"""Minimal versioned table: manifest-based snapshots over parquet.

The primitive that makes warehouse maintenance safe at scale: a table is
not a directory, it is a MANIFEST — an immutable, versioned list of data
directories. Readers resolve a manifest once and only ever see the files
it lists; writers add data then publish a new manifest with an atomic
rename. That gives, with ~100 lines and no lock service:

- **snapshot isolation**: a reader holding version N is unaffected by
  any later commit — including a compaction that logically rewrites
  everything it is reading;
- **time travel**: any retained version remains readable
  (``read(version=K)``);
- **safe compaction**: ``compact()`` rewrites the current snapshot into
  one directory and publishes it as a NEW version — old files are never
  deleted under a reader (vacuuming old versions is an explicit,
  separate policy decision);
- **atomic append/overwrite**: data lands in a commit-private directory
  first; the manifest rename is the only publication point, so readers
  never observe a half-written commit.

This is deliberately the idea behind production table formats (Iceberg /
Delta's log), shrunk to the engine's needs and kept fully inspectable —
the manifest is one JSON file per version. Single-writer by design:
concurrent WRITERS need a log service or conditional puts (documented
non-goal); concurrent readers-with-one-writer is the case this solves.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col as F_col


class VersionedTable:
    def __init__(self, base: str):
        self.base = base
        os.makedirs(os.path.join(base, "manifests"), exist_ok=True)

    # -- manifest plumbing -------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.base, "manifests", f"v{version:06d}.json")

    def versions(self) -> list[int]:
        mdir = os.path.join(self.base, "manifests")
        return sorted(
            int(f[1:-5]) for f in os.listdir(mdir)
            if f.startswith("v") and f.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _load(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _publish(self, dirs: list[str]) -> int:
        prev = self.latest_version()
        version = 0 if prev is None else prev + 1
        tmp = self._manifest_path(version) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "dirs": dirs}, f)
        # rename is the atomic publication point
        os.rename(tmp, self._manifest_path(version))
        return version

    # -- write path --------------------------------------------------------

    def commit(self, df: DataFrame, mode: str = "append") -> int:
        """Write df into a commit-private dir, publish a new manifest.

        ``append`` unions the new dir with the current snapshot's dirs;
        ``overwrite`` makes the new dir the whole snapshot. Either way
        no existing data file is touched.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        prev = self.latest_version()
        new_dir = os.path.join(
            self.base, "data", f"c{0 if prev is None else prev + 1:06d}"
        )
        df.write.mode("errorifexists").parquet(new_dir)
        base_dirs = (
            [] if mode == "overwrite" or prev is None
            else list(self._load(prev)["dirs"])
        )
        return self._publish(base_dirs + [new_dir])

    def compact(self, spark: SparkSession, n_files: int = 1) -> int:
        """Rewrite the current snapshot into one directory, publish it.

        Logically an overwrite-with-same-content: readers on older
        versions keep their (uncompacted) files; new readers get the
        compacted layout.
        """
        cur = self.read(spark)
        prev = self.latest_version()
        new_dir = os.path.join(self.base, "data", f"c{prev + 1:06d}")
        cur.coalesce(n_files).write.mode("errorifexists").parquet(new_dir)
        return self._publish([new_dir])

    def merge_upsert(
        self, updates: DataFrame, key: str, delete_col: str | None = None
    ) -> int:
        """MERGE: upsert rows by key (and optionally delete), new version.

        The Delta-style maintenance primitive on top of snapshots: read
        the current version, anti-join rows whose key appears in
        ``updates`` (they are being replaced), union the surviving base
        rows with the updates (minus rows flagged in ``delete_col``),
        and commit the result as an overwrite — one shuffle join, and
        readers on the old version are untouched. Updates must carry the
        full row schema (plus the optional boolean delete flag).
        """
        spark = updates.sparkSession
        upd = updates
        deletes = None
        if delete_col is not None:
            deletes = upd.filter(F_col(delete_col)).select(key)
            upd = upd.filter(~F_col(delete_col)).drop(delete_col)
        if self.latest_version() is None:
            merged = upd
        else:
            base = self.read(spark)
            replaced = upd.select(key).union(
                deletes if deletes is not None else upd.select(key).limit(0)
            )
            merged = base.join(replaced, key, "left_anti").unionByName(upd)
        return self.commit(merged, mode="overwrite")

    def vacuum(self, keep_last: int = 2) -> dict:
        """Drop versions older than the last ``keep_last`` and delete data
        dirs no retained manifest references.

        The explicit policy step separated from compaction: compaction
        never deletes (readers may hold old snapshots); vacuum is where
        the operator declares how far back readers are allowed to be.
        Returns {"removed_versions": [...], "removed_dirs": [...]}.
        """
        import shutil

        vs = self.versions()
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        drop, keep = vs[:-keep_last], vs[-keep_last:]
        live = {d for v in keep for d in self._load(v)["dirs"]}
        dead = [
            d
            for v in drop
            for d in self._load(v)["dirs"]
            if d not in live
        ]
        for d in sorted(set(dead)):
            shutil.rmtree(d, ignore_errors=True)
        for v in drop:
            os.remove(self._manifest_path(v))
        return {"removed_versions": drop, "removed_dirs": sorted(set(dead))}

    # -- read path ---------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Resolve a manifest (latest by default) and read exactly its files."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise ValueError(f"empty table at {self.base}")
        dirs = self._load(v)["dirs"]
        return spark.read.parquet(*dirs)
