"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a typed metadata
struct alongside (media_type, width, height, n_bytes). Decode /
feature-extract run as Arrow-batched ``mapInPandas`` — the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested; the
actual codec call is STUBBED (no image/audio libraries in this
environment) behind ``decode_media``, which raises NotImplementedError
unless ``allow_stub=True`` substitutes a deterministic fake.

At 100 TB: binary payloads ride the same parquet scans as every other
column (columnar pruning means metadata-only queries never read the
bytes); feature extraction is embarrassingly parallel over Arrow record
batches with zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "n_bytes bigint, payload binary"
)


def make_media_df(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from documents.

    The text bytes stand in for an encoded image payload; width/height
    are deterministic metadata. This is the ingestion shape a real
    pipeline would produce (payload + typed metadata side-by-side).
    """
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        ((F.col("doc_id") % 16 + 1) * 64).cast("int").alias("width"),
        ((F.col("doc_id") % 9 + 1) * 64).cast("int").alias("height"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        payload.alias("payload"),
    )


def decode_media(payload: bytes, media_type: str, allow_stub: bool = False) -> np.ndarray:
    """Decode a media payload to a pixel/sample array.

    STUB: real decoding needs PIL/ffmpeg/soundfile, which are not in this
    container. With ``allow_stub`` the payload bytes themselves are
    reinterpreted as the sample array (deterministic, shape-correct
    plumbing); without it this raises so nobody mistakes the stub for a
    real codec.
    """
    if not allow_stub:
        raise NotImplementedError(
            f"no codec available for {media_type}; pass allow_stub=True for "
            "the deterministic byte-passthrough used in tests"
        )
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(media: DataFrame, allow_stub: bool = True) -> DataFrame:
    """Per-payload feature vector via Arrow-batched mapInPandas.

    Features: FEATURE_DIM-bucket byte histogram, L1-normalized — a stand-in
    for an embedding model forward pass with identical plumbing (binary in,
    fixed-dim float array out, zero shuffle).
    """
    schema = f"doc_id bigint, media_type string, n_bytes bigint, features array<double>"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                arr = decode_media(payload, mt, allow_stub=allow_stub)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(
                    np.float64
                )
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return media.mapInPandas(_batches, schema=schema)


FRAME_BYTES = 64
FRAME_SAMPLE_EVERY = 4


def frame_sample(media: DataFrame) -> DataFrame:
    """Sample every 4th fixed-size frame from each payload (fan-out).

    The video-pipeline plumbing shape: one binary row in, one row per
    SAMPLED frame out, via Arrow-batched ``mapInPandas`` — zero shuffle,
    embarrassingly parallel, output partitioning inherited from the scan.
    The stub "decode" treats the payload as a flat byte stream chopped
    into FRAME_BYTES-byte frames (a real deployment swaps in an ffmpeg
    keyframe reader with the identical signature); the checksum is the
    exact int64 sum of frame bytes, so the whole fan-out is
    oracle-checkable (payloads are ASCII text bytes, so byte slices ==
    char slices in the SQL rendering).
    """
    import numpy as np

    schema = "doc_id bigint, frame_idx bigint, n_frame_bytes bigint, checksum bigint"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            doc_ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            sums: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n_frames = -(-len(arr) // FRAME_BYTES)  # ceil
                for k in range(0, n_frames, FRAME_SAMPLE_EVERY):
                    fr = arr[k * FRAME_BYTES : (k + 1) * FRAME_BYTES]
                    doc_ids.append(int(doc_id))
                    idxs.append(k)
                    sizes.append(len(fr))
                    sums.append(int(fr.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "n_frame_bytes": pd.Series(sizes, dtype="int64"),
                    "checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(_batches, schema=schema)


AUDIO_WINDOW_BYTES = 128
AUDIO_HOP_BYTES = 64


def audio_windows(media: DataFrame) -> DataFrame:
    """Overlapping sliding windows over audio payloads (STFT-frame shape).

    Unlike :func:`frame_sample` (disjoint frames), windows OVERLAP:
    window k covers bytes [k*hop, k*hop + window), hop < window — the
    frame layout every spectral feature (STFT/MFCC) consumes. Only
    windows that fit entirely are emitted (standard truncation). The
    stub "signal" is the byte stream; sum and peak per window are exact
    integers, so the fan-out is fully oracle-checkable. Zero shuffle,
    output partitioning inherited from the scan.
    """
    import numpy as np

    schema = (
        "doc_id bigint, window_idx bigint, window_sum bigint, window_peak bigint"
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "window_idx", "window_sum", "window_peak")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n_win = (len(arr) - AUDIO_WINDOW_BYTES) // AUDIO_HOP_BYTES + 1
                for k in range(max(n_win, 0)):
                    w = arr[k * AUDIO_HOP_BYTES : k * AUDIO_HOP_BYTES + AUDIO_WINDOW_BYTES]
                    out["doc_id"].append(int(doc_id))
                    out["window_idx"].append(k)
                    out["window_sum"].append(int(w.sum()))
                    out["window_peak"].append(int(w.max()))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return media.select("doc_id", "payload").mapInPandas(_batches, schema=schema)


RESIZE_FACTOR = 2


def resize_media(media: DataFrame) -> DataFrame:
    """Stub 2x downsample per payload (mapInPandas, zero shuffle).

    The image-resize plumbing shape: payload in, reduced payload stats +
    halved metadata out. The stub "resample" keeps every RESIZE_FACTOR-th
    byte (a real deployment swaps in PIL/opencv with this exact
    signature); the resized byte count and checksum are exact integers,
    so the whole op is oracle-checkable through the ASCII byte==char
    identity.
    """
    import numpy as np

    schema = (
        "doc_id bigint, new_width int, new_height int, "
        "n_resized_bytes bigint, resized_checksum bigint"
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "new_width", "new_height",
                                   "n_resized_bytes", "resized_checksum")}
            for doc_id, w, h, payload in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                kept = arr[::RESIZE_FACTOR]
                out["doc_id"].append(int(doc_id))
                out["new_width"].append(int(w) // RESIZE_FACTOR)
                out["new_height"].append(int(h) // RESIZE_FACTOR)
                out["n_resized_bytes"].append(len(kept))
                out["resized_checksum"].append(int(kept.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "new_width": pd.Series(out["new_width"], dtype="int32"),
                    "new_height": pd.Series(out["new_height"], dtype="int32"),
                    "n_resized_bytes": pd.Series(out["n_resized_bytes"], dtype="int64"),
                    "resized_checksum": pd.Series(out["resized_checksum"], dtype="int64"),
                }
            )

    return media.select("doc_id", "width", "height", "payload").mapInPandas(
        _batches, schema=schema
    )


def media_metadata_summary(media: DataFrame) -> DataFrame:
    """Metadata-only rollup — never touches the payload column.

    Column pruning keeps the binary bytes out of the scan entirely; at
    100 TB this is the difference between a metadata query and a full
    table read (verify via .explain: ReadSchema excludes 'payload').
    """
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )
