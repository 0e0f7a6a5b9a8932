"""Registered multimodal plans.

``media_metadata`` is fully oracle-checked (metadata derivation is pure
column arithmetic); ``media_features`` exercises the real mapInPandas
binary-decode plumbing with the stubbed codec and gets the driver's
rows-only check (byte-level histograms are not expressible in the SQL
oracle — the plumbing shape is pinned by tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import extract_features, make_media_df, media_metadata_summary
from ..sources.catalog import read_table


def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return media_metadata_summary(make_media_df(docs))


MEDIA_METADATA_SQL = """
WITH media AS (
  SELECT doc_id,
         CASE (doc_id % 3) WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS media_type,
         CAST((doc_id % 16 + 1) * 64 AS INT) AS width,
         CAST((doc_id % 9 + 1) * 64 AS INT) AS height,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
)
SELECT media_type,
       COUNT(*) AS n_media,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       MAX(width) AS max_width,
       MAX(height) AS max_height
FROM media
GROUP BY media_type
"""


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return extract_features(make_media_df(docs), allow_stub=True)


QUERIES = {
    "media_metadata": media_metadata,
    "media_features": media_features,
}

ORACLES = {
    "media_metadata": MEDIA_METADATA_SQL,
    # media_features: rows-only (binary histogram not SQL-expressible)
}
