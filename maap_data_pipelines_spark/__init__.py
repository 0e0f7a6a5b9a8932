"""PySpark-native analytics engine with the query & data-processing
capabilities of MAAP-Project/MAAP-data-pipelines, rebuilt Spark-first.

Layout:
    session     SparkSession factory with scale-tuned defaults
    sources     discovery inputs as DataFrames (s3 listings, inventories, CMR)
    functions   pure column-expression builders (hashing, vectors, dates)
    operators   DataFrame -> DataFrame transforms (STAC, dedup, text, ANN)
    plans       end-to-end pipelines + analytic query battery
    streaming   Structured Streaming variants
"""

__version__ = "0.1.0"
