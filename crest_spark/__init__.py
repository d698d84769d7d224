"""crest_spark — a PySpark-native analytics + lakehouse-ingestion engine.

A from-scratch, Spark-first re-expression of the capability surface of the
reference streaming-lakehouse pipeline (TFMV/crest: Arrow Flight source →
Parquet micro-batch files → transactional Iceberg append commits, see
``/root/reference/pkg/ingestor``), plus the relational query surface that
pipeline assumes upstream and the LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) required at 100 TB
scale.

Layout:
    session     -- SparkSession factory tuned for scale (AQE, Arrow, shuffle)
    sources     -- table loaders / registration (parquet star schema)
    operators   -- relational + LLM-pipeline operators (DataFrame-first)
    functions   -- reusable column-expression builders (vector math, hashing)
    lakehouse   -- transactional commit-log table format (crest's Iceberg
                   append-commit parity, self-contained: parquet + JSON log)
    streaming   -- Structured Streaming ingestion service + event-time ops
    plans       -- plan introspection helpers (pushdown / broadcast asserts)
"""

from crest_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
