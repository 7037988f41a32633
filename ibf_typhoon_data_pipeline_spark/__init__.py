"""PySpark-native analytics engine with the query & data-processing
capabilities of rodekruis/IBF_TYPHOON_DATA_PIPELINE.

The reference (at /root/reference) is a single-node pandas/xarray/R
impact-based-forecasting ETL pipeline; this package re-expresses its
operator inventory (SURVEY.md §2) as idiomatic Spark DataFrame/SQL
plans, plus the large-scale training-data operators (dedup,
similarity search, text analysis, multimodal plumbing) a 100 TB
pipeline needs.

Layout:
    session     — tuned SparkSession builder
    sources     — schema'd readers, ingest adapters, bucketed layout
    functions   — scalar expression library (geo, conversions, ladders)
    operators   — operator library (joins, aggs, windows, dedup,
                  interpolation, text, similarity, multimodal,
                  inference, and the Holland/Willoughby wind kernels
                  as both codegen expressions and applyInPandas)
    plans       — named end-to-end query plans + the oracle registry
    streaming   — Structured Streaming ingest skin
    sinks       — file/REST/blob publishers
    pipeline    — orchestrated forecast DAG with persist boundaries
"""

from ibf_typhoon_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
