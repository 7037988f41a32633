from ibf_typhoon_data_pipeline_spark.plans.registry import (
    QUERIES,
    oracle_sql_map,
    oracle_text,
    query_map,
)

# importing the catalog modules populates the registry
from ibf_typhoon_data_pipeline_spark.plans import (  # noqa: E402,F401
    analytics,
    corpus,
    curation,
    graphs,
    linkage,
    mlops,
    relational,
    relational_ext,
    temporal,
    tpch_fill,
    typhoon,
    vectors,
)

__all__ = ["QUERIES", "query_map", "oracle_sql_map", "oracle_text"]
