from ibf_typhoon_data_pipeline_spark.functions import convert, geo

__all__ = ["convert", "geo"]
