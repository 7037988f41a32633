from ibf_typhoon_data_pipeline_spark.streaming.micro_batch import (
    dedup_forecast_drops,
    forecast_stream,
    run_available_now,
)

__all__ = ["forecast_stream", "dedup_forecast_drops", "run_available_now"]
