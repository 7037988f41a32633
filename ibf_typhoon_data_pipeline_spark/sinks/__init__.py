from ibf_typhoon_data_pipeline_spark.sinks.publish import (
    post_exposure_to_api,
    upload_to_blob,
    write_exposure_json,
    write_layer_csv,
)

__all__ = [
    "write_exposure_json",
    "write_layer_csv",
    "post_exposure_to_api",
    "upload_to_blob",
]
