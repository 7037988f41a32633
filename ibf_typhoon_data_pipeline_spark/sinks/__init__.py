from ibf_typhoon_data_pipeline_spark.sinks.publish import (
    IbfApiClient,
    process_events,
    publish_exposure_frames,
    replay_mock_event,
    upload_to_blob,
    write_exposure_json,
    write_layer_csv,
)

__all__ = [
    "write_exposure_json",
    "write_layer_csv",
    "IbfApiClient",
    "publish_exposure_frames",
    "process_events",
    "replay_mock_event",
    "upload_to_blob",
]
