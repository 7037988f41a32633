"""Publish-side sinks (SURVEY.md §2.1 S7/S8/S11).

File sinks are engine-native (`df.write`); the REST/blob publishers
are driver-side adapters over *collected* layer frames — every upload
frame in the reference is municipality-sized (~1,650 rows,
forecast_process.py:1160-1233), so collect-then-POST is the right
shape; a `foreachPartition` HTTP push only makes sense if a layer ever
becomes fact-sized. Network libraries are gated."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_exposure_json(df: DataFrame, path: str) -> None:
    """S11 — per-indicator JSON documents (the F19 nested-doc frames)."""
    df.write.mode("overwrite").json(path)


def write_layer_csv(df: DataFrame, path: str) -> None:
    """S11 — windfield/track/trigger CSVs (forecast_process.py:1640,
    836, 1349-1355). coalesce(1) mirrors the reference's single-file
    outputs; drop it for fact-sized layers."""
    df.coalesce(1).write.mode("overwrite").csv(path, header=True)


def post_exposure_to_api(
    df: DataFrame, api_url: str, layer: str, token: str | None = None
) -> None:
    """S8 — authenticate then POST exposure docs to
    `admin-area-dynamic-data/exposure` (dynamicDataDb.py:53-124,
    258-299). Collects the (small) layer frame on the driver."""
    try:
        import requests  # noqa: F401
    except Exception as exc:  # pragma: no cover
        raise NotImplementedError(
            "HTTP publisher requires `requests`; not available here"
        ) from exc
    raise NotImplementedError(
        "live API publishing is environment-specific; wire credentials "
        "and retry policy in the deployment, then POST df.toJSON()"
    )


def upload_to_blob(local_path: str, container: str, blob_name: str) -> None:
    """S7 — data-lake upload (dynamicDataDb.py:301-418)."""
    raise NotImplementedError(
        "blob SDK not available in this container; adapter boundary only"
    )
