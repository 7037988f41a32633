"""transformWithStateInPandas (Spark 4.0 arbitrary stateful v2) is an
ENVIRONMENT-GATED surface in this container: the API exists and plans
(TransformWithStateInPySpark lands in the logical plan), but its
Python driver worker imports pyspark.sql.streaming.proto.StateMessage_pb2,
which requires `google.protobuf` — not installed here and installs are
prohibited. The applyInPandasWithState entries (stream_stateful_peak,
streaming/stateful.py) cover the keyed-running-state semantics; this
test pins the gate so the capability flips on automatically (and the
skip disappears) in an environment that ships protobuf."""

import importlib.util

import pytest


def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # parent `google` namespace absent
        return False


def test_transform_with_state_api_present():
    from pyspark.sql.group import GroupedData

    assert hasattr(GroupedData, "transformWithStateInPandas")
    from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
        StatefulProcessor,
        StatefulProcessorHandle,
    )


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="google.protobuf absent: transformWithState python worker "
    "cannot start (StateMessage_pb2 import)",
)
def test_transform_with_state_runs(spark):
    """Keyed running totals via a ValueState StatefulProcessor must
    equal the batch aggregate (same contract as stream_stateful_peak).
    Runs only where protobuf exists."""
    import os
    import shutil
    import tempfile

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 1000.0 + 0.5)
            .cast("long")
            .alias("value_milli"),
        )
    )

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n LONG, s LONG")

        def handleInputRows(self, key, rows, timer_values):
            n, s = (self._agg.get() if self._agg.exists() else (0, 0))
            for pdf in rows:
                if not len(pdf):
                    continue
                n += len(pdf)
                s += int(pdf["value_milli"].sum())
            self._agg.update((n, s))
            yield pd.DataFrame(
                {"event_type": [key[0]], "n_events": [n], "sum_milli": [s]}
            )

        def close(self) -> None:
            pass

    work = tempfile.mkdtemp(prefix="ibf_tws_")
    landing, out, ckpt = (
        os.path.join(work, d) for d in ("landing", "out", "ckpt")
    )
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(landing)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        res = stream.groupBy("event_type").transformWithStateInPandas(
            Totals(),
            "event_type string, n_events long, sum_milli long",
            "Update",
            "None",
        )
        q = (
            res.writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r["event_type"]: (r["n_events"], r["sum_milli"])
            for r in spark.read.parquet(out)
            .groupBy("event_type")
            .agg(F.max(F.struct("n_events", "sum_milli")).alias("st"))
            .select("event_type", "st.n_events", "st.sum_milli")
            .collect()
        }
        want = {
            r["event_type"]: (r["n"], r["s"])
            for r in ev.groupBy("event_type")
            .agg(
                F.count("*").alias("n"), F.sum("value_milli").alias("s")
            )
            .collect()
        }
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)
        shutil.rmtree(work, ignore_errors=True)
