"""Avro serde (`to_avro`/`from_avro`) is an ENVIRONMENT-GATED surface
in this container: the Python wrappers ship with pyspark 4.1, but the
spark-avro data source is an external jar loaded via --packages, and
package installs/network are prohibited here — calls raise
AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE. Binary-payload serde semantics
are covered by the VARIANT (events_variant_props), JSON-document
(f19/tc_exposure_json), and binaryFile/multimodal entries; this test
pins the gate so the capability (and a future serde entry) flips on
automatically in an environment that ships the jar."""

import pytest
from pyspark.errors import AnalysisException


def _avro_loaded(spark) -> bool:
    from pyspark.sql.avro.functions import to_avro

    df = spark.range(1).selectExpr("named_struct('a', id) s")
    try:
        df.select(to_avro("s")).collect()
        return True
    except AnalysisException as e:
        if "AVRO_NOT_LOADED" in str(e):
            return False
        raise


def test_avro_wrappers_present():
    from pyspark.sql.avro.functions import (  # noqa: F401
        from_avro,
        to_avro,
    )


def test_avro_roundtrip_or_documented_gate(spark):
    if not _avro_loaded(spark):
        pytest.skip(
            "spark-avro jar absent (external --packages, no network): "
            "to_avro raises AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE"
        )
    # environment ships the jar: the round-trip must be exact
    from pyspark.sql.avro.functions import from_avro, to_avro

    df = spark.range(5).selectExpr(
        "id", "named_struct('a', id, 'b', CAST(id * 2 AS STRING)) s"
    )
    enc = df.select("id", to_avro("s").alias("bin"))
    schema = (
        '{"type":"record","name":"s","fields":['
        '{"name":"a","type":"long"},{"name":"b","type":"string"}]}'
    )
    dec = enc.select("id", from_avro("bin", schema).alias("s"))
    assert sorted((r["id"], r["s"]["a"], r["s"]["b"]) for r in dec.collect()) == [
        (i, i, str(i * 2)) for i in range(5)
    ]
