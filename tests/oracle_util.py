"""Local replica of the driver's DuckDB-oracle comparison so failures
surface in pytest before the round gate."""

from __future__ import annotations

import math

import duckdb

from ibf_typhoon_data_pipeline_spark.sources.tables import TABLES

SF_ORACLE = "/root/testdata/sf0.01"


def duck_con(sf_dir: str = SF_ORACLE) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == int(v) and abs(v) < 1e15:
            return f"f:{int(v)}"
        return f"f:{v:.9g}"
    if isinstance(v, int):
        return f"f:{v}"  # ints and integral floats hash alike
    return f"s:{v}"


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append("|".join(_norm_cell(vals[i]) for i in order))
    return sorted(out)


def compare_query(spark, name, fn, sql, sf_dir: str = SF_ORACLE):
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    con = duck_con(sf_dir)
    # fail fast on oracle columns whose DuckDB type exports differently
    # from its Python value (HUGEINT/DECIMAL -> decimal128/float64):
    # fetchall()'s Python ints masked exactly this for three rounds on
    # a5_a6 (driver saw 1.0 vs 1). test_type_parity sweeps the whole
    # catalog; this inline check pins each entry in its own test.
    for col, dtype, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
        up = dtype.upper()
        assert "HUGEINT" not in up and "DECIMAL" not in up, (
            f"{name}.{col}: oracle types it {dtype} — CAST it to "
            f"BIGINT/DOUBLE in the oracle text"
        )
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{name}: row count spark={len(srows)} oracle={len(orows)}"
    )
    s_h = canon(srows, scols)
    o_h = canon(orows, ocols)
    if s_h != o_h:
        diff_s = [r for r in s_h if r not in set(o_h)][:5]
        diff_o = [r for r in o_h if r not in set(s_h)][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only={diff_s}\n oracle-only={diff_o}"
        )
