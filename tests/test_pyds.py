"""Unit tests for the Python DataSource advisory-log source — the
driver-side contracts (partition planning, filter-pushdown
bookkeeping, streaming offset replay) that the oracle-parity entries
exercise only end-to-end. No SparkSession needed: the reader classes
are plain Python at this layer by design."""

import os

from pyspark.sql.datasource import EqualTo, GreaterThan, InputPartition

from ibf_typhoon_data_pipeline_spark.sources.pyds import (
    AdvisoryLogReader,
    AdvisoryLogStreamReader,
)


def _write_logs(tmp_path, n_files=3, rows_per=4):
    rows = []
    for i in range(n_files):
        lines = []
        for j in range(rows_per):
            eid = i * rows_per + j
            et = "click" if eid % 2 == 0 else "purchase"
            lines.append(f"{eid}|{1700000000 + eid}|{eid % 7}|{et}|{eid * 10}")
            rows.append((eid, 1700000000 + eid, eid % 7, et, eid * 10))
        (tmp_path / f"f{i}.txt").write_text("\n".join(lines) + "\n")
    # a non-log file the manifest must ignore
    (tmp_path / "README.md").write_text("not data\n")
    return rows


def test_batch_partitions_one_per_file(tmp_path):
    _write_logs(tmp_path)
    r = AdvisoryLogReader({"path": str(tmp_path)})
    parts = r.partitions()
    assert len(parts) == 3
    assert all(isinstance(p, InputPartition) for p in parts)
    # deterministic manifest order
    assert [os.path.basename(p.value) for p in parts] == [
        "f0.txt",
        "f1.txt",
        "f2.txt",
    ]


def test_batch_read_roundtrip_and_pushdown(tmp_path):
    rows = _write_logs(tmp_path)
    r = AdvisoryLogReader({"path": str(tmp_path)})
    got = [t for p in r.partitions() for t in r.read(p)]
    assert sorted(got) == sorted(rows)

    # pushdown: the event_type EqualTo is absorbed, others are residual
    r2 = AdvisoryLogReader({"path": str(tmp_path)})
    eq = EqualTo(("event_type",), "click")
    gt = GreaterThan(("event_id",), 3)
    residual = list(r2.pushFilters([eq, gt]))
    assert residual == [gt]
    got2 = [t for p in r2.partitions() for t in r2.read(p)]
    assert got2 and all(t[3] == "click" for t in got2)
    assert sorted(got2) == sorted(t for t in rows if t[3] == "click")


def test_pushdown_only_absorbs_first_equalto(tmp_path):
    _write_logs(tmp_path)
    r = AdvisoryLogReader({"path": str(tmp_path)})
    a = EqualTo(("event_type",), "click")
    b = EqualTo(("event_type",), "purchase")
    residual = list(r.pushFilters([a, b]))
    # one predicate absorbed, the conflicting second stays residual —
    # Spark re-applies it, so correctness never depends on the reader
    assert residual == [b]


def test_stream_offsets_advance_one_file_per_batch(tmp_path):
    rows = _write_logs(tmp_path)
    r = AdvisoryLogStreamReader({"path": str(tmp_path)})
    off = r.initialOffset()
    assert off == {"idx": 0}
    seen = []
    for expected_idx in (1, 2, 3):
        batch, off = r.read(off)
        batch = list(batch)
        assert len(batch) == 4
        seen.extend(batch)
        assert off == {"idx": expected_idx}
    # exhausted: read returns empty without advancing
    batch, off2 = r.read(off)
    assert list(batch) == [] and off2 == off
    assert sorted(seen) == sorted(rows)


def test_stream_read_between_offsets_replays_exactly(tmp_path):
    _write_logs(tmp_path)
    r = AdvisoryLogStreamReader({"path": str(tmp_path)})
    off0 = r.initialOffset()
    b1, off1 = r.read(off0)
    b2, off2 = r.read(off1)
    live = sorted(list(b1) + list(b2))
    replay = sorted(r.readBetweenOffsets(off0, off2))
    assert replay == live
