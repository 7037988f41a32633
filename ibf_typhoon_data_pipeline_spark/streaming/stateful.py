"""Custom stateful streaming operator (SURVEY.md §2.10 extension).

The reference has no streaming state, but its operational loop — "is
there an active typhoon, has it crossed the trigger threshold yet,
how strong has it been so far" (Check_for_active_typhoon.py:7-53 +
the per-run trigger checks, forecast_process.py:1262-1266) — is
exactly a keyed running-state computation. Re-expressed on Structured
Streaming it becomes ``applyInPandasWithState``: one state row per
ensemble member, updated per micro-batch as forecast drops land.

State per key: (n points seen, running peak vmax, earliest step whose
vmax crossed the trigger threshold; -1 until crossed). All updates are
order-independent (count/max/min), so the result is identical however
the file source slices the drops into batches — which is what makes
the operator oracle-checkable against the batch aggregate.

Scale: state is O(|members|) — three scalars per key — and lives in
the state store keyed by the same (ens_id) the windfield partitions
on; no skew, no unbounded growth. With continuous ingestion, add a
timeout (GroupStateTimeout) to retire storms that stopped reporting.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "ens_id long, n_points long, peak_vmax double, first_trigger_step long"
)
STATE_SCHEMA = "n long, peak double, first_trig long"
TRIGGER_VMAX_MS = 33.0  # typhoon-strength threshold (F10 TY bin lower edge)


def track_state_tracker(
    stream: DataFrame, threshold_ms: float = TRIGGER_VMAX_MS
) -> DataFrame:
    """Running per-member intensity state over a track-point stream.

    Emits the updated state row for every key touched in a batch
    (update mode), so the sink sees the state trajectory; the final
    row per key (max n_points — strictly monotone per emission) equals
    the batch aggregate over all points.
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, peak, first_trig = state.get
        else:
            n, peak, first_trig = 0, float("-inf"), -1
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            peak = max(peak, float(pdf["vmax"].max()))
            crossed = pdf.loc[pdf["vmax"] >= threshold_ms, "step"]
            if len(crossed):
                m = int(crossed.min())
                first_trig = m if first_trig < 0 else min(first_trig, m)
        state.update((n, peak, first_trig))
        yield pd.DataFrame(
            {
                "ens_id": [key[0]],
                "n_points": [n],
                "peak_vmax": [peak],
                "first_trigger_step": [first_trig],
            }
        )

    return stream.groupBy("ens_id").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
