"""ANN quality contract: the bucketed variants must recover a
meaningful share of the true cosine top-5, and multi-probe must
strictly improve on single-probe — the statistical claim that makes
the sub-quadratic pair space a valid stand-in for brute force.

Floors are set from measured values on the synthetic embeddings
(uniform random — the WORST case for ANN: no cluster structure), with
slack for future regeneration of the test data.
"""

from __future__ import annotations

from ibf_typhoon_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_multiprobe_topk,
    ivf_topk,
    lsh_bucketed_topk,
)
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_ann_recall_floors_and_multiprobe_gain(spark):
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    truth = _pairs(brute_force_topk(emb, k=5))
    assert truth

    recall = {}
    for name, df in [
        ("ivf_p1", ivf_topk(emb, k=5)),
        ("ivf_p2", ivf_multiprobe_topk(emb, k=5, probe=2)),
        ("lsh", lsh_bucketed_topk(emb, k=5)),
    ]:
        approx = _pairs(df)
        recall[name] = len(approx & truth) / len(truth)

    # measured at sf0.01: ivf_p1 ≈ 0.26, lsh ≈ 0.055
    assert recall["ivf_p1"] > 0.15, recall
    assert recall["lsh"] > 0.02, recall
    # probing a second cell must strictly add recall
    assert recall["ivf_p2"] > recall["ivf_p1"], recall
