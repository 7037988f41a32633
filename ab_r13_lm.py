#!/usr/bin/env python
"""Paired in-session A/B: text_lm_logprob_capped freq persist (r12)
vs the r11 unpersisted shape (VERDICT r12 item 3 adjudication).
A = r11 (no persist), B = current module code (persist). Alternating
back-to-back noop runs in one JVM; median paired ratio B/A."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from ibf_typhoon_data_pipeline_spark import plans  # noqa: E402
from ibf_typhoon_data_pipeline_spark.operators import dedup as dd  # noqa: E402
from ibf_typhoon_data_pipeline_spark.operators.cache import (  # noqa: E402
    release_caches,
)
from ibf_typhoon_data_pipeline_spark.plans.curation import (  # noqa: E402
    _LM_K,
    _LM_LP_EC_MICRO_SQL,
    _LM_MEAN_NLL_SQL,
)
from ibf_typhoon_data_pipeline_spark.session import get_spark  # noqa: E402
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table  # noqa: E402


def old_lm_capped(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", dd.split_words(F.col("text")).alias("__words"))
    )
    tok = docs.select("doc_id", F.explode("__words").alias("tok"))
    freq = tok.groupBy("tok").agg(F.count("*").cast("long").alias("c"))
    vocab = freq.orderBy(F.col("c").desc(), F.col("tok")).limit(_LM_K)
    tot = freq.agg(F.sum("c").cast("long").alias("corpus_tokens"))
    oov = (
        tot.crossJoin(vocab.agg(F.sum("c").cast("long").alias("__vc")))
        .select(
            F.greatest(
                F.col("corpus_tokens") - F.col("__vc"), F.lit(1).cast("long")
            ).alias("oov_mass")
        )
    )
    scored = (
        tok.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(oov))
        .select(
            "doc_id",
            F.when(F.col("c").isNull(), 1).otherwise(0).alias("is_oov"),
            F.coalesce(F.col("c"), F.col("oov_mass")).alias("ec"),
            "corpus_tokens",
        )
        .select(
            "doc_id",
            "is_oov",
            F.expr(_LM_LP_EC_MICRO_SQL).alias("lp_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("is_oov").cast("long").alias("n_oov"),
        F.sum("lp_micro").cast("long").alias("logprob_micro"),
        F.expr(_LM_MEAN_NLL_SQL).alias("mean_nll"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("ibf-ab-r13-lm", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    new_fn = plans.QUERIES["text_lm_logprob_capped"].fn

    def run(fn):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        release_caches()
        return dt

    run(old_lm_capped)
    run(new_fn)
    ratios, a_ts, b_ts = [], [], []
    for i in range(n_pairs):
        if i % 2 == 0:
            ta, tb = run(old_lm_capped), run(new_fn)
        else:
            tb, ta = run(new_fn), run(old_lm_capped)
        a_ts.append(round(ta, 3))
        b_ts.append(round(tb, 3))
        ratios.append(tb / ta)
    print(
        f"text_lm_logprob_capped: A(r11 no-persist)={a_ts} "
        f"B(r12 persist)={b_ts} "
        f"median_ratio_B/A={statistics.median(ratios):.3f} "
        f"min_A={min(a_ts):.3f} min_B={min(b_ts):.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
