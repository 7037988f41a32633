"""Similarity-search catalog over the ``embeddings`` table
(array<float> column): exact brute-force cosine top-k baseline and the
sign-LSH bucketed ANN scale path.

Parity: both engines promote float32 → double before any arithmetic
and fold the dot product in index order; similarities are rounded to
6dp BEFORE ranking so ulp noise cannot flip a rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ibf_typhoon_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup,
    ivf_multiprobe_topk,
    ivf_topk,
    lsh_bucketed_topk,
)
from ibf_typhoon_data_pipeline_spark.plans.registry import register
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

_COSINE = (
    "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])), 6)"
)


@register(
    "sim_bruteforce_topk",
    f"""
    WITH pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_COSINE} AS cosine_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
      ) AS rn FROM pairs
    ) WHERE rn <= 5
    """,
    doc="Exact all-pairs cosine top-5 — the ANN correctness baseline; "
        "n² pairs, one shuffle + one window",
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, k=5)


@register(
    "sim_lsh_topk",
    f"""
    WITH bucketed AS (
      SELECT vec_id, embedding,
             array_to_string(list_transform(
               (CAST(embedding AS DOUBLE[]))[1:6],
               x -> CASE WHEN x >= 0 THEN '+' ELSE '-' END), '') AS bucket
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_COSINE} AS cosine_sim
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
      ) AS rn FROM pairs
    ) WHERE rn <= 5
    """,
    doc="Sign-LSH bucketed ANN top-5: axis-aligned hyperplane bucket "
        "key shrinks the pair space from n² to Σ bucket² — the 100 TB "
        "path; recall<1 by construction",
)
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_bucketed_topk(emb, k=5, m=6)


@register(
    "dedup_embedding_cosine",
    """
    WITH bucketed AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve,
             array_to_string(list_transform(
               (CAST(embedding AS DOUBLE[]))[1:6],
               x -> CASE WHEN x >= 0 THEN '+' ELSE '-' END), '') AS bucket
      FROM embeddings
    ), matched AS (
      SELECT a.vec_id AS aid, min(b.vec_id) AS canon
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND b.vec_id < a.vec_id
      WHERE round(list_cosine_similarity(a.ve, b.ve), 6) >= CAST(0.3 AS DOUBLE)
      GROUP BY a.vec_id
    )
    SELECT e.vec_id,
           coalesce(m.canon, e.vec_id) AS canonical_id,
           m.canon IS NOT NULL AS is_dup
    FROM embeddings e LEFT JOIN matched m ON e.vec_id = m.aid
    """,
    doc="Embedding-cosine near-dup: sign-LSH bucket candidate join "
        "(n² → Σ bucket²), pair is dup at round(cos,6) ≥ t, canonical "
        "= lowest matched id (keep-first). Threshold 0.3 here so the "
        "synthetic embeddings (max within-bucket cos ≈ 0.55) exercise "
        "real pairs; production default 0.98",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup(emb, threshold=0.3, m=6)


_SEG_SUMS = ", ".join(
    f"list_sum(ve[{k * 8 + 1}:{(k + 1) * 8}]) AS s{k}" for k in range(8)
)
_CELL_LADDER = " ".join(
    f"WHEN s{k} = greatest({', '.join('s' + str(i) for i in range(8))}) "
    f"THEN {k}"
    for k in range(7)
)


@register(
    "sim_ivf_topk",
    f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
    ), sums AS (
      SELECT vec_id, ve, {_SEG_SUMS} FROM v
    ), cells AS (
      SELECT vec_id, ve,
             CAST(CASE {_CELL_LADDER} ELSE 7 END AS INTEGER) AS cell
      FROM sums
    ), pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.ve, b.ve), 6) AS cosine_sim
      FROM cells a JOIN cells b
        ON a.cell = b.cell AND a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
      ) AS rn FROM pairs
    ) WHERE rn <= 5
    """,
    doc="IVF(probe=1) ANN top-5: coarse cell = argmax segment-sum "
        "anchor (deterministic codebook stand-in); cell key = shuffle "
        "key, pair space n² → Σ cell²; probe>1 unions neighbor cells",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, k=5, n_cells=8, seg=8)


_SUM_LIST = ", ".join(f"list_sum(ve[{k * 8 + 1}:{(k + 1) * 8}])" for k in range(8))
_IDX_LIST = ", ".join(str(k) for k in range(8))


@register(
    "sim_ivf_probe2_topk",
    f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
    ), affin AS (
      SELECT vec_id, ve,
             unnest([{_SUM_LIST}]) AS s,
             unnest([{_IDX_LIST}]) AS i
      FROM v
    ), ranked AS (
      SELECT vec_id, ve, i, row_number() OVER (
        PARTITION BY vec_id ORDER BY s DESC, i DESC
      ) AS rn FROM affin
    ), qcells AS (
      SELECT vec_id, ve, i AS cell FROM ranked WHERE rn <= 2
    ), ncell AS (
      SELECT vec_id, ve, i AS cell FROM ranked WHERE rn = 1
    ), pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.ve, b.ve), 6) AS cosine_sim
      FROM qcells a JOIN ncell b
        ON a.cell = b.cell AND a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
      ) AS rn FROM pairs
    ) WHERE rn <= 5
    """,
    doc="IVF multi-probe (p=2) ANN top-5 — the recall knob: neighbors "
        "indexed by primary cell, queries probe their 2 best-affinity "
        "cells (explode), pair space grows linearly in p while recall "
        "climbs toward brute force",
)
def sim_ivf_probe2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_multiprobe_topk(emb, k=5, probe=2, n_cells=8, seg=8)
