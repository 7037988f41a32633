"""In-engine data amplification for the DATA-axis scaling tier.

Testdata is capped at sf0.1 (read-only), so the largest on-disk
measurement point is a 600k-row lineitem — small evidence for a
100 TB claim. This module mirrors the trick `bench_event.py` uses on
the EVENT axis (VERDICT r9 item 3): synthesize N× the data *inside
the engine at read time* so `scaling_curve.py` can measure an
sf0.1 → N·sf0.1 growth ratio per query family.

Mechanics — ``load_table`` recognizes an ``@xN`` suffix on the
``sf_dir`` argument (e.g. ``/root/testdata/sf0.1@x10``), reads the
base parquet once, and fans every row out into N replicas with a
row-preserving ``explode(sequence(0, N-1))`` generator (one pipelined
scan, no join, no extra exchange). Replica 0 is the original data
bit-for-bit; replicas 1..N-1 are made *distinct* workloads, not
copies, so every candidate-generating family grows linearly by
construction (the same property `gen_tracks_batch` gives the event
tier by seeding noise per global member):

- **Key columns** (``doc_id``, ``vec_id``, ``event_id``/``user_id``,
  the TPC-H ``*key`` families) shift by ``replica * 10^9`` —
  consistently across tables, so orders⋈lineitem⋈customer joins stay
  referentially intact and each replica is a disjoint subgraph (the
  graph family sees 10 independent purchase graphs, keep-last dedup
  sees 10× the key domain).
- **documents.text** goes through a per-replica letter-rotation
  cipher (``translate`` with a rotated alphabet — a JVM-side
  expression, replica 0 = identity rotation). Every shingle/token of
  every replica is distinct from every other replica's, so MinHash
  bands, n-gram vocabularies and df tables grow ~linearly instead of
  colliding 10 exact copies into the same LSH buckets (which would
  square the pair space and measure an artifact, not the plan).
- **embeddings.embedding** gets a small deterministic per-replica,
  per-dimension offset (±2% range, replica 0 = identity), so ANN
  cells stay balanced but replicas are not identical vectors.
- ``nation``/``region`` are fixed domains and never amplified.

This is measurement tooling: amplified reads exist for
`scaling_curve.py`'s data tier, never for correctness oracles (the
driver always passes plain sf dirs).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Disjoint-replica key shift. Far above any key in the capped testdata
# (max observed key ~1.5e5 at sf0.1) and small enough that derived ids
# (pagerank's node*2+1) stay comfortably inside BIGINT.
KEY_OFFSET = 1_000_000_000

_AMP_RE = re.compile(r"^(?P<base>.*)@x(?P<n>\d+)$")

_KEY_COLS: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

_ALPHA = "abcdefghijklmnopqrstuvwxyz"

# 26 rotations × 2 case blocks = 52 pairwise token-disjoint document
# vocabularies; past this the cipher would wrap and replicas would
# collide into shared LSH buckets (squared pair space = measurement
# artifact). Raise, never wrap. Disjointness holds for tokens that
# CONTAIN a lowercase letter — a caseless token (digits, punctuation,
# all-uppercase) is invariant under both the rotation and upper(), so
# it would collide across all replicas (ADVICE r11); the current
# testdata has none, and tests/test_amplify.py asserts that loudly so
# a regenerated corpus fails the guard instead of silently re-squaring
# pair spaces.
_MAX_REPLICAS = 52


def split_amplified(sf_dir: str) -> tuple[str, int]:
    """``'/data/sf0.1@x10'`` → ``('/data/sf0.1', 10)``; plain dirs
    pass through with n=1."""
    m = _AMP_RE.match(sf_dir)
    if not m:
        return sf_dir, 1
    return m.group("base"), max(int(m.group("n")), 1)


def amplify_table(df: DataFrame, name: str, n: int) -> DataFrame:
    """Fan ``df`` out into ``n`` distinct replicas (see module doc)."""
    if n > _MAX_REPLICAS:
        raise ValueError(
            f"amplification @x{n} exceeds the {_MAX_REPLICAS} pairwise-"
            "distinct document vocabularies the rotation cipher can "
            "produce — replicas would collide and measure an artifact"
        )
    if n <= 1 or name in ("nation", "region"):
        return df
    # A real N×-bigger dataset arrives in ~N× more input splits; the
    # capped testdata is ONE small parquet file per table, so without
    # a spread the explode fans the whole amplified workload out of a
    # single-task scan and every pre-shuffle stage (tokenize explodes,
    # partial aggs, broadcast-join probes) runs on one core — a
    # single-split artifact, not the plan under test (the round-10
    # hamming cliff, 15.6 → 1.26 s, was exactly this). Round-robin
    # the BASE rows up to the session parallelism before fanning out.
    from ibf_typhoon_data_pipeline_spark.operators.skew import spread

    out = spread(df).select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("__r"),
    )
    # ANSI mode: the replica index from explode(sequence) is INT —
    # widen before the 1e9 multiply or r >= 3 overflows 32 bits.
    shift = F.col("__r").cast("bigint") * F.lit(KEY_OFFSET)
    for key in _KEY_COLS.get(name, ()):
        out = out.withColumn(
            key, (F.col(key).cast("bigint") + shift)
        )
    if name == "documents":
        # per-replica rotation cipher: replica r maps letter i to
        # letter (i + r) % 26 — token boundaries (spaces) untouched,
        # lengths preserved (n_chars stays truthful), replica 0 is the
        # identity. translate's replace argument may be non-foldable;
        # Spark rebuilds its dict only when the argument value changes.
        # Replicas 26..51 additionally uppercase (ADVICE r10: a bare
        # `% 26` silently mapped replica 26 back to the identity
        # rotation, colliding vocabularies and squaring the pair
        # space — exactly the artifact this module exists to avoid).
        # Case is a second vocabulary block: every tokenizer in the
        # catalog splits on whitespace case-preserved, so the 52
        # blocks stay pairwise token-disjoint; _MAX_REPLICAS pins the
        # ceiling.
        rot = (
            f"translate(text, '{_ALPHA}', "
            f"substring('{_ALPHA}{_ALPHA}', __r % 26 + 1, 26))"
        )
        out = out.withColumn(
            "text",
            F.expr(f"CASE WHEN __r < 26 THEN {rot} ELSE upper({rot}) END"),
        )
    if name == "embeddings":
        # deterministic ±2%-range per-(replica, dim) offset; __r is a
        # materialized column, so referencing it inside the lambda is
        # safe (the HOF-lambda rule in CLAUDE.md).
        out = out.withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, i) -> CAST(x + "
                "(CASE WHEN __r = 0 THEN 0.0 ELSE "
                "(((i * 13 + __r * 7) % 21) - 10) * 0.002 END) AS FLOAT))"
            ),
        )
    return out.drop("__r")
