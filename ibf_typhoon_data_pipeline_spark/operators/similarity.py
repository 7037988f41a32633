"""Similarity search over an embedding column (array<float>).

- Brute-force cosine top-k: the exact baseline. Pair generation is a
  join; the dot product is a codegen'd higher-order function
  (zip_with + aggregate), never a Python UDF.
- Sign-LSH bucketed ANN: the scale path — bucket by the sign pattern
  of the first m dimensions (axis-aligned hyperplanes — deterministic,
  oracle-reproducible), probe only same-bucket candidates. At 100 TB
  the bucket key turns the n² pair space into Σ bucket².

All arithmetic is promoted to double and summed in index order so the
DuckDB oracle (list_cosine_similarity / unnest-sum) matches bitwise
after round(…, 6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.operators.skew import spread
from ibf_typhoon_data_pipeline_spark.operators.windows import top1_per_group  # noqa: F401


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — left-to-right fold, same
    summation order as DuckDB's list functions."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Per-pair cosine. Prefer the precomputed-norm form in the topk
    functions: norms are per-VECTOR quantities, so computing them in
    the pair loop wastes 2/3 of the arithmetic (measured 8.4s → 3.4s
    on the IVF pair space at sf0.1). Values are bit-identical either
    way — same fold, same association."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine top-k per query vector.

    n² pairs — correct baseline at any SF, quadratic at scale (that is
    what the LSH variant is for). The self-join is a single shuffle;
    ranking is one window. Ties broken by neighbor id for determinism.
    """
    base = spread(df).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    ).select(F.col(id_col), "__v", l2_norm(F.col("__v")).alias("__n"))
    v = base.select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__n").alias("__qn"),
    )
    w = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("__nv"),
        F.col("__n").alias("__nn"),
    )
    pairs = v.join(w, F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("__qv"), F.col("__nv")) / (F.col("__qn") * F.col("__nn")),
            6,
        ).alias("cosine_sim"),
    )
    from pyspark.sql import Window

    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def sign_bucket(vec: Column, m: int = 6) -> Column:
    """Sign-LSH bucket key: '+'/'-' per first m dims. Deterministic
    axis-aligned hyperplanes; swap in seeded random projections when a
    real ANN recall target matters."""
    signs = F.transform(
        F.slice(vec, 1, m), lambda x: F.when(x >= 0, F.lit("+")).otherwise(F.lit("-"))
    )
    return F.array_join(signs, "")


def ivf_cell(vec: Column, n_cells: int = 8, seg: int = 8) -> Column:
    """IVF coarse-quantizer cell: argmax over ``n_cells`` anchor
    directions. Anchors are axis-segment indicators (anchor k = 1 on
    dims [k·seg, (k+1)·seg)), so dot(v, anchor_k) = the segment sum —
    deterministic and oracle-reproducible where a k-means codebook
    would not be. Swap in a trained codebook via a broadcast join on
    the same cell-key plan shape when recall matters."""
    sums = [
        F.aggregate(
            F.slice(vec, k * seg + 1, seg),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for k in range(n_cells)
    ]
    best = F.greatest(*sums)
    cell = F.lit(n_cells - 1)
    for k in reversed(range(n_cells - 1)):
        cell = F.when(sums[k] == best, F.lit(k)).otherwise(cell)
    return cell.cast("int")


def ivf_topk(
    df: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    seg: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF(probe=1) ANN top-k: partition vectors by coarse cell, search
    only the query's own cell. The cell key is the shuffle key — at
    scale each cell is a co-located partition and the n² pair space
    becomes Σ cell². Probe>1 = union over neighboring cells."""
    with_cell = spread(df).select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("__v"),
    ).select(
        F.col(id_col),
        "__v",
        ivf_cell(F.col("__v"), n_cells, seg).alias("__cell"),
        l2_norm(F.col("__v")).alias("__n"),
    )
    a = with_cell.select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__n").alias("__qn"),
        "__cell",
    )
    b = with_cell.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("__nv"),
        F.col("__n").alias("__nn"),
        "__cell",
    )
    pairs = a.join(b, "__cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("__qv"), F.col("__nv")) / (F.col("__qn") * F.col("__nn")),
            6,
        ).alias("cosine_sim"),
    )
    from pyspark.sql import Window

    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ivf_cells_ranked(vec: Column, n_cells: int = 8, seg: int = 8) -> Column:
    """All coarse cells ranked by anchor affinity: array of (segment
    sum, cell index) structs sorted descending — struct comparison is
    field-by-field, so ties break on the LARGER index, mirrored by the
    oracle's ORDER BY s DESC, i DESC. Element 0 is the primary cell
    (the one ``ivf_cell``-style assignment indexes by); elements 0..p-1
    are the probe list."""
    structs = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.slice(vec, k * seg + 1, seg),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("s"),
                F.lit(k).alias("i"),
            )
            for k in range(n_cells)
        ]
    )
    return F.sort_array(structs, asc=False)


def ivf_multiprobe_topk(
    df: DataFrame,
    k: int = 5,
    probe: int = 2,
    n_cells: int = 8,
    seg: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF(probe=p) ANN top-k — the recall knob. Neighbors are indexed
    by their PRIMARY cell only; each query probes its ``probe``
    best-affinity cells (explode → p rows), so the pair space grows
    linearly in p while recall climbs toward brute force (measured at
    sf0.01: 0.26 @ p=1 → higher with p; each (q, n) pair appears at
    most once because the index side is single-cell)."""
    base = spread(df).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    ).select(
        F.col(id_col),
        "__v",
        ivf_cells_ranked(F.col("__v"), n_cells, seg).alias("__ranked"),
        l2_norm(F.col("__v")).alias("__n"),
    )
    a = base.select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__n").alias("__qn"),
        F.explode(
            F.transform(
                F.slice(F.col("__ranked"), 1, probe), lambda s: s["i"]
            )
        ).alias("__cell"),
    )
    b = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("__nv"),
        F.col("__n").alias("__nn"),
        F.col("__ranked")[0]["i"].alias("__cell"),
    )
    pairs = a.join(b, "__cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("__qv"), F.col("__nv")) / (F.col("__qn") * F.col("__nn")),
            6,
        ).alias("cosine_sim"),
    )
    from pyspark.sql import Window

    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.98,
    m: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate detection (the vector analog of
    dedup_minhash_lsh): candidate pairs come from the sign-LSH bucket
    join (n² → Σ bucket²), a pair is a duplicate when round(cosine, 6)
    ≥ threshold, and each duplicate canonicalizes to the LOWEST id it
    matches (keep-first; deterministic, no tie possible on min).

    Output: (vec_id, canonical_id, is_dup) for every vector — keepers
    map to themselves. One bucket-join shuffle + one groupBy(min);
    both sides of the pair predicate are id-ordered (b < a) so each
    unordered pair is scored once.
    """
    base = spread(df).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    ).select(
        F.col(id_col),
        "__v",
        sign_bucket(F.col("__v"), m).alias("__bucket"),
        l2_norm(F.col("__v")).alias("__n"),
    )
    a = base.select(
        F.col(id_col).alias("__aid"),
        F.col("__v").alias("__av"),
        F.col("__n").alias("__an"),
        "__bucket",
    )
    b = base.select(
        F.col(id_col).alias("__bid"),
        F.col("__v").alias("__bv"),
        F.col("__n").alias("__bn"),
        "__bucket",
    )
    pairs = a.join(b, "__bucket").filter(F.col("__bid") < F.col("__aid"))
    matched = (
        pairs.select(
            "__aid",
            "__bid",
            F.round(
                dot(F.col("__av"), F.col("__bv"))
                / (F.col("__an") * F.col("__bn")),
                6,
            ).alias("__sim"),
        )
        .filter(F.col("__sim") >= threshold)
        .groupBy("__aid")
        .agg(F.min("__bid").alias("__canon"))
    )
    return (
        base.select(id_col)
        .join(matched, F.col(id_col) == F.col("__aid"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__canon"), F.col(id_col)).alias("canonical_id"),
            F.col("__canon").isNotNull().alias("is_dup"),
        )
    )


def lsh_bucketed_topk(
    df: DataFrame,
    k: int = 5,
    m: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k probing only same-sign-bucket candidates. Recall < 1
    by construction; the pair space shrinks from n² to Σ bucket².
    Bucket skew is the salting knob at scale."""
    with_bucket = spread(df).select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("__v"),
    ).select(
        F.col(id_col),
        "__v",
        sign_bucket(F.col("__v"), m).alias("__bucket"),
        l2_norm(F.col("__v")).alias("__n"),
    )
    a = with_bucket.select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__n").alias("__qn"),
        "__bucket",
    )
    b = with_bucket.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("__nv"),
        F.col("__n").alias("__nn"),
        "__bucket",
    )
    pairs = a.join(b, "__bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("__qv"), F.col("__nv")) / (F.col("__qn") * F.col("__nn")),
            6,
        ).alias("cosine_sim"),
    )
    from pyspark.sql import Window

    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
