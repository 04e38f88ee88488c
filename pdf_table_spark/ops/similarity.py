"""Similarity search over ``embeddings(vec_id, embedding float[], label)``.

  * brute-force cosine top-k — the exactness baseline: broadcast the
    (small) query set, JVM-side zip_with/aggregate dot products, window
    top-k. No Python, no cartesian shuffle (broadcast join).
  * LSH-bucketed ANN — the scale path: sign-of-dot-product against
    ``n_planes`` deterministic hyperplanes → bucket key; candidates
    searched only within the query's bucket. Recall is tunable by
    plane count / multi-probe; here single-probe.

Dot products are computed as a sequential left fold in double
precision — the same order DuckDB's list_dot_product uses — so oracle
values match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

COS_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
    " / (sqrt(aggregate({a}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    " * sqrt(aggregate({b}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double))))"
)


def cosine_topk(emb: DataFrame, query_ids=None, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``query_ids`` defaults to vec_id < 10. The query side is broadcast
    (it is small by construction); ranking ties break on neighbor id so
    results are total-ordered and oracle-stable.
    """
    queries = emb.filter(
        F.col("vec_id").isin(list(query_ids)) if query_ids is not None
        else F.col("vec_id") < 10
    ).select(F.col("vec_id").alias("query_id"),
             F.col("embedding").alias("q_emb"))
    pairs = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.round(F.expr(COS_EXPR.format(a="q_emb", b="embedding")), 9)
            .alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine",
                F.col("rank").cast("int").alias("rank"))
    )


def hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j is +1/-1 by
    the parity of md5('p<plane>:<j>') — reproducible in any engine (the
    DuckDB oracle embeds the identical literals)."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"p{plane_idx}:{j}".encode()).hexdigest()[:8],
                   16) % 2 == 0 else -1.0
        for j in range(dim)
    ]


def _plane_literal(dim: int, plane_idx: int) -> str:
    comps = ", ".join(
        f"{'1.0D' if c > 0 else '-1.0D'}" for c in hyperplane(dim, plane_idx))
    return f"array({comps})"


def lsh_bucket(emb: DataFrame, dim: int = 64, n_planes: int = 8) -> DataFrame:
    """Bucket id per vector: bit i = sign of dot(embedding, plane_i).
    Buckets ~ 2^n_planes; the ANN search space shrinks ~256x."""
    bits = []
    for p in range(n_planes):
        dot = (f"aggregate(zip_with(embedding, {_plane_literal(dim, p)},"
               f" (x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)")
        bits.append(f"if({dot} > 0, cast({1 << p} as bigint), 0L)")
    return emb.withColumn("bucket", F.expr(" + ".join(bits)))


def ann_topk_lsh(emb: DataFrame, query_ids=None, k: int = 5,
                 dim: int = 64, n_planes: int = 8) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (single-probe). Same output schema as cosine_topk."""
    bucketed = lsh_bucket(emb, dim, n_planes)
    queries = bucketed.filter(
        F.col("vec_id").isin(list(query_ids)) if query_ids is not None
        else F.col("vec_id") < 10
    ).select(F.col("vec_id").alias("query_id"),
             F.col("embedding").alias("q_emb"),
             F.col("bucket").alias("q_bucket"))
    pairs = (
        bucketed.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.round(F.expr(COS_EXPR.format(a="q_emb", b="embedding")), 9)
            .alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine",
                F.col("rank").cast("int").alias("rank"))
    )


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.95,
                            dim: int = 64, n_planes: int = 6) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing: only
    same-bucket pairs are compared (the quadratic step never leaves a
    bucket). Returns (vec_a, vec_b, cosine >= threshold)."""
    bucketed = lsh_bucket(emb, dim, n_planes)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(F.expr(COS_EXPR.format(
                a="a.embedding", b="b.embedding")), 9).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
