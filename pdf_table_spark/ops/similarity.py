"""Similarity search over ``embeddings(vec_id, embedding float[], label)``.

  * brute-force cosine top-k — the exactness baseline: broadcast the
    (small) query set, JVM-side zip_with/aggregate dot products, window
    top-k. No Python, no cartesian shuffle (broadcast join).
  * LSH-bucketed ANN — the scale path: sign-of-dot-product against
    ``n_planes`` deterministic hyperplanes → bucket key; candidates
    searched in the query's bucket AND every bucket at Hamming
    distance 1 (multi-probe: n_planes+1 probes). For a neighbor at
    cosine c, P(agree per plane) = 1 - acos(c)/π, so at c=0.99 the
    probe set catches ~0.98 of true nearest neighbors while still
    shrinking the search space ~2^n/(n+1)-fold.
  * embedding near-dup — OR-of-bands (the MinHash-LSH shape applied to
    hyperplane signs): NEARDUP_BANDS bands × NEARDUP_ROWS planes; a
    pair is a candidate when ANY band's sign-pattern matches. At
    cosine 0.95 (p≈0.899/plane) recall = 1-(1-p^8)^6 ≈ 0.96, vs ~0.5
    for the previous single-bucket probe; random pairs still collide
    at only ~bands/2^rows ≈ 2.3%, so the quadratic step stays bounded.

Dot products are computed as a sequential left fold in double
precision — the same order DuckDB's list_dot_product uses — so oracle
values match bit-for-bit. A measured recall-vs-brute-force gate lives
in tests/test_similarity_recall.py.
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

# staged-norm building blocks: the pair scorers below compute each
# row's norm ONCE as a column and divide the dot product by the
# product of staged norms — the same IEEE operation sequence as
# COS_EXPR (dot / (sqrt(Σa²) · sqrt(Σb²)), all left folds), so
# cosines are bit-identical, but the two norm folds stop being
# recomputed per PAIR (for brute force that was 2/3 of the
# interpreted flops: 128 of 192 multiply-adds per pair).
DOT_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
)
NORM_EXPR = ("sqrt(aggregate({a}, 0D, (acc, v) -> "
             "acc + cast(v as double) * cast(v as double)))")


def _fold_norm(vec) -> float:
    """Driver-side twin of NORM_EXPR: the identical sequential left
    fold in IEEE doubles, for embedding centroid norms as literals."""
    import math
    acc = 0.0
    for v in vec:
        acc += float(v) * float(v)
    return math.sqrt(acc)


def cosine_topk(emb: DataFrame, query_ids=None, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``query_ids`` defaults to vec_id < 10. The query side is broadcast
    (it is small by construction); ranking ties break on neighbor id so
    results are total-ordered and oracle-stable.
    """
    emb_n = emb.select(
        "vec_id", "embedding",
        F.expr(NORM_EXPR.format(a="embedding")).alias("_n"))
    queries = emb_n.filter(
        F.col("vec_id").isin(list(query_ids)) if query_ids is not None
        else F.col("vec_id") < 10
    ).select(F.col("vec_id").alias("query_id"),
             F.col("embedding").alias("q_emb"),
             F.col("_n").alias("_qn"))
    pairs = (
        emb_n.join(F.broadcast(queries),
                   F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.round(F.expr(DOT_EXPR.format(a="q_emb", b="embedding"))
                    / (F.col("_qn") * F.col("_n")), 9)
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
    """Approximate top-k: multi-probe LSH — candidates from the query's
    bucket plus the n_planes buckets one bit-flip away. Same output
    schema as cosine_topk. A candidate lives in exactly one bucket, so
    the probe join produces no duplicate (query, neighbor) rows."""
    bucketed = lsh_bucket(emb, dim, n_planes).withColumn(
        "_n", F.expr(NORM_EXPR.format(a="embedding")))
    queries = bucketed.filter(
        F.col("vec_id").isin(list(query_ids)) if query_ids is not None
        else F.col("vec_id") < 10
    ).select(F.col("vec_id").alias("query_id"),
             F.col("embedding").alias("q_emb"),
             F.col("_n").alias("_qn"),
             F.col("bucket").alias("q_bucket"))
    probe_list = ", ".join(
        ["q_bucket"] + [f"q_bucket ^ {1 << i}L" for i in range(n_planes)])
    probes = queries.select(
        "query_id", "q_emb", "_qn",
        F.explode(F.expr(f"array({probe_list})")).alias("probe"))
    pairs = (
        bucketed.join(
            F.broadcast(probes),
            (F.col("bucket") == F.col("probe"))
            & (F.col("vec_id") != F.col("query_id")))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.round(F.expr(DOT_EXPR.format(a="q_emb", b="embedding"))
                    / (F.col("_qn") * F.col("_n")), 9)
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


def _vec_literal(vals) -> str:
    comps = ", ".join(f"cast({float(v)!r} as double)" for v in vals)
    return f"array({comps})"


def ivf_centroids(emb: DataFrame, n_centroids: int = 16) -> list:
    """IVF coarse quantizer: the ``n_centroids`` vectors with the
    smallest vec_id, collected to the driver (16 x dim floats — the
    same driver-held-small-model shape as broadcast weights). A
    deterministic seed-vector quantizer rather than k-means: FAISS
    would Lloyd-refine these seeds, which only moves the centroids —
    the plan (assign → probe → search-within-cells) is identical, and
    determinism is what lets the DuckDB oracle replicate the cells.
    Returns [(centroid_id, [float, ...]), ...]."""
    rows = (emb.orderBy("vec_id").limit(n_centroids)
            .select("vec_id", "embedding").collect())
    return [(int(r.vec_id), [float(x) for x in r.embedding])
            for r in rows]


def _cell_structs(cents, col: str = "embedding",
                  norm_col: str | None = None) -> str:
    """Per-centroid (cosine, -centroid_id) structs; array_max picks the
    max cosine and, on a rounded tie, the SMALLEST centroid id.

    ``norm_col`` names a staged row-norm column: the per-centroid
    cosine then divides one dot product by (row norm × a driver-
    computed centroid-norm literal — the identical IEEE fold, see
    ``_fold_norm``) instead of re-folding both norms per centroid;
    with 16 centroids that removes 32 of 48 interpreted array folds
    per row, bit-identically."""
    structs = []
    for cid, vec in cents:
        if norm_col is None:
            cos = COS_EXPR.format(a=col, b=_vec_literal(vec))
        else:
            cos = (f"{DOT_EXPR.format(a=col, b=_vec_literal(vec))}"
                   f" / ({norm_col}"
                   f" * cast({_fold_norm(vec)!r} as double))")
        structs.append(f"struct(round({cos}, 9) as c, {-cid}L as nid)")
    return ", ".join(structs)


def ann_topk_ivf(emb: DataFrame, query_ids=None, k: int = 5,
                 n_centroids: int = 16, n_probe: int = 4) -> DataFrame:
    """IVF-Flat approximate top-k: every vector is assigned to its
    max-cosine centroid cell (a NARROW projection against driver-held
    centroid literals — no shuffle, no join), each query probes its
    ``n_probe`` nearest cells, and the exact search runs only inside
    the probed cells. Same output schema as cosine_topk.

    The 100 TB plan: assignment is embarrassingly parallel scan work;
    the candidate join keys on the cell id with the tiny probe set
    broadcast — the search space shrinks ~n_centroids/n_probe-fold and
    no cross join ever materializes. A vector lives in exactly one
    cell, so probes yield no duplicate (query, neighbor) rows."""
    cents = ivf_centroids(emb, n_centroids)
    cells = emb.withColumn(
        "_n", F.expr(NORM_EXPR.format(a="embedding"))
    ).withColumn(
        "cell",
        F.expr(f"(array_max(array("
               f"{_cell_structs(cents, norm_col='_n')})).nid * -1L)"))
    queries = cells.filter(
        F.col("vec_id").isin(list(query_ids)) if query_ids is not None
        else F.col("vec_id") < 10
    ).select(F.col("vec_id").alias("query_id"),
             F.col("embedding").alias("q_emb"),
             F.col("_n").alias("_qn"))
    # n_probe nearest cells per query: sort (cosine asc, -cid asc) then
    # reverse → cosine desc with centroid_id asc on rounded ties
    probes = queries.select(
        "query_id", "q_emb", "_qn",
        F.explode(F.expr(
            f"transform(slice(reverse(array_sort(array("
            f"{_cell_structs(cents, col='q_emb', norm_col='_qn')}"
            f"))), 1, {n_probe}), s -> s.nid * -1L)")).alias("probe"))
    pairs = (
        cells.join(
            F.broadcast(probes),
            (F.col("cell") == F.col("probe"))
            & (F.col("vec_id") != F.col("query_id")))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.round(F.expr(DOT_EXPR.format(a="q_emb", b="embedding"))
                    / (F.col("_qn") * F.col("_n")), 9)
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


NEARDUP_BANDS = 6
NEARDUP_ROWS = 8  # planes per band


def lsh_band_rows(emb: DataFrame, dim: int = 64,
                  bands: int = NEARDUP_BANDS,
                  rows_per_band: int = NEARDUP_ROWS) -> DataFrame:
    """(vec_id, embedding, band, key): one row per band, key = the
    band's rows_per_band sign bits. Plane index = band*rows + row, so
    bands use disjoint hyperplane sets."""
    structs = []
    for b in range(bands):
        bits = []
        for r in range(rows_per_band):
            p = b * rows_per_band + r
            dot = (f"aggregate(zip_with(embedding, {_plane_literal(dim, p)},"
                   f" (x, y) -> cast(x as double) * y),"
                   f" 0D, (acc, v) -> acc + v)")
            bits.append(f"if({dot} > 0, cast({1 << r} as bigint), 0L)")
        structs.append(F.struct(
            F.lit(b).alias("band"),
            F.expr(" + ".join(bits)).alias("key")))
    # the row norm is staged BEFORE the band explode (once per vector,
    # not once per band row, and never per candidate pair) — the
    # staged-norm scorer in embedding_neardup_pairs divides by it
    return (
        emb.select("vec_id", "embedding",
                   F.expr(NORM_EXPR.format(a="embedding")).alias("_n"),
                   F.explode(F.array(*structs)).alias("bk"))
        .select("vec_id", "embedding", "_n",
                F.col("bk.band").alias("band"),
                F.col("bk.key").alias("key"))
    )


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.95,
                            dim: int = 64,
                            bands: int = NEARDUP_BANDS,
                            rows_per_band: int = NEARDUP_ROWS) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via OR-of-bands LSH: a
    pair is compared when ANY band's sign pattern matches (recall ≈
    1-(1-p^rows)^bands, measured ≥0.9 in the recall gate), and the
    quadratic step never leaves a (band, key) bucket. Pairs colliding
    in several bands are deduped by the final distinct (cosine is
    deterministic, so the rows are identical). Returns (vec_a, vec_b,
    cosine >= threshold)."""
    banded = lsh_band_rows(emb, dim, bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(F.expr(DOT_EXPR.format(
                a="a.embedding", b="b.embedding"))
                / (F.col("a._n") * F.col("b._n")), 9).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def semdedup(emb: DataFrame, threshold: float = 0.95, dim: int = 64,
             bands: int = NEARDUP_BANDS,
             rows_per_band: int = NEARDUP_ROWS) -> dict:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): embedding-
    cosine near-dup pairs (OR-of-bands LSH, measured recall ≥0.9) →
    connected components → keep exactly one vector (the minimum
    vec_id) per semantic-duplicate cluster. The embedding-space
    counterpart of ``dedup.dedup_corpus_clusters``: pairwise drops
    split chains, components don't.

    Returns {"pairs": (vec_a, vec_b, cosine), "components":
    (vec_id, component), "keep": surviving vec_ids}.
    """
    from .dedup import connected_components

    pairs = embedding_neardup_pairs(emb, threshold, dim, bands,
                                    rows_per_band)
    comp = (connected_components(pairs, a="vec_a", b="vec_b")
            .withColumnsRenamed({"doc_id": "vec_id"}))
    dropped = (comp.filter(F.col("vec_id") != F.col("component"))
               .select("vec_id"))
    keep = emb.join(dropped, "vec_id", "left_anti").select("vec_id")
    return {"pairs": pairs, "components": comp, "keep": keep}


# ---------------------------------------------------------------------------
# Vectorized scale path: numpy/Arrow ANN for corpus-size vector tables.
#
# The operators above are the ORACLE-CHECKED contracts: interpreted
# zip_with/aggregate dot products whose fold order DuckDB reproduces
# bit-for-bit. Interpreted HOFs cost ~10 ns per multiply-add, which is
# fine at fixture scale and hopeless at 10^6+ vectors x 64 cells. The
# functions below are the production path for that regime: the same
# candidate-generation plans (broadcast probes, keyed cell join, never
# a cartesian), with the inner-loop arithmetic moved to numpy over
# Arrow batches — one matmul per batch instead of per-element lambdas.
# Query SETS stay driver-collected and broadcast (bounded, the same
# small-model shape as ivf_centroids).
# ---------------------------------------------------------------------------

TOPK_SCHEMA = "query_id long, neighbor_id long, cosine double"


def _query_matrix(emb: DataFrame, query_ids):
    """Collect the (small) query set to the driver as a normalized
    numpy matrix + id vector."""
    import numpy as np
    rows = (emb.filter(
        F.col("vec_id").isin([int(q) for q in query_ids])
        if query_ids is not None else F.col("vec_id") < 10)
        .select("vec_id", "embedding").collect())
    qids = np.array([int(r.vec_id) for r in rows], dtype="int64")
    q = np.array([r.embedding for r in rows], dtype="float64")
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return qids, q


def _topk_final(partial: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (partial.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cosine", 9).alias("cosine"),
                    F.col("rank").cast("int").alias("rank")))


def cosine_topk_np(emb: DataFrame, query_ids=None, k: int = 5,
                   batch_rows: int = 65536) -> DataFrame:
    """Exact brute-force top-k, vectorized: mapInPandas computes one
    (batch x dim) @ (dim x n_queries) matmul per Arrow batch and emits
    only each batch's top-k rows per query — the shuffle carries
    n_partitions x n_queries x k rows, never the full score matrix.
    Same output schema and tie rule as ``cosine_topk`` (which remains
    the oracle contract); this is the 10^6+-vector baseline the
    approximate paths are measured against."""
    import numpy as np
    qids, q = _query_matrix(emb, query_ids)
    spark = emb.sparkSession
    bq = spark.sparkContext.broadcast((qids, q))

    def part(batches):
        import pandas as pd
        ids_b, q_b = bq.value
        pos = {int(x): j for j, x in enumerate(ids_b)}
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            # chunk the query axis so the (rows x queries) score
            # matrix stays ~32 MB per worker regardless of the query
            # count — 32 workers x an unchunked 16k x several-k
            # matrix was pure allocator churn
            q_chunk = max(1, (4 << 20) // n)
            m = np.array(list(pdf["embedding"]), dtype="float64")
            vid = pdf["vec_id"].to_numpy("int64")
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                            1e-300)
            kk = min(k, n)
            self_rows = np.nonzero(np.isin(vid, ids_b))[0]
            for lo in range(0, len(ids_b), q_chunk):
                sub = slice(lo, lo + q_chunk)
                s = m @ q_b[sub].T              # (n, q_chunk)
                for i in self_rows:             # self-exclusion
                    j = pos[int(vid[i])] - lo
                    if 0 <= j < s.shape[1]:
                        s[i, j] = -np.inf
                top = np.argpartition(-s, kth=kk - 1, axis=0)[:kk]
                out = pd.DataFrame({
                    "query_id": np.repeat(ids_b[sub], kk),
                    "neighbor_id": vid[top.T.ravel()],
                    "cosine": np.take_along_axis(s, top, axis=0)
                    .T.ravel()})
                yield out[np.isfinite(out.cosine.to_numpy())]

    partial = (emb.select("vec_id", "embedding")
               .mapInPandas(part, TOPK_SCHEMA))
    return _topk_final(partial, k)


def ivf_centroids_kmeans(emb: DataFrame, n_centroids: int = 64,
                         max_iter: int = 10, seed: int = 42,
                         train_fraction: float | None = None) -> list:
    """Lloyd-refined IVF coarse quantizer via Spark MLlib's
    distributed k-means|| — the production replacement for the
    deterministic seed quantizer (``ivf_centroids``, kept as the
    oracle contract). ``train_fraction`` samples the training set (a
    quantizer does not need every vector; FAISS trains on ~256 points
    per centroid). Returns the same [(centroid_id, [float, ...])]
    shape, so both quantizers plug into the same search."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    train = emb if train_fraction is None else emb.sample(
        fraction=train_fraction, seed=seed)
    feats = train.select(array_to_vector(
        F.col("embedding").cast("array<double>")).alias("features"))
    model = KMeans(k=n_centroids, maxIter=max_iter, seed=seed,
                   featuresCol="features").fit(feats)
    return [(i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())]


def _centroid_matrix(centroids):
    import numpy as np
    cmat = np.array([c for _, c in centroids], dtype="float64")
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    cids = np.array([cid for cid, _ in centroids], dtype="int64")
    return cids, cmat


def ivf_assign(emb: DataFrame, centroids: list) -> DataFrame:
    """(vec_id, embedding, cell): max-cosine centroid per vector, one
    (batch x dim) @ (dim x n_cells) argmax per Arrow batch (a pandas
    UDF — no join, no shuffle). This is the INDEX-BUILD step: a
    production deployment runs it once per corpus snapshot, persists
    the result partitioned by cell, and amortizes it over every query
    wave — pass the persisted frame to ``ann_topk_ivf_np(cells=...)``."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    cids, cmat = _centroid_matrix(centroids)
    bc = emb.sparkSession.sparkContext.broadcast((cids, cmat))

    @pandas_udf("long")
    def _cell(embs):
        import pandas as pd
        ids_c, c = bc.value
        m = np.array(list(embs), dtype="float64")
        if not len(m):
            return pd.Series([], dtype="int64")
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                        1e-300)
        return pd.Series(ids_c[np.argmax(m @ c.T, axis=1)])

    return emb.select("vec_id", "embedding",
                      _cell("embedding").alias("cell"))


def ann_topk_ivf_np(emb: DataFrame, centroids: list, query_ids=None,
                    k: int = 5, n_probe: int = 8,
                    cells: DataFrame | None = None) -> DataFrame:
    """IVF-Flat search, vectorized: assignment from ``ivf_assign``
    (or a precomputed/persisted ``cells`` frame); each query's
    ``n_probe`` nearest cells are computed driver-side from the same
    centroid matrix; candidates come from a keyed join of the cells
    against the broadcast probe list; candidate scoring is one matmul
    per Arrow batch with per-batch top-k, so the final window sees
    only n_partitions x n_queries x k rows. The 100 TB plan shape is
    identical to ``ann_topk_ivf`` — only the per-element lambdas are
    replaced by numpy."""
    import numpy as np
    spark = emb.sparkSession
    cids, cmat = _centroid_matrix(centroids)
    if cells is None:
        cells = ivf_assign(emb, centroids)

    qids, q = _query_matrix(emb, query_ids)
    probe_cells = np.argsort(-(q @ cmat.T), axis=1)[:, :n_probe]
    # cell -> indices of the queries probing it: a broadcast dict, not
    # a join — a probe JOIN would replicate every candidate's 64-dim
    # embedding once per probing query (n_queries x n_probe/n_cells
    # copies of the corpus through the shuffle); grouping by cell
    # inside each Arrow batch moves the corpus ONCE and still does
    # only the probed fraction of the dot products
    probes_by_cell: dict = {}
    for j, row in enumerate(probe_cells):
        for c in row:
            probes_by_cell.setdefault(int(cids[c]), []).append(j)
    bq = spark.sparkContext.broadcast((qids, q, probes_by_cell))

    def score(batches):
        import pandas as pd
        ids_b, q_b, by_cell = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            parts = []
            for cell, g in pdf.groupby("cell"):
                qidx = by_cell.get(int(cell))
                if not qidx:
                    continue
                m = np.array(list(g["embedding"]), dtype="float64")
                vid = g["vec_id"].to_numpy("int64")
                m /= np.maximum(
                    np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
                sub_ids = ids_b[qidx]
                s = m @ q_b[qidx].T            # (n_g, nq_cell)
                pos = {int(x): jj for jj, x in enumerate(sub_ids)}
                for i in np.nonzero(np.isin(vid, sub_ids))[0]:
                    s[i, pos[int(vid[i])]] = -np.inf
                kk = min(k, len(vid))
                top = np.argpartition(-s, kth=kk - 1, axis=0)[:kk]
                parts.append(pd.DataFrame({
                    "query_id": np.repeat(sub_ids, kk),
                    "neighbor_id": vid[top.T.ravel()],
                    "cosine": np.take_along_axis(s, top, axis=0)
                    .T.ravel()}))
            if parts:
                out = pd.concat(parts)
                out = out[np.isfinite(out.cosine.to_numpy())]
                # per-batch per-query top-k keeps the shuffle at
                # n_batches x n_queries x k rows
                yield (out.sort_values("cosine", ascending=False)
                       .groupby("query_id", sort=False).head(k))

    # unprobed cells are skipped entirely (partition-pruned when the
    # persisted index is partitioned by cell); with enough queries
    # every cell is probed by someone and the filter is a no-op
    probed = sorted(probes_by_cell)
    searched = cells if len(probed) == len(cids) else cells.filter(
        F.col("cell").isin(probed))
    partial = searched.mapInPandas(score, TOPK_SCHEMA)
    return _topk_final(partial, k)


def write_ivf_index(cells: DataFrame, path: str,
                    mode: str = "overwrite",
                    files_per_cell: int | None = 1) -> None:
    """Persist an ``ivf_assign`` output AT REST, hive-partitioned by
    cell — the production index layout. Every probe-time filter
    ``cell IN (probes)`` then becomes a PARTITION filter at the
    parquet scan: unprobed cells' files are never opened (proved by
    scan metrics in tests and BENCH_ann — not just by the plan
    text). One directory per cell; rewrite per corpus snapshot.

    ``files_per_cell`` repartitions by cell (+ a salt when > 1)
    before the write so each cell directory holds AT MOST that many
    files instead of one per upstream task — without it, n_cells x
    n_partitions tiny files dominate probe-time open cost (measured
    4.6x slower at 256 cells x 16 partitions). AQE may coalesce
    below the cap when cells are small (size-driven — desirable);
    the salt's job is letting one HUGE cell spread over up to
    files_per_cell writer tasks. None = keep the input
    partitioning. At 100 TB pick files_per_cell so each file
    is a few hundred MB."""
    if files_per_cell == 1:
        cells = cells.repartition(F.col("cell"))
    elif files_per_cell and files_per_cell > 1:
        # pmod, not %: xxhash64 is signed and Spark's % keeps the
        # sign, which would double the salt alphabet to 2f-1
        cells = cells.repartition(
            F.col("cell"),
            F.expr(f"pmod(xxhash64(vec_id), {int(files_per_cell)})"))
    cells.write.mode(mode).partitionBy("cell").parquet(path)


def read_ivf_index(spark, path: str) -> DataFrame:
    """Read a :func:`write_ivf_index` layout back as the ``cells``
    frame ``ann_topk_ivf_np(cells=...)`` consumes. The partition
    column comes back as its directory-inferred type; cast to long so
    the probe filter compares like-for-like."""
    df = spark.read.parquet(path)
    return df.select("vec_id", "embedding",
                     F.col("cell").cast("long").alias("cell"))


def scan_file_metrics(df: DataFrame) -> dict:
    """numFiles / numPartitions / numOutputRows of ``df``'s leaf file
    scan, read from the EXECUTED plan's SQL metrics — call after an
    action that ran this exact frame (``df.collect()``). This is the
    at-rest pruning proof: a probe-filtered index read must show
    fewer files than the full index holds."""
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    out = {}
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        for k in ("numFiles", "numPartitions", "numOutputRows"):
            if m.contains(k):
                out[k] = out.get(k, 0) + m.apply(k).value()
    return out


def semdedup_kmeans(emb: DataFrame, n_clusters: int = 64,
                    threshold: float = 0.95,
                    centroids: list | None = None,
                    train_fraction: float | None = None,
                    chunk: int = 1024,
                    seed: int = 42,
                    max_cell: int = 1_000_000) -> DataFrame:
    """SemDeDup exactly as published (Abbas et al. 2023,
    arXiv:2303.09540 §3): k-means the embedding space, compute
    pairwise cosine WITHIN each cluster, and from every group of
    semantic duplicates keep the example with the LOWEST cosine to
    its cluster centroid (the paper keeps the member farthest from
    the centroid to preserve diversity; ties break on vec_id).

    The OR-of-bands ``semdedup`` above remains the oracle contract
    (its pair set is SQL-reproducible); this is the production shape:
    one shuffle keyed by cell, then ONE ``applyInPandas`` per cell
    does the chunked similarity matmul, a union-find over
    above-threshold pairs, and the keep rule — duplicate groups never
    span cells by construction (the paper's approximation), so no
    iterative global connected components is needed. Memory is
    bounded by ``chunk`` rows of similarity at a time; cell
    populations are ~n/n_clusters for k-means-balanced corpora (pick
    ``n_clusters`` so cells fit executors — the paper uses 11k
    clusters for 134M points). A skewed cell would otherwise OOM the
    executor as one giant pandas group, so ``max_cell`` fails fast
    with the offending cell id and population instead — raise
    ``n_clusters`` (or ``max_cell`` if the executors really have the
    headroom) when it trips.

    Returns (vec_id, cell, component, cent_cos, keep): every input
    vector with its cell, its within-cell duplicate-component id
    (component == min vec_id of the group), its cosine to the cell
    centroid, and whether SemDeDup keeps it.
    """
    if centroids is None:
        centroids = ivf_centroids_kmeans(
            emb, n_centroids=n_clusters, seed=seed,
            train_fraction=train_fraction)
    cells = ivf_assign(emb, centroids)
    cids, cmat = _centroid_matrix(centroids)
    # centroid ids need not be dense row indices — map id -> row
    bc = emb.sparkSession.sparkContext.broadcast(
        ({int(c): i for i, c in enumerate(cids)}, cmat))

    def dedup_cell(pdf):
        import numpy as np
        import pandas as pd
        # deterministic order: union-find + tie-breaks keyed on the
        # sorted vec_id sequence, not partition arrival order
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        n = len(pdf)
        if n > max_cell:
            raise ValueError(
                f"semdedup_kmeans: cell {int(pdf['cell'].iloc[0])} "
                f"holds {n} vectors (> max_cell={max_cell}); the "
                f"whole cell materializes as one pandas group — "
                f"raise n_clusters to split it (or max_cell if the "
                f"executors have the memory)")
        m = np.array(list(pdf["embedding"]), dtype="float64")
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                        1e-300)
        rows_by_cid, cmat_b = bc.value
        cent = cmat_b[rows_by_cid[int(pdf["cell"].iloc[0])]]
        cent_cos = m @ cent
        parent = np.arange(n)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for lo in range(0, n, chunk):
            s = m[lo:lo + chunk] @ m.T          # (chunk, n)
            for di, dj in zip(*np.nonzero(s >= threshold)):
                i, j = lo + int(di), int(dj)
                if i == j:
                    continue
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
        roots = np.array([find(i) for i in range(n)])
        vid = pdf["vec_id"].to_numpy()
        keep = np.zeros(n, dtype=bool)
        for r in np.unique(roots):
            members = np.nonzero(roots == r)[0]
            # farthest from centroid wins; vec_id (== position order,
            # pdf is sorted) breaks ties
            keep[members[np.argmin(cent_cos[members])]] = True
        return pd.DataFrame({
            "vec_id": vid, "cell": pdf["cell"],
            "component": vid[roots],
            "cent_cos": cent_cos, "keep": keep})

    out_schema = ("vec_id long, cell long, component long, "
                  "cent_cos double, keep boolean")
    return cells.groupBy("cell").applyInPandas(dedup_cell, out_schema)
