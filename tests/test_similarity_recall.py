"""Measured recall gates for the approximate similarity ops.

The sf testdata embeddings are near-uniform random (zero true
near-dups at cosine 0.95), so recall is measured on a planted corpus:
unit base vectors plus noisy copies at cosine ≈0.99. Ground truth is
numpy brute force; the gates assert the documented recall targets
(≥0.9) actually hold, which the oracle twins cannot see (they encode
the same approximation on both sides)."""

import numpy as np
import pytest

DIM = 64
N_BASE = 260
N_DUP = 60
NOISE = 0.012  # per-dim sigma → cosine ≈ 1/sqrt(1+64σ²) ≈ 0.995


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.RandomState(7)
    vecs = []
    base = rng.randn(N_BASE, DIM)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs.extend(base)
    dup_src = rng.randint(0, N_BASE, size=N_DUP)
    for i in dup_src:
        w = base[i] + rng.randn(DIM) * NOISE
        vecs.append(w / np.linalg.norm(w))
    arr = np.asarray(vecs, dtype=np.float32)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(arr)],
        "vec_id int, embedding array<float>")
    return df, arr, dup_src


def _true_pairs(arr, threshold):
    sims = arr @ arr.T
    out = set()
    n = len(arr)
    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= threshold:
                out.add((i, j))
    return out


def test_neardup_banded_recall(planted):
    from pdf_table_spark.ops.similarity import embedding_neardup_pairs
    df, arr, _ = planted
    truth = _true_pairs(arr.astype(np.float64), 0.95)
    assert len(truth) >= N_DUP  # the plant worked
    got = {(r.vec_a, r.vec_b)
           for r in embedding_neardup_pairs(df, threshold=0.95).collect()}
    assert got <= truth or all(  # precision: every found pair is real
        (a, b) in truth for a, b in got)
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"banded near-dup recall {recall:.3f} < 0.9"


def test_ann_multiprobe_nn_recall(planted):
    """Recall@1 of the true nearest neighbor for the planted dup
    vectors (their source sits at cosine ≈0.995)."""
    from pdf_table_spark.ops.similarity import ann_topk_lsh
    df, arr, dup_src = planted
    a64 = arr.astype(np.float64)
    sims = a64 @ a64.T
    np.fill_diagonal(sims, -2.0)
    query_ids = list(range(N_BASE, N_BASE + N_DUP))
    true_nn = {q: int(np.argmax(sims[q])) for q in query_ids}
    rows = ann_topk_lsh(df, query_ids=query_ids, k=5).collect()
    got_nn = {}
    for r in rows:
        if r.rank == 1:
            got_nn[r.query_id] = r.neighbor_id
    hits = sum(1 for q in query_ids if got_nn.get(q) == true_nn[q])
    recall = hits / len(query_ids)
    assert recall >= 0.9, f"multi-probe ANN recall@1 {recall:.3f} < 0.9"


def test_ann_ivf_nn_recall(planted):
    """IVF-Flat recall@1 on the planted dups: a near-copy lands in (or
    one probe away from) its source's centroid cell, so probing the 4
    nearest of 16 cells recovers the true nearest neighbor."""
    from pdf_table_spark.ops.similarity import ann_topk_ivf
    df, arr, dup_src = planted
    a64 = arr.astype(np.float64)
    sims = a64 @ a64.T
    np.fill_diagonal(sims, -2.0)
    query_ids = list(range(N_BASE, N_BASE + N_DUP))
    true_nn = {q: int(np.argmax(sims[q])) for q in query_ids}
    rows = ann_topk_ivf(df, query_ids=query_ids, k=5,
                        n_centroids=16, n_probe=4).collect()
    got_nn = {r.query_id: r.neighbor_id for r in rows if r.rank == 1}
    hits = sum(1 for q in query_ids if got_nn.get(q) == true_nn[q])
    recall = hits / len(query_ids)
    assert recall >= 0.9, f"IVF ANN recall@1 {recall:.3f} < 0.9"


def test_ann_ivf_search_space_shrinks(planted):
    """The point of IVF: probing 4 of 16 cells must examine a strict
    subset of the corpus per query (scale path, not a rename of brute
    force)."""
    from pyspark.sql import functions as F

    from pdf_table_spark.ops.similarity import (
        _cell_structs, ivf_centroids)
    df, arr, _ = planted
    cents = ivf_centroids(df, 16)
    cells = df.withColumn(
        "cell",
        F.expr(f"(array_max(array({_cell_structs(cents)})).nid * -1L)"))
    sizes = {r.cell: r.n for r in
             cells.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    assert len(sizes) > 4  # vectors actually spread over cells
    # any 4 cells cover well under the whole corpus
    top4 = sum(sorted(sizes.values(), reverse=True)[:4])
    assert top4 < len(arr)


def test_semdedup_keeps_one_per_embedding_cluster(spark):
    """Planted identical/near-identical vectors collapse to one
    canonical vec_id; unrelated vectors all survive."""
    import random

    from pdf_table_spark.ops.similarity import semdedup
    rng = random.Random(7)
    dim = 64

    def vec(seed=None):
        r = random.Random(seed) if seed is not None else rng
        return [r.uniform(-1, 1) for _ in range(dim)]

    base = vec(1)
    near = list(base)
    near[0] += 1e-4          # cosine ~1.0 with base
    rows = [(0, base), (1, near), (2, list(base))]   # cluster {0,1,2}
    rows += [(10 + i, vec()) for i in range(20)]     # unrelated
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    out = semdedup(emb, threshold=0.99)
    comp = {r.vec_id: r.component for r in out["components"].collect()}
    assert comp == {0: 0, 1: 0, 2: 0}
    kept = {r.vec_id for r in out["keep"].collect()}
    assert kept == {0} | {10 + i for i in range(20)}
