"""SemDeDup (paper variant) at corpus scale: 10^6 vectors through
k-means cells → within-cell exact pairwise dedup → keep-farthest-
from-centroid (ops.similarity.semdedup_kmeans).

Corpus: the same deterministic clustered geometry as
bench_ann_scale.py (256 hashed cluster centers, noise 0.3 so
same-cluster distinct vectors sit near cosine ~0.92, comfortably
below the 0.99 threshold), plus a planted ground truth: every id with
id % 50 == 1 is a BYTE-IDENTICAL copy of id-1 (2 % exact duplicates,
cosine exactly 1.0). In-run assertions — the throughput number is
only recorded if they hold:

  * kept == n_vectors − n_planted (every planted copy dropped,
    nothing else);
  * for every planted pair, both land in one component and the
    keeper is the min vec_id (identical vectors tie on centroid
    cosine; the tie-break is pinned).

Prints ONE JSON line and appends it to BENCH_ann.json.

Run on a quiet box: python scripts/bench_semdedup_scale.py
  SPARK_GRAFT_SEMDEDUP_N   corpus size (default 1_000_000)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N = int(os.environ.get("SPARK_GRAFT_SEMDEDUP_N", "1000000"))
CELLS = 256
DIM = 64
N_CLUSTERS = 256
THRESHOLD = 0.99
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
              "MKL_NUM_THREADS"):
        os.environ[v] = "1"   # Spark owns core-level parallelism
    from pyspark.sql import functions as F

    from pdf_table_spark.ops.similarity import (ivf_centroids_kmeans,
                                                semdedup_kmeans)
    from pdf_table_spark.spark.session import build_session

    spark = build_session("bench_semdedup", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   "16384")

    # planted copies: id % 50 == 1 duplicates id - 1 exactly (same
    # cluster seed, same noise seed)
    src = f"if(id % 50 = 1, id - 1, id)"
    comp = ("transform(sequence(0, {dmax}), d -> "
            "(cast(pmod(xxhash64({seed}, d), 100000) as double)"
            " / 50000.0 - 1.0))")
    center = comp.format(dmax=DIM - 1, seed=f"({src}) % {N_CLUSTERS}")
    noise = comp.format(dmax=DIM - 1, seed=f"'n', ({src})")
    emb = (spark.range(N)
           .select(F.col("id").alias("vec_id"),
                   F.expr(f"zip_with({center}, {noise}, "
                          f"(c, n) -> cast(c + 0.3D * n as float))")
                   .alias("embedding"))
           .repartition(CPUS * 2).persist())
    n = emb.count()
    n_planted = spark.range(N).filter("id % 50 = 1").count()

    t0 = time.monotonic()
    cents = ivf_centroids_kmeans(emb, n_centroids=CELLS, max_iter=10,
                                 train_fraction=min(1.0, 100_000 / N))
    train_s = time.monotonic() - t0

    t0 = time.monotonic()
    out = semdedup_kmeans(emb, threshold=THRESHOLD,
                          centroids=cents).persist()
    kept = out.filter("keep").count()
    dedup_s = time.monotonic() - t0

    # ground truth: every planted pair collapses into one component
    # and never keeps both members. Natural same-cluster near-dups
    # above the threshold may join a planted component and displace
    # its keeper (the farthest-from-centroid rule is component-wide),
    # so kept may undershoot n - n_planted by the count of those
    # extra members — reported, expected ~0 at this noise scale.
    assert kept <= n - n_planted, (kept, n, n_planted)
    pairs = (out.alias("a")
             .join(out.alias("b"),
                   F.expr("b.vec_id = a.vec_id + 1 and "
                          "a.vec_id % 50 = 0"))
             .select(F.expr("a.component = b.component").alias("same"),
                     F.expr("a.keep and b.keep").alias("both")))
    agg = pairs.agg(F.count("*").alias("n"),
                    F.sum(F.expr("if(same, 1, 0)")).alias("same"),
                    F.sum(F.expr("if(both, 1, 0)")).alias("both")
                    ).first()
    assert agg.n == n_planted and agg.same == n_planted \
        and agg.both == 0, tuple(agg)

    result = {
        "metric": "semdedup_kmeans_scale", "n_vectors": n,
        "dim": DIM, "cpus": CPUS, "n_cells": CELLS,
        "threshold": THRESHOLD, "planted_dups": n_planted,
        "kept": kept,
        "extra_natural_drops": (n - n_planted) - kept,
        "kmeans_train_sec": round(train_s, 2),
        "dedup_sec": round(dedup_s, 2),
        "vectors_per_sec": round(n / dedup_s, 1),
        "planted_check": "pass",
    }
    line = json.dumps(result)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_ann.json"), "a") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
