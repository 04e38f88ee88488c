"""Measured skew-join evidence (north rule: "partitioning / shuffle /
skew handled explicitly").

A deliberately pathological workload: 20M fact rows joining a 1M-row
dim on a key where ONE key owns half the facts (the one-domain-owns-
half-the-corpus shape). The dim is sized past the broadcast threshold
so the join must shuffle — exactly when skew hurts. Three executions
of the SAME logical join, all hash-checked equal:

  * smj_no_aqe_skew — sort-merge join with AQE's skew split disabled:
    the hot key's partition pins one task (the straggler baseline).
  * smj_aqe_skew — AQE skewJoin on (the engine's mitigation: the hot
    partition is split at runtime).
  * salted — ``ops.skew.salted_join`` (the explicit mitigation that
    also works where AQE can't see the skew, e.g. UDF-compute skew or
    non-SMJ plans).

Prints ONE JSON line and appends to BENCH_skew.json. The equality
assertion makes the walls comparable by construction.

Run on a quiet box: python scripts/bench_skew.py
  SPARK_GRAFT_SKEW_FACTS  fact rows (default 20_000_000)
  SPARK_GRAFT_SKEW_DIMS   dim rows (default 1_000_000)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_FACTS = int(os.environ.get("SPARK_GRAFT_SKEW_FACTS", "20000000"))
N_DIMS = int(os.environ.get("SPARK_GRAFT_SKEW_DIMS", "1000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import functions as F

    from pdf_table_spark.ops.skew import salted_join
    from pdf_table_spark.spark.session import build_session

    spark = build_session("bench_skew", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    # dim must NOT broadcast or the skew never materializes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # facts: half the rows hit key 0, the rest spread uniformly
    facts = (spark.range(N_FACTS).select(
        F.expr(f"if(id % 2 = 0, 0L, pmod(xxhash64(id), {N_DIMS}))")
        .alias("key"),
        F.expr("cast(pmod(xxhash64('v', id), 1000) as double) / 10")
        .alias("amount")).persist())
    dims = (spark.range(N_DIMS).select(
        F.col("id").alias("key"),
        F.expr("concat('grp_', pmod(id, 7))").alias("grp")).persist())
    facts.count(), dims.count()

    def agg(joined):
        return (joined.groupBy("grp")
                .agg(F.count("*").alias("n"),
                     F.round(F.sum("amount"), 2).alias("amt"))
                .orderBy("grp"))

    def run(label, skew_on, salted):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled",
            "true" if skew_on else "false")
        t0 = time.monotonic()
        j = (salted_join(facts, dims, "key") if salted
             else facts.join(dims, "key"))
        rows = [tuple(r) for r in agg(j).collect()]
        return time.monotonic() - t0, rows

    base_s, base_rows = run("smj_no_aqe_skew", skew_on=False,
                            salted=False)
    aqe_s, aqe_rows = run("smj_aqe_skew", skew_on=True, salted=False)
    salt_s, salt_rows = run("salted", skew_on=False, salted=True)
    assert base_rows == aqe_rows == salt_rows, "variant results differ"

    result = {
        "metric": "skew_join", "fact_rows": N_FACTS,
        "dim_rows": N_DIMS, "hot_key_share": 0.5, "cpus": CPUS,
        "smj_no_aqe_skew_sec": round(base_s, 2),
        "smj_aqe_skew_sec": round(aqe_s, 2),
        "salted_sec": round(salt_s, 2),
        "aqe_speedup": round(base_s / aqe_s, 2),
        "salted_speedup": round(base_s / salt_s, 2),
        "results_equal": True,
    }
    line = json.dumps(result)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_skew.json"), "a") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
