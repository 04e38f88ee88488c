"""DSIR selection at corpus scale, two parallelism levels (the same
N-vs-4N evidence discipline as bench_scaling.py — same spark-submit
--py-files job, same input, local[N] vs local[4N], canary-gated
best-of-N trials). Appends one JSON line to BENCH_prepare_scaling.json.

Usage: python scripts/bench_dsir_scale.py [--docs 10000000] [--n 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pdf_table_spark.canary import wait_quiet  # noqa: E402


def run_once(cores: int, zip_path: str, corpus: str) -> dict:
    cmd = [
        SPARK_SUBMIT, "--master", f"local[{cores}]",
        "--py-files", zip_path,
        "--conf", "spark.driver.memory=16g",
        os.path.join(REPO, "scripts", "run_dsir.py"),
        "--input", corpus,
        "--shuffle-partitions", str(max(cores * 2, 16)),
    ]
    env = dict(os.environ,
               SPARK_LOCAL_DIRS=os.path.join(REPO, ".scale", "tmp"))
    os.makedirs(env["SPARK_LOCAL_DIRS"], exist_ok=True)
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          cwd=REPO, env=env)
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"job"' in line:
            return json.loads(line)
    sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:])
    raise RuntimeError(f"no result line from local[{cores}]")


def run_best(cores: int, zip_path: str, corpus: str,
             trials: int) -> dict:
    results = []
    for i in range(trials):
        if i:
            time.sleep(10)
        wait_quiet()
        results.append(run_once(cores, zip_path, corpus))
    best = max(results, key=lambda r: r["docs_per_sec"])
    best["trials_docs_per_sec"] = [r["docs_per_sec"] for r in results]
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    from make_pyfiles import make_zip
    zip_path = make_zip()

    corpus = os.path.join(REPO, ".scale",
                          f"dsir_corpus_{args.docs}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        from pdf_table_spark.fixtures.text_gen import \
            generate_text_corpus
        from pdf_table_spark.spark.session import build_session
        spark = build_session("gen_dsir", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        generate_text_corpus(spark, args.docs, corpus, 400_000,
                             n_files=64)
        spark.stop()

    small = run_best(args.n, zip_path, corpus, args.trials)
    big = run_best(args.n * 4, zip_path, corpus, args.trials)
    eff = (big["docs_per_sec"] / small["docs_per_sec"]) / 4.0
    line = {
        "metric": f"dsir_scaling_{args.n}_to_{args.n * 4}",
        "docs": args.docs,
        "docs_per_sec_n": small["docs_per_sec"],
        "docs_per_sec_4n": big["docs_per_sec"],
        "efficiency": round(eff, 3),
        "runs": {"n": small, "4n": big},
        "method": ("same spark-submit --py-files run_dsir.py job "
                   "(fit + score + topk + gumbel arms, planted "
                   "dup-sibling assertion in-run), same input, "
                   "canary-gated best-of-%d" % args.trials),
    }
    with open(os.path.join(REPO, "BENCH_prepare_scaling.json"),
              "a") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line))


if __name__ == "__main__":
    main()
