"""Streaming-tier benchmark (SURVEY §2.10 evidence).

The batch tier's throughput and N→4N scaling are covered by bench.py /
bench_scaling.py; this script measures the Structured Streaming face:

  1. extract_ingest — file-source streaming ingest of the interleaved
     spans corpus through the full extraction plan (foreachBatch), in
     three phases: bulk catch-up (48 of 64 fixture files, several
     micro-batches), incremental delta (the remaining 16 files — cost
     must track the DELTA, not the corpus), and a no-op resume (no new
     files — cost must be trigger overhead only, no input scan).
  2. clean_gate — the stateless streaming clean gate + watermarked
     exact dedup (dropDuplicatesWithinWatermark) over a 10×-replicated
     documents table (distinct doc_ids, deterministic ingest_ts).
  3. sessionize — the custom stateful operator (applyInPandasWithState
     30-min-gap sessionization) over a 10×-replicated events table,
     cross-checked against the batch event_sessions count.

Prints ONE JSON line and appends it to BENCH_streaming.json.
Run on a quiet box: python scripts/bench_streaming.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# replication factor for the small sf0.1 side tables; raise via env
# for decade-up runs (e.g. 100 → 10M events / 500k docs)
REPL = int(os.environ.get("SPARK_GRAFT_STREAM_REPL", "10"))


def _session():
    from pyspark.sql import SparkSession
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench_streaming")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate())


def bench_extract_ingest(spark, work):
    """Phases over the committed 64-part sf0.1 fixture corpus."""
    import __spark_entry__ as entrymod
    from pdf_table_spark.streaming.incremental import extract_stream

    src = os.path.join(entrymod._fixture_dir(SF_DIR),
                       "documents_spans.parquet")
    parts = sorted(n for n in os.listdir(src) if n.endswith(".parquet"))
    d_in = os.path.join(work, "in")
    d_out = os.path.join(work, "out")
    d_ckpt = os.path.join(work, "ckpt")
    os.makedirs(d_in)

    def run(mfpt=8):
        os.makedirs(d_ckpt, exist_ok=True)
        t0 = time.monotonic()
        q = (extract_stream(spark, d_in, d_out, d_ckpt,
                            max_files_per_trigger=mfpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return time.monotonic() - t0

    def copy(lo, hi):
        for n in parts[lo:hi]:
            shutil.copy(os.path.join(src, n), os.path.join(d_in, n))

    copy(0, 48)
    bulk_s = run()
    out1 = spark.read.parquet(d_out)
    bulk_docs = out1.select("doc_id").distinct().count()
    n_batches = out1.select("batch_id").distinct().count()

    copy(48, 64)
    delta_s = run()
    out2 = spark.read.parquet(d_out)
    total_docs = out2.select("doc_id").distinct().count()

    noop_s = run()
    assert spark.read.parquet(d_out).count() == out2.count(), \
        "no-op resume must not change the sink"
    return {
        "bulk_files": 48, "bulk_sec": round(bulk_s, 2),
        "bulk_docs": bulk_docs, "bulk_micro_batches": n_batches,
        "bulk_docs_per_sec": round(bulk_docs / bulk_s, 1),
        "delta_files": 16, "delta_sec": round(delta_s, 2),
        "delta_docs": total_docs - bulk_docs,
        "delta_docs_per_sec": round((total_docs - bulk_docs) / delta_s, 1),
        "noop_resume_sec": round(noop_s, 2),
    }


def bench_clean_gate(spark, work):
    """Streaming clean gate over a 10×-replicated documents table.

    Replicas share their text, so the watermarked exact dedup must
    keep exactly ONE survivor per replicated doc — the kept count is
    asserted equal to the distinct-clean-text count of the kept docs,
    making the throughput number also a correctness check."""
    from pyspark.sql import functions as F
    from pdf_table_spark.streaming.clean import clean_stream

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    d_in = os.path.join(work, "clean_in")
    reps = spark.range(REPL).select(F.col("id").alias("rep"))
    (docs.select("doc_id", "text").crossJoin(reps)
     .select(
         F.concat_ws("#", "doc_id", "rep").alias("doc_id"), "text",
         # deterministic ingest_ts inside one dedup horizon
         F.timestamp_seconds(
             F.lit(1700000000)
             + F.pmod(F.xxhash64("doc_id"), F.lit(3000))).alias("ingest_ts"))
     .repartition(16).write.parquet(d_in))
    n_in = spark.read.parquet(d_in).count()

    d_out = os.path.join(work, "clean_out")
    d_ckpt = os.path.join(work, "clean_ckpt")
    t0 = time.monotonic()
    # relaxed gates: the synthetic corpus has no terminal punctuation
    # (0 sentences) and fails the production min_words=50 threshold
    # wholesale, which would leave the gate with nothing to keep
    clean_stream(spark, d_in, d_out, d_ckpt,
                 min_words=5, min_sentences=0, min_stopword_hits=0)
    wall = time.monotonic() - t0
    out = spark.read.parquet(d_out)
    n_out = out.count()
    kept = out.filter("kept").count()
    # replicas (and the corpus's own planted exact dups) share raw
    # text: the watermarked exact dedup must emit exactly ONE row per
    # distinct content fingerprint
    want = (spark.read.parquet(d_in)
            .select(F.md5("text")).distinct().count())
    assert n_out == want, (n_out, want)
    assert kept > 0, "gate kept nothing; thresholds still too strict"
    return {"rows_in": n_in, "sec": round(wall, 2),
            "rows_per_sec": round(n_in / wall, 1), "kept": kept}


def bench_sessionize(spark, work):
    """Stateful sessionization over 10×-replicated events (distinct
    user_ids per replica), count cross-checked against the batch
    window sessionization on the same input."""
    from pyspark.sql import functions as F
    from pdf_table_spark.streaming.windowed import sessionize_stream

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    d_in = os.path.join(work, "sess_in")
    reps = spark.range(REPL).select(F.col("id").alias("rep"))
    big = (ev.select("user_id", "ts", "event_id").crossJoin(reps)
           .select((F.col("user_id") + F.col("rep") * 10_000_000)
                   .alias("user_id"), "ts", "event_id"))
    big.repartition(16).write.parquet(d_in)
    n_in = spark.read.parquet(d_in).count()

    d_out = os.path.join(work, "sess_out")
    d_ckpt = os.path.join(work, "sess_ckpt")
    t0 = time.monotonic()
    sessionize_stream(spark, d_in, d_out, d_ckpt)
    wall = time.monotonic() - t0
    got = spark.read.parquet(d_out).count()

    # batch twin: 30-min-gap sessions via the lag/cumsum window. A
    # session whose event-time timeout (last_ts + gap) has not passed
    # the final watermark (= max event ts at 0s allowance) is still
    # OPEN at end-of-stream and correctly NOT emitted — exclude those
    # from the expected count instead of hiding the append semantics.
    w_in = spark.read.parquet(d_in)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (w_in
            .withColumn("prev", F.lag("ts").over(w))
            .withColumn("brk", (F.col("prev").isNull() | (
                F.unix_timestamp("ts") - F.unix_timestamp("prev")
                > 1800)).cast("int"))
            .withColumn("sid", F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("user_id", "sid")
            .agg(F.max("ts").alias("last_ts")))
    wm = w_in.agg(F.max("ts")).collect()[0][0]
    closed = sess.filter(
        F.unix_timestamp("last_ts") + 1800
        < F.unix_timestamp(F.lit(wm))).count()
    total = sess.count()
    assert got == closed, (got, closed, total)
    return {"events_in": n_in, "sec": round(wall, 2),
            "events_per_sec": round(n_in / wall, 1), "sessions": got,
            "open_at_eos": total - closed}


def bench_neardup_gate(spark, work):
    """Incremental MinHash-LSH gate: wave 1 ingests the corpus and
    builds the index; wave 2 throws REPL× traffic at it — half exact
    copies of INDEXED docs (signature agreement 1.0, must all drop),
    half synthetic docs with per-id random vocab (zero shingle overlap
    with anything, must all survive). The throughput number is gated
    by both set assertions, so it can't be bought with a broken gate."""
    from pyspark.sql import functions as F
    from pdf_table_spark.streaming.neardup import run_neardup_stream

    d_in = os.path.join(work, "nd_in")
    d_out = os.path.join(work, "nd_out")
    d_index = os.path.join(work, "nd_index")
    d_ckpt = os.path.join(work, "nd_ckpt")

    docs = (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .select(F.col("doc_id").cast("string").alias("doc_id"),
                    "text"))
    docs.repartition(4).write.parquet(d_in)
    t0 = time.monotonic()
    run_neardup_stream(spark, d_in, d_out, d_index, d_ckpt)
    wave1_s = time.monotonic() - t0
    indexed = spark.read.parquet(d_out).select("doc_id", "text")
    n_indexed = indexed.count()

    # wave 2: copies of indexed docs only (their canonical is in the
    # index by construction) + synthetic all-distinct-vocab docs
    reps = spark.range(REPL).select(F.col("id").alias("rep"))
    dups = (indexed.crossJoin(reps)
            .filter(F.xxhash64("doc_id") % 2 == 0)
            .select(F.concat_ws("#", F.lit("dup"), "rep", "doc_id")
                    .alias("doc_id"), "text"))
    n_dup = dups.count()
    fresh = (spark.range(n_dup)
             .select(F.concat(F.lit("fresh#"), F.col("id").cast("string"))
                     .alias("doc_id"),
                     F.expr("array_join(transform(sequence(1, 40), "
                            "i -> concat('t', xxhash64(id, i))), ' ')")
                     .alias("text")))
    (dups.unionByName(fresh).repartition(16)
     .write.mode("append").parquet(d_in))
    n_wave2 = n_dup * 2

    t0 = time.monotonic()
    run_neardup_stream(spark, d_in, d_out, d_index, d_ckpt,
                       max_files_per_trigger=8)
    wave2_s = time.monotonic() - t0

    kept = {r.doc_id for r in spark.read.parquet(d_out)
            .select("doc_id").collect()}
    dup_kept = sum(1 for d in kept if d.startswith("dup#"))
    fresh_kept = sum(1 for d in kept if d.startswith("fresh#"))
    assert dup_kept == 0, f"{dup_kept} copies of indexed docs survived"
    assert fresh_kept == n_dup, (fresh_kept, n_dup)
    assert len(kept) == n_indexed + n_dup
    return {"wave1_docs": n_indexed, "wave1_sec": round(wave1_s, 2),
            "wave2_docs": n_wave2, "wave2_sec": round(wave2_s, 2),
            "wave2_docs_per_sec": round(n_wave2 / wave2_s, 1),
            "dups_dropped": n_dup, "fresh_kept": fresh_kept}


def main():
    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bench_streaming_",
                            dir=os.environ.get("SPARK_GRAFT_TMP"))
    try:
        result = {
            "metric": "streaming_tier",
            "sf": SF_DIR, "cpus": CPUS, "replication": REPL,
            "extract_ingest": bench_extract_ingest(spark, work),
            "clean_gate": bench_clean_gate(spark, work),
            "sessionize": bench_sessionize(spark, work),
            "neardup_gate": bench_neardup_gate(spark, work),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    line = json.dumps(result)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_streaming.json"),
            "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
