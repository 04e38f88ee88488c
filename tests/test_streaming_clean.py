"""Streaming corpus-clean gate: within-watermark exact dedup with
bounded state, gate provenance on survivors, exactly-once across
restarts (the dedup state lives in the checkpoint)."""

import os
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

KEEP_TEXT = ("the quick brown foxes jump high today.\n"
             "the lazy dogs sleep deeply through noon.\n"
             "and many birds fly south every year.")
# passes gopher (12 words, stopwords) but has no sentence enders
C4_FAIL_TEXT = "the cat and dog run fast over long road with nice pace"


@pytest.fixture
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    os.makedirs(d["in"])
    return d


def _ts(hh, mm):
    return datetime(2026, 1, 1, hh, mm)


def _write_docs(dst, name, rows):
    tbl = pa.Table.from_pylist(
        [{"doc_id": d, "text": t, "ingest_ts": ts} for d, t, ts in rows],
        schema=pa.schema([("doc_id", pa.string()),
                          ("text", pa.string()),
                          ("ingest_ts", pa.timestamp("us"))]))
    pq.write_table(tbl, os.path.join(dst, name))


def _read_out(path):
    return {r["doc_id"]: r for r in pq.read_table(path).to_pylist()}


def _run(spark, dirs):
    from pdf_table_spark.streaming.clean import clean_stream
    clean_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"],
                 min_words=10, min_stopword_hits=1)


def test_clean_stream_gates_and_dedup(spark, dirs):
    # wave 1: a good doc, an in-batch duplicate of it, a gopher reject
    _write_docs(dirs["in"], "w1.parquet", [
        ("a_keep", KEEP_TEXT, _ts(10, 0)),
        ("b_dup", KEEP_TEXT, _ts(10, 5)),
        ("c_gopher", "tiny doc.", _ts(10, 10)),
    ])
    _run(spark, dirs)
    out1 = _read_out(dirs["out"])
    assert set(out1) == {"a_keep", "c_gopher"}      # duplicate dropped
    assert out1["a_keep"]["stage"] == "kept" and out1["a_keep"]["kept"]
    assert out1["a_keep"]["clean_fp"] is not None
    assert out1["c_gopher"]["stage"] == "gopher"
    assert not out1["c_gopher"]["kept"]

    # wave 2 (after a restart — new query, same checkpoint): a
    # cross-batch duplicate within the horizon stays suppressed by the
    # checkpointed state; a c4 reject flows through with provenance
    _write_docs(dirs["in"], "w2.parquet", [
        ("d_dup_again", KEEP_TEXT, _ts(10, 20)),
        ("e_c4", C4_FAIL_TEXT, _ts(10, 25)),
    ])
    _run(spark, dirs)
    out2 = _read_out(dirs["out"])
    assert "d_dup_again" not in out2
    assert out2["e_c4"]["stage"] == "c4"
    # exactly once: the wave-1 survivor was not re-emitted
    assert sum(1 for r in pq.read_table(dirs["out"]).to_pylist()
               if r["doc_id"] == "a_keep") == 1


def test_clean_stream_rerun_without_new_files_is_noop(spark, dirs):
    _write_docs(dirs["in"], "w1.parquet",
                [("a_keep", KEEP_TEXT, _ts(10, 0))])
    _run(spark, dirs)
    _run(spark, dirs)   # no new files: source offset log skips them
    assert len(_read_out(dirs["out"])) == 1


def test_clean_docs_stream_matches_batch_gate_on_survivors(spark):
    """The streaming gate and the batch corpus_clean agree on stage
    and clean_fp for docs that survive dedup (shared column exprs)."""
    from pdf_table_spark.ops.textfilters import corpus_clean
    from pdf_table_spark.streaming.clean import clean_docs_stream
    rows = [("a_keep", KEEP_TEXT, _ts(10, 0)),
            ("c_gopher", "tiny doc.", _ts(10, 10)),
            ("e_c4", C4_FAIL_TEXT, _ts(10, 20))]
    docs = spark.createDataFrame(
        rows, "doc_id string, text string, ingest_ts timestamp")
    batch = {r["doc_id"]: r for r in corpus_clean(
        docs.drop("ingest_ts"), min_words=10,
        min_stopword_hits=1).collect()}
    # run the streaming transformation as a batch plan (same exprs,
    # minus the stateful dedup which needs a streaming source)
    from pdf_table_spark.ops.textfilters import (_redact_col, _with_c4,
                                                 _with_gopher)
    from pyspark.sql import functions as F
    staged = _with_gopher(docs, 10, 100_000, 3.0, 10.0, 0.1, 0.9, 0.3,
                          0.8, 1, "\\n")
    staged = _with_c4(staged, 5, 3, "\\n")
    stage = (F.when(~F.col("pass_gopher"), F.lit("gopher"))
             .when(~F.col("keep_c4"), F.lit("c4"))
             .otherwise(F.lit("kept")))
    stream_like = {r["doc_id"]: r for r in staged.select(
        "doc_id", stage.alias("stage"),
        F.when(stage == "kept",
               F.md5(_redact_col(F.col("clean_text"))))
        .alias("clean_fp")).collect()}
    for d in ("a_keep", "c_gopher", "e_c4"):
        assert stream_like[d]["stage"] == batch[d]["stage"]
        assert stream_like[d]["clean_fp"] == batch[d]["clean_fp"]


def test_streaming_decontamination_gate(spark, dirs):
    """A static benchmark set adds the 13-gram decontamination gate to
    the stream: leaked docs are stage='contaminated', the probe is
    stateless (only the dedup horizon keeps state), and a second batch
    through the SAME checkpoint still applies it."""
    from pdf_table_spark.streaming.clean import clean_stream
    leak = " ".join(f"benchword{j}" for j in range(13))
    bench = spark.createDataFrame([("b1", leak)],
                                  "doc_id string, text string")
    _write_docs(dirs["in"], "b1.parquet", [
        ("d1", KEEP_TEXT, _ts(9, 0)),
        ("d2", KEEP_TEXT + "\nalso " + leak + " appears here.",
         _ts(9, 1)),
    ])
    clean_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"],
                 min_words=10, min_stopword_hits=1, benchmark=bench)
    out = _read_out(dirs["out"])
    assert out["d1"]["stage"] == "kept" and out["d1"]["kept"]
    assert out["d2"]["stage"] == "contaminated" and not out["d2"]["kept"]

    _write_docs(dirs["in"], "b2.parquet", [
        ("d3", KEEP_TEXT + "\nmore " + leak + " leaked.", _ts(9, 5)),
    ])
    clean_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"],
                 min_words=10, min_stopword_hits=1, benchmark=bench)
    out = _read_out(dirs["out"])
    assert out["d3"]["stage"] == "contaminated"


def test_clean_stream_min_sentences_off_switch(spark, dirs):
    """min_sentences=0 disables the sentence-count C4 sub-gate in the
    streaming runner (mirrors the batch off-switch): a doc with zero
    terminal-punctuation sentences is kept instead of staged 'c4'."""
    from pdf_table_spark.streaming.clean import clean_stream
    _write_docs(dirs["in"], "b1.parquet", [
        ("d1", C4_FAIL_TEXT, _ts(9, 0)),
    ])
    clean_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"],
                 min_words=10, min_sentences=0, min_stopword_hits=1)
    out = _read_out(dirs["out"])
    assert out["d1"]["stage"] == "kept" and out["d1"]["kept"]
