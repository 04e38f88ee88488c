"""The composed ingest program (ops/prepare.py): per-stage provenance
with planted docs for every gate, and the later-stages-see-fewer-docs
invariant."""

import pytest

KEEP = ("the quick brown foxes jump high today.\n"
        "the lazy dogs sleep deeply through noon.\n"
        "and many birds fly south every year.")
# near-duplicate of KEEP: ONE inserted word — ~2 shingles out, ~3 in,
# Jaccard ≈ 14/20 = 0.7 ≥ the 0.5 threshold, and still passes the
# gopher/c4 gates (line structure intact)
NEARDUP = ("the quick brown foxes jump high today.\n"
           "the lazy dogs sleep deeply through noon.\n"
           "and many birds fly south every single year.")


def _run(spark, rows, **kw):
    from pdf_table_spark.ops.prepare import prepare_corpus
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    kw.setdefault("min_words", 10)
    kw.setdefault("min_stopword_hits", 1)
    kw.setdefault("neardup_threshold", 0.5)
    return {r.doc_id: r for r in prepare_corpus(docs, **kw).collect()}


def test_every_stage_fires_and_order_is_first_failing(spark):
    out = _run(spark, [
        ("a_keep", KEEP),
        ("b_dup", KEEP),                   # exact dup of a_keep
        ("c_gopher", "tiny doc."),
        ("d_c4", "the cat and dog run fast over long road with pace"),
        ("e_neardup", NEARDUP),            # near-dup of a_keep
    ])
    assert out["a_keep"].stage == "kept" and out["a_keep"].kept
    assert out["a_keep"].clean_fp is not None
    assert out["b_dup"].stage == "dup"
    assert out["c_gopher"].stage == "gopher"
    assert out["d_c4"].stage == "c4"
    assert out["e_neardup"].stage == "neardup"
    # provenance is total: one row per input doc
    assert len(out) == 5
    assert all(r.clean_fp is None for d, r in out.items()
               if d != "a_keep")


def test_neardup_only_among_clean_survivors(spark):
    # the near-dup partner FAILS the c4 gate (no sentence enders), so
    # it must be staged 'c4', and a_keep must NOT lose its partner-less
    # near-dedup round (stays kept)
    bad_partner = NEARDUP.replace(".", "")
    out = _run(spark, [("a_keep", KEEP), ("b_bad", bad_partner)])
    assert out["b_bad"].stage == "c4"
    assert out["a_keep"].stage == "kept"


def test_model_gate_fires_last(spark):
    # passes gopher+c4 but the literal quality head votes drop:
    # few words (min_words=5 here), no stopword-free penalty —
    # short docs score below the drop bias
    short = "delta echo foxtrot golf hotel india.\nkilo lima mike november oscar papa.\nquebec romeo sierra tango uniform victor."
    out = _run(spark, [("s", short)], min_words=5,
               min_stopword_hits=0)
    assert out["s"].stage == "model" and not out["s"].kept


def test_prepare_caches_release_via_dedup_registry(spark):
    """One release_caches() call frees every intermediate the program
    persisted (survivors + the dedup pipeline's shingle/sig tables)."""
    from pdf_table_spark.ops import dedup
    dedup.release_caches()
    _run(spark, [("a_keep", KEEP), ("e_neardup", NEARDUP)])
    assert dedup.release_caches() >= 3
