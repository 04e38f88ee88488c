"""Ground-truth corpus generator (fixtures/text_gen.py): every
assembly stage must fire on EXACTLY the planted fraction — the same
check the 50M-doc scale bench runs, at pytest scale."""

import pytest

from pdf_table_spark.fixtures.text_gen import (
    bench_n_grams,
    bench_text,
    doc_row,
    expected_stages,
    generate_bench_table,
    generate_text_corpus,
    regions,
)
from pdf_table_spark.ops import dedup
from pdf_table_spark.ops.prepare import assemble_training_set

N, NB = 10_000, 1_000


def test_doc_row_is_pure_and_region_shaped():
    r = regions(N)
    # exact duplicates inside a cluster, distinct across clusters
    assert doc_row(0, N, NB)[1] == doc_row(99, N, NB)[1]
    assert doc_row(0, N, NB)[1] != doc_row(100, N, NB)[1]
    # near-dup replicas share everything but one token
    a = doc_row(r["neardup"][0], N, NB)[1].split()
    b = doc_row(r["neardup"][0] + 1, N, NB)[1].split()
    assert len(a) == len(b) and sum(x != y for x, y in zip(a, b)) == 1
    # contaminated docs embed the bench phrase verbatim
    c = doc_row(r["contam"][0], N, NB)[1]
    phrase = " ".join(bench_text(r["contam"][0] % NB).split()[:16])
    assert phrase in c
    # regions tile [0, N)
    spans = sorted(r.values())
    assert spans[0][0] == 0 and spans[-1][1] == N
    assert all(x[1] == y[0] for x, y in zip(spans, spans[1:]))


def test_assembly_stage_counts_match_ground_truth(spark, tmp_path):
    corpus = generate_text_corpus(
        spark, N, str(tmp_path / "corpus"), NB, n_files=8)
    bench = generate_bench_table(
        spark, NB, str(tmp_path / "bench"), n_files=2)
    try:
        out = assemble_training_set(
            spark.read.parquet(corpus),
            benchmark=spark.read.parquet(bench),
            mixture={"web": 1.0, "books": 2.0, "code": 0.5,
                     "wiki": 1.5},
            min_words=15)
        got = {r[0]: r[1] for r in
               out["provenance"].groupBy("stage").count().collect()}
        assert got == expected_stages(N)
        # mixture emits >= 1 row per kept doc (books always 2 copies)
        n_assembled = out["assembled"].count()
        assert n_assembled > got["kept"]
    finally:
        dedup.release_caches()


def test_bench_gram_prediction(spark, tmp_path):
    from pdf_table_spark.ops.textfilters import _ngram_hash_rows
    path = generate_bench_table(
        spark, 200, str(tmp_path / "b"), n_files=2)
    grams = (_ngram_hash_rows(spark.read.parquet(path), 13)
             .select("g").distinct().count())
    assert grams == pytest.approx(bench_n_grams(200), rel=0.001)
