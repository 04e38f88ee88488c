"""Training-set assembly: deterministic splits, stratified sampling,
and concat-and-chunk sequence packing (distributed prefix sum)."""

import pytest
from pyspark.sql import functions as F

from pdf_table_spark.ops.sampling import (
    pack_chunks, sample_stratified, split_corpus)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"t{i}x{j}" for j in range(1 + i % 17)),
             ["en", "de", "fr"][i % 3]) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_split_is_deterministic_and_total(docs):
    a = {r.doc_id: r.split for r in split_corpus(docs).collect()}
    b = {r.doc_id: r.split for r in split_corpus(docs).collect()}
    assert a == b and len(a) == 300
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    # 90/5/5 within loose tolerance on 300 docs
    assert counts["train"] > 240 and counts["val"] + counts["test"] < 60


def test_split_weights_validated(docs):
    with pytest.raises(ValueError):
        split_corpus(docs, {"train": 0.5, "val": 0.1})


def test_split_seed_changes_assignment(docs):
    a = {r.doc_id: r.split for r in split_corpus(docs).collect()}
    c = {r.doc_id: r.split
         for r in split_corpus(docs, seed="other").collect()}
    assert a != c


def test_stratified_sample_respects_fractions(docs):
    kept = sample_stratified(docs, {"en": 1.0, "de": 0.0}, default=0.5)
    by = {r.lang: r["count"] for r in
          kept.groupBy("lang").count().collect()}
    assert by["en"] == 100        # fraction 1.0 keeps every en doc
    assert "de" not in by         # fraction 0.0 keeps none
    assert 20 < by.get("fr", 0) < 80   # default 0.5 of 100


def test_pack_chunks_conserves_tokens_and_fills(docs, spark):
    c = 64
    chunks = pack_chunks(docs, ctx_len=c, n_buckets=7).collect()
    total = docs.selectExpr(
        "sum(size(filter(split(lower(text), '\\\\s+'), t -> t <> '')))"
    ).first()[0]
    assert sum(r.n_tokens for r in chunks) == total
    by_id = sorted(chunks, key=lambda r: r.chunk_id)
    # contiguous ids from 0; every chunk but the tail holds exactly c
    assert [r.chunk_id for r in by_id] == list(range(len(by_id)))
    assert all(r.n_tokens == c for r in by_id[:-1])
    assert 0 < by_id[-1].n_tokens <= c
    # doc ranges tile the corpus in order: a doc spanning a boundary
    # appears as last_doc of one chunk and first_doc of the next
    for prev, cur in zip(by_id, by_id[1:]):
        assert prev.last_doc in (cur.first_doc, cur.first_doc - 1)


def test_pack_chunks_matches_naive_prefix_sum(spark):
    # ragged token counts incl. empty docs; compare the two-pass
    # distributed offsets against a driver-side exact packing
    rows = [(i, " ".join("w" for _ in range(n)))
            for i, n in enumerate([5, 0, 3, 64, 1, 0, 200, 7])]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.chunk_id: (r.n_docs, r.n_tokens)
           for r in pack_chunks(docs, ctx_len=64, n_buckets=3).collect()}
    off, want = 0, {}
    for i, n in enumerate([5, 0, 3, 64, 1, 0, 200, 7]):
        for chunk in range(off // 64, max((off + n - 1) // 64, off // 64)
                           + (1 if n else 0)):
            d, t = want.get(chunk, (0, 0))
            want[chunk] = (d + 1, t + min(off + n, (chunk + 1) * 64)
                           - max(off, chunk * 64))
        off += n
    assert got == want


def test_pack_chunks_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_chunks(empty).count() == 0
