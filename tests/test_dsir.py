"""DSIR importance-resampling selection (ops/dsir.py) — planted
target-like docs must be selected, both hash paths must agree on the
selection, and the deterministic Gumbel draw must be rerun-stable."""

import pytest

from pdf_table_spark.ops import dsir

# a target corpus about one topic, a raw corpus that hides a few
# target-like docs in unrelated chatter
TARGET = [
    (1000 + i, "solar panels convert sunlight into electric power "
               "solar inverters feed the grid")
    for i in range(8)
]
PLANTED = [
    (i, "rooftop solar panels and inverters supply electric power "
        "to the local grid")
    for i in (3, 17, 29)
]
NOISE = [
    (i, f"recipe {i} calls for flour butter sugar and a pinch of "
        f"salt baked twenty minutes")
    for i in range(40) if i not in (3, 17, 29)
]


def _dfs(spark):
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    raw = spark.createDataFrame(sorted(PLANTED + NOISE),
                                ["doc_id", "text"])
    return target, raw


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
def test_topk_selects_planted_target_like_docs(spark, hash_fn):
    target, raw = _dfs(spark)
    lr = dsir.fit_logratio_e6(target, raw, n_buckets=256,
                              hash_fn=hash_fn)
    got = dsir.dsir_select(raw, lr, 3, hash_fn=hash_fn,
                           mode="topk").collect()
    assert {r.doc_id for r in got} == {3, 17, 29}
    # topk ranking key IS the score
    assert all(r.key_e6 == r.score_e6 for r in got)


def test_planted_docs_outscore_noise(spark):
    target, raw = _dfs(spark)
    lr = dsir.fit_logratio_e6(target, raw, n_buckets=256)
    scored = {r.doc_id: r.score_e6
              for r in dsir.score_e6(raw, lr).collect()}
    planted_min = min(scored[i] for i in (3, 17, 29))
    noise_max = max(v for k, v in scored.items()
                    if k not in (3, 17, 29))
    assert planted_min > noise_max


def test_gumbel_deterministic_and_score_preserving(spark):
    target, raw = _dfs(spark)
    lr = dsir.fit_logratio_e6(target, raw, n_buckets=256)
    a = dsir.dsir_select(raw, lr, 10, mode="gumbel").collect()
    b = dsir.dsir_select(raw, lr, 10, mode="gumbel").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # the noise perturbs the KEY, never the reported score
    scored = {r.doc_id: r.score_e6
              for r in dsir.score_e6(raw, lr).collect()}
    assert all(r.score_e6 == scored[r.doc_id] for r in a)
    # a different seed redraws different noise
    c = dsir.dsir_select(raw, lr, 10, mode="gumbel",
                         seed="other").collect()
    assert ({r.key_e6 - r.score_e6 for r in a}
            != {r.key_e6 - r.score_e6 for r in c})


def test_empty_and_short_docs(spark):
    target, _ = _dfs(spark)
    raw = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "word"), (4, "solar panels")],
        ["doc_id", "text"])
    lr = dsir.fit_logratio_e6(target, raw, n_buckets=64)
    got = dsir.score_e6(raw, lr).collect()
    # zero-gram docs are dropped; 1-token doc has no bigram but scores
    assert {r.doc_id for r in got} == {3, 4}


def test_score_np_equals_hof(spark):
    # the vectorized Arrow scorer is bit-equal to the codegen HOF
    # path (integer sums are order-independent)
    target, raw = _dfs(spark)
    for hash_fn in ("md5", "xxhash64"):
        lr = dsir.fit_logratio_e6(target, raw, n_buckets=256,
                                  hash_fn=hash_fn)
        hof = {(r.doc_id, r.score_e6) for r in
               dsir.score_e6(raw, lr, hash_fn=hash_fn)
               .select("doc_id", "score_e6").collect()}
        npv = {(r.doc_id, r.score_e6) for r in
               dsir.score_np(raw, lr, hash_fn=hash_fn).collect()}
        assert hof == npv


def test_score_np_drops_empty_docs(spark):
    target, _ = _dfs(spark)
    raw = spark.createDataFrame(
        [(1, ""), (2, "solar panels"), (3, "  ")],
        ["doc_id", "text"])
    lr = dsir.fit_logratio_e6(target, raw, n_buckets=64)
    assert {r.doc_id for r in dsir.score_np(raw, lr).collect()} == {2}


def test_fit_counts_exact(spark):
    df = spark.createDataFrame([(1, "a b a")], ["doc_id", "text"])
    counts, total = dsir.bucket_counts(df, n_buckets=16)
    # grams: a, b, a, 'a b', 'b a' -> 5 occurrences
    assert total == 5 and sum(counts) == 5


def test_score_matches_independent_python_recompute(spark):
    """Pin the whole md5 contract path (tokenize → unigram+bigram →
    md5-prefix bucket → lr lookup → integer sum) against a from-
    scratch hashlib implementation over seeded random texts."""
    import hashlib
    import random

    rng = random.Random(42)
    vocab = ["w%d" % i for i in range(50)] + ["é", "x-y", "a.b", "{"]
    texts = [(i, " ".join(rng.choices(vocab, k=rng.randint(0, 12))))
             for i in range(200)]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    b = 128
    lr = dsir.fit_logratio_e6(docs.filter("doc_id < 20"),
                              docs.filter("doc_id >= 20"),
                              n_buckets=b)

    def py_buckets(text):
        toks = [t for t in text.lower().split() if t]
        grams = toks + [f"{a} {z}" for a, z in zip(toks, toks[1:])]
        return [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % b
                for g in grams]

    expect = {i: sum(lr[k] for k in py_buckets(t))
              for i, t in texts if py_buckets(t)}
    got = {r.doc_id: r.score_e6
           for r in dsir.score_e6(docs, lr).collect()}
    assert got == expect


def test_validation(spark):
    target, raw = _dfs(spark)
    with pytest.raises(ValueError):
        dsir.bucket_counts(target, n_buckets=1)
    with pytest.raises(ValueError):
        dsir.fit_logratio_e6(target, raw, hash_fn="sha9")
    with pytest.raises(ValueError):
        dsir.dsir_select(raw, [0] * 512, 5, mode="softmax")


def test_dsir_select_dispatches_to_arrow_scorer_at_large_b(spark):
    # B > 1024 routes through score_np (the per-row lookup-array trick
    # allocates B int64s per doc); the selection must be identical to
    # the small-B SQL path given the same hash_fn
    target, raw = _dfs(spark)
    lr = dsir.fit_logratio_e6(target, raw, n_buckets=2048)
    got = dsir.dsir_select(raw, lr, 3).collect()
    assert sorted(r.doc_id for r in got) == [3, 17, 29]
    # bit-parity with the explicit SQL scorer at the same B
    sql_scores = {r.doc_id: r.score_e6
                  for r in dsir.score_e6(raw, lr).collect()}
    assert all(r.score_e6 == sql_scores[r.doc_id] for r in got)
