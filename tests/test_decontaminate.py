"""Benchmark decontamination: a training doc sharing any 13-gram with
the eval set is flagged; clean docs and short docs are not."""

from pdf_table_spark.ops.textfilters import decontaminate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_flags_docs_sharing_an_ngram(spark):
    leak = " ".join(f"q{j}" for j in range(13))      # a 13-token answer
    bench = _docs(spark, [(900, f"question: {leak} end")])
    corpus = _docs(spark, [
        (1, "clean " + " ".join(f"a{j}" for j in range(30))),
        (2, f"prefix text {leak} suffix text"),       # leaked verbatim
        (3, leak.replace("q5", "Z")),                 # one token off: clean
    ])
    out = decontaminate(corpus, bench)
    hits = {r.doc_id: r.n_hits for r in out["contaminated"].collect()}
    assert hits == {2: 1}
    assert {r.doc_id for r in out["keep"].collect()} == {1, 3}


def test_short_docs_never_match(spark):
    # under n tokens on either side -> no n-grams -> no flags (and no
    # descending-sequence explosion)
    bench = _docs(spark, [(900, "only three tokens")])
    corpus = _docs(spark, [(1, "only three tokens"), (2, "")])
    out = decontaminate(corpus, bench)
    assert out["contaminated"].count() == 0
    assert {r.doc_id for r in out["keep"].collect()} == {1, 2}


def test_hit_count_is_distinct_grams(spark):
    # 15-token overlap = three distinct 13-grams, each counted once
    # even though the doc repeats the leaked run twice
    run = " ".join(f"r{j}" for j in range(15))
    bench = _docs(spark, [(900, run)])
    corpus = _docs(spark, [(1, f"{run} mid {run}")])
    out = decontaminate(corpus, bench)
    assert {(r.doc_id, r.n_hits)
            for r in out["contaminated"].collect()} == {(1, 3)}


def test_broadcast_threshold_flip(spark):
    """The auto mode broadcasts small bench gram sets and flips to a
    shuffled semi-join when the bench side exceeds the limit — the
    flip is visible in the physical plan."""
    from pdf_table_spark.ops.textfilters import decontaminate

    words = " ".join(f"w{i}" for i in range(20))
    corpus = spark.createDataFrame(
        [(1, words)], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, words)], "doc_id long, text string")

    def plan_of(df):
        jvm = spark._jvm
        return df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))

    small = decontaminate(corpus, bench)["contaminated"]
    assert "BroadcastHashJoin" in plan_of(small)

    big = decontaminate(corpus, bench, broadcast_limit=0)["contaminated"]
    p = plan_of(big)
    assert "BroadcastHashJoin" not in p
    assert ("SortMergeJoin" in p or "ShuffledHashJoin" in p)
    # both shapes produce the same answer
    assert [tuple(r) for r in small.collect()] == \
        [tuple(r) for r in big.collect()]


def test_xxhash64_grams_match_md5(spark):
    """Production (xxhash64 bigint grams) and oracle (md5 string
    grams) paths flag the identical doc set with identical hit
    counts — contamination is a gram-equality test, so the key hash
    is interchangeable."""
    leak = " ".join(f"q{j}" for j in range(16))
    bench = _docs(spark, [(900, f"question: {leak} end")])
    corpus = _docs(spark, [
        (1, "clean " + " ".join(f"a{j}" for j in range(30))),
        (2, f"prefix text {leak} suffix text"),
        (3, f"{leak} tail {leak}"),
        (4, leak.replace("q5", "Z")),
    ])
    md5 = decontaminate(corpus, bench, hash_fn="md5")
    xx = decontaminate(corpus, bench, hash_fn="xxhash64")
    as_set = lambda out: {(r.doc_id, r.n_hits)
                          for r in out["contaminated"].collect()}
    assert as_set(md5) == as_set(xx)
    assert {r.doc_id for r in md5["keep"].collect()} == \
        {r.doc_id for r in xx["keep"].collect()}
