"""Corpus filter gates (ops/textfilters.py): hand-computed literal
expectations per gate, plus the composed-gate stage provenance.

These pin the published-heuristic semantics (Gopher App. A thresholds,
C4 line rules) independently of the DuckDB oracle, so a change that
breaks a rule on both engines still fails here.
"""

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_repetition_signals_literals(spark):
    from pdf_table_spark.ops.textfilters import repetition_signals
    # 3 lines, one repeated; 3 words -> 2 bigrams, no 5-grams
    df = _docs(spark, [("d", "aa\naa\nbb")])
    r = repetition_signals(df, line_sep="\\n").collect()[0]
    assert r.n_lines == 3
    assert r.dup_line_frac == pytest.approx(1 / 3)
    # repeat occurrences of 'aa': (2-1)*2 chars over 6 line chars
    assert r.dup_line_char_frac == pytest.approx(2 / 6)
    # bigrams 'aa aa', 'aa bb' tie at count 1 -> lexicographically
    # greatest wins: 5 chars over len('aa\naa\nbb') = 8
    assert r.top_2gram_char_frac == pytest.approx(5 / 8)
    assert r.dup_5gram_char_frac == 0.0


def test_repetition_dup_5gram(spark):
    from pdf_table_spark.ops.textfilters import repetition_signals
    # 'a b c d e' repeated -> the 5-gram 'a b c d e' occurs twice
    df = _docs(spark, [("d", "a b c d e a b c d e")])
    r = repetition_signals(df).collect()[0]
    # 6 5-grams, all distinct except 'a b c d e' (x2): 2*9 chars / 19
    assert r.dup_5gram_char_frac == pytest.approx(18 / 19)


def test_gopher_pass_and_fail(spark):
    from pdf_table_spark.ops.textfilters import gopher_quality
    good = ("the quick brown foxes jump high today and lazy dogs "
            "sleep deeply")
    df = _docs(spark, [("good", good),
                       ("short", "tiny doc here"),
                       ("nums", "1 2 3 4 5 6 7 8 9 10 11 12")])
    out = {r.doc_id: r for r in
           gopher_quality(df, min_words=10,
                          min_stopword_hits=1).collect()}
    assert out["good"].pass_gopher
    assert out["good"].n_words == 12
    assert out["good"].alpha_word_frac == 1.0
    assert out["good"].stopword_hits == 2  # the, and
    assert not out["short"].pass_gopher          # < 10 words
    assert not out["nums"].pass_gopher           # alpha_word_frac = 0
    assert out["nums"].alpha_word_frac == 0.0


def test_gopher_symbol_and_bullet_signals(spark):
    from pdf_table_spark.ops.textfilters import gopher_quality
    df = _docs(spark, [("s", "alpha # beta ... gamma"),
                       ("b", "- one bullet\n- two bullet\nplain line")])
    out = {r.doc_id: r for r in gopher_quality(df).collect()}
    # '#' once + '...' once over 5 words
    assert out["s"].symbol_word_ratio == pytest.approx(2 / 5)
    assert out["b"].bullet_line_frac == pytest.approx(2 / 3)


def test_c4_line_filter_literals(spark):
    from pdf_table_spark.ops.textfilters import c4_line_filter
    text = ("this is a good long line today.\n"
            "too short.\n"
            "enable JavaScript to view this content today.\n"
            "no terminal punctuation on this line")
    df = _docs(spark, [("d", text),
                       ("lorem", "Lorem ipsum dolor sit amet today."),
                       ("brace", "code { sample } in a long line.")])
    out = {r.doc_id: r for r in c4_line_filter(df).collect()}
    d = out["d"]
    assert d.clean_text == "this is a good long line today."
    assert d.n_lines_kept == 1
    assert d.n_sentences == 1
    assert not d.keep_c4                 # < 3 sentences
    assert out["lorem"].has_lorem and not out["lorem"].keep_c4
    assert out["brace"].has_brace and not out["brace"].keep_c4


def test_pii_redact_counts_and_text(spark):
    from pdf_table_spark.ops.textfilters import pii_redact
    df = _docs(spark, [
        ("d", "mail bob@example.com or 10.0.0.1 call +1 555 123 4567 now"),
        ("clean", "no pii in here at all"),
    ])
    out = {r.doc_id: r for r in pii_redact(df).collect()}
    d = out["d"]
    assert (d.n_emails, d.n_ips, d.n_phones) == (1, 1, 1)
    assert d.redacted == "mail [EMAIL] or [IP] call [PHONE] now"
    c = out["clean"]
    assert (c.n_emails, c.n_ips, c.n_phones) == (0, 0, 0)
    assert c.redacted == "no pii in here at all"


def test_corpus_clean_stage_provenance(spark):
    from pdf_table_spark.ops.textfilters import corpus_clean
    keep_text = ("the quick brown foxes jump high today.\n"
                 "the lazy dogs sleep deeply through noon.\n"
                 "and many birds fly south every year.")
    df = _docs(spark, [
        ("a_keep", keep_text),
        ("b_dup", keep_text),              # same content, later doc_id
        ("c_gopher", "tiny doc."),         # < 10 words
        # passes gopher (12 words, stopwords) but no sentence enders
        ("d_c4", "the cat and dog run fast over long road with nice pace"),
    ])
    out = {r.doc_id: r for r in
           corpus_clean(df, min_words=10,
                        min_stopword_hits=1).collect()}
    assert out["a_keep"].stage == "kept" and out["a_keep"].kept
    assert out["a_keep"].clean_fp is not None
    assert out["b_dup"].stage == "dup" and not out["b_dup"].kept
    assert out["b_dup"].clean_fp is None
    assert out["c_gopher"].stage == "gopher"
    assert out["d_c4"].stage == "c4"


def test_corpus_clean_single_shuffle_plan(spark):
    """Scale guard: the composed gate is one scan + exactly one
    exchange (the md5-key window) — every gate rides that pass."""
    from pdf_table_spark.ops.textfilters import corpus_clean
    df = _docs(spark, [("a", "x")])
    plan = corpus_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_repetition_agg_impl_matches_narrow(spark):
    """The shuffle-based scale path (impl='agg') is bit-identical to
    the narrow per-doc path on a real corpus slice and on crafted
    repetitive docs (same integer counts, same single division)."""
    import os
    from pyspark.sql import functions as F
    from pdf_table_spark.ops.textfilters import repetition_signals
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("doc_id"),
                    F.expr(
                "replace(text, 'table ', 'table.' || chr(10))")
                .alias("text"))
            .union(_docs(spark, [
                ("rep", "a b c d e a b c d e a b c d e"),
                ("one", "word"),
                ("dup", "x y\nx y\nx y")]).select(
                    F.col("doc_id").cast("string"), "text")))
    narrow = sorted(map(tuple, repetition_signals(docs).collect()))
    agg = sorted(map(tuple,
                     repetition_signals(docs, impl="agg").collect()))
    assert narrow == agg


def test_repetition_agg_plan_shape(spark):
    """impl='agg' shuffles on (doc_id, gram) — a pathological doc
    spreads across the cluster instead of pinning one task."""
    from pdf_table_spark.ops.textfilters import repetition_signals
    df = repetition_signals(_docs(spark, [("d", "a b c")]), impl="agg")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(doc_id" in plan


def test_repetition_full_rule_family_literals(spark):
    from pdf_table_spark.ops.textfilters import repetition_signals
    # 'a b c' x3: 17 chars, 9 tokens
    df = _docs(spark, [("d", "a b c a b c a b c")])
    r = repetition_signals(df).collect()[0]
    # bigrams: 'a b' x3, 'b c' x3, 'c a' x2 -> tie at 3, 'b c' wins
    assert r.top_2gram_char_frac == pytest.approx(3 * 3 / 17)
    # trigram 'a b c' x3 covers 3*5 chars
    assert r.top_3gram_char_frac == pytest.approx(3 * 5 / 17)
    # 5-grams: 'a b c a b' x2 + 'b c a b c' x2 -> 4*9/17 > 1 (overlaps)
    assert r.dup_5gram_char_frac == pytest.approx(36 / 17)
    assert r.dup_10gram_char_frac == 0.0        # only 9 tokens
    assert not r.pass_repetition                # top-2-gram 53% > 20%


def test_repetition_pass_on_diverse_text(spark):
    from pdf_table_spark.ops.textfilters import repetition_signals
    text = ("the quick brown foxes jump high above lazy sleeping dogs "
            "while many migrating birds fly south during every winter "
            "season across wide open country landscapes near rivers")
    r = repetition_signals(_docs(spark, [("d", text)])).collect()[0]
    assert r.pass_repetition
    assert r.dup_5gram_char_frac == 0.0
    assert r.dup_line_frac == 0.0


def test_lang_id_ngram_picks_profile_language(spark):
    """Cavnar-Trenkle out-of-place: docs saturated with one profile's
    trigrams rank that language first; no letters -> 'und'."""
    from pdf_table_spark.ops.text import lang_id_ngram
    df = _docs(spark, [
        ("en", "the thing and the ring bring the kingdom the ending"),
        ("de", "der schein und der eindruck durch dieser schoenen"),
        ("none", "12345 67890 ..."),
    ])
    out = {r.doc_id: r for r in lang_id_ngram(df).collect()}
    assert out["en"].pred_lang == "en"
    assert out["de"].pred_lang == "de"
    assert out["none"].pred_lang == "und"
    # winner score bounded by OOP_MAX * top_n; margin nonnegative and
    # zero for the no-gram doc
    from pdf_table_spark.ops.text import OOP_MAX
    assert 0 <= out["en"].top_score <= OOP_MAX * 20
    assert out["en"].margin >= 0 and out["de"].margin >= 0
    assert out["none"].margin == 0


def test_lang_id_broad_profiles_and_margin(spark):
    """Data-file profiles: new-language fixtures rank their own
    language first on BOTH paths, and the margin behaves as a
    confidence gap (saturated doc > ambiguous doc). Stopword tier
    covers 78 whitespace-tokenized languages; the trigram tier is the
    40-language Latin-script subset by design (its tokenizer keeps
    only ASCII letter grams)."""
    from pdf_table_spark.ops.text import (LANG_STOPWORDS,
                                          LANG_TRIGRAM_PROFILES,
                                          lang_id, lang_id_ngram)
    assert len(LANG_STOPWORDS) >= 78
    assert set(LANG_TRIGRAM_PROFILES) <= set(LANG_STOPWORDS)
    df = _docs(spark, [
        ("pl", "nie to sie jest na co jak czy ale tak nie jest"),
        ("tr", "ve bir bu da de ile icin ama gibi daha bir bu"),
        ("sw", "na ya wa kwa ni za katika hii kuwa lakini na ya"),
        ("vi", "va cua la co khong trong mot nguoi nay cho va cua"),
        # round-4 broadening: diacritic stopwords must survive the
        # whitespace tokenizer untouched (is/sk), and the close pairs
        # must separate (sk vs cs, sl vs hr, gl vs pt, az/uz vs tr)
        ("af", "die en van het nie wat vir met om ook die wat"),
        ("is", "og að er ekki það sem við til hann var að ekki"),
        ("sk", "som ako aj sme ich po za vo keď ešte som ako"),
        ("sl", "je in se da za ki pa ne bi so in ki pa"),
        ("gl", "unha non polo pola coa cos nas nos como pero unha"),
        ("uz", "va bu bir uchun bilan ham lekin emas edi keyin ham"),
        ("ambig", "the der"),
    ])
    sw_out = {r.doc_id: r for r in lang_id(df).collect()}
    for la in ("pl", "tr", "sw", "vi", "af", "is", "sk", "sl",
               "gl", "uz"):
        assert sw_out[la].pred_lang == la, (la, sw_out[la])
        assert sw_out[la].margin >= 0
    # one hit each for en and de: tie -> margin 0, alphabetical winner
    assert sw_out["ambig"].margin == 0
    assert sw_out["ambig"].pred_lang == "de"

    ng = {r.doc_id: r for r in lang_id_ngram(_docs(spark, [
        ("pl", "nie przez owany przednie niego ych ani rzeczy"
               " sie czy dzien nie przez"),
        ("fi", "kaikista olemassa asuinalueilla sanottavansa"
               " istuntosali elamaansa"),
        ("cy", "gwneuthpwyd ysgrifennydd cyhoeddwyd gweithgaredd"
               " ieithyddol mae bod gan"),
        ("lt", "taisykles vartotojais instituciniais kuriausi"
               " antikiniais masinimas"),
    ])).collect()}
    assert ng["pl"].pred_lang == "pl"
    assert ng["fi"].pred_lang == "fi"
    assert ng["cy"].pred_lang == "cy"
    assert ng["lt"].pred_lang == "lt"


def test_lang_id_nonlatin_and_cjk_tiers(spark):
    """Round-4 broadening to the reference's full docs/language.md
    surface: non-Latin whitespace-tokenized scripts resolve on the
    stopword tier (Cyrillic, Arabic, Devanagari, Tamil, Telugu), and
    the four CJK languages resolve on the script-range tier — kana ⇒
    japan, hangul ⇒ korean, the 23-pair traditional/simplified probe
    splits chinese_cht from ch. The tier only wins when the doc's CJK
    char count beats the best stopword score."""
    from pdf_table_spark.ops.text import lang_id
    df = _docs(spark, [
        ("ru", "и в не на что я с он как это и в не"),
        ("ar", "في من على أن إلى عن مع هذا هذه التي في من"),
        ("hi", "और के की का है में से को पर यह और के"),
        ("ta", "மற்றும் இது அது நான் அவர் என்று உள்ளது ஒரு"),
        ("te", "మరియు ఇది అది నేను అతను అని ఉంది ఒక"),
        # kana present ⇒ japan even though Han chars dominate
        ("japan", "これは日本語の文書です。漢字と仮名が混在する。"),
        ("korean", "이것은 한국어 문서입니다 감사합니다 안녕하세요"),
        # simplified-only probe chars (国发经实现这…) ⇒ ch
        ("ch", "这是一个中文文档 国家发展经济实现现代化 时间点"),
        # traditional-only probe chars (國發經實現這…) ⇒ chinese_cht
        ("cht", "這是一個中文文檔 國家發展經濟實現現代化 時間點"),
        # five English stopword hits vs one CJK char: stopword tier
        # must keep winning (cjk_total=1 ≤ g=5)
        ("mixed", "the of and to in 中"),
    ])
    out = {r.doc_id: r for r in lang_id(df).collect()}
    for la in ("ru", "ar", "hi", "ta", "te", "japan", "korean"):
        got = out[la].pred_lang
        assert got == la, (la, out[la])
        assert out[la].margin >= 0
    assert out["ch"].pred_lang == "ch"
    assert out["cht"].pred_lang == "chinese_cht"
    assert out["mixed"].pred_lang == "en", out["mixed"]
    # CJK-tier score = CJK char count; margin = lead over the best
    # stopword score (zero stopword hits in the pure-CJK docs)
    assert out["korean"].top_score > 0
    assert out["korean"].top_score == out["korean"].margin


def test_c4_span_dedup_cross_document(spark):
    """C4 three-sentence span dedup: the canonical (smallest doc_id,
    start) occurrence survives; repeated spans elsewhere are dropped
    sentence-by-sentence; short docs pass through untouched."""
    from pdf_table_spark.ops.textfilters import c4_span_dedup
    shared = ("one two three alpha. four five six bravo. "
              "seven eight nine charlie. ")
    df = _docs(spark, [
        ("a", shared + "unique tail delta."),
        ("b", shared + "totally different ending."),
        ("c", "short one. short two."),
        ("d", "x y z. p q r. l m n."),
        ("e", "x y z. p q r. l m n."),      # full copy of d
    ])
    out = {r.doc_id: r for r in c4_span_dedup(df).collect()}
    assert out["a"].n_dropped == 0 and out["a"].n_sentences == 4
    # b loses the shared 3-sentence span, keeps its own ending
    assert out["b"].n_dropped == 3
    assert out["b"].clean_text == "totally different ending"
    assert out["c"].n_dropped == 0 and out["c"].n_sentences == 2
    assert out["d"].n_dropped == 0
    assert out["e"].n_dropped == 3 and out["e"].clean_text == ""
    # totality: one row per input doc
    assert len(out) == 5


def test_corpus_clean_c4_off_keeps_brace_and_lorem_docs(spark):
    """min_sentences <= 0 disables the WHOLE C4 stage, lorem/brace
    sub-gates included — no doc may land in the 'c4' stage and the
    clean text is the input text."""
    from pdf_table_spark.ops.textfilters import corpus_clean
    body = ("the quick brown fox jumps over the lazy dog and then "
            "sits with all of them for a while")
    df = _docs(spark, [
        ("d1", body + " {json: true}"),
        ("d2", body + " lorem ipsum dolor"),
        ("d3", body),
    ])
    out = {r.doc_id: r for r in
           corpus_clean(df, min_words=5, min_stopword_hits=1,
                        min_sentences=0).collect()}
    assert {r.stage for r in out.values()} == {"kept"}
    assert all(r.kept for r in out.values())
    # with min_sentences=3 the same brace/lorem docs DO drop as 'c4'
    gated = {r.doc_id: r.stage for r in
             corpus_clean(df, min_words=5, min_stopword_hits=1,
                          min_sentences=3).collect()}
    assert gated["d1"] == "c4" and gated["d2"] == "c4"
