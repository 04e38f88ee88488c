"""DSIR-style importance-resampling data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023 — arXiv:2302.03169).

Selects raw-corpus documents that look like a small target corpus by
importance weighting in a hashed n-gram feature space:

  1. features: unigrams + bigrams of the lower/whitespace tokens,
     hashed into ``n_buckets`` buckets (the paper's hashed n-gram
     generative model);
  2. fit: bag-of-buckets multinomials for target (p) and raw (q) with
     add-1 smoothing; per-bucket log ratio  lr[b] = ln p[b] − ln q[b];
  3. score: per raw doc,  logw(x) = Σ_grams lr[bucket(gram)];
  4. select: top-k by logw (the paper's ``top-k`` variant) and/or
     Gumbel-perturbed top-k (the paper's importance *resampling*:
     logw_i + g_i with g_i ~ Gumbel(0,1) draws k docs without
     replacement ∝ softmax(logw)).

Determinism/parity contract (what makes this oracle-exact in both
Spark and DuckDB): the per-bucket log ratio is quantized ONCE to
integer micro-nats  lr_e6[b] = floor(lr[b]·1e6 + 0.5)  and every doc
score is an order-independent BIGINT sum of those — no float
accumulation anywhere, so aggregation order cannot move an ulp. The
Gumbel noise is likewise deterministic (the md5 60-bit doc-hash →
uniform → −ln(−ln(u)), quantized to e6) — retries and reruns select
the identical set. Caveat on cross-engine ``ln``: Spark's is JVM
``Math.log`` while DuckDB/CPython use the platform libm; the e6
quantization absorbs an ulp divergence EXCEPT when the true value
lands exactly on a floor boundary, so the lr_e6/gumbel_e6 bit-parity
is empirical (driver-gate-verified on this box: 0 mismatches in a
20k-point sweep), not guaranteed on every platform. The log ratios
(fit_logratio_e6) sidestep this entirely — they are computed
driver-side in ONE engine (CPython) and shipped as integers to both.

Scale shape (10^12 docs): the fit is one map-side-combinable groupBy
over ≤ ``n_buckets`` keys (a bounded ≤65k-row collect — the same
broadcast-model-to-executors pattern as the IVF centroids and the
.npz model seam); scoring is a NARROW whole-stage-codegen map
(tokenize → hash → integer HOF sum against a constant-folded lookup
array, no Python boundary, no shuffle); selection is a
TakeOrderedAndProject (per-partition top-k, k-row merge — no global
sort). Nothing scales with corpus size except the narrow scan.

Reference scope note: data selection is beyond the pdf_table
reference surface (a PDF-table engine has no training-data tier);
implemented per the brief's LLM-pipeline mandate, following the
published method.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TWO60 = float(1 << 60)


def _tokens_expr(text_col: str) -> str:
    """Lower/whitespace token array (the repo-wide token convention)."""
    return f"filter(split(lower({text_col}), '\\\\s+'), x -> x <> '')"


def _gram_hash(hash_fn: str) -> str:
    """Per-gram 60-bit non-negative hash expression (gram bound as
    ``g``). md5 is the oracle contract (DuckDB twin:
    ``cast('0x' || substr(md5(g), 1, 15) as bigint)``); xxhash64 is
    the production default (one JVM hash vs md5's hex round-trip)."""
    if hash_fn == "md5":
        return ("cast(conv(substring(md5(g), 1, 15), 16, 10) "
                "as bigint)")
    if hash_fn == "xxhash64":
        # shift into [0, 2^60) so % keeps buckets non-negative
        return "abs(xxhash64(g) % 1152921504606846976)"
    raise ValueError(f"unknown hash_fn {hash_fn!r}; md5 | xxhash64")


def _buckets_expr(tokens_col: str, n_buckets: int, hash_fn: str) -> str:
    """array<bigint> of hashed unigram+bigram bucket ids over a
    pre-computed token-array column (duplicates kept — counts
    matter)."""
    t = tokens_col
    # sequence(1, 0) runs DESCENDING — guard docs with < 2 tokens
    bigrams = (f"if(size({t}) < 2, array(), "
               f"transform(sequence(1, size({t}) - 1), "
               f"i -> concat(element_at({t}, i), ' ', "
               f"element_at({t}, i + 1))))")
    return (f"transform(concat({t}, {bigrams}), "
            f"g -> {_gram_hash(hash_fn)} % {int(n_buckets)})")


def _with_buckets(df: DataFrame, text_col: str, n_buckets: int,
                  hash_fn: str, keep: list[str] | None = None,
                  out: str = "_bks") -> DataFrame:
    """select-CHAIN shape, deliberately: ``withColumn`` + ``drop``
    around a multiply-referenced alias lets CollapseProject inline
    the token split 5× into the gram expression (measured 4× slower
    at sf0.1); a select chain keeps each stage evaluated once."""
    keep = keep if keep is not None else df.columns
    return (df
            .select(*keep, F.expr(_tokens_expr(text_col))
                    .alias("_toks"))
            .select(*keep, F.expr(
                _buckets_expr("_toks", n_buckets, hash_fn))
                .alias(out)))


def bucket_counts(df: DataFrame, text_col: str = "text",
                  n_buckets: int = 512,
                  hash_fn: str = "md5") -> tuple[list[int], int]:
    """(dense per-bucket gram counts, total grams). One explode +
    ≤n_buckets-key groupBy (map-side combinable) + bounded collect."""
    if not 2 <= n_buckets <= 65536:
        raise ValueError("n_buckets must be in [2, 65536] — the fit "
                         "is a driver-side collect of that many rows")
    # explode_outer: plain explode makes the optimizer insert a
    # size()>0 pre-filter that re-evaluates the whole gram expression
    # per row (measured ~2× the job)
    rows = (_with_buckets(df, text_col, n_buckets, hash_fn, keep=[])
            .select(F.explode_outer("_bks").alias("bk"))
            .filter(F.col("bk").isNotNull())
            .groupBy("bk").count().collect())
    counts = [0] * n_buckets
    total = 0
    for r in rows:
        counts[r["bk"]] = r["count"]
        total += r["count"]
    return counts, total


def bucket_counts_tagged(docs: DataFrame, target_expr: str,
                         text_col: str = "text", n_buckets: int = 512,
                         hash_fn: str = "md5"
                         ) -> tuple[list[int], int, list[int], int]:
    """Target AND raw per-bucket counts from ONE scan: when both
    sides are predicates over the same table (the common DSIR setup —
    'this source is the target, the rest is raw'), tagging rows with
    the predicate and grouping by (tag, bucket) halves the fit's jobs
    — one scan, one ≤2·n_buckets-key shuffle, one bounded collect
    instead of two of each. Counts are exactly ``bucket_counts`` of
    the two filtered frames. Rows matching neither side are excluded
    by construction (the predicate is boolean, so every row lands in
    target or raw — pre-filter the frame if some rows belong to
    neither)."""
    if not 2 <= n_buckets <= 65536:
        raise ValueError("n_buckets must be in [2, 65536] — the fit "
                         "is a driver-side collect of that many rows")
    tagged = docs.select(F.expr(target_expr).alias("_tgt"),
                         F.col(text_col))
    rows = (_with_buckets(tagged, text_col, n_buckets, hash_fn,
                          keep=["_tgt"])
            .select("_tgt", F.explode_outer("_bks").alias("bk"))
            .filter(F.col("bk").isNotNull())
            .groupBy("_tgt", "bk").count().collect())
    t, r = [0] * n_buckets, [0] * n_buckets
    tt = rr = 0
    for row in rows:
        if row["_tgt"]:
            t[row["bk"]] = row["count"]
            tt += row["count"]
        else:
            r[row["bk"]] = row["count"]
            rr += row["count"]
    return t, tt, r, rr


def _logratio_e6(t, tt, r, rr, n_buckets: int) -> list[int]:
    b = float(n_buckets)
    return [
        math.floor((math.log((t[i] + 1.0) / (tt + b))
                    - math.log((r[i] + 1.0) / (rr + b))) * 1e6 + 0.5)
        for i in range(n_buckets)]


def fit_logratio_e6_tagged(docs: DataFrame, target_expr: str,
                           text_col: str = "text",
                           n_buckets: int = 512,
                           hash_fn: str = "md5") -> list[int]:
    """``fit_logratio_e6`` when target and raw are predicate halves of
    one table: identical integers, one scan/shuffle/collect instead of
    two (see :func:`bucket_counts_tagged`)."""
    t, tt, r, rr = bucket_counts_tagged(docs, target_expr, text_col,
                                        n_buckets, hash_fn)
    return _logratio_e6(t, tt, r, rr, n_buckets)


def fit_logratio_e6(target: DataFrame, raw: DataFrame,
                    text_col: str = "text", n_buckets: int = 512,
                    hash_fn: str = "md5") -> list[int]:
    """Per-bucket quantized log importance ratio, add-1 smoothed:

      lr_e6[b] = floor((ln((t[b]+1)/(T+B)) − ln((r[b]+1)/(R+B)))·1e6
                       + 0.5)

    computed in driver Python on the EXACT integer counts (the oracle
    recomputes the same formula in SQL; the e6 quantization absorbs a
    last-ulp libm divergence unless the true value straddles a floor
    boundary — empirically zero mismatches on this box, see module
    docstring)."""
    t, tt = bucket_counts(target, text_col, n_buckets, hash_fn)
    r, rr = bucket_counts(raw, text_col, n_buckets, hash_fn)
    return _logratio_e6(t, tt, r, rr, n_buckets)


def score_e6(docs: DataFrame, lr_e6: list[int],
             text_col: str = "text", hash_fn: str = "md5",
             out_col: str = "score_e6") -> DataFrame:
    """Adds ``out_col``: the doc's integer micro-nat log importance
    weight — a whole-stage-codegen HOF sum against a constant-folded
    lookup array (no Python boundary, no shuffle, no floats). Docs
    with zero grams (empty/whitespace text) are dropped: they carry
    no evidence either way and the oracle's gram join excludes them.
    """
    # the lookup array rides as a per-ROW column: expressions inside a
    # HOF lambda are not constant-folded, so an inline array literal
    # would be rebuilt per GRAM (measured 0.9 s → 28 s at sf0.1);
    # per-row it is built once per doc and the lambda just indexes it.
    # The zero-gram filter runs on the raw text column BEFORE any
    # aliasing — a filter on a projected alias would be pushed below
    # the projection and re-evaluate the gram chain per row.
    lut = "array(" + ",".join(f"{int(v)}L" for v in lr_e6) + ")"
    cols = docs.columns
    nonempty = docs.filter(
        F.expr(f"size({_tokens_expr(text_col)}) > 0"))
    return (_with_buckets(nonempty, text_col, len(lr_e6), hash_fn,
                          keep=cols)
            .select(*cols, F.col("_bks"), F.expr(lut).alias("_lut"))
            .select(*cols, F.expr(
                "aggregate(_bks, 0L, (acc, b) -> "
                "acc + element_at(_lut, cast(b + 1 as int)))")
                .alias(out_col)))


def score_np(docs: DataFrame, lr_e6: list[int],
             text_col: str = "text", hash_fn: str = "md5",
             out_col: str = "score_e6") -> DataFrame:
    """Vectorized Arrow twin of :func:`score_e6` for LARGE bucket
    counts: the per-row lookup-array trick tops out around B≈1k
    (CreateArray is evaluated per row — at B=65536 that is a 512 KiB
    allocation per doc), so here the bucket arrays are still computed
    JVM-side (narrow, codegen) and ONE ``mapInArrow`` stage does the
    lookup + segmented integer sum in numpy (cumsum-difference over
    the Arrow list offsets — no per-row Python). Output is the
    compact (doc_id, score_e6) frame; join it back if more columns
    are needed. Exactly equal to score_e6 *under the same hash_fn*
    (parity-tested; both default to 'md5' so swapping scorers on
    defaults is score-preserving — pass 'xxhash64' explicitly for the
    cheaper production hash) — integer sums are order-independent."""
    import pyarrow as pa

    lut_vals = lr_e6  # closure-captured; ~0.5 MiB at B=65536
    nonempty = docs.filter(
        F.expr(f"size({_tokens_expr(text_col)}) > 0"))
    bks = _with_buckets(nonempty, text_col, len(lr_e6), hash_fn,
                        keep=["doc_id"])

    def score_batches(batches):
        import numpy as np
        lut = np.asarray(lut_vals, dtype=np.int64)
        for batch in batches:
            col = batch.column(1)
            if isinstance(col, pa.ChunkedArray):  # pragma: no cover
                col = col.combine_chunks()
            flat = lut[col.values.to_numpy(zero_copy_only=False)]
            cs = np.concatenate(([0], np.cumsum(flat)))
            offs = col.offsets.to_numpy(zero_copy_only=False)
            scores = cs[offs[1:]] - cs[offs[:-1]]
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(scores, pa.int64())],
                names=["doc_id", out_col])

    return bks.mapInArrow(
        score_batches,
        schema=f"doc_id {dict(docs.dtypes)['doc_id']}, "
               f"{out_col} bigint")


def gumbel_e6_expr(seed: str = "dsir-v1", key: str = "doc_id") -> str:
    """Deterministic quantized Gumbel(0,1) draw per doc: the md5
    60-bit hash of (key, seed) → u = (h + 0.5)/2^60 ∈ (0,1) →
    floor(−ln(−ln(u))·1e6 + 0.5). Same-libm/quantized like the log
    ratios, so Spark and DuckDB agree bit-for-bit; reruns and retries
    redraw the identical noise."""
    h = (f"cast(conv(substring(md5(concat(cast(`{key}` as string), "
         f"'{seed}')), 1, 15), 16, 10) as bigint)")
    return (f"cast(floor(-ln(-ln(({h} + 0.5d) / {_TWO60!r}d)) * 1e6 "
            f"+ 0.5) as bigint)")


def dsir_select(docs: DataFrame, lr_e6: list[int], k: int,
                text_col: str = "text", hash_fn: str = "md5",
                mode: str = "topk",
                seed: str = "dsir-v1",
                scored: DataFrame | None = None) -> DataFrame:
    """Top-``k`` selection by importance weight. ``mode='topk'``:
    highest logw (the paper's deterministic variant). ``mode=
    'gumbel'``: highest logw + Gumbel noise — a without-replacement
    draw ∝ softmax(logw), the paper's actual resampler — still fully
    deterministic here (hash-derived noise). Ties break on doc_id.

    Returns (doc_id, score_e6, key_e6) where key_e6 is the ranking
    key actually used (== score_e6 for topk). orderBy+limit plans as
    TakeOrderedAndProject — per-partition top-k then a k-row merge,
    no global sort, no single-task window.

    Scorer dispatch: small bucket counts (≤1024) use the pure-SQL
    :func:`score_e6` (whole-stage codegen, zero Python); larger ones
    use the Arrow :func:`score_np` twin — the per-row lookup-array
    trick allocates B int64s PER DOC, which at the assemble default
    B=65536 is 512 KiB/doc and does not scale (a far smaller inline
    array already measured 0.9 s → 28 s at sf0.1). Both scorers are
    bit-equal under the same hash_fn, so the switch is invisible to
    the selection.

    ``scored``: a precomputed (and typically persisted) frame already
    carrying ``score_e6`` — lets a caller running several selection
    modes over the same corpus score it once instead of once per
    mode."""
    if mode not in ("topk", "gumbel"):
        raise ValueError(f"mode must be topk|gumbel, got {mode!r}")
    if scored is None:
        if len(lr_e6) <= 1024:
            scored = score_e6(docs, lr_e6, text_col, hash_fn)
        else:
            scored = score_np(docs, lr_e6, text_col, hash_fn)
    key = (F.col("score_e6") if mode == "topk"
           else F.col("score_e6") + F.expr(gumbel_e6_expr(seed)))
    return (scored
            .select("doc_id", "score_e6", key.alias("key_e6"))
            .orderBy(F.desc("key_e6"), F.asc("doc_id"))
            .limit(int(k)))
