"""The composed corpus-preparation program — what a 100 TB ingest
actually runs, end to end:

    1. corpus_clean   — exact dedup + Gopher + C4 gates, PII-scrubbed
                        content receipts (``ops.textfilters``);
    2. dedup_corpus   — capped MinHash-LSH near-dedup among the clean
                        survivors only (``ops.dedup``: df-capped
                        shingles, bucket-capped band join, exact
                        Jaccard verify — every scale guard ON);
    3. model gate     — the broadcast-weights quality classifier on
                        what remains (``spark.model_stage``).

One row per input doc with first-failing-stage provenance:
(doc_id, stage, kept, clean_fp) where stage ∈ 'dup' | 'gopher' | 'c4'
| 'neardup' | 'model' | 'kept'. Later stages only ever process earlier
stages' survivors, so the expensive near-dedup shuffles see the
already-thinned corpus.

Scale: corpus_clean is one scan + one shuffle; the near-dedup joins
are banded and capped; the model gate is a narrow Arrow stage.
``ops.dedup.release_caches()`` releases the shingle/signature caches
when the driver moves to another corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..spark.model_stage import score_doc_quality
from . import dedup
from .textfilters import corpus_clean


def prepare_corpus(docs: DataFrame,
                   min_words: int = 50,
                   min_stopword_hits: int = 2,
                   neardup_threshold: float = 0.8,
                   max_df: int = 10_000,
                   max_bucket: int = 10_000,
                   hash_fn: str = "xxhash64",
                   weights_path: str | None = None,
                   line_sep: str = "\\n") -> DataFrame:
    """documents(doc_id, text) → (doc_id, stage, kept, clean_fp)."""
    # the gate columns are evaluated by three consumers (survivor ids,
    # the final provenance join, and transitively every later stage);
    # persist so the window + array-expression work runs once
    cc = corpus_clean(docs, min_words=min_words,
                      min_stopword_hits=min_stopword_hits,
                      line_sep=line_sep).persist()
    dedup._PERSISTED.append(cc)
    clean_ids = cc.filter("kept").select("doc_id")
    # both downstream consumers (near-dedup shingling, model gate)
    # re-read the survivors; persist once so the gate computation runs
    # a single pass over the raw corpus. Registered with the dedup
    # cache registry: one release_caches() call frees the whole
    # program's intermediates.
    survivors = docs.join(clean_ids, "doc_id").persist()
    dedup._PERSISTED.append(survivors)

    nd = dedup.dedup_corpus(survivors, threshold=neardup_threshold,
                            max_df=max_df, max_bucket=max_bucket,
                            hash_fn=hash_fn)
    nd_dropped = (nd["pairs"].select(F.col("doc_b").alias("doc_id"))
                  .distinct().withColumn("nd_drop", F.lit(True)))

    qm = (score_doc_quality(
        survivors.join(nd_dropped.select("doc_id"), "doc_id",
                       "left_anti"),
        weights_path=weights_path).select("doc_id", "pred"))

    stage = (
        F.when(F.col("stage") != "kept", F.col("stage"))
        .when(F.col("nd_drop").isNotNull(), F.lit("neardup"))
        .when(F.col("pred") == "drop", F.lit("model"))
        .otherwise(F.lit("kept"))
    )
    return (
        cc.join(nd_dropped, "doc_id", "left")
        .join(qm, "doc_id", "left")
        .select(
            "doc_id",
            stage.alias("final_stage"),
            (stage == "kept").alias("final_kept"),
            F.when(stage == "kept", F.col("clean_fp")).alias("clean_fp"),
        )
        .withColumnsRenamed({"final_stage": "stage",
                             "final_kept": "kept"})
    )


def assemble_training_set(docs: DataFrame,
                          benchmark: DataFrame | None = None,
                          mixture: dict[str, float] | None = None,
                          source_col: str = "source",
                          split_weights: dict[str, float] | None = None,
                          min_words: int = 50,
                          min_stopword_hits: int = 2,
                          min_sentences: int = 3,
                          neardup_threshold: float = 0.8,
                          max_df: int = 10_000,
                          max_bucket: int = 10_000,
                          hash_fn: str = "xxhash64",
                          ngram_n: int = 13,
                          seed: str = "assemble-v1") -> dict:
    """The training-set ASSEMBLY program — everything between a raw
    corpus and the rows a data loader reads, composed end to end:

      1. clean gates      — exact dedup + Gopher (+ C4 when
                            ``min_sentences`` > 0), via corpus_clean;
      2. cluster dedup    — capped near-dedup + connected components,
                            one canonical doc per duplicate cluster;
      3. decontamination  — drop survivors sharing any ``ngram_n``-gram
                            with ``benchmark`` (skipped when None);
      4. mixture          — per-``source_col`` epoch weights emit
                            (doc_id, copy) rows;
      5. split            — deterministic train/val/test per doc.

    Each stage consumes only the previous stage's survivors (the
    expensive gram joins see the thinned corpus). Returns:

      {"provenance": (doc_id, stage, kept) — first-failing stage per
                     input doc, stage ∈ dup|gopher|c4|neardup|
                     contaminated|kept;
       "assembled":  (doc_id, source, copy, split) — the final rows,
                     repeated per epoch copy, each carrying its split}

    Everything downstream of the gates is a pure function of
    (doc_id, seed): reruns, resumes, and different cluster sizes
    produce identical assignments. Call ``dedup.release_caches()``
    when done.
    """
    from .sampling import resample_mixture, split_corpus
    from .textfilters import decontaminate

    cc = corpus_clean(docs, min_words=min_words,
                      min_sentences=min_sentences,
                      min_stopword_hits=min_stopword_hits).persist()
    dedup._PERSISTED.append(cc)
    survivors = (docs.join(cc.filter("kept").select("doc_id"), "doc_id")
                 .persist())
    dedup._PERSISTED.append(survivors)

    cl = dedup.dedup_corpus_clusters(
        survivors, threshold=neardup_threshold, max_df=max_df,
        max_bucket=max_bucket, hash_fn=hash_fn)
    nd_dropped = (cl["components"]
                  .filter(F.col("doc_id") != F.col("component"))
                  .select("doc_id").withColumn("nd", F.lit(True)))

    after_nd = survivors.join(nd_dropped.select("doc_id"),
                              "doc_id", "left_anti")
    if benchmark is not None:
        cont = (decontaminate(after_nd, benchmark, n=ngram_n)
                ["contaminated"].select("doc_id")
                .withColumn("ct", F.lit(True)))
    else:
        # schema-matched empty frame whatever the doc_id type is
        cont = (docs.select("doc_id").limit(0)
                .withColumn("ct", F.lit(True)))

    stage = (
        F.when(F.col("stage") != "kept", F.col("stage"))
        .when(F.col("nd").isNotNull(), F.lit("neardup"))
        .when(F.col("ct").isNotNull(), F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    provenance = (
        cc.join(nd_dropped, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .select("doc_id", stage.alias("final_stage"),
                (stage == "kept").alias("final_kept"))
        .withColumnsRenamed({"final_stage": "stage",
                             "final_kept": "kept"})
    )

    kept_docs = docs.join(
        provenance.filter("kept").select("doc_id"), "doc_id")
    mixed = resample_mixture(kept_docs, mixture or {},
                             source_col=source_col,
                             seed=f"{seed}-mix")
    split = split_corpus(kept_docs, split_weights,
                         seed=f"{seed}-split")
    assembled = (mixed.select("doc_id", source_col, "copy")
                 .join(split, "doc_id"))
    return {"provenance": provenance, "assembled": assembled}
