"""The model seam with REAL file-loaded artifacts: serialized .npz
weights flow driver-load → broadcast → executor-side version-keyed
singleton, with per-worker single materialization across versions."""

import numpy as np
import pytest


@pytest.fixture
def docs(spark, fixture_root):
    import os
    return spark.read.parquet(os.path.join(
        fixture_root, "sf0.001", "documents_spans.parquet"))


def test_npz_artifact_matches_literal_fallback(spark, docs, tmp_path):
    from pdf_table_spark.spark.model_stage import (
        WEIGHTS, save_weights, score_page_layout)
    path = str(tmp_path / "layout_v1.npz")
    save_weights(path, WEIGHTS, "layout-linear-v1-file")
    lit = {(r.doc_id, r.offset): (r.score_table, r.layout_class)
           for r in score_page_layout(docs).collect()}
    art = {(r.doc_id, r.offset): (r.score_table, r.layout_class)
           for r in score_page_layout(docs, weights_path=path).collect()}
    assert lit == art and lit


def test_second_version_changes_scores(spark, docs, tmp_path):
    from pdf_table_spark.spark.model_stage import (
        WEIGHTS, save_weights, score_page_layout)
    v2 = np.asarray(WEIGHTS) * 2.0  # scaled head: argmax preserved,
    path = str(tmp_path / "layout_v2.npz")  # scores doubled
    save_weights(path, v2, "layout-linear-v2")
    base = {(r.doc_id, r.offset): r.score_table
            for r in score_page_layout(docs).collect()}
    scaled = {(r.doc_id, r.offset): r.score_table
              for r in score_page_layout(
                  docs, weights_path=path).collect()}
    assert scaled == {k: pytest.approx(2.0 * v) for k, v in base.items()}


def test_single_materialization_per_worker_across_versions(
        spark, docs, tmp_path):
    """The version-keyed singleton materializes each artifact at most
    once per Python worker, no matter how many tasks run: with reused
    workers, materializations < tasks, and a SECOND pass over the same
    version adds none."""
    from pdf_table_spark.spark.model_stage import (
        WEIGHTS, save_weights, score_page_layout)
    sc = spark.sparkContext
    n_workers = int(spark.conf.get("spark.master")
                    .split("[")[1].rstrip("]").replace("*", "64") or 64)

    path = str(tmp_path / "layout_mat.npz")
    save_weights(path, WEIGHTS, "layout-mat-test-v1")
    counter = sc.accumulator(0)
    df = score_page_layout(docs, weights_path=path,
                           _mat_counter=counter).repartition(16)
    n_tasks = df.rdd.getNumPartitions()
    df.count()
    first = counter.value
    assert 1 <= first <= n_workers < n_tasks

    # same version again: every worker already holds it → no new
    # materializations (workers are reused within the session)
    score_page_layout(docs, weights_path=path,
                      _mat_counter=counter).count()
    assert counter.value == first

    # a DIFFERENT version materializes independently (coexists in the
    # same workers without evicting v1)
    path2 = str(tmp_path / "layout_mat2.npz")
    save_weights(path2, np.asarray(WEIGHTS) * 3.0, "layout-mat-test-v2")
    counter2 = sc.accumulator(0)
    score_page_layout(docs, weights_path=path2,
                      _mat_counter=counter2).count()
    assert 1 <= counter2.value <= n_workers
    # and v1 is STILL warm: another v1 pass adds nothing
    score_page_layout(docs, weights_path=path,
                      _mat_counter=counter).count()
    assert counter.value == first


def test_save_load_roundtrip(tmp_path):
    from pdf_table_spark.spark.model_stage import load_weights, save_weights
    w = [[1.5, -2.0], [0.25, 4.0]]
    path = str(tmp_path / "rt.npz")
    save_weights(path, w, "rt-v9")
    got, version = load_weights(path)
    assert version == "rt-v9"
    assert np.array_equal(got, np.asarray(w))
