"""M1/M4 page-orientation head (`score_page_orientation`): the
PULC text_image_orientation classifier half of the reference's
preprocess task (ocr_table_preprocess_task.py:27-206), re-expressed
as a linear head over where content STARTS in PDF coordinates.

Semantic pins:
- an upright page's first line sits near the top (large y) → rot0
- the fixture generator's own rotation maps (rotate_page_90cw) must
  land in the matching class, i.e. pred_rot == the rotation applied
- no text lines → neutral features → rot0 (tie toward lower class)
- unparseable payloads / first line missing coords → poisoned row:
  scores 0, pred_rot = declared_rot = -1
- .npz artifact path produces identical output to the literal head
"""

import json

import pytest

PAGE_SCHEMA = ("doc_id string, spans array<struct<kind:string,"
               "text:string,media_ref:string,offset:int>>")


def _df(spark, payloads):
    rows = [(f"d{i}", [("pdf_page", p, None, 0)])
            for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, PAGE_SCHEMA)


def _score(spark, payloads):
    from pdf_table_spark.spark.model_stage import score_page_orientation
    out = score_page_orientation(_df(spark, payloads)).collect()
    return {r.doc_id: r for r in out}


UPRIGHT = {
    "width": 612.0, "height": 792.0, "rotation": 0,
    "images": [], "rects": [],
    "text_lines": [
        {"x0": 72.0, "y0": 706.0, "x1": 400.0, "y1": 716.0,
         "text": "Title line", "dir": "h"},
        {"x0": 72.0, "y0": 680.0, "x1": 540.0, "y1": 690.0,
         "text": "body", "dir": "h"},
    ],
}


def test_upright_page_predicts_rot0(spark):
    r = _score(spark, [json.dumps(UPRIGHT)])["d0"]
    assert r.pred_rot == 0 and r.declared_rot == 0
    assert r.score_rot0 == max(r.score_rot0, r.score_rot90,
                               r.score_rot180, r.score_rot270)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_generator_rotation_lands_in_matching_class(spark, k):
    """Applying the fixture generator's own k×90°-cw map to an
    upright page must move the prediction to class k — the geometric
    invariant the head encodes, checked against the SAME point map
    the extraction pipeline (core.page.rotate_page_90cw) uses."""
    from pdf_table_spark.core.page import rotate_page_90cw
    page = dict(UPRIGHT)
    for _ in range(k):
        page = rotate_page_90cw(page)
    page["rotation"] = 90 * k
    r = _score(spark, [json.dumps(page)])["d0"]
    assert r.pred_rot == 90 * k
    assert r.declared_rot == 90 * k


def test_empty_page_neutral_rot0(spark):
    blank = {"width": 612.0, "height": 792.0, "text_lines": []}
    r = _score(spark, [json.dumps(blank)])["d0"]
    # neutral (0, .5, .5) scores rot0 == rot180; argmax ties toward
    # the lower class
    assert r.pred_rot == 0
    assert r.score_rot0 == r.score_rot180


def test_poisoned_payloads_quarantined(spark):
    bad_json = '{"height": 792.0, "text_li'
    no_coords = json.dumps({
        "width": 612.0, "height": 792.0,
        "text_lines": [{"text": "broken"}]})
    out = _score(spark, [bad_json, no_coords])
    for r in out.values():
        assert r.pred_rot == -1 and r.declared_rot == -1
        assert (r.score_rot0, r.score_rot90,
                r.score_rot180, r.score_rot270) == (0.0,) * 4


def test_npz_artifact_matches_literal(spark, tmp_path):
    from pdf_table_spark.spark.model_stage import (
        ORIENT_WEIGHTS, save_weights, score_page_orientation)
    path = str(tmp_path / "orient_v1.npz")
    save_weights(path, ORIENT_WEIGHTS, "page-orient-linear-v1-file")
    from pdf_table_spark.core.page import rotate_page_90cw
    payloads = [json.dumps(UPRIGHT),
                json.dumps(rotate_page_90cw(UPRIGHT))]
    df = _df(spark, payloads)
    lit = {r.doc_id: tuple(r) for r in
           score_page_orientation(df).collect()}
    art = {r.doc_id: tuple(r) for r in
           score_page_orientation(df, weights_path=path).collect()}
    assert lit == art and lit


def test_fixture_corpus_pred_matches_declared(spark, fixture_root):
    """Over the whole sf0.001 interleaved corpus, every page the head
    can read (non-poisoned) must predict exactly its declared
    rotation — the span-level ground truth the generator plants."""
    import os

    from pyspark.sql import functions as F

    from pdf_table_spark.spark.model_stage import score_page_orientation
    docs = spark.read.parquet(os.path.join(
        fixture_root, "sf0.001", "documents_spans.parquet"))
    out = score_page_orientation(docs)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("pred_rot") == -1, 1).otherwise(0))
        .alias("n_poisoned"),
        F.sum(F.when((F.col("pred_rot") != -1) &
                     (F.col("pred_rot") != F.col("declared_rot")), 1)
              .otherwise(0)).alias("n_wrong"),
    ).collect()[0]
    assert agg.n > 50
    assert agg.n_wrong == 0
    assert agg.n_poisoned < agg.n  # poison family is a small minority


def test_single_python_boundary(spark):
    from pdf_table_spark.spark.model_stage import score_page_orientation
    plan = (score_page_orientation(_df(spark, [json.dumps(UPRIGHT)]))
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("MapInArrow") + plan.count("ArrowEvalPython") == 1
