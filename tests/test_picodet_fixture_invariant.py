"""Fixture-wide PicoDet invariant: the engine's hard-NMS output must
equal the DuckDB twin's group-max-per-(cls, box) reduction on EVERY
planted payload — not just the sf0.01 pages the oracle gate samples.

Round-5 review found 5 sf0.1 pages violating this (zero-area
duplicate pairs whose IoU is 0, and org<input clipping collapsing
distinct tiles onto one degenerate box); the generator now guarantees
positive-area boxes and reserves the clip-exerciser's overlap range,
and this test pins the invariant at the largest committed scale."""

import json
import os

import duckdb
import pytest

import pdf_table_spark.core.picodet as pico

FIXTURE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures")


def _payloads(sf):
    path = os.path.join(FIXTURE_ROOT, f"sf{sf}",
                        "documents_spans.parquet")
    if not os.path.isdir(path):
        pytest.skip(f"fixtures sf{sf} not built")
    rows = duckdb.sql(f"""
        with pages as materialized (
          -- materialized: keeps json_extract from being reordered
          -- ahead of the kind/json_valid filter (same hardening as
          -- the entry oracles)
          select s.text as text from (
            select unnest(spans) as s
            from read_parquet('{path}/*.parquet'))
          where s.kind = 'ocr_page' and json_valid(s.text)
        )
        select text from pages
        where json_extract(text, '$.picodet') is not null
    """).fetchall()
    return [json.loads(t)["picodet"] for (t,) in rows]


def _twin(pd):
    """The SQL twin's semantics in python: every anchor above the 0.5
    gate decodes (center ± bin-mean·stride, clip to org, ÷ scale);
    identical (cls, box) rows collapse to the max score."""
    oh, ow = pd["org_shape"]
    sy, sx = pd["scale_factor"]
    best = {}
    for lv in pd["levels"]:
        st = lv["stride"]
        for a in lv["anchors"]:
            if a["score"] <= 0.5:
                continue
            cx, cy = (a["c"] + 0.5) * st, (a["r"] + 0.5) * st

            def mean(bins):
                return sum(bins) / len(bins)
            x0 = min(max(cx - st * mean(a["bl"]), 0.0), ow) / sx
            y0 = min(max(cy - st * mean(a["bt"]), 0.0), oh) / sy
            x1 = min(max(cx + st * mean(a["br"]), 0.0), ow) / sx
            y1 = min(max(cy + st * mean(a["bb"]), 0.0), oh) / sy
            key = (a["cls"], x0, y0, x1, y1)
            best[key] = max(best.get(key, 0.0), a["score"])
    return {(cls, round(x0, 2), round(y0, 2), round(x1, 2),
             round(y1, 2), round(s, 4))
            for (cls, x0, y0, x1, y1), s in best.items()}


@pytest.mark.parametrize("sf", ["0.01", "0.1"])
def test_engine_nms_equals_twin_groupmax_all_payloads(sf):
    payloads = _payloads(sf)
    assert payloads, "no picodet plants in fixtures"
    for pd in payloads:
        got = {(clsid, round(b[0], 2), round(b[1], 2), round(b[2], 2),
                round(b[3], 2), round(score, 4))
               for _label, clsid, score, b in pico.decode_payload(pd)}
        want = _twin(pd)
        assert got == want, pd
        # every kept box has strictly positive area (the zero-area
        # class of divergence)
        for _cls, x0, y0, x1, y1, _s in got:
            assert x1 > x0 and y1 > y0
