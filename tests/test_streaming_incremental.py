"""Incremental streaming ingest: exactly-once per input file, output
equal to the batch pipeline over the union of all arrivals."""

import os
import shutil

import pyarrow.parquet as pq
import pytest


@pytest.fixture
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    os.makedirs(d["in"])
    return d


def _copy_parts(fixture_root, dst, parts):
    src = os.path.join(fixture_root, "sf0.001", "documents_spans.parquet")
    names = sorted(os.listdir(src))
    for n in names[parts[0]:parts[1]]:
        shutil.copy(os.path.join(src, n), os.path.join(dst, n))


def _read_sorted(path):
    tbl = pq.read_table(path).to_pylist()
    return sorted((r["doc_id"], r["offset"], r["kind"], r["text"],
                   r["media_ref"]) for r in tbl)


def test_incremental_matches_batch_and_is_exactly_once(
        spark, fixture_root, dirs):
    from pdf_table_spark.streaming.incremental import run_incremental

    # wave 1: first half of the corpus files arrives
    _copy_parts(fixture_root, dirs["in"], (0, 4))
    run_incremental(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    wave1 = _read_sorted(dirs["out"])
    assert wave1, "wave 1 produced no rows"

    # re-run with no new files: nothing must be reprocessed
    run_incremental(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    assert _read_sorted(dirs["out"]) == wave1

    # wave 2: the rest arrives; only the delta is processed
    _copy_parts(fixture_root, dirs["in"], (4, 8))
    run_incremental(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    got = _read_sorted(dirs["out"])

    golden = os.path.join(fixture_root, "sf0.001", "golden_flat.parquet")
    assert got == _read_sorted(golden)
