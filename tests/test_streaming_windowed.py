"""Event-time streaming semantics: watermarked windows finalize exactly
once and drop late data; stateful sessionization closes sessions by
gap and by event-time timeout, exactly once across restarts."""

import os
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    os.makedirs(d["in"])
    return d


def _ts(hh, mm):
    return datetime(2026, 1, 1, hh, mm)


def _write_ingest(dst, name, rows):
    tbl = pa.Table.from_pylist(
        [{"doc_id": d, "event_ts": t, "n_spans": n} for d, t, n in rows],
        schema=pa.schema([("doc_id", pa.string()),
                          ("event_ts", pa.timestamp("us")),
                          ("n_spans", pa.int32())]))
    pq.write_table(tbl, os.path.join(dst, name))


def _read_windows(path):
    return sorted(
        (r["window_start"].strftime("%H:%M"), r["n_docs"],
         r["total_spans"])
        for r in pq.read_table(path).to_pylist())


def test_windowed_stats_finalize_and_drop_late(spark, dirs):
    from pdf_table_spark.streaming.windowed import windowed_ingest_stats

    # wave 1: windows 10:00 (2 docs) and 10:20 (1 doc); the 10:41 event
    # pushes the watermark to 10:31, finalizing both
    _write_ingest(dirs["in"], "w1.parquet", [
        ("a", _ts(10, 0), 3), ("b", _ts(10, 5), 5),
        ("c", _ts(10, 25), 7), ("d", _ts(10, 41), 1)])
    windowed_ingest_stats(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    got1 = _read_windows(dirs["out"])
    assert ("10:00", 2, 8) in got1 and ("10:20", 1, 7) in got1
    assert not any(w == "10:40" for w, _, _ in got1)  # not finalized yet

    # wave 2: a LATE event at 10:07 (older than the 10:31 watermark)
    # must NOT reopen the finalized 10:00 window; the 10:55 event
    # advances the watermark past 10:50 and finalizes the 10:40 window
    _write_ingest(dirs["in"], "w2.parquet", [
        ("late", _ts(10, 7), 100), ("e", _ts(10, 55), 2)])
    windowed_ingest_stats(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    got2 = _read_windows(dirs["out"])
    assert ("10:00", 2, 8) in got2          # unchanged: late row dropped
    assert sum(1 for w, _, _ in got2 if w == "10:00") == 1  # exactly once

    # wave 3: the watermark advance from wave 2 (→10:45) takes effect
    # in the next data-bearing batch, which finalizes the 10:40 window;
    # the late 10:07 row still never resurfaces
    _write_ingest(dirs["in"], "w3.parquet", [("f", _ts(11, 30), 4)])
    windowed_ingest_stats(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    got3 = _read_windows(dirs["out"])
    assert ("10:40", 1, 1) in got3          # finalized, late row absent
    assert ("10:00", 2, 8) in got3
    assert sum(1 for w, _, _ in got3 if w == "10:00") == 1


def _write_events(dst, name, rows):
    tbl = pa.Table.from_pylist(
        [{"user_id": u, "ts": t, "event_id": e} for u, t, e in rows],
        schema=pa.schema([("user_id", pa.int64()),
                          ("ts", pa.timestamp("us")),
                          ("event_id", pa.int64())]))
    pq.write_table(tbl, os.path.join(dst, name))


def _read_sessions(path):
    return sorted(
        (r["user_id"], r["session_start"].strftime("%H:%M"),
         r["session_end"].strftime("%H:%M"), r["n_events"])
        for r in pq.read_table(path).to_pylist())


def test_stateful_sessionization_gap_and_timeout(spark, dirs):
    from pdf_table_spark.streaming.windowed import sessionize_stream

    # wave 1: user 1 has a 2-event session (10:00-10:10) closed by the
    # in-batch gap to 11:00; the 11:00 session stays OPEN in state
    _write_events(dirs["in"], "e1.parquet", [
        (1, _ts(10, 0), 1), (1, _ts(10, 10), 2), (1, _ts(11, 0), 3),
        (2, _ts(10, 30), 4)])
    sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    got1 = _read_sessions(dirs["out"])
    assert (1, "10:00", "10:10", 2) in got1
    assert not any(s == "11:00" for _, s, _, _ in got1)  # still open

    # wave 2: watermark jumps to 13:00 → both open sessions time out
    # and are emitted exactly once; the 13:00 event opens a new one
    _write_events(dirs["in"], "e2.parquet", [(1, _ts(13, 0), 5)])
    sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    got2 = _read_sessions(dirs["out"])
    assert (1, "11:00", "11:00", 1) in got2   # closed by timeout
    assert (2, "10:30", "10:30", 1) in got2   # closed by timeout
    assert sum(1 for r in got2 if r == (1, "10:00", "10:10", 2)) == 1

    # wave 3: nothing new for user 1 within the gap → re-run is a no-op
    sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    assert _read_sessions(dirs["out"]) == got2


def test_sessionization_out_of_order_straggler(spark, dirs):
    """A cross-batch in-gap straggler (admitted by a lateness
    allowance) extends the open session but must never regress its
    boundaries — session_end stays the MAX ts so the event-time
    timeout fires at the right moment."""
    from pdf_table_spark.streaming.windowed import sessionize_stream
    wm = "40 minutes"
    _write_events(dirs["in"], "o1.parquet", [
        (9, _ts(10, 20), 1), (9, _ts(10, 0), 2)])
    sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"],
                      watermark=wm)
    # straggler at 10:05 — younger than the watermark (10:20 - 40min),
    # in-gap vs the open session's last=10:20: joins the session
    _write_events(dirs["in"], "o2.parquet", [(9, _ts(10, 5), 3)])
    sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"],
                      watermark=wm)
    # close by timeout via a much later event
    _write_events(dirs["in"], "o3.parquet", [(9, _ts(14, 0), 4)])
    sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"],
                      watermark=wm)
    _write_events(dirs["in"], "o4.parquet", [(9, _ts(18, 0), 5)])
    sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"],
                      watermark=wm)
    got = _read_sessions(dirs["out"])
    assert (9, "10:00", "10:20", 3) in got  # end = MAX ts, straggler in


def test_sessionization_ancient_straggler_is_own_session(spark, dirs):
    """A straggler older than the open session by more than the gap
    must NOT fuse into it (the batch semantics always splits there)."""
    from pdf_table_spark.streaming.windowed import sessionize_stream
    wm = "6 hours"
    _write_events(dirs["in"], "a1.parquet", [(7, _ts(12, 0), 1)])
    sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"],
                      watermark=wm)
    _write_events(dirs["in"], "a2.parquet", [(7, _ts(9, 0), 2)])
    sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"],
                      watermark=wm)
    _write_events(dirs["in"], "a3.parquet", [(7, _ts(23, 0), 3)])
    sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"],
                      watermark=wm)
    _write_events(dirs["in"], "a4.parquet", [(7, _ts(23, 59), 4)])
    sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"],
                      watermark=wm)
    got = _read_sessions(dirs["out"])
    assert (7, "09:00", "09:00", 1) in got   # its own session
    assert (7, "12:00", "12:00", 1) in got   # not fused across 3h


def test_sessionization_straggler_group_is_one_session(spark, dirs):
    """Several ancient stragglers arriving in ONE batch, each within
    the 30-min gap of the next, form ONE session (the batch
    event_sessions semantics) — not one singleton session apiece."""
    from pdf_table_spark.streaming.windowed import sessionize_stream
    wm = "6 hours"
    _write_events(dirs["in"], "g1.parquet", [(5, _ts(14, 0), 1)])
    sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"],
                      watermark=wm)
    # three stragglers, 10 min apart, all > gap before the open 14:00
    # session — one group; plus a fourth > gap earlier than those (but
    # inside the 6h lateness allowance) — its own group
    _write_events(dirs["in"], "g2.parquet", [
        (5, _ts(9, 0), 2), (5, _ts(9, 10), 3), (5, _ts(9, 20), 4),
        (5, _ts(8, 10), 5)])
    sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"],
                      watermark=wm)
    got = _read_sessions(dirs["out"])
    assert (5, "09:00", "09:20", 3) in got   # gap-grouped, not 3 rows
    assert (5, "08:10", "08:10", 1) in got   # separate earlier group
    assert not any(r == (5, "09:00", "09:00", 1) for r in got)
    assert not any(r == (5, "09:10", "09:10", 1) for r in got)


def test_sessionization_non_utc_session_timezone(spark, dirs):
    """The stateful sessionizer must survive (and stay correct under) a
    non-UTC spark.sql.session.timeZone: timestamps reach Python tz-naive
    in the session zone while setTimeoutTimestamp compares against the
    true-UTC watermark — west-of-UTC zones killed the query before the
    UTC pin."""
    from pdf_table_spark.streaming.windowed import sessionize_stream
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        _write_events(dirs["in"], "z1.parquet", [
            (3, _ts(10, 0), 1), (3, _ts(10, 10), 2)])
        sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"])
        # timeout close via a later event — this is where a sub-watermark
        # timeout timestamp would raise before the fix
        _write_events(dirs["in"], "z2.parquet", [(3, _ts(13, 0), 3)])
        sessionize_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"])
        got = _read_sessions(dirs["out"])
        assert (3, "10:00", "10:10", 2) in got
        # context manager restored the caller's timezone
        assert (spark.conf.get("spark.sql.session.timeZone")
                == "America/Los_Angeles")
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
