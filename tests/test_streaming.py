"""Watermarked streaming tumbling windows (kgx/ops/streaming.py)."""

import pyarrow as pa
import pytest
import ray.data as rd

from kgx.ops.streaming import (TumblingWindowStream, stream_sharded,
                               stream_tumbling)
from kgx.ops.window import US, tumbling_window_agg


def _batch(rows):
    return pa.table({
        "ts": pa.array([r[0] * US for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([float(r[2]) for r in rows], pa.float64()),
    })


def _as_dict(tbl):
    return {(int(r["window_start"].timestamp()), r["event_type"]):
            (r["n_events"], r["sum_value"], r["min_value"], r["max_value"])
            for r in tbl.to_pylist()}


def test_stream_matches_batch_aggregate_on_events(ray_session):
    ev = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["ts", "event_type", "value"])
    got = stream_tumbling(ev, width_s=3600)
    want = pa.concat_tables(list(
        tumbling_window_agg(ev, width_s=3600)
        .iter_batches(batch_format="pyarrow")))
    assert _as_dict(got) == _as_dict(want)


def test_sharded_streams_match_batch_and_sequential(ray_session):
    """The hosted one-per-shard deployment (groupby(shard).map_groups,
    one TumblingWindowStream per key-hash shard) must equal BOTH the
    sequential single-consumer run and the distributed batch aggregate —
    every (window, key) lives on exactly one shard."""
    ev = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["ts", "event_type", "value"])
    sharded = pa.concat_tables(list(
        stream_sharded(ev, n_shards=4, width_s=3600)
        .iter_batches(batch_format="pyarrow")))
    sequential = stream_tumbling(ev, width_s=3600)
    batch = pa.concat_tables(list(
        tumbling_window_agg(ev, width_s=3600)
        .iter_batches(batch_format="pyarrow")))
    assert _as_dict(sharded) == _as_dict(sequential) == _as_dict(batch)
    # more shards than keys: empty shards never appear, parity holds
    wide = pa.concat_tables(list(
        stream_sharded(ev, n_shards=16, width_s=3600)
        .iter_batches(batch_format="pyarrow")))
    assert _as_dict(wide) == _as_dict(batch)


def test_watermark_closes_windows_incrementally():
    s = TumblingWindowStream(width_s=10, lateness_s=0)
    out1 = s.feed(_batch([(1, "a", 1.0), (5, "a", 2.0)]))
    assert out1.num_rows == 0                 # window [0,10) still open
    out2 = s.feed(_batch([(12, "a", 3.0)]))   # watermark 12 closes [0,10)
    assert _as_dict(out2) == {(0, "a"): (2, 3.0, 1.0, 2.0)}
    rest = s.flush()
    assert _as_dict(rest) == {(10, "a"): (1, 3.0, 3.0, 3.0)}
    assert s.late_rows == 0


def test_lateness_bound_holds_window_open():
    s = TumblingWindowStream(width_s=10, lateness_s=5)
    s.feed(_batch([(1, "a", 1.0)]))
    out = s.feed(_batch([(12, "a", 2.0)]))    # watermark 7 < 10: still open
    assert out.num_rows == 0
    out = s.feed(_batch([(9, "a", 4.0)]))     # late-but-allowed row lands
    assert out.num_rows == 0
    out = s.feed(_batch([(16, "a", 5.0)]))    # watermark 11 >= 10: closes
    assert _as_dict(out) == {(0, "a"): (2, 5.0, 1.0, 4.0)}


def test_too_late_rows_dropped_and_counted():
    # a past window that never closed (it had no rows when the watermark
    # passed) still accepts the late row and emits ONCE at the next close
    # — no data loss, late emission
    s = TumblingWindowStream(width_s=10, lateness_s=0)
    s.feed(_batch([(25, "a", 1.0)]))          # watermark 25, opens [20,30)
    out = s.feed(_batch([(3, "a", 9.0)]))     # merges, then the same
    # feed's eviction pass sees end 10 <= watermark 25 and emits at once
    assert _as_dict(out) == {(0, "a"): (1, 9.0, 9.0, 9.0)}
    out = s.feed(_batch([(40, "a", 2.0)]))    # closes [20,30)
    assert _as_dict(out) == {(20, "a"): (1, 1.0, 1.0, 1.0)}
    assert s.late_rows == 0
    # once a window HAS closed, later rows for it (or anything older)
    # are dropped and counted
    s2 = TumblingWindowStream(width_s=10, lateness_s=0)
    s2.feed(_batch([(1, "a", 1.0)]))
    s2.feed(_batch([(12, "a", 2.0)]))         # closes [0,10)
    s2.feed(_batch([(4, "a", 7.0)]))          # too late: window closed
    assert s2.late_rows == 1
    total = _as_dict(s2.flush())
    assert total == {(10, "a"): (1, 2.0, 2.0, 2.0)}


def test_stream_tumbling_empty_input_returns_empty_table(ray_session):
    """ADVICE r2: an empty events dataset must yield a schema-bearing
    empty table, not a pa.concat_tables([]) ValueError."""
    ev = rd.from_arrow(_batch([]))
    got = stream_tumbling(ev, width_s=3600)
    assert got.num_rows == 0
    assert "window_start" in got.schema.names
