"""Tumbling-window aggregation over an event stream table.

Ray Data has no native windowed aggregate; a tumbling window over event
time is (a) a vectorized window-assignment ``map_batches`` (integer
floor-division on the epoch-us view of the timestamp — zero-copy Arrow),
(b) an **in-batch partial aggregate** (pyarrow ``Table.group_by``) so the
shuffle moves one row per (window, key) per block, then (c) a final
``groupby(window, key)`` merge.  This is the partial/combiner pattern the
100 TB path requires: the all-to-all only carries pre-aggregated rows.

Partitioning assumption: none — windows are derived from the row itself.
Late data is a non-issue for batch tables; a streaming deployment would
bound state by watermarking window keys (documented, not implemented).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

US = 1_000_000


def assign_tumbling(batch: pa.Table, *, width_s: int, ts_col: str = "ts"
                    ) -> pa.Table:
    """Add ``window_start`` (timestamp us, floor of ts to the window)."""
    epoch = pc.cast(batch[ts_col], pa.int64())
    width_us = width_s * US
    win = pc.multiply(pc.divide(epoch, width_us), width_us)  # int floor-div
    return batch.append_column(
        "window_start", pc.cast(win, pa.timestamp("us")))


def _partial(batch: pa.Table, width_s: int, key: str, value_col: str
             ) -> pa.Table:
    b = assign_tumbling(batch, width_s=width_s)
    g = (pa.table({
        "window_start": b["window_start"],
        key: b[key],
        "value": b[value_col],
    }).group_by(["window_start", key])
       .aggregate([("value", "sum"), ("value", "count"),
                   ("value", "min"), ("value", "max")]))
    return g


def _finalize(group: pa.Table, key: str) -> pa.Table:
    total = sum(group["value_sum"].to_pylist())
    n = sum(group["value_count"].to_pylist())
    return pa.table({
        "window_start": group["window_start"].slice(0, 1),
        key: group[key].slice(0, 1),
        "n_events": pa.array([n], pa.int64()),
        "sum_value": pa.array([round(total, 2)], pa.float64()),
        "min_value": pa.array([min(group["value_min"].to_pylist())],
                              pa.float64()),
        "max_value": pa.array([max(group["value_max"].to_pylist())],
                              pa.float64()),
    })


def tumbling_window_agg(events_ds, *, width_s: int = 3600,
                        key: str = "event_type", value_col: str = "value"):
    """events -> per (window_start, key): count / sum / min / max."""
    partial = events_ds.map_batches(
        lambda b: _partial(b, width_s, key, value_col),
        batch_format="pyarrow")
    return partial.groupby(["window_start", key]).map_groups(
        lambda g: _finalize(g, key), batch_format="pyarrow")
