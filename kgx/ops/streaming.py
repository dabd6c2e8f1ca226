"""Watermarked streaming window aggregation — the bounded-state
STREAMING form of :func:`kgx.ops.window.tumbling_window_agg`.

The batch operators treat the event table as complete; a streaming
deployment sees an unbounded, slightly-out-of-order arrival and must
bound its state.  :class:`TumblingWindowStream` is that form: it folds
arriving batches into per-(window, key) aggregate states, advances an
event-time WATERMARK = max-ts-seen − allowed lateness, EMITS and evicts
every window whose end falls at or before the watermark (no row that
respects the lateness bound can still reach it), and counts+drops rows
arriving after their window closed (no silent loss — the drop counter is
part of the result).  State held is O(open windows × keys), independent
of stream length.

Semantics equal the batch aggregate exactly whenever no row violates the
lateness bound (parity-tested; the driver query ``events_stream`` runs
the stream over time-ordered arrival and hash-matches the batch SQL
oracle).  Placement: the CLASS is a per-consumer sequential sink;
:func:`stream_sharded` demonstrates the hosted one-per-shard deployment
(key-hash partition via ``groupby(shard).map_groups``, one stream per
shard, union == batch aggregate — driver query
``events_stream_sharded``); the distributed whole-table path remains
``tumbling_window_agg``.

The reference has no streaming surface at all; this is the custom-
operator category the brief names ("a streaming window").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from kgx.ops.window import US, _finalize, _partial


class TumblingWindowStream:
    def __init__(self, *, width_s: int = 3600, lateness_s: int = 0,
                 key: str = "event_type", value_col: str = "value"):
        self.width_us = width_s * US
        self.lateness_us = lateness_s * US
        self.key = key
        self.value_col = value_col
        self.width_s = width_s
        self.max_ts = None            # max event ts seen (us)
        self.closed_before = None     # window starts < this are closed
        self.open: dict[tuple, dict] = {}   # (win_us, key) -> agg state
        self.late_rows = 0

    # -- internals --------------------------------------------------------
    def _merge(self, win_us: int, k, row: dict) -> None:
        st = self.open.get((win_us, k))
        if st is None:
            self.open[(win_us, k)] = {
                "sum": row["value_sum"], "n": row["value_count"],
                "min": row["value_min"], "max": row["value_max"]}
        else:
            st["sum"] += row["value_sum"]
            st["n"] += row["value_count"]
            st["min"] = min(st["min"], row["value_min"])
            st["max"] = max(st["max"], row["value_max"])

    def _emit(self, keys: list[tuple]) -> pa.Table:
        rows = []
        for win_us, k in sorted(keys):
            st = self.open.pop((win_us, k))
            rows.append({
                "window_start": win_us, self.key: k,
                "n_events": st["n"],
                "sum_value": round(st["sum"], 2),
                "min_value": st["min"], "max_value": st["max"]})
        return pa.table({
            "window_start": pa.array(
                [r["window_start"] for r in rows],
                pa.int64()).cast(pa.timestamp("us")),
            self.key: pa.array([r[self.key] for r in rows], pa.string()),
            "n_events": pa.array([r["n_events"] for r in rows], pa.int64()),
            "sum_value": pa.array([r["sum_value"] for r in rows],
                                  pa.float64()),
            "min_value": pa.array([r["min_value"] for r in rows],
                                  pa.float64()),
            "max_value": pa.array([r["max_value"] for r in rows],
                                  pa.float64()),
        })

    # -- public API -------------------------------------------------------
    def feed(self, batch: pa.Table) -> pa.Table:
        """Fold one arriving batch; returns the windows this batch's
        watermark advance closed (possibly empty)."""
        part = _partial(batch, self.width_s, self.key, self.value_col)
        part = part.set_column(
            part.column_names.index("window_start"), "window_start",
            pc.cast(part["window_start"], pa.int64()))
        for row in part.to_pylist():
            win_us = row["window_start"]
            if self.closed_before is not None \
                    and win_us < self.closed_before:
                self.late_rows += row["value_count"]   # window already gone
                continue
            self._merge(win_us, row[self.key], row)
        ts_max = pc.max(pc.cast(batch["ts"], pa.int64())).as_py()
        if ts_max is not None:
            self.max_ts = ts_max if self.max_ts is None \
                else max(self.max_ts, ts_max)
        if self.max_ts is None:
            return self._emit([])
        watermark = self.max_ts - self.lateness_us
        # a window [s, s+w) closes when s + w <= watermark
        to_close = [kk for kk in self.open
                    if kk[0] + self.width_us <= watermark]
        self.closed_before = max(
            [self.closed_before or 0]
            + [kk[0] + self.width_us for kk in to_close]) \
            if to_close else self.closed_before
        return self._emit(to_close)

    def flush(self) -> pa.Table:
        """End of stream: emit every still-open window."""
        return self._emit(list(self.open))


def stream_tumbling(events_ds, *, width_s: int = 3600,
                    lateness_s: int = 300, key: str = "event_type",
                    value_col: str = "value"):
    """Drive a :class:`TumblingWindowStream` with the events table in
    event-time order (the arrival a log/queue source would deliver) and
    return the concatenated emissions + final flush as one Arrow table.
    With ordered arrival nothing is late, so the result equals the
    distributed batch aggregate exactly (the driver oracle is the same
    SQL as ``events_window``)."""
    stream = TumblingWindowStream(width_s=width_s, lateness_s=lateness_s,
                                  key=key, value_col=value_col)
    outs = []
    for batch in events_ds.sort("ts").iter_batches(
            batch_size=4096, batch_format="pyarrow"):
        if batch.num_rows:
            outs.append(stream.feed(batch))
    flush = stream.flush()
    outs.append(flush)
    nonempty = [t for t in outs if t.num_rows]
    # Empty stream: every emission has 0 rows; return a schema-bearing
    # empty table instead of letting concat_tables([]) raise.
    return pa.concat_tables(nonempty) if nonempty else flush


def stream_sharded(events_ds, *, n_shards: int = 8, width_s: int = 3600,
                   lateness_s: int = 300, key: str = "event_type",
                   value_col: str = "value", feed_batch: int = 4096):
    """PARALLEL hosting of :class:`TumblingWindowStream` — the deployment
    the class docstring promises: the stream is partitioned by key hash
    into ``n_shards`` consumers, and ``groupby(shard).map_groups`` hosts
    one independent stream instance per shard, each fed its shard's rows
    in event-time order.

    Every (window, key) state lives on exactly one shard, so the union
    of the shards' emissions equals the single-consumer
    :func:`stream_tumbling` run and the distributed batch
    ``tumbling_window_agg`` exactly (parity-tested; the driver query
    ``events_stream_sharded`` hash-matches the same SQL oracle).  Scale
    shape: the shuffle is the key-hash partition a log bus (e.g. a
    partitioned queue) would already provide; per-shard state stays
    O(open windows x keys-in-shard); shards run concurrently as ordinary
    Ray Data groups.  Watermarks advance per shard, which is exactly how
    key-partitioned consumers behave in production."""
    import hashlib

    import numpy as np

    def tag(batch: pa.Table) -> pa.Table:
        ks = batch[key].to_pylist()
        uniq = sorted(set(ks))
        smap = {u: int.from_bytes(
            hashlib.blake2b(str(u).encode(), digest_size=8).digest(),
            "big") % n_shards for u in uniq}
        return batch.append_column(
            "shard", pa.array([smap[x] for x in ks], pa.int64()))

    def run_shard(group: pa.Table) -> pa.Table:
        ts = pc.cast(group["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        g = group.take(pa.array(order, pa.int64())).drop(["shard"])
        stream = TumblingWindowStream(
            width_s=width_s, lateness_s=lateness_s, key=key,
            value_col=value_col)
        outs = []
        for lo in range(0, g.num_rows, feed_batch):
            outs.append(stream.feed(g.slice(lo, feed_batch)))
        flush = stream.flush()
        outs.append(flush)
        nonempty = [t for t in outs if t.num_rows]
        return pa.concat_tables(nonempty) if nonempty else flush

    return events_ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("shard").map_groups(run_shard, batch_format="pyarrow")
