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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

US = 1_000_000


def _value_cents(col, op: str) -> np.ndarray:
    """Convert a value column to exact int64 cents, REJECTING nulls.

    Frame/order aggregates (``moving_frame_agg``, ``first_last_by_key``)
    cannot silently drop null values the way ``mode_by_key`` does — a
    dropped row would shift the frame / change which row is first — and
    letting NaN flow through ``astype(int64)`` yields INT64_MIN garbage
    that silently diverges from the SQL oracle.  So these ops document a
    non-null value precondition and enforce it here with a clear error.
    """
    v = np.asarray(col.to_pylist(), dtype=np.float64)
    if np.isnan(v).any():
        raise ValueError(
            f"{op}: null/NaN in value column — frame/order aggregates "
            "require non-null values (filter upstream or use an op with "
            "SQL null-skipping semantics like mode_by_key)")
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


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


def assign_sliding(batch: pa.Table, *, width_s: int, slide_s: int,
                   ts_col: str = "ts") -> pa.Table:
    """Row -> one output row per overlapping sliding (hopping) window:
    starts s divisible by slide with s <= ts < s + width.  Vectorized
    1->N expansion (window count per row = width/slide)."""
    import numpy as np
    epoch = pc.cast(batch[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
    width_us, slide_us = width_s * US, slide_s * US
    first = ((epoch - width_us) // slide_us + 1) * slide_us
    last = (epoch // slide_us) * slide_us
    counts = ((last - first) // slide_us + 1).astype(np.int64)
    idx = np.repeat(np.arange(len(epoch)), counts)
    # per-row running offset 0..counts-1
    offs = np.arange(counts.sum()) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
    starts = first[idx] + offs * slide_us
    out = batch.take(pa.array(idx, pa.int64()))
    return out.append_column(
        "window_start", pc.cast(pa.array(starts, pa.int64()),
                                pa.timestamp("us")))


def sliding_window_agg(events_ds, *, width_s: int = 3600,
                       slide_s: int = 900, key: str = "event_type",
                       value_col: str = "value"):
    """Hopping-window aggregate: same combiner pattern as tumbling, after
    the vectorized window fan-out (each row lands in width/slide
    windows)."""
    def partial(batch: pa.Table) -> pa.Table:
        b = assign_sliding(batch, width_s=width_s, slide_s=slide_s)
        return (pa.table({
            "window_start": b["window_start"],
            key: b[key],
            "value": b[value_col],
        }).group_by(["window_start", key])
           .aggregate([("value", "sum"), ("value", "count"),
                       ("value", "min"), ("value", "max")]))

    partial_ds = events_ds.map_batches(partial, batch_format="pyarrow")
    return partial_ds.groupby(["window_start", key]).map_groups(
        lambda g: _finalize(g, key), batch_format="pyarrow")


def session_window_agg(events_ds, *, gap_s: int = 1800,
                       user_col: str = "user_id", ts_col: str = "ts",
                       value_col: str = "value"):
    """Session windows: per user, consecutive events closer than ``gap_s``
    form one session.

    Sessionization is inherently per-key sequential, so it runs as
    ``groupby(user).map_groups`` — the shuffle co-locates each user's
    events and the per-group walk is linear.  Partitioning assumption:
    one user's events fit one group (holds at any realistic per-user
    volume; a pathological user would need per-day sub-keying).
    Output: (user_id, session_start, n_events, sum_value, duration_s).
    """
    gap_us = gap_s * US

    def sessions(group: pa.Table) -> pa.Table:
        user = group[user_col][0].as_py()
        ts = pc.cast(group[ts_col], pa.int64()).to_pylist()
        vals = group[value_col].to_pylist()
        order = sorted(range(len(ts)), key=lambda i: ts[i])
        starts, n_col, sum_col, dur_col = [], [], [], []
        s_start = s_last = None
        s_n, s_sum = 0, 0.0
        for i in order:
            if s_start is None or ts[i] - s_last > gap_us:
                if s_start is not None:
                    starts.append(s_start)
                    n_col.append(s_n)
                    sum_col.append(round(s_sum, 2))
                    dur_col.append((s_last - s_start) // US)
                s_start, s_n, s_sum = ts[i], 0, 0.0
            s_last = ts[i]
            s_n += 1
            s_sum += vals[i] or 0.0
        if s_start is not None:
            starts.append(s_start)
            n_col.append(s_n)
            sum_col.append(round(s_sum, 2))
            dur_col.append((s_last - s_start) // US)
        return pa.table({
            "user_id": pa.array([user] * len(starts), pa.int64()),
            "session_start": pc.cast(pa.array(starts, pa.int64()),
                                     pa.timestamp("us")),
            "n_events": pa.array(n_col, pa.int64()),
            "sum_value": pa.array(sum_col, pa.float64()),
            "duration_s": pa.array(dur_col, pa.int64()),
        })

    return events_ds.groupby(user_col).map_groups(
        sessions, batch_format="pyarrow")


DAY_US = 86_400 * US


def cohort_retention(events_ds, *, user_col: str = "user_id",
                     ts_col: str = "ts", bucket_us: int = DAY_US):
    """Classic cohort-retention matrix: cohort(u) = u's first active day,
    and for every later active day the (cohort_day, day_offset) cell
    counts distinct users.  Output: (cohort_day, day_offset, n_users),
    day indices as int64 floor(epoch_us / bucket_us).

    Scale shape — three narrow stages, the event payload never moves:

    1. map-side project-to-(user, day) + in-batch DISTINCT, so the
       first shuffle carries at most one row per user per day per block;
    2. ``groupby(user)`` emits that user's (cohort, offset) rows — group
       size = the user's distinct active days (bounded by the horizon,
       e.g. 365), immune to event-count skew because step 1 already
       collapsed duplicates;
    3. in-batch partial counts + a final (cohort, offset) groupby sum
       over rows bounded by horizon^2 per block.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def user_days(batch: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(batch[ts_col], pa.int64()), bucket_us)
        return pa.table({
            "user_id": batch[user_col],
            "day": day,
        }).group_by(["user_id", "day"]).aggregate([])

    def emit_offsets(group: pa.Table) -> pa.Table:
        d = np.unique(group["day"].to_numpy(zero_copy_only=False))
        cohort = d.min()
        n = len(d)
        return pa.table({
            "cohort_day": pa.array(np.full(n, cohort), pa.int64()),
            "day_offset": pa.array(d - cohort, pa.int64()),
            "one": pa.array(np.ones(n, dtype=np.int64)),
        })

    def partial_count(batch: pa.Table) -> pa.Table:
        return batch.group_by(["cohort_day", "day_offset"]).aggregate(
            [("one", "sum")])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_day": batch["cohort_day"].combine_chunks(),
            "day_offset": batch["day_offset"].combine_chunks(),
            "n_users": batch["sum(one_sum)"].combine_chunks()
                            .cast(pa.int64()),
        })

    return (events_ds.map_batches(user_days, batch_format="pyarrow")
            .groupby("user_id").map_groups(emit_offsets,
                                           batch_format="pyarrow")
            .map_batches(partial_count, batch_format="pyarrow")
            .groupby(["cohort_day", "day_offset"]).aggregate(Sum("one_sum"))
            .map_batches(finish, batch_format="pyarrow"))


def zscore_flags(events_ds, *, value_col: str = "value",
                 key_col: str = "event_type", z_cut: float = 3.0):
    """Per-key anomaly screen: flag events whose value is more than
    ``z_cut`` sample standard deviations from their key's mean.

    Scale shape: ONE streamed pass computes per-key moment partials
    (n, sum, sum-of-squares) in-batch — one narrow row per key per block
    — a tiny groupby folds them, the per-key (mean, std) map broadcasts,
    and the verdict is a second map-side pass.  Moments are exact IEEE
    double sums of the raw float64 values folded in batch-then-key
    order; mean/std round to 6 dp before the comparison so the SQL
    oracle (population variance via n*sumsq - sum^2) agrees at the
    boundary.  Output: (event_id, event_type, value, z_units =
    z-score in 1e-6 units as int64, is_anomaly).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    import numpy as np

    def _clean(batch: pa.Table) -> pa.Table:
        # null/NaN values carry no signal and would poison the moment
        # sums; drop them (the SQL oracle applies the same WHERE)
        v = batch[value_col]
        return batch.filter(pc.and_(pc.is_valid(v),
                                    pc.invert(pc.is_nan(v))))

    def partial(batch: pa.Table) -> pa.Table:
        batch = _clean(batch)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        t = pa.table({
            "key": batch[key_col],
            "s1": pa.array(v, pa.float64()),
            "s2": pa.array(v * v, pa.float64()),
            "n": pa.array([1] * len(v), pa.int64()),
        })
        return t.group_by(["key"]).aggregate(
            [("s1", "sum"), ("s2", "sum"), ("n", "sum")])

    from kgx.functions.collect import collect_arrow
    agg = collect_arrow(
        events_ds.map_batches(partial, batch_format="pyarrow")
                 .groupby("key").aggregate(Sum("s1_sum"), Sum("s2_sum"),
                                           Sum("n_sum")))
    skeys, smeans, sstds = [], [], []
    for r in agg.to_pylist():
        n = r["sum(n_sum)"]
        mean = r["sum(s1_sum)"] / n
        var = max(r["sum(s2_sum)"] / n - mean * mean, 0.0)
        skeys.append(r["key"])
        smeans.append(round(mean, 6))
        sstds.append(round(var ** 0.5, 6))
    sref = ray.put((pa.array(skeys, pa.string()),
                    np.asarray(smeans), np.asarray(sstds)))

    def verdict(batch: pa.Table, _sref=sref) -> pa.Table:
        ks, ms, ss = ray.get(_sref)
        batch = _clean(batch)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        idx = pc.index_in(batch[key_col].combine_chunks(), value_set=ks) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        mean = ms[idx]
        std = ss[idx]
        safe = np.where(std > 0, std, 1.0)
        z = np.round((v - mean) / safe, 6)
        z_units = np.round(z * 1e6).astype(np.int64)
        return pa.table({
            "event_id": batch["event_id"],
            "event_type": batch[key_col],
            "value": batch[value_col],
            "z_units": pa.array(z_units, pa.int64()),
            "is_anomaly": pa.array(np.abs(z) > z_cut, pa.bool_()),
        })

    return events_ds.map_batches(verdict, batch_format="pyarrow")


def lag_deltas(events_ds, *, key: str = "user_id", ts_col: str = "ts"):
    """Per-key LAG(): each event paired with its key's previous event
    (ordered by (ts, event_id)) and the gap in whole seconds — the
    sessionization primitive as a standalone window function (SQL:
    ``lag() OVER (PARTITION BY key ORDER BY ts, event_id)``).

    Scale shape: one narrow groupby(key) shuffle of (key, event_id, ts)
    rows; each group is one lexsort + two array shifts (no per-row
    Python).  First events carry null prev/gap.  Output: (event_id,
    user_id, prev_event_id, gap_s)."""
    import numpy as np

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            key: batch[key],
            "event_id": batch["event_id"],
            "t": pc.cast(batch[ts_col], pa.int64()),
        })

    def per_key(group: pa.Table) -> pa.Table:
        ids = group["event_id"].to_numpy(zero_copy_only=False)
        ts = group["t"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts))
        ids_s, ts_s = ids[order], ts[order]
        prev = np.empty(len(ids_s), dtype=object)
        gap = np.empty(len(ids_s), dtype=object)
        prev[0] = None
        gap[0] = None
        if len(ids_s) > 1:
            prev[1:] = ids_s[:-1]
            gap[1:] = (ts_s[1:] - ts_s[:-1]) // US
        return pa.table({
            "event_id": pa.array(ids_s, pa.int64()),
            key: pa.array(
                np.full(len(ids_s), group[key][0].as_py()), pa.int64()),
            "prev_event_id": pa.array(prev.tolist(), pa.int64()),
            "gap_s": pa.array(gap.tolist(), pa.int64()),
        })

    return events_ds.map_batches(project, batch_format="pyarrow") \
        .groupby(key).map_groups(per_key, batch_format="pyarrow")


def throttle_dedup(events_ds, *, gap_s: int = 604_800,
                   key: str = "user_id", ts_col: str = "ts"):
    """Rate-limit (throttle) dedup: per key, keep an event iff its ts is
    at least ``gap_s`` after the LAST KEPT event; the key's first event
    is always kept.  This is the alerting/notification dedup semantics —
    distinct from gap-SESSIONS (`session_window_agg` keeps one row per
    burst measured from the previous EVENT; throttling measures from the
    previous SURVIVOR, so a slow drizzle of sub-gap events collapses to
    periodic keeps instead of one endless session).

    Scale shape: one narrow groupby(key) shuffle of (key, event_id, ts)
    rows (same per-key-fits-a-group assumption as sessionization); each
    group is a lexsort plus a SEARCHSORTED JUMP WALK — one
    ``np.searchsorted`` per KEPT row, O(kept · log n), never a per-event
    Python loop.  Determinism: order (and tie-break among equal ts) is
    (ts, event_id), the keep test compares ts only — mirrored by the
    SQL oracle's recursive next-survivor CTE.  Output: (user_id,
    event_id, ts) of kept events.
    """
    import numpy as np

    gap_us = gap_s * US

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            key: batch[key],
            "event_id": batch["event_id"],
            "t": pc.cast(batch[ts_col], pa.int64()),
        })

    def per_key(group: pa.Table) -> pa.Table:
        ids = group["event_id"].to_numpy(zero_copy_only=False)
        ts = group["t"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts))
        ids_s, ts_s = ids[order], ts[order]
        kept = []
        i, n = 0, len(ts_s)
        while i < n:
            kept.append(i)
            i = int(np.searchsorted(ts_s, ts_s[i] + gap_us, side="left"))
        kept_idx = np.asarray(kept, dtype=np.int64)
        # replicate the group's key value with its ORIGINAL type (the
        # key may be a string column like event_type, not just int64)
        key_rep = pc.take(group[key].combine_chunks(),
                          pa.array(np.zeros(len(kept_idx), dtype=np.int64),
                                   pa.int64()))
        return pa.table({
            key: key_rep,
            "event_id": pa.array(ids_s[kept_idx], pa.int64()),
            "ts": pc.cast(pa.array(ts_s[kept_idx], pa.int64()),
                          pa.timestamp("us")),
        })

    return events_ds.map_batches(project, batch_format="pyarrow") \
        .groupby(key).map_groups(per_key, batch_format="pyarrow")


def corr_by_key(events_ds, *, key: str = "event_type",
                value_col: str = "value", ts_col: str = "ts"):
    """Per-key Pearson correlation between hour-of-day and value, from
    EXACT integer moment sums.

    All five moments (Σx, Σy, Σxy, Σx², Σy² with x = hour-of-day,
    y = value in integer cents) accumulate as int64 — order-free, so
    the map-side in-batch fold + one narrow groupby(key) is exact; the
    correlation itself is then ONE deterministic double expression over
    those exact integers (floor(1e6·num/√(d₁·d₂)) — identical IEEE ops
    in numpy and the SQL twin), emitted in integer ppm.  The shuffle
    moves one 7-int row per (key, block).
    Output: (key, n, sum_x, sum_y, sum_xy, corr_ppm).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        x = (us // 3_600_000_000) % 24
        y = np.floor(np.asarray(batch[value_col].to_pylist(),
                                dtype=np.float64) * 100.0
                     + 0.5).astype(np.int64)
        t = pa.table({
            key: batch[key],
            "n": pa.array(np.ones(len(x), np.int64)),
            "sx": pa.array(x, pa.int64()),
            "sy": pa.array(y, pa.int64()),
            "sxy": pa.array(x * y, pa.int64()),
            "sx2": pa.array(x * x, pa.int64()),
            "sy2": pa.array(y * y, pa.int64()),
        })
        return t.group_by([key]).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sx2", "sy2")])

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["sum(n_sum)"].to_numpy(zero_copy_only=False)
        sx = batch["sum(sx_sum)"].to_numpy(zero_copy_only=False)
        sy = batch["sum(sy_sum)"].to_numpy(zero_copy_only=False)
        sxy = batch["sum(sxy_sum)"].to_numpy(zero_copy_only=False)
        sx2 = batch["sum(sx2_sum)"].to_numpy(zero_copy_only=False)
        sy2 = batch["sum(sy2_sum)"].to_numpy(zero_copy_only=False)
        num = n * sxy - sx * sy                      # exact int64
        d1 = n * sx2 - sx * sx
        d2 = n * sy2 - sy * sy
        denom = np.sqrt(d1.astype(np.float64) * d2.astype(np.float64))
        safe = np.where(denom > 0.0, denom, 1.0)
        corr = np.where(denom > 0.0,
                        np.floor(num.astype(np.float64) * 1e6 / safe),
                        0.0).astype(np.int64)
        return pa.table({
            key: batch[key].combine_chunks(),
            "n": pa.array(n, pa.int64()),
            "sum_x": pa.array(sx, pa.int64()),
            "sum_y": pa.array(sy, pa.int64()),
            "sum_xy": pa.array(sxy, pa.int64()),
            "corr_ppm": pa.array(corr, pa.int64()),
        })

    return (events_ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key)
            .aggregate(*[Sum(f"{c}_sum")
                         for c in ("n", "sx", "sy", "sxy", "sx2", "sy2")])
            .map_batches(finish, batch_format="pyarrow"))


def window_distinct_users(events_ds, *, width_s: int = 3600,
                          key: str = "event_type",
                          user_col: str = "user_id"):
    """Exact distinct-user counts per (tumbling window, key) — COUNT
    (DISTINCT u) is not a mergeable fold, so it runs as TWO narrow
    stages: (1) per-batch dedupe of (window, key, user) triples (the
    map-side combiner — repeat visits within a batch collapse before
    the shuffle), one groupby over the triples to finish global
    dedup, then (2) an in-group size count.  The all-to-all carries one
    row per DISTINCT (window, key, user) — bounded by active users ×
    windows, not events.  The sketch alternative at unbounded key
    cardinality is the grouped HLL (kgx/ops/sketch.py).
    Output: (window_start, key, n_users).
    """
    def triples(batch: pa.Table) -> pa.Table:
        b = assign_tumbling(batch, width_s=width_s)
        t = pa.table({
            "window_start": b["window_start"],
            key: b[key],
            user_col: b[user_col],
        })
        return t.group_by(["window_start", key, user_col]).aggregate([])

    def finish(group: pa.Table) -> pa.Table:
        users = group[user_col].combine_chunks()
        return pa.table({
            "window_start": group["window_start"].slice(0, 1),
            key: group[key].slice(0, 1),
            "n_users": pa.array([len(pc.unique(users))], pa.int64()),
        })

    return (events_ds.map_batches(triples, batch_format="pyarrow")
            .groupby(["window_start", key])
            .map_groups(finish, batch_format="pyarrow"))


def moving_frame_agg(events_ds, *, key: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     value_col: str = "value", preceding: int = 3):
    """SQL row-frame moving aggregate — ``sum/count OVER (PARTITION BY
    key ORDER BY ts, id ROWS BETWEEN preceding PRECEDING AND CURRENT
    ROW)`` — in exact integer cents.

    Scale shape: ONE narrow groupby(key) shuffle of (key, id, ts,
    value-cents) rows; each group's frame sums come from a single
    lexsort + cumulative-sum difference (``cs[i] - cs[i-k-1]``), no
    Python row loop.  Per-key groups are bounded by events-per-user —
    the same fits-a-worker assumption every ordered-window op here
    documents.  Values must be NON-NULL (enforced — a null would shift
    the frame if dropped, or corrupt the cents cast if kept).
    Output: (key, id, mov_sum_cents, mov_n).
    """
    def win(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        us = pc.cast(group[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        v = _value_cents(group[value_col], "moving_frame_agg")
        order = np.lexsort((ids, us))
        ids_s, v_s = ids[order], v[order]
        cs = np.cumsum(v_s)
        n = len(v_s)
        i = np.arange(n)
        lo = np.maximum(i - preceding, 0)
        mov = cs - np.where(lo > 0, cs[lo - 1], 0)
        return pa.table({
            key: group[key].take(pa.array(order, pa.int64())),
            id_col: pa.array(ids_s, pa.int64()),
            "mov_sum_cents": pa.array(mov, pa.int64()),
            "mov_n": pa.array(i - lo + 1, pa.int64()),
        })

    return events_ds.groupby(key).map_groups(win, batch_format="pyarrow")


def activity_streaks(events_ds, *, key: str = "user_id",
                     ts_col: str = "ts"):
    """Gaps-and-islands: per key, the number of DISTINCT active days
    and the longest run of CONSECUTIVE active days (the SQL
    ``day - row_number() OVER (...)`` grouping trick).

    Scale shape: activity projects map-side to per-batch DISTINCT
    (key, epoch-day) pairs — the pair domain is bounded by
    users x days, not event rows — then ONE narrow groupby(key)
    resolves each key's runs in a single np.unique + diff pass.
    Output: (key, n_days, longest_streak).
    """
    def days(batch: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(batch[ts_col], pa.int64()),
                        86_400_000_000)
        t = pa.table({key: batch[key], "day": day})
        return t.group_by([key, "day"]).aggregate([])

    def fold(group: pa.Table) -> pa.Table:
        d = np.unique(group["day"].to_numpy(zero_copy_only=False))
        breaks = np.flatnonzero(np.r_[True, np.diff(d) != 1])
        runs = np.diff(np.r_[breaks, d.size])
        return pa.table({
            key: group[key].slice(0, 1),
            "n_days": pa.array([d.size], pa.int64()),
            "longest_streak": pa.array([int(runs.max())], pa.int64()),
        })

    return (events_ds.map_batches(days, batch_format="pyarrow")
            .groupby(key).map_groups(fold, batch_format="pyarrow"))


def mode_by_key(events_ds, *, key: str = "event_type",
                value_col: str = "value"):
    """Per-key MODE over the value in integer cents: the most frequent
    value, ties broken toward the SMALLEST value (SQL's ``mode()`` has
    engine-defined ties, so both sides spell the deterministic argmax
    explicitly).  Null/NaN values are ignored.

    Scale shape: map-side per-batch (key, cents) counting bounds the
    shuffle by the DISTINCT value domain per key, not event rows; one
    narrow groupby(key) folds each key's counts in a single lexsort
    pass (count desc, value asc).  Output: (key, mode_cents, n_mode).
    """
    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col].to_pylist(), dtype=np.float64)
        ok = ~np.isnan(v)
        t = pa.table({
            key: batch[key].filter(pa.array(ok)),
            "v": pa.array(np.floor(v[ok] * 100.0 + 0.5)
                          .astype(np.int64), pa.int64()),
        })
        agg = t.group_by([key, "v"]).aggregate([([], "count_all")])
        return pa.table({key: agg[key], "v": agg["v"],
                         "n": agg["count_all"]})

    def fold(group: pa.Table) -> pa.Table:
        v = group["v"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((n, v))          # value asc within count
        v, n = v[order], n[order]
        starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
        tot = np.add.reduceat(n, starts)
        best = np.lexsort((v[starts], -tot))[0]
        return pa.table({
            key: group[key].slice(0, 1),
            "mode_cents": pa.array([int(v[starts][best])], pa.int64()),
            "n_mode": pa.array([int(tot[best])], pa.int64()),
        })

    return (events_ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key).map_groups(fold, batch_format="pyarrow"))


def first_last_by_key(events_ds, *, key: str = "user_id",
                      ts_col: str = "ts", id_col: str = "event_id",
                      value_col: str = "value"):
    """Per-key FIRST_VALUE / LAST_VALUE over the (ts, id)-tiebroken
    total order, in exact integer cents, plus the key's row count.

    Scale shape: each batch folds map-side to AT MOST ONE row per key
    (that batch's first and last candidate + count) via one lexsort +
    group-boundary pick — order rows never shuffle; the final narrow
    groupby(key) re-applies the identical fold to the per-batch
    candidates (min/max over (ts, id) is associative).  Values must be
    NON-NULL (enforced — SQL FIRST/LAST_VALUE would surface the null,
    but the cents cast would corrupt it, so we fail loudly instead).
    The key keeps its ORIGINAL type (string keys like event_type work;
    grouping sorts on dictionary codes, output takes the real values).
    Output: (key, n_events, first_id, first_value_cents, last_id,
    last_value_cents)."""
    def batch_fold(batch: pa.Table, final: bool) -> pa.Table:
        if final:
            ids_f = batch["first_id"].to_numpy(zero_copy_only=False)
            ts_f = batch["first_ts"].to_numpy(zero_copy_only=False)
            c_f = batch["first_value_cents"].to_numpy(
                zero_copy_only=False)
            ids_l = batch["last_id"].to_numpy(zero_copy_only=False)
            ts_l = batch["last_ts"].to_numpy(zero_copy_only=False)
            c_l = batch["last_value_cents"].to_numpy(
                zero_copy_only=False)
            cnt = batch["n_events"].to_numpy(zero_copy_only=False)
        else:
            ids_f = ids_l = np.asarray(batch[id_col].to_pylist(),
                                       dtype=np.int64)
            ts_f = ts_l = pc.cast(batch[ts_col], pa.int64()).to_numpy(
                zero_copy_only=False)
            c_f = c_l = _value_cents(batch[value_col],
                                     "first_last_by_key")
            cnt = np.ones(len(ids_f), np.int64)
        key_arr = batch[key].combine_chunks()
        # group on dictionary codes so any key type (string, int) sorts;
        # the emitted key column takes the ORIGINAL values back out
        keys = pc.dictionary_encode(key_arr).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        o_f = np.lexsort((ids_f, ts_f, keys))
        sk = keys[o_f]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        gid_sizes = np.diff(np.r_[starts, len(sk)])
        f_idx = o_f[starts]
        o_l = np.lexsort((ids_l, ts_l, keys))
        l_idx = o_l[np.r_[starts[1:], len(sk)] - 1]
        gid = np.repeat(np.arange(starts.size), gid_sizes)
        tot = np.zeros(starts.size, np.int64)
        np.add.at(tot, gid, cnt[o_f])
        return pa.table({
            key: pc.take(key_arr, pa.array(f_idx, pa.int64())),
            "n_events": pa.array(tot, pa.int64()),
            "first_ts": pa.array(ts_f[f_idx], pa.int64()),
            "first_id": pa.array(ids_f[f_idx], pa.int64()),
            "first_value_cents": pa.array(c_f[f_idx], pa.int64()),
            "last_ts": pa.array(ts_l[l_idx], pa.int64()),
            "last_id": pa.array(ids_l[l_idx], pa.int64()),
            "last_value_cents": pa.array(c_l[l_idx], pa.int64()),
        })

    def partial(batch: pa.Table) -> pa.Table:
        return batch_fold(batch, final=False)

    def final_fold(group: pa.Table) -> pa.Table:
        out = batch_fold(group, final=True)
        return out.drop_columns(["first_ts", "last_ts"])

    return (events_ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key).map_groups(final_fold, batch_format="pyarrow"))
