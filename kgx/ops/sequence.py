"""Per-key ordered (window-function) operators.

Ray Data has no SQL window functions; the two shapes a training-data /
analytics pipeline actually needs are:

- :func:`ordered_window` — per-key ``row_number`` / ``lag`` / running
  sum over a deterministic in-key order.  Inherently per-key sequential,
  so it runs as ONE ``groupby(key).map_groups`` shuffle with a fully
  vectorized (numpy lexsort + cumsum) in-group kernel.  PARTITIONING
  ASSUMPTION: one key's rows fit one group (per-user event history —
  the same assumption as sessionization in kgx/ops/window.py; a
  pathological key would need time-sliced sub-keying plus a carry pass).
- :func:`topn_per_key` — per-key top-n by an order column.  The shuffle
  is combined map-side: every batch keeps at most n rows per key it
  contains, so the all-to-all moves <= n rows per (key, block) — never
  the full table — and the final per-key merge re-ranks the survivors.

Running sums are computed in integer cents (``floor(value*100 + 0.5)``)
so the distributed result is bit-identical to the DuckDB window-function
oracle regardless of summation order.

The reference has no window functions (its pipeline is per-document
LLM calls, /root/reference/graphrag_lite_x.py); these are part of the
relational surface a general engine owes its users.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

US = 1_000_000


def _cents(col) -> np.ndarray:
    v = np.asarray(col.to_pylist(), dtype=np.float64)
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


def ordered_window(events_ds, *, key: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id", value_col: str = "value"):
    """Per key, ordered by (ts, id): seq (row_number), gap_s to the
    previous event, prev_value_cents (lag, null on the first row) and
    cum_value_cents (running sum in integer cents).

    Output: (key, id, seq, gap_s, prev_value_cents, cum_value_cents).
    """
    def win(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        ts = pc.cast(group[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = _cents(group[value_col])
        order = np.lexsort((ids, ts))              # ts asc, id asc
        ids, ts, cents = ids[order], ts[order], cents[order]
        n = len(ids)
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = (ts[1:] - ts[:-1]) // US
        prev = np.empty(n, dtype=np.int64)
        prev[1:] = cents[:-1]
        prev_valid = np.ones(n, dtype=bool)
        prev_valid[0] = False
        return pa.table({
            key: group[key].take(pa.array(order, pa.int64())),
            id_col: pa.array(ids, pa.int64()),
            "seq": pa.array(np.arange(1, n + 1), pa.int64()),
            "gap_s": pa.array(gap, pa.int64()),
            "prev_value_cents": pa.array(
                np.where(prev_valid, prev, 0), pa.int64(),
                mask=~prev_valid),
            "cum_value_cents": pa.array(np.cumsum(cents), pa.int64()),
        })

    return events_ds.groupby(key).map_groups(win, batch_format="pyarrow")


def _rank_within(keys: np.ndarray, order_minor: tuple[np.ndarray, ...]
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Sort rows by (key asc, *order_minor) and return (perm, rank) where
    rank restarts at 1 per key.  ``order_minor`` is lexsort-style: LAST
    array is the most-significant sub-key after ``keys``."""
    perm = np.lexsort(order_minor + (keys,))
    sk = keys[perm]
    starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    sizes = np.diff(np.r_[starts, len(sk)])
    rank = np.arange(len(sk)) - np.repeat(starts, sizes) + 1
    return perm, rank


def topn_per_key(ds, *, key: str, order_col: str, id_col: str, n: int = 3,
                 descending: bool = True):
    """Top-n rows per key by ``order_col`` (ties broken by ``id_col``
    asc), with a 1-based ``rk`` column.

    Map-side combiner: each batch emits at most n rows per key it holds,
    so the groupby shuffle carries <= n rows per (key, block).
    Output: (key, id_col, order_col, rk) sorted within key.
    """
    sign = -1.0 if descending else 1.0

    def partial(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key].to_pylist(), dtype=np.int64)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        vals = np.asarray(batch[order_col].to_pylist(), dtype=np.float64)
        perm, rank = _rank_within(keys, (ids, sign * vals))
        keep = perm[rank <= n]
        return batch.take(pa.array(keep, pa.int64())).select(
            [key, id_col, order_col])

    def final(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        vals = np.asarray(group[order_col].to_pylist(), dtype=np.float64)
        order = np.lexsort((ids, sign * vals))[:n]
        return pa.table({
            key: group[key].take(pa.array(order, pa.int64())),
            id_col: pa.array(ids[order], pa.int64()),
            order_col: group[order_col].take(pa.array(order, pa.int64())),
            "rk": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    partial_ds = ds.map_batches(partial, batch_format="pyarrow")
    return partial_ds.groupby(key).map_groups(final, batch_format="pyarrow")


def funnel_steps(events_ds, *, steps: tuple[str, ...] = ("view", "click",
                                                         "purchase"),
                 key: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type"):
    """Ordered funnel: per key, the earliest chain of ``steps`` where
    step i+1 must happen STRICTLY after the chosen step-i timestamp
    (the classic min-chain funnel).  Emits one row per key that reached
    step 1.

    Scale shape: rows of non-step types die in a map-side filter, so the
    single ``groupby(key)`` shuffle carries only (key, ts, step_index) —
    three narrow columns; the per-group chain is a numpy scan.
    Partitioning assumption: one key's step events fit one group.
    Output: (key, step1_ts..stepN_ts [null if unreached], steps_reached).
    """
    step_ix = {s: i for i, s in enumerate(steps)}
    n_steps = len(steps)

    def prefilter(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[type_col].combine_chunks(),
                        value_set=pa.array(list(steps), pa.string()))
        b = batch.filter(mask)
        six = pc.index_in(b[type_col].combine_chunks(),
                          value_set=pa.array(list(steps), pa.string()))
        return pa.table({
            key: b[key],
            "ts_us": pc.cast(b[ts_col], pa.int64()),
            "step_ix": pc.cast(six, pa.int64()),
        })

    def chain(group: pa.Table) -> pa.Table:
        ts = group["ts_us"].to_numpy(zero_copy_only=False)
        six = group["step_ix"].to_numpy(zero_copy_only=False)
        reached: list[int | None] = []
        floor_ts = -(1 << 62)
        for i in range(n_steps):
            cand = ts[(six == i) & (ts > floor_ts)]
            if len(cand) == 0:
                break
            floor_ts = int(cand.min())
            reached.append(floor_ts)
        if not reached:          # never saw step 1
            cols = {key: group[key].slice(0, 0)}
            for i in range(n_steps):
                cols[f"step{i + 1}_ts"] = pa.array([], pa.timestamp("us"))
            cols["steps_reached"] = pa.array([], pa.int64())
            return pa.table(cols)
        cols = {key: group[key].slice(0, 1)}
        for i in range(n_steps):
            v = reached[i] if i < len(reached) else None
            cols[f"step{i + 1}_ts"] = pa.array([v], pa.int64()).cast(
                pa.timestamp("us"))
        cols["steps_reached"] = pa.array([len(reached)], pa.int64())
        return pa.table(cols)

    assert all(s in step_ix for s in steps)
    return (events_ds.map_batches(prefilter, batch_format="pyarrow")
                     .groupby(key)
                     .map_groups(chain, batch_format="pyarrow"))


def json_field_stats(events_ds, *, props_col: str = "props",
                     field: str = "k", key_col: str = "event_type"):
    """Semi-structured extraction + aggregate: pull an integer ``field``
    out of the JSON ``props`` payload (vectorized — polars
    ``str.json_path_match``, never a per-row json.loads loop) and
    aggregate per ``key_col``: event count, sum, min/max, distinct
    values.

    Scale shape: extraction + partial aggregation happen in-batch, so
    the shuffle carries one row per (key, distinct-tracking chunk) —
    distinct values per key ride along as in-batch-deduped narrow rows
    and are counted exactly in the final per-key merge (group size =
    the key's distinct-value count, bounded by the field's cardinality).
    Output: (event_type, n_events, sum_val, min_val, max_val,
    n_distinct_vals).
    """
    import polars as pl

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(pa.table({
            "key": batch[key_col],
            "props": batch[props_col],
        }))
        df = df.with_columns(
            pl.col("props").str.json_path_match(f"$.{field}")
              .cast(pl.Int64).alias("val")).drop("props")
        df = df.filter(pl.col("val").is_not_null())
        agg = df.group_by(["key", "val"]).agg(pl.len().alias("n"))
        out = agg.to_arrow()
        return pa.table({
            "key": out["key"].cast(pa.string()),
            "val": out["val"].cast(pa.int64()),
            "n": out["n"].cast(pa.int64()),
        })

    def finalize(group: pa.Table) -> pa.Table:
        vals = group["val"].to_numpy(zero_copy_only=False)
        ns = group["n"].to_numpy(zero_copy_only=False)
        # the same (key, val) may arrive from many batches
        uniq = np.unique(vals)
        return pa.table({
            "event_type": group["key"].slice(0, 1),
            "n_events": pa.array([int(ns.sum())], pa.int64()),
            "sum_val": pa.array([int((vals * ns).sum())], pa.int64()),
            "min_val": pa.array([int(vals.min())], pa.int64()),
            "max_val": pa.array([int(vals.max())], pa.int64()),
            "n_distinct_vals": pa.array([len(uniq)], pa.int64()),
        })

    return (events_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("key").map_groups(finalize, batch_format="pyarrow"))


def rank_features(events_ds, *, key: str = "user_id",
                  id_col: str = "event_id", value_col: str = "value",
                  tiles: int = 4):
    """Per-key SQL ranking-window family over ``value_col`` descending:
    tie-aware rank -> percent_rank in integer ppm
    (floor((rank-1) * 1e6 / max(n-1, 1)) — identical IEEE double ops on
    both sides), dense_rank, and NTILE(tiles) over the id-tiebroken
    total order (first n % tiles tiles get the extra row, SQL
    semantics).

    Scale shape: ONE narrow groupby(key) shuffle of (key, id,
    value-cents) rows; each group's ranks are a single lexsort +
    run-length arithmetic (no Python row loop).  Per-key groups are
    bounded by events-per-user — the same fits-a-worker assumption
    every ordered-window op here documents.
    Output: (key, id, value_cents, rnk, dense_rnk, prank_ppm, tile).
    """
    def win(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        cents = _cents(group[value_col])
        order = np.lexsort((ids, -cents))          # value desc, id asc
        ids_s, cents_s = ids[order], cents[order]
        n = len(ids_s)
        new = np.r_[True, cents_s[1:] != cents_s[:-1]]
        firsts = np.flatnonzero(new)
        sizes = np.diff(np.r_[firsts, n])
        rnk = np.repeat(firsts + 1, sizes)
        dense = np.cumsum(new)
        prank = np.floor((rnk - 1) * 1000000.0
                         / max(n - 1, 1)).astype(np.int64)
        base, rem = divmod(n, tiles)
        i = np.arange(n)
        cut = rem * (base + 1)
        tile = np.where(i < cut, i // (base + 1),
                        rem + (i - cut) // max(base, 1)) + 1
        return pa.table({
            key: group[key].take(pa.array(order, pa.int64())),
            id_col: pa.array(ids_s, pa.int64()),
            "value_cents": pa.array(cents_s, pa.int64()),
            "rnk": pa.array(rnk, pa.int64()),
            "dense_rnk": pa.array(dense, pa.int64()),
            "prank_ppm": pa.array(prank, pa.int64()),
            "tile": pa.array(tile, pa.int64()),
        })

    return events_ds.groupby(key).map_groups(win, batch_format="pyarrow")
