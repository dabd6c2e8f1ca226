"""Exact distributed quantiles without a global sort.

``ds.sort`` is an all-to-all over the full column; for a handful of
quantiles that is wasted motion.  This operator computes EXACT discrete
quantiles (the value whose ascending 0-based rank is
``floor(p * (N - 1))`` — mirrored by the DuckDB oracle's
``row_number() - 1``) in three streaming passes, none of which shuffles
anything wider than a fixed-size histogram row per batch:

1. (count, min, max) partials -> fold on the driver.
2. equi-width histogram partials (``np.histogram`` per batch over
   ``n_buckets`` shared bins) -> fold -> locate, for every requested
   rank, the bucket containing it and the count of values below it.
3. one filtered collect of ONLY the located buckets' values; each
   target rank is answered by a partial sort of its bucket.

Driver memory is bounded by the populated-bucket sizes, ~N/n_buckets
per bucket for non-degenerate distributions.  A pathologically skewed
bucket (e.g. 90% of mass at one float value) degrades to collecting
that bucket — still far below N; recursion into sub-buckets would fix
even that but is deliberately left out until a workload needs it.
NaNs are excluded (SQL semantics: NULL/NaN don't participate).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kgx.functions.collect import collect_arrow


def _clean(batch: pa.Table, col: str) -> np.ndarray:
    v = batch[col].combine_chunks().cast(pa.float64()) \
        .to_numpy(zero_copy_only=False)
    return v[~np.isnan(v)]


def exact_quantiles(ds, col: str, ps: list[float], *,
                    n_buckets: int = 4096):
    """-> pyarrow.Table (p, value) for each requested quantile.

    Deterministic for any input order; ``ps`` must be in [0, 1].
    Returns an empty table when the column has no non-NaN values.
    """
    if not all(0.0 <= p <= 1.0 for p in ps):
        raise ValueError("quantile probabilities must be in [0, 1]")

    def stats_partial(batch: pa.Table) -> pa.Table:
        v = _clean(batch, col)
        if len(v) == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "lo": pa.array([np.inf], pa.float64()),
                             "hi": pa.array([-np.inf], pa.float64())})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "lo": pa.array([float(v.min())], pa.float64()),
                         "hi": pa.array([float(v.max())], pa.float64())})

    st = collect_arrow(ds.map_batches(stats_partial,
                                      batch_format="pyarrow"))
    empty = pa.table({"p": pa.array([], pa.float64()),
                      "value": pa.array([], pa.float64())})
    # a zero-block input yields a schema-less empty collect
    if st.num_rows == 0 or "n" not in st.column_names:
        return empty
    n = int(pc.sum(st["n"]).as_py() or 0)
    if n == 0:
        return empty
    lo = float(pc.min(st["lo"]).as_py())
    hi = float(pc.max(st["hi"]).as_py())
    ranks = sorted({math.floor(p * (n - 1)) for p in ps})

    if lo == hi:
        return pa.table({"p": pa.array(list(ps), pa.float64()),
                         "value": pa.array([lo] * len(ps), pa.float64())})

    edges = np.linspace(lo, hi, n_buckets + 1)

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = _clean(batch, col)
        counts, _ = np.histogram(v, bins=edges)
        return pa.table({"b": pa.array(np.arange(n_buckets), pa.int64()),
                         "c": pa.array(counts, pa.int64())})

    hp = collect_arrow(ds.map_batches(hist_partial,
                                      batch_format="pyarrow"))
    counts = np.zeros(n_buckets, dtype=np.int64)
    np.add.at(counts, hp["b"].to_numpy(zero_copy_only=False),
              hp["c"].to_numpy(zero_copy_only=False))
    cum = np.concatenate([[0], np.cumsum(counts)])

    # bucket containing each rank + how many values precede that bucket
    rank_bucket = {
        r: int(np.searchsorted(cum, r, side="right") - 1) for r in ranks}
    wanted = sorted(set(rank_bucket.values()))

    def in_buckets(batch: pa.Table) -> pa.Table:
        v = _clean(batch, col)
        bi = np.minimum(np.searchsorted(edges, v, side="right") - 1,
                        n_buckets - 1)
        keep = np.isin(bi, wanted)
        return pa.table({"v": pa.array(v[keep], pa.float64()),
                         "b": pa.array(bi[keep], pa.int64())})

    got = collect_arrow(ds.map_batches(in_buckets,
                                       batch_format="pyarrow"))
    gv = got["v"].to_numpy(zero_copy_only=False)
    gb = got["b"].to_numpy(zero_copy_only=False)
    by_bucket = {b: np.sort(gv[gb == b]) for b in wanted}

    values = []
    for p in ps:
        r = math.floor(p * (n - 1))
        b = rank_bucket[r]
        values.append(float(by_bucket[b][r - cum[b]]))
    return pa.table({"p": pa.array(list(ps), pa.float64()),
                     "value": pa.array(values, pa.float64())})


def grouped_quantiles(ds, *, key: str, value_col: str,
                      ps: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """Exact per-group discrete quantiles in integer cents.

    Complementary shape to :func:`exact_quantiles`: the global version
    avoids any shuffle because ONE key's values would be the whole
    dataset; per-group, the values partition naturally, so the right
    move is one narrow ``groupby(key)`` shuffle of (key, cents) rows and
    an in-group vectorized sort.  PARTITIONING ASSUMPTION: one group's
    values fit one task (same as sessionization; a degenerate key would
    need the histogram-refine of ``exact_quantiles`` applied per key).

    Quantile definition shared with the SQL oracle: ascending 0-based
    rank ``floor(p * (n - 1))`` (identical IEEE double expression on
    both sides).  Output: (key, n, q50_cents, q90_cents, q99_cents)
    for the default ``ps``.
    """
    names = [f"q{int(p * 100)}_cents" for p in ps]

    def narrow(batch: pa.Table) -> pa.Table:
        vals = batch[value_col].combine_chunks().cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        keep = ~np.isnan(vals)
        cents = np.floor(vals[keep] * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            key: batch[key].filter(pa.array(keep)),
            "cents": pa.array(cents, pa.int64()),
        })

    def qs(group: pa.Table) -> pa.Table:
        c = np.sort(group["cents"].to_numpy(zero_copy_only=False))
        n = len(c)
        cols = {key: group[key].slice(0, 1),
                "n": pa.array([n], pa.int64())}
        for p, name in zip(ps, names):
            cols[name] = pa.array([int(c[math.floor(p * (n - 1))])],
                                  pa.int64())
        return pa.table(cols)

    return ds.map_batches(narrow, batch_format="pyarrow") \
        .groupby(key).map_groups(qs, batch_format="pyarrow")


def value_histogram(ds, col: str, *, width: float = 25.0):
    """Fixed-width histogram of ``col``: one row per occupied bin with
    count and exact integer-cents sum.

    Scale shape: each batch pre-aggregates to (bin, n, sum_cents) rows
    map-side, so the single groupby shuffle moves at most
    n_bins x n_blocks tiny rows regardless of input size.
    bin = floor(value / width) — the identical IEEE-double division the
    DuckDB oracle evaluates.  NaN/null values are dropped (counted
    nowhere), mirroring SQL aggregate semantics.
    Output: (bin, n_rows, sum_value_cents).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = _clean(batch, col)
        bins = np.floor(v / width).astype(np.int64)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        t = pa.table({
            "bin": pa.array(bins, pa.int64()),
            "n": pa.array(np.ones(len(bins), dtype=np.int64)),
            "cents": pa.array(cents, pa.int64()),
        })
        return (t.group_by(["bin"])
                 .aggregate([("n", "sum"), ("cents", "sum")]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("bin").aggregate(Sum("n_sum"), Sum("cents_sum")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bin": batch["bin"].combine_chunks().cast(pa.int64()),
            "n_rows": batch["sum(n_sum)"].combine_chunks()
                           .cast(pa.int64()),
            "sum_value_cents": batch["sum(cents_sum)"].combine_chunks()
                                    .cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
