"""Mergeable sketches: HyperLogLog distinct-count and Misra-Gries heavy
hitters.

Both follow the partial/combiner shape every wide aggregate in this
engine uses: each ``map_batches`` task folds its batch into ONE sketch
row, and a single tiny reduce merges the per-batch sketches — the
all-to-all moves kilobytes regardless of input size.  Both are
deterministic (hash-based, no sampling): the same input always yields
the same estimate, so results are reproducible even though they are
approximate (driver checks are rows-only / tolerance-tested).

The reference has no sketches (SURVEY.md §2.5: "no approximate
aggregates"); these are part of the training-data-pipeline surface where
exact distinct counts over 10^12 rows are a full shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


# ----------------------------------------------------------------------
# HyperLogLog
# ----------------------------------------------------------------------

def _hash64(values: list) -> np.ndarray:
    """uint64 value hashes — md5 low-64 so the DuckDB oracle can mirror
    the full register construction exactly
    (``CAST('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 16) AS UBIGINT)``;
    ``str(v)`` of an int matches the VARCHAR cast)."""
    return np.asarray(
        [int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
         for v in values], dtype=np.uint64)


def hll_from_values(values: list, p: int = 12) -> np.ndarray:
    """Register vector (2^p uint8) from raw values."""
    regs = np.zeros(1 << p, dtype=np.uint8)
    if not values:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # wraps: low bits shifted up
    # rank = leading zeros of the remaining 64-p bits + 1 (capped)
    lz = np.full(len(h), 64 - p, dtype=np.int64)
    nonzero = rest != 0
    # count leading zeros of a uint64 via float64 exponent is lossy; do it
    # exactly with bit length
    bl = np.asarray([int(x).bit_length() for x in rest[nonzero]],
                    dtype=np.int64)
    lz[nonzero] = 64 - bl
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, col: str, *, p: int = 12):
    """Approximate COUNT(DISTINCT col): one sketch row per batch, one
    merge.  Standard error ~= 1.04 / sqrt(2^p) (~1.6% at p=12)."""
    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_from_values(batch[col].to_pylist(), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for blob in b["regs"].to_pylist():
            merged = hll_merge(merged,
                               np.frombuffer(blob, dtype=np.uint8))
    return pa.table({
        "column": pa.array([col], pa.string()),
        "approx_distinct": pa.array([int(round(hll_estimate(merged)))],
                                    pa.int64()),
        "precision_p": pa.array([p], pa.int32()),
    })


def approx_distinct_by_key(ds, key: str, col: str, *, p: int = 12):
    """Per-key approximate COUNT(DISTINCT col) — the GROUPED form of
    :func:`approx_distinct`, the shape production telemetry pipelines
    use for e.g. distinct-users-per-event-type over data too large for
    exact per-key sets.

    Scale shape: each batch folds one HLL register vector PER KEY it
    contains (2^p bytes each — 4 KB at p=12), so the shuffle moves
    (key, registers) rows bounded by keys x blocks, never the value
    column; ``groupby(key)`` merges registers with an elementwise max
    (HLL merges are lossless) and estimates once per key.  Same
    ~1.04/sqrt(2^p) standard error as the global sketch.  Output:
    (key-column, approx_distinct, precision_p), deterministic.
    """
    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_pylist()
        vals = batch[col].to_pylist()
        by: dict = {}
        for k_, v in zip(keys, vals):
            by.setdefault(k_, []).append(v)
        # null-safe, mixed-type-safe ordering (None < everything, then
        # by string form): raw sorted() raises TypeError on None keys
        ks = sorted(by, key=lambda k_: (k_ is not None, str(k_)))
        return pa.table({
            key: pa.array(ks, batch.schema.field(key).type),
            "regs": pa.array([hll_from_values(by[k_], p).tobytes()
                              for k_ in ks], pa.binary()),
        })

    def merge_group(group: pa.Table) -> pa.Table:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for blob in group["regs"].to_pylist():
            merged = hll_merge(merged, np.frombuffer(blob, dtype=np.uint8))
        return pa.table({
            key: group[key].slice(0, 1),
            "approx_distinct": pa.array(
                [int(round(hll_estimate(merged)))], pa.int64()),
            "precision_p": pa.array([p], pa.int32()),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key).map_groups(merge_group, batch_format="pyarrow")


# ----------------------------------------------------------------------
# Misra-Gries heavy hitters
# ----------------------------------------------------------------------

def mg_fold(counts: dict, values: list, k: int) -> dict:
    """Fold values into a Misra-Gries summary of at most k counters."""
    for v in values:
        if v in counts:
            counts[v] += 1
        elif len(counts) < k:
            counts[v] = 1
        else:
            dead = [key for key in counts if counts[key] == 1]
            for key in counts:
                counts[key] -= 1
            for key in dead:
                del counts[key]
    return counts


def mg_merge(a: dict, b: dict, k: int) -> dict:
    """Merge two summaries (counter sum, then decrement to k counters)."""
    for v, c in b.items():
        a[v] = a.get(v, 0) + c
    if len(a) > k:
        # subtract the (len-k)-th largest count and drop non-positives
        cut = sorted(a.values(), reverse=True)[k]
        a = {v: c - cut for v, c in a.items() if c - cut > 0}
    return a


def heavy_hitters(ds, col: str, *, k: int = 20):
    """Approximate top-k frequent values: per-batch Misra-Gries summaries
    merged once.  Guarantees every value with frequency > n/(k+1)
    survives; reported counts are lower bounds.  Output sorted by
    (count desc, value asc)."""
    import json

    def partial(batch: pa.Table) -> pa.Table:
        counts = mg_fold({}, batch[col].to_pylist(), 4 * k)
        return pa.table({
            "summary": pa.array([json.dumps(counts, sort_keys=True,
                                            default=str)], pa.string()),
        })

    merged: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for s in b["summary"].to_pylist():
            merged = mg_merge(merged, json.loads(s), 4 * k)
    top = sorted(merged.items(), key=lambda kv: (-kv[1], str(kv[0])))[:k]
    return pa.table({
        "value": pa.array([str(v) for v, _c in top], pa.string()),
        "min_count": pa.array([c for _v, c in top], pa.int64()),
    })


# ----------------------------------------------------------------------
# Count-min sketch (additively mergeable point-frequency estimates)
# ----------------------------------------------------------------------

_CMS_A = np.uint64(0x9E3779B97F4A7C15)
_CMS_B = np.uint64(0xC2B2AE3D27D4EB4F)


def _cms_positions(h: np.ndarray, d: int, w: int) -> np.ndarray:
    """(rows=d, len(h)) column positions: row r uses the pairwise-
    independent family (h * (A + r) + r * B) mod 2^64 mod w — uint64
    wraparound by design, identical on fold and query sides."""
    rs = np.arange(d, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        mixed = h[None, :] * (_CMS_A + rs) + rs * _CMS_B
    return (mixed % np.uint64(w)).astype(np.int64)


def cms_fold(values: list, *, d: int, w: int) -> np.ndarray:
    """(d, w) int64 count table from raw values."""
    tbl = np.zeros((d, w), dtype=np.int64)
    if not values:
        return tbl
    pos = _cms_positions(_hash64(values), d, w)
    for r in range(d):                        # d rows, vectorized per row
        np.add.at(tbl[r], pos[r], 1)
    return tbl


def cms_estimates(ds, col: str, query_values: list, *, d: int = 4,
                  w: int = 2048):
    """Count-min point-frequency estimates for ``query_values``.

    The mergeable counting complement of Misra-Gries: MG tracks the
    top-k with LOWER-bound counts; CMS answers any point query with an
    UPPER-bound count (never under, over by <= e*n/w with prob
    1 - e^-d).  Scale shape: one (d x w) int64 table per batch — 64 KB
    at the defaults — merged by elementwise ADD driver-side (CMS merge
    is exact addition), so the stream is blocks x 64 KB regardless of
    corpus size.  Deterministic (fixed hash family); approximate:
    rows-only driver check with the error bound pinned in tests.
    Output: (value, est_count, true_at_most_overcount columns d/w).
    """
    def partial(batch: pa.Table) -> pa.Table:
        tbl = cms_fold(batch[col].to_pylist(), d=d, w=w)
        return pa.table({"tbl": pa.array([tbl.tobytes()], pa.binary())})

    merged = np.zeros((d, w), dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for blob in b["tbl"].to_pylist():
            merged += np.frombuffer(blob, dtype=np.int64).reshape(d, w)
    qpos = _cms_positions(_hash64(query_values), d, w)
    ests = merged[np.arange(d)[:, None], qpos].min(axis=0)
    return pa.table({
        "value": pa.array([str(v) for v in query_values], pa.string()),
        "est_count": pa.array(ests, pa.int64()),
        "depth": pa.array([d] * len(query_values), pa.int32()),
        "width": pa.array([w] * len(query_values), pa.int32()),
    })


# ----------------------------------------------------------------------
# Mergeable quantile sketch (uniform-compaction, deterministic)
# ----------------------------------------------------------------------

def _compact(vals: np.ndarray, weights: np.ndarray, b: int
             ) -> tuple[np.ndarray, np.ndarray]:
    """Compact a weighted sample to <= b points, preserving the weighted
    rank structure: points are the weighted quantiles at the b midpoint
    ranks, each carrying total_weight / b.  Deterministic (no sampling);
    one compaction adds at most W/(2b) rank error, so a two-level
    partial->merge pipeline stays within ~W/b."""
    if len(vals) <= b:
        return vals, weights
    order = np.argsort(vals, kind="stable")
    v = vals[order]
    w = weights[order]
    cw = np.cumsum(w)
    total = cw[-1]
    targets = (np.arange(b) + 0.5) * (total / b)
    idx = np.searchsorted(cw, targets, side="left")
    idx = np.minimum(idx, len(v) - 1)
    return v[idx], np.full(b, total / b)


def quantile_sketch(ds, col: str, *, ps: tuple = (0.5, 0.9, 0.99),
                    b: int = 512):
    """Approximate quantiles via a mergeable compaction sketch: each
    batch folds to ONE row of <= b (value, weight) pairs, a single tiny
    reduce merges + recompacts, and the requested quantiles read off the
    weighted CDF.  Rank error ~ n/b after the two levels — tolerance-
    tested; the EXACT path (two narrow passes over the data) is
    ``kgx.ops.quantile.exact_quantiles``.  Output: (p, estimate).
    """
    def partial(batch: pa.Table) -> pa.Table:
        a = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        a = a[~np.isnan(a)]
        v, w = _compact(a, np.ones(len(a)), b)
        return pa.table({
            "vals": pa.array([v.tolist()], pa.list_(pa.float64())),
            "weights": pa.array([w.tolist()], pa.list_(pa.float64())),
        })

    def reduce_all(batch: pa.Table) -> pa.Table:
        v = np.concatenate([np.asarray(x, dtype=np.float64)
                            for x in batch["vals"].to_pylist()])
        w = np.concatenate([np.asarray(x, dtype=np.float64)
                            for x in batch["weights"].to_pylist()])
        v, w = _compact(v, w, b)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cw = np.cumsum(w)
        total = cw[-1] if len(cw) else 0.0
        out_p, out_e = [], []
        for p in ps:
            if total == 0.0:
                continue
            i = int(np.searchsorted(cw, p * total, side="left"))
            out_p.append(float(p))
            out_e.append(float(v[min(i, len(v) - 1)]))
        return pa.table({
            "p": pa.array(out_p, pa.float64()),
            "estimate": pa.array(out_e, pa.float64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(reduce_all, batch_format="pyarrow",
                         batch_size=None))
