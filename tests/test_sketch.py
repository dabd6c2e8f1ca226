"""HyperLogLog distinct-count and Misra-Gries heavy hitters (mergeable
sketches; approximate but deterministic)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from kgx.ops.sketch import (approx_distinct, heavy_hitters, hll_estimate,
                            hll_from_values, hll_merge, mg_fold, mg_merge)


class TestHLL:
    def test_estimate_within_error_bound(self):
        vals = [f"item-{i}" for i in range(50_000)]
        est = hll_estimate(hll_from_values(vals, p=12))
        assert abs(est - 50_000) / 50_000 < 0.05  # ~3 sigma at p=12

    def test_merge_equals_union(self):
        a = hll_from_values([f"a{i}" for i in range(1000)])
        b = hll_from_values([f"b{i}" for i in range(1000)])
        both = hll_from_values([f"a{i}" for i in range(1000)] +
                               [f"b{i}" for i in range(1000)])
        assert np.array_equal(hll_merge(a.copy(), b), both)

    def test_deterministic(self):
        v = ["x", "y", "z"] * 10
        assert np.array_equal(hll_from_values(v), hll_from_values(v))

    def test_dataset_op(self, ray_session):
        ds = rd.from_arrow(pa.table({
            "k": pa.array([f"v{i % 500}" for i in range(5000)])}))
        out = approx_distinct(ds, "k")
        est = out["approx_distinct"][0].as_py()
        assert abs(est - 500) / 500 < 0.1


class TestMisraGries:
    def test_heavy_hitter_guarantee(self):
        # value with frequency > n/(k+1) must survive any fold order
        vals = ["hot"] * 400 + [f"cold{i}" for i in range(600)]
        counts = mg_fold({}, vals, k=10)
        assert "hot" in counts

    def test_merge_keeps_heavy(self):
        a = mg_fold({}, ["hot"] * 300 + [f"x{i}" for i in range(100)], 10)
        b = mg_fold({}, ["hot"] * 300 + [f"y{i}" for i in range(100)], 10)
        m = mg_merge(a, b, 10)
        assert m["hot"] >= 400  # lower bound after decrements

    def test_dataset_op(self, ray_session):
        vals = (["alpha"] * 900 + ["beta"] * 500 +
                [f"noise{i}" for i in range(600)])
        ds = rd.from_arrow(pa.table({"k": pa.array(vals)}))
        out = heavy_hitters(ds, "k", k=5).to_pylist()
        assert out[0]["value"] == "alpha"
        assert out[1]["value"] == "beta"
        assert out[0]["min_count"] <= 900  # counts are lower bounds


def test_quantile_sketch_within_rank_tolerance(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.sketch import quantile_sketch
    rng = np.random.default_rng(4)
    vals = np.concatenate([rng.lognormal(0, 1, 20000),
                           rng.normal(100, 5, 5000)])
    ds = rd.from_arrow(pa.table({"value": pa.array(vals, pa.float64())}))
    out = quantile_sketch(ds.repartition(16), "value",
                          ps=(0.1, 0.5, 0.9, 0.99), b=512).to_pandas()
    got = dict(zip(out["p"], out["estimate"]))
    srt = np.sort(vals)
    n = len(srt)
    for p, est in got.items():
        # rank of the estimate must be within ~2*n/b of the true rank
        rank = np.searchsorted(srt, est) / n
        assert abs(rank - p) < 2 * (1 / 512) + 0.01, (p, est, rank)


def test_quantile_sketch_partition_invariant_small_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.sketch import quantile_sketch
    vals = np.arange(100, dtype=np.float64)
    ds = rd.from_arrow(pa.table({"value": pa.array(vals)}))
    # under b points, no compaction happens anywhere -> the exact lower
    # quantile: first value whose cumulative weight reaches p * total
    # (rank 50 of 0..99 -> value 49.0)
    out = quantile_sketch(ds.repartition(7), "value",
                          ps=(0.5,), b=512).to_pandas()
    assert out["estimate"][0] == 49.0


def test_approx_distinct_by_key_error_bound(ray_session):
    """Grouped HLL: every key's estimate lands within ~5% of its exact
    distinct count (p=12 standard error ~1.6%), and merges are
    partition-invariant (two block layouts, identical registers)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.sketch import approx_distinct_by_key

    rng = np.random.default_rng(7)
    keys, vals = [], []
    truth = {}
    for k, n in (("a", 2000), ("b", 500), ("c", 37)):
        ids = rng.integers(0, 10 * n, size=3 * n)
        truth[k] = len(set(ids.tolist()))
        keys.extend([k] * len(ids))
        vals.extend(ids.tolist())
    tbl = pa.table({"k": pa.array(keys, pa.string()),
                    "v": pa.array(vals, pa.int64())})
    out = approx_distinct_by_key(
        rd.from_arrow(tbl), "k", "v").to_pandas().set_index("k")
    for k, exact in truth.items():
        est = out.loc[k, "approx_distinct"]
        assert abs(est - exact) / exact < 0.05, (k, est, exact)
    out2 = approx_distinct_by_key(
        rd.from_arrow(tbl).repartition(7), "k", "v").to_pandas() \
        .set_index("k")
    assert out["approx_distinct"].to_dict() == \
        out2["approx_distinct"].to_dict()


def test_approx_distinct_by_key_null_key(ray_session):
    """A null (None) key must not crash the partial's key ordering
    (raw sorted() raises TypeError on None vs str) and gets its own
    estimate row like any other key."""
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.sketch import approx_distinct_by_key

    tbl = pa.table({
        "k": pa.array(["a", None, "a", None, "b"], pa.string()),
        "v": pa.array([1, 2, 3, 2, 9], pa.int64()),
    })
    out = approx_distinct_by_key(rd.from_arrow(tbl), "k", "v") \
        .to_pandas()
    got = {(None if k != k or k is None else k): int(d)
           for k, d in zip(out["k"], out["approx_distinct"])}
    assert got == {"a": 2, None: 1, "b": 1}


def test_cms_one_sided_error_and_merge_invariance(ray_session):
    """CMS never undercounts, overcounts stay within the e*n/w bound
    with room to spare at the defaults, and the merged estimate is
    partition-invariant (merge is exact addition)."""
    import collections
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.sketch import cms_estimates

    rng = np.random.default_rng(11)
    vals = [f"k{int(v)}" for v in rng.zipf(1.5, size=20000) % 500]
    truth = collections.Counter(vals)
    keys = [k for k, _ in truth.most_common(10)] + ["absent-key"]
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.string())}))
    out = cms_estimates(ds, "v", keys).to_pandas().set_index("value")
    for k in keys:
        est = int(out.loc[k, "est_count"])
        true = truth.get(k, 0)
        assert est >= true, (k, est, true)          # never under
        assert est - true <= 2 * len(vals) / 2048 + 50, (k, est, true)
    out2 = cms_estimates(ds.repartition(9), "v", keys).to_pandas() \
        .set_index("value")
    assert out["est_count"].to_dict() == out2["est_count"].to_dict()
