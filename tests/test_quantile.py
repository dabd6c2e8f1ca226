"""kgx.ops.quantile: exact distributed quantiles (histogram-refine)."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from kgx.ops.quantile import exact_quantiles


def _ds(values, parts=4):
    return rd.from_arrow(pa.table({
        "value": pa.array(values, pa.float64())})).repartition(parts)


def _expect(values, p):
    s = np.sort(np.asarray([v for v in values if not np.isnan(v)]))
    return float(s[int(np.floor(p * (len(s) - 1)))])


def test_quantiles_match_numpy_lower(ray_session):
    rng = np.random.default_rng(7)
    vals = rng.normal(size=5000).tolist()
    ps = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    out = exact_quantiles(_ds(vals), "value", ps).to_pandas()
    assert out["p"].tolist() == ps
    for p, v in zip(out["p"], out["value"]):
        assert v == _expect(vals, p)


def test_quantiles_duplicate_heavy(ray_session):
    # 90% of mass at one value -> degenerate bucket still exact
    vals = [5.0] * 900 + list(np.linspace(0, 10, 100))
    out = exact_quantiles(_ds(vals), "value", [0.5, 0.95]).to_pandas()
    assert out["value"].tolist() == [_expect(vals, 0.5),
                                     _expect(vals, 0.95)]


def test_quantiles_all_equal_and_nan(ray_session):
    vals = [3.25] * 50 + [float("nan")] * 10
    out = exact_quantiles(_ds(vals), "value", [0.1, 0.9]).to_pandas()
    assert out["value"].tolist() == [3.25, 3.25]


def test_quantiles_empty(ray_session):
    assert exact_quantiles(_ds([]), "value", [0.5]).num_rows == 0


def test_quantiles_partition_invariant(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.exponential(size=2000).tolist()
    a = exact_quantiles(_ds(vals, parts=2), "value", [0.5, 0.9])
    b = exact_quantiles(_ds(vals, parts=13), "value", [0.5, 0.9])
    assert a.to_pydict() == b.to_pydict()


def test_quantiles_rejects_bad_p(ray_session):
    import pytest
    with pytest.raises(ValueError):
        exact_quantiles(_ds([1.0]), "value", [1.5])
