"""kgx.ops.quantile: exact distributed quantiles (histogram-refine)."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from kgx.ops.quantile import exact_quantiles


SF = "/root/testdata/sf0.001"


def _collect(ds):
    from kgx.functions.collect import collect_arrow
    return collect_arrow(ds)


def _duck(sql):
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    return con.execute(sql).arrow()


def _sorted(tbl):
    cols = sorted(tbl.column_names)
    rows = [tuple(r[c] for c in cols) for r in tbl.select(cols).to_pylist()]
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


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


def test_value_histogram_matches_sql():
    import __ray_entry__ as entrymod
    from kgx.ops.quantile import value_histogram
    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    got = _collect(value_histogram(ev, "value", width=25.0))
    want = _duck(entrymod.oracle_sql()["events_histogram"])
    assert _sorted(got) == _sorted(want)
    # bins tile the value domain without gaps in the count total
    assert sum(got["n_rows"].to_pylist()) == sum(want["n_rows"].to_pylist())
    assert got.num_rows > 1


def test_value_histogram_negative_and_nan():
    from kgx.ops.quantile import value_histogram
    ds = rd.from_arrow(pa.table({
        "v": pa.array([-0.5, -25.0, 0.0, 24.99, 25.0, float("nan"), None],
                      pa.float64())}))
    out = {r["bin"]: r for r in
           _collect(value_histogram(ds, "v", width=25.0)).to_pylist()}
    assert out[-1]["n_rows"] == 2      # -0.5 and -25.0 both floor to -1
    assert out[0]["n_rows"] == 2       # 0.0, 24.99
    assert out[1]["n_rows"] == 1       # 25.0
    assert sum(r["n_rows"] for r in out.values()) == 5  # nan/null dropped
