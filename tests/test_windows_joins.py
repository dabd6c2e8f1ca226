"""Sliding/session windows and as-of/interval joins (custom temporal
operators; exact semantics unit-tested here, DuckDB-oracle-checked via
the driver)."""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from kgx.ops.joins import asof_join_events, interval_join_events
from kgx.ops.window import session_window_agg, sliding_window_agg

US = 1_000_000
SF = "/root/testdata/sf0.001"


def _events(rows):
    return rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * US for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([float(r[4]) for r in rows], pa.float64()),
    }))


def _collect(ds):
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))


class TestSliding:
    def test_event_lands_in_width_over_slide_windows(self, ray_session):
        ds = _events([(1, 3600, 7, "click", 1.0)])
        out = _collect(sliding_window_agg(ds, width_s=3600, slide_s=900,
                                          key="event_type"))
        # starts 900..3600 step 900 => 4 windows contain ts=3600
        starts = sorted(int(s.timestamp()) for s in
                        out["window_start"].to_pylist())
        assert starts == [900, 1800, 2700, 3600]
        assert out["n_events"].to_pylist() == [1, 1, 1, 1]

    def test_counts_sum_across_windows(self, ray_session):
        ds = _events([(i, 100 * i, 7, "click", 2.0) for i in range(50)])
        out = _collect(sliding_window_agg(ds, width_s=1000, slide_s=500))
        # every event is in exactly 2 windows
        assert sum(out["n_events"].to_pylist()) == 100


class TestSession:
    def test_gap_splits_sessions(self, ray_session):
        ds = _events([
            (1, 0, 7, "click", 1.0), (2, 60, 7, "click", 2.0),
            (3, 5000, 7, "click", 3.0),       # > gap 1800 -> new session
            (4, 10, 8, "click", 4.0),         # other user
        ])
        out = _collect(session_window_agg(ds, gap_s=1800)).to_pylist()
        u7 = sorted([r for r in out if r["user_id"] == 7],
                    key=lambda r: r["session_start"])
        assert [r["n_events"] for r in u7] == [2, 1]
        assert u7[0]["sum_value"] == 3.0
        assert u7[0]["duration_s"] == 60
        assert len([r for r in out if r["user_id"] == 8]) == 1


class TestAsof:
    def test_latest_prior_and_tie_break(self, ray_session):
        ds = _events([
            (10, 100, 7, "view", 1.0),
            (11, 200, 7, "view", 2.0),
            (12, 200, 7, "view", 3.0),        # tie on ts: larger id wins
            (20, 250, 7, "click", 9.0),
            (21, 50, 7, "click", 8.0),        # no prior view -> dropped
            (22, 300, 8, "click", 7.0),       # other user, no views
        ])
        out = _collect(asof_join_events(ds, left_type="click",
                                        right_type="view")).to_pylist()
        assert len(out) == 1
        assert out[0]["event_id"] == 20
        assert out[0]["prior_event_id"] == 12

    def test_equal_ts_matches(self, ray_session):
        ds = _events([(1, 100, 7, "view", 1.0), (2, 100, 7, "click", 2.0)])
        out = _collect(asof_join_events(ds, left_type="click",
                                        right_type="view")).to_pylist()
        assert out[0]["prior_event_id"] == 1


class TestInterval:
    def test_pairs_within_tolerance_only_once(self, ray_session):
        ds = _events([
            (1, 1000, 7, "purchase", 1.0),
            (2, 995, 7, "click", 1.0),        # within 10s
            (3, 1009, 7, "click", 1.0),       # within 10s (bucket edge)
            (4, 2000, 7, "click", 1.0),       # far
            (5, 1001, 8, "click", 1.0),       # other user
        ])
        out = _collect(interval_join_events(
            ds, left_type="purchase", right_type="click",
            tolerance_s=10)).to_pylist()
        pairs = sorted((r["left_event_id"], r["right_event_id"])
                       for r in out)
        assert pairs == [(1, 2), (1, 3)]
        deltas = {r["right_event_id"]: r["delta_s"] for r in out}
        assert deltas == {2: 5, 3: -9}


def _join_sides():
    import pyarrow as pa
    import ray.data as rd
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 3], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d"], pa.string()),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([1, 2, 2, 4], pa.int64()),
        "rv": pa.array([10, 20, 21, 40], pa.int64()),
    }))
    return left, right


def test_hash_equijoin_inner(ray_session):
    from kgx.ops.joins import hash_equijoin
    left, right = _join_sides()
    out = hash_equijoin(left, right, left_on="k", right_on="rk") \
        .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    # k=1: 2 left x 1 right; k=2: 1 left x 2 right; k=3/4: no match
    assert list(out.itertuples(index=False, name=None)) == [
        (1, "a", 10), (1, "b", 10), (2, "c", 20), (2, "c", 21)]


def test_hash_equijoin_left_outer(ray_session):
    import pandas as pd
    from kgx.ops.joins import hash_equijoin
    left, right = _join_sides()
    out = hash_equijoin(left, right, left_on="k", right_on="rk",
                        how="left").to_pandas() \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    assert len(out) == 5                      # 4 matches + 1 miss (k=3)
    miss = out[out["k"] == 3]
    assert miss["lv"].tolist() == ["d"] and pd.isna(miss["rv"]).all()


def test_hash_equijoin_partition_invariant(ray_session):
    from kgx.ops.joins import hash_equijoin
    left, right = _join_sides()
    a = hash_equijoin(left, right, left_on="k", right_on="rk") \
        .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    b = hash_equijoin(left.repartition(4), right.repartition(3),
                      left_on="k", right_on="rk") \
        .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    assert a.equals(b)


def test_hash_equijoin_rejects_collisions_and_bad_how(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from kgx.ops.joins import hash_equijoin
    l = rd.from_arrow(pa.table({"k": [1], "v": [1]}))
    r = rd.from_arrow(pa.table({"rk": [1], "v": [2]}))
    with pytest.raises(ValueError, match="collision"):
        hash_equijoin(l, r, left_on="k", right_on="rk")
    r2 = rd.from_arrow(pa.table({"rk": [1], "w": [2]}))
    with pytest.raises(ValueError, match="how"):
        hash_equijoin(l, r2, left_on="k", right_on="rk", how="cross")


def test_bloom_semijoin_exact_with_tiny_filter():
    """A deliberately tiny (high-false-positive) Bloom bitmap must still
    yield the exact semi-join — the verify pass kills false positives."""
    import ray.data as rd
    from kgx.functions.collect import collect_arrow
    from kgx.ops.joins import bloom_semijoin
    probe = rd.from_arrow(pa.table({
        "k": pa.array(list(range(1000)), pa.int64()),
        "v": pa.array([f"p{i}" for i in range(1000)], pa.string()),
    }))
    build = rd.from_arrow(pa.table({
        "bk": pa.array([3, 500, 999, 12345], pa.int64()),
    }))
    out = collect_arrow(bloom_semijoin(probe, build, probe_on="k",
                                       build_on="bk", m_bits=64,
                                       n_hashes=2))
    assert sorted(out["k"].to_pylist()) == [3, 500, 999]
    assert sorted(out["v"].to_pylist()) == ["p3", "p500", "p999"]


def test_bloom_semijoin_empty_build_side():
    import ray.data as rd
    from kgx.functions.collect import collect_arrow
    from kgx.ops.joins import bloom_semijoin
    probe = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    build = rd.from_arrow(pa.table({"bk": pa.array([], pa.int64())}))
    out = collect_arrow(bloom_semijoin(probe, build,
                                       probe_on="k", build_on="bk"))
    assert out.num_rows == 0


def test_bloom_semijoin_matches_sql():
    import duckdb
    import ray.data as rd
    from kgx.functions.collect import collect_arrow
    from kgx.ops.joins import bloom_semijoin

    def urgent(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))

    orders = rd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(urgent, batch_format="pyarrow")
    items = rd.read_parquet(f"{SF}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber"])
    got = collect_arrow(bloom_semijoin(items, orders, probe_on="l_orderkey",
                                       build_on="o_orderkey"))
    con = duckdb.connect()
    want = con.execute(f"""
        SELECT l_orderkey, l_linenumber
        FROM read_parquet('{SF}/lineitem.parquet')
        WHERE l_orderkey IN (
          SELECT o_orderkey FROM read_parquet('{SF}/orders.parquet')
          WHERE o_orderpriority = '1-URGENT')
    """).arrow()
    assert sorted(zip(got["l_orderkey"].to_pylist(),
                      got["l_linenumber"].to_pylist())) \
        == sorted(zip(want["l_orderkey"].to_pylist(),
                      want["l_linenumber"].to_pylist()))


def test_cohort_retention_small(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.window import DAY_US, cohort_retention
    # users: u1 active days 0,1,3 (two events day 0); u2 days 1,2; u3 day 3
    rows = [(1, 0), (1, 0), (1, 1), (1, 3), (2, 1), (2, 2), (3, 3)]
    tbl = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([d * DAY_US + 17 for _, d in rows],
                       pa.timestamp("us")),
    })
    out = cohort_retention(rd.from_arrow(tbl)).to_pandas()
    got = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for _, r in out.iterrows()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1,
                   (1, 0): 1, (1, 1): 1,
                   (3, 0): 1}


def test_cohort_retention_counts_distinct_users(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.window import DAY_US, cohort_retention
    # 5 users all starting day 2, three of them return day 4
    rows = [(u, 2) for u in range(5)] + [(u, 4) for u in range(3)] \
        + [(0, 4)]                        # duplicate event same day
    tbl = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([d * DAY_US for _, d in rows], pa.timestamp("us")),
    })
    out = cohort_retention(rd.from_arrow(tbl)).to_pandas()
    got = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for _, r in out.iterrows()}
    assert got == {(2, 0): 5, (2, 2): 3}


def test_hash_equijoin_full_outer(ray_session):
    import pandas as pd
    from kgx.ops.joins import hash_equijoin
    left, right = _join_sides()
    out = hash_equijoin(left, right, left_on="k", right_on="rk",
                        how="outer").to_pandas() \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    # 4 matches + left-only k=3 + right-only k=4
    assert len(out) == 6
    miss_l = out[out["k"] == 3]
    assert miss_l["lv"].tolist() == ["d"] and pd.isna(miss_l["rv"]).all()
    miss_r = out[out["k"] == 4]
    assert miss_r["rv"].tolist() == [40] and pd.isna(miss_r["lv"]).all()


def test_hash_equijoin_salted_matches_unsalted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.joins import hash_equijoin
    # one hot key (0) with 300 left x 40 right rows, plus cold keys
    lk = np.concatenate([np.zeros(300, dtype=np.int64),
                         np.arange(1, 51, dtype=np.int64)])
    rk = np.concatenate([np.zeros(40, dtype=np.int64),
                         np.arange(1, 51, dtype=np.int64)])
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk), "lv": pa.array(np.arange(len(lk)))}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array(rk), "rv": pa.array(np.arange(len(rk)) * 10)}))
    base = hash_equijoin(left, right, left_on="k", right_on="rk") \
        .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    salted = hash_equijoin(left.repartition(6), right.repartition(4),
                           left_on="k", right_on="rk",
                           hot_keys=[0], n_salts=8) \
        .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    assert len(base) == 300 * 40 + 50
    assert base.equals(salted)


def test_hash_equijoin_salting_rejects_outer(ray_session):
    import pytest
    from kgx.ops.joins import hash_equijoin
    left, right = _join_sides()
    with pytest.raises(ValueError, match="salting"):
        hash_equijoin(left, right, left_on="k", right_on="rk",
                      how="outer", hot_keys=[1])


def test_hash_equijoin_property_vs_pandas(ray_session):
    import pandas as pd
    import pyarrow as pa
    import random
    import ray.data as rd
    from kgx.ops.joins import hash_equijoin
    rng = random.Random(21)
    for how in ("inner", "left", "outer"):
        for trial in range(3):
            lk = [rng.randint(0, 6) for _ in range(rng.randint(0, 25))]
            rk = [rng.randint(0, 6) for _ in range(rng.randint(0, 25))]
            left = pd.DataFrame({"k": lk, "lv": range(len(lk))})
            right = pd.DataFrame({"rk": rk, "rv": range(len(rk))})
            want = left.merge(right, left_on="k", right_on="rk",
                              how=("outer" if how == "outer" else how))
            if how == "outer":
                want["k"] = want["k"].fillna(want["rk"])
            want = want.drop(columns=["rk"])
            lds = rd.from_arrow(pa.table({
                "k": pa.array(lk, pa.int64()),
                "lv": pa.array(range(len(lk)), pa.int64())}))
            rds = rd.from_arrow(pa.table({
                "rk": pa.array(rk, pa.int64()),
                "rv": pa.array(range(len(rk)), pa.int64())}))
            got = hash_equijoin(lds, rds, left_on="k", right_on="rk",
                                how=how).to_pandas()
            canon = lambda df: sorted(
                tuple("NA" if pd.isna(v) else int(v) for v in r)
                for r in df[["k", "lv", "rv"]].itertuples(index=False))
            assert canon(got) == canon(want), (how, lk, rk)


def test_zscore_flags_planted_outlier(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.window import zscore_flags
    vals = [10.0] * 50 + [10.5] * 50 + [999.0]      # one wild outlier
    types = ["a"] * 101
    tbl = pa.table({
        "event_id": pa.array(range(101), pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
    })
    out = zscore_flags(rd.from_arrow(tbl)).to_pandas() \
        .set_index("event_id")
    assert bool(out.loc[100, "is_anomaly"])
    assert not out.loc[:99, "is_anomaly"].any()
    # nulls/NaNs are dropped, zero-variance keys never flag
    tbl2 = pa.table({
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "event_type": pa.array(["b"] * 3, pa.string()),
        "value": pa.array([5.0, 5.0, None], pa.float64()),
    })
    out2 = zscore_flags(rd.from_arrow(tbl2)).to_pandas()
    assert len(out2) == 2 and not out2["is_anomaly"].any()
    assert (out2["z_units"] == 0).all()


def test_retention_and_zscore_partition_invariant(ray_session):
    import ray.data as rd
    from kgx.ops.window import cohort_retention, zscore_flags
    ev = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type", "value"])
    r1 = cohort_retention(ev).to_pandas() \
        .sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)
    r2 = cohort_retention(ev.repartition(9)).to_pandas() \
        .sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)
    assert r1.equals(r2)
    z1 = zscore_flags(ev).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    z2 = zscore_flags(ev.repartition(9)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert z1.equals(z2)


def test_hash_equijoin_randomized_vs_duckdb(ray_session):
    """Differential fuzz of the bucketed multi-key join against DuckDB
    over random skewed tables, all three join modes, tiny bucket count
    (n_buckets=3) so every bucket group mixes many keys — the exact
    regime the vectorized per-segment fold must get right."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.joins import hash_equijoin

    rng = np.random.default_rng(23)
    for trial in range(3):
        nl, nr = int(rng.integers(5, 120)), int(rng.integers(5, 120))
        lt = pa.table({
            "k": pa.array(rng.integers(0, 15, nl), pa.int64()),
            "lv": pa.array(rng.integers(0, 1000, nl), pa.int64())})
        rt = pa.table({
            "rk": pa.array(rng.integers(0, 15, nr), pa.int64()),
            "rv": pa.array(rng.integers(0, 1000, nr), pa.int64())})
        con = duckdb.connect()
        con.register("l", lt)
        con.register("r", rt)
        for how, sql in (("inner", "JOIN"), ("left", "LEFT JOIN"),
                         ("outer", "FULL OUTER JOIN")):
            got = hash_equijoin(
                rd.from_arrow(lt).repartition(3),
                rd.from_arrow(rt).repartition(2),
                left_on="k", right_on="rk", how=how, n_buckets=3) \
                .to_pandas()
            want = con.sql(
                f"SELECT coalesce(l.k, r.rk) AS k, lv, rv "
                f"FROM l {sql} r ON l.k = r.rk").df()
            key = ["k", "lv", "rv"]
            g = got[key].sort_values(key, na_position="last") \
                .reset_index(drop=True)
            w = want[key].sort_values(key, na_position="last") \
                .reset_index(drop=True)
            assert g.astype("float64").equals(w.astype("float64")), \
                (trial, how, len(g), len(w))


def test_hash_equijoin_null_keys_vs_duckdb(ray_session):
    """Null join keys never match (SQL semantics): inner drops them,
    left outer emits null-key LEFT rows unmatched, full outer emits
    both sides' null-key rows unmatched — fuzzed against DuckDB.
    Regression: null dictionary indices used to NaN-cast to arbitrary
    int64 codes and silently cross-join with each other."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.joins import hash_equijoin

    rng = np.random.default_rng(29)
    for trial in range(2):
        nl, nr = int(rng.integers(10, 80)), int(rng.integers(10, 80))

        def keys(n):
            vals = rng.integers(0, 8, n)
            return [None if rng.random() < 0.25 else int(v) for v in vals]

        lt = pa.table({
            "k": pa.array(keys(nl), pa.int64()),
            "lv": pa.array(rng.integers(0, 100, nl), pa.int64())})
        rt = pa.table({
            "rk": pa.array(keys(nr), pa.int64()),
            "rv": pa.array(rng.integers(0, 100, nr), pa.int64())})
        con = duckdb.connect()
        con.register("l", lt)
        con.register("r", rt)
        for how, sql in (("inner", "JOIN"), ("left", "LEFT JOIN"),
                         ("outer", "FULL OUTER JOIN")):
            got = hash_equijoin(
                rd.from_arrow(lt).repartition(3),
                rd.from_arrow(rt).repartition(2),
                left_on="k", right_on="rk", how=how, n_buckets=3) \
                .to_pandas()
            want = con.sql(
                f"SELECT coalesce(l.k, r.rk) AS k, lv, rv "
                f"FROM l {sql} r ON l.k = r.rk").df()
            key = ["k", "lv", "rv"]
            g = got[key].sort_values(key, na_position="last") \
                .reset_index(drop=True)
            w = want[key].sort_values(key, na_position="last") \
                .reset_index(drop=True)
            assert g.astype("float64").equals(w.astype("float64")), \
                (trial, how, len(g), len(w))


def test_moving_frame_agg_ties_and_frame(ray_session):
    """Row-frame semantics: the frame is ROWS (not RANGE) with the
    id-tiebroken order, truncated at the partition start."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.window import moving_frame_agg

    ts = pa.array([1_000_000] * 3 + [2_000_000, 3_000_000],
                  pa.timestamp("us"))
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([7] * 5, pa.int64()),
        "event_id": pa.array([3, 1, 2, 4, 5], pa.int64()),
        "ts": ts,
        "value": pa.array([0.30, 0.10, 0.20, 0.40, 0.50], pa.float64()),
    }))
    out = moving_frame_agg(ev, preceding=2).to_pandas() \
        .sort_values("event_id")
    # order by (ts, id): ids 1,2,3 share ts -> id order; cents 10,20,30
    assert out["mov_sum_cents"].tolist() == [10, 30, 60, 90, 120]
    assert out["mov_n"].tolist() == [1, 2, 3, 3, 3]


def test_activity_streaks_gaps(ray_session):
    """Consecutive-day runs split on any gap; duplicate events inside a
    day collapse; day boundaries are UTC epoch days."""
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.window import activity_streaks

    day = 86_400_000_000
    us = [0, 10, day, 2 * day, 4 * day,          # u1: d0,d0,d1,d2 | d4
          7 * day, 9 * day]                      # u2: d7 | d9
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array(us, pa.timestamp("us")),
    }))
    out = activity_streaks(ev).to_pandas().set_index("user_id")
    assert out.loc[1, "n_days"] == 4
    assert out.loc[1, "longest_streak"] == 3
    assert out.loc[2, "n_days"] == 2
    assert out.loc[2, "longest_streak"] == 1


def test_mode_by_key_tiebreak(ray_session):
    """Equal counts resolve to the SMALLEST value; NaN rows are
    ignored; counts accumulate across batches."""
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.window import mode_by_key

    ev = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 5 + ["b"] * 3, pa.string()),
        "value": pa.array([2.0, 2.0, 1.0, 1.0, float("nan"),
                           5.0, 5.0, 4.0], pa.float64()),
    })).repartition(4)
    out = mode_by_key(ev).to_pandas().set_index("event_type")
    assert out.loc["a", "mode_cents"] == 100      # tie 2x100 vs 2x200
    assert out.loc["a", "n_mode"] == 2
    assert out.loc["b", "mode_cents"] == 500
    assert out.loc["b", "n_mode"] == 2


def test_first_last_by_key_cross_batch(ray_session):
    """First/last resolve over the (ts, id) total order across many
    partitions; ties on ts break by id; counts accumulate."""
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.window import first_last_by_key

    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_id": pa.array([5, 2, 9, 1, 3], pa.int64()),
        "ts": pa.array([100, 100, 50, 7, 7], pa.timestamp("us")),
        "value": pa.array([0.5, 0.2, 0.9, 0.1, 0.3], pa.float64()),
    })).repartition(5)
    out = first_last_by_key(ev).to_pandas().set_index("user_id")
    # u1 order: (50,9), (100,2), (100,5) -> first id 9, last id 5
    assert out.loc[1, "first_id"] == 9
    assert out.loc[1, "first_value_cents"] == 90
    assert out.loc[1, "last_id"] == 5
    assert out.loc[1, "last_value_cents"] == 50
    assert out.loc[1, "n_events"] == 3
    assert out.loc[2, "first_id"] == 1 and out.loc[2, "last_id"] == 3


def test_hash_equijoin_auto_hot_keys(ray_session):
    """hot_keys='auto' detects a key holding >1/16 of the left rows,
    and the salted output is identical to the unsalted join."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.joins import detect_hot_keys, hash_equijoin

    n = 4000
    keys = np.where(np.arange(n) % 2 == 0, 7,
                    np.arange(n) % 50 + 100).astype(np.int64)
    left = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "lv": pa.array(np.arange(n), pa.int64()),
    })).repartition(8)
    right = rd.from_arrow(pa.table({
        "rk": pa.array([7, 100, 101, 999], pa.int64()),
        "rv": pa.array([70, 1000, 1010, 9990], pa.int64()),
    }))

    hot = detect_hot_keys(left.select_columns(["k"]), "k")
    assert hot == [7]

    base = hash_equijoin(left, right, left_on="k", right_on="rk") \
        .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    auto = hash_equijoin(left, right, left_on="k", right_on="rk",
                         hot_keys="auto") \
        .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    assert base.equals(auto)
    assert (auto["k"] == 7).sum() == 2000      # hot key fully joined

    # uniform keys -> nothing detected, plain plan
    uni = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(n) % 100, pa.int64()),
        "lv": pa.array(np.arange(n), pa.int64()),
    }))
    assert detect_hot_keys(uni.select_columns(["k"]), "k") == []


class TestThrottle:
    def test_survivor_chain_not_session_chain(self, ray_session):
        from kgx.ops.window import throttle_dedup
        # drizzle every 5s with gap 6: sessions would keep only t=0;
        # throttle keeps t=0,10,20 (measured from the last SURVIVOR)
        rows = [(i, 5 * i, 1, "view", 1.0) for i in range(5)]
        out = _collect(throttle_dedup(_events(rows), gap_s=6)).to_pydict()
        assert out["event_id"] == [0, 2, 4]

    def test_first_kept_and_tie_breaks_on_event_id(self, ray_session):
        from kgx.ops.window import throttle_dedup
        # two events share ts=0: lower event_id survives; ts=7 clears gap
        rows = [(9, 0, 1, "a", 1.0), (3, 0, 1, "a", 1.0),
                (5, 7, 1, "a", 1.0), (6, 9, 1, "a", 1.0)]
        out = _collect(throttle_dedup(_events(rows), gap_s=7)).to_pydict()
        assert out["event_id"] == [3, 5]

    def test_per_key_independent_and_partition_invariant(self,
                                                         ray_session):
        from kgx.ops.window import throttle_dedup
        rows = ([(i, 3 * i, 1, "a", 1.0) for i in range(20)]
                + [(100 + i, 17 * i, 2, "b", 1.0) for i in range(20)])
        a = _collect(throttle_dedup(_events(rows), gap_s=10)) \
            .sort_by([("user_id", "ascending"), ("ts", "ascending")])
        b = _collect(throttle_dedup(_events(rows).repartition(7),
                                    gap_s=10)) \
            .sort_by([("user_id", "ascending"), ("ts", "ascending")])
        assert a.equals(b)
        # brute per-key reference
        for uid in (1, 2):
            evs = sorted((r[1], r[0]) for r in rows if r[2] == uid)
            kept, last = [], None
            for t, eid in evs:
                if last is None or t >= last + 10:
                    kept.append(eid)
                    last = t
            got = [e for u, e in zip(a["user_id"].to_pylist(),
                                     a["event_id"].to_pylist()) if u == uid]
            assert got == kept

    def test_string_key_column(self, ray_session):
        from kgx.ops.window import throttle_dedup
        rows = [(1, 0, 1, "a", 1.0), (2, 3, 1, "a", 1.0),
                (3, 0, 1, "b", 1.0), (4, 9, 1, "b", 1.0)]
        out = _collect(throttle_dedup(_events(rows), gap_s=5,
                                      key="event_type")) \
            .sort_by([("event_type", "ascending"), ("ts", "ascending")]) \
            .to_pydict()
        assert out["event_type"] == ["a", "b", "b"]
        assert out["event_id"] == [1, 3, 4]
