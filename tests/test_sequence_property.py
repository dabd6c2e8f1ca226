"""Property / randomized tests for the per-key ordered operators."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from kgx.ops.sequence import _rank_within, ordered_window, topn_per_key


@given(st.lists(st.tuples(st.integers(0, 5), st.integers(-3, 3),
                          st.integers(0, 100)), min_size=1, max_size=60))
@settings(max_examples=60, deadline=None)
def test_rank_within_matches_reference(rows):
    """_rank_within == per-key rank of (minor asc) with the lexsort
    contract (last order array most significant)."""
    keys = np.asarray([r[0] for r in rows], dtype=np.int64)
    vals = np.asarray([r[1] for r in rows], dtype=np.float64)
    ids = np.asarray([r[2] for r in rows], dtype=np.int64)
    perm, rank = _rank_within(keys, (ids, vals))

    triples = sorted(range(len(rows)),
                     key=lambda i: (keys[i], vals[i], ids[i]))
    want_rank = {}
    seen: dict[int, int] = {}
    for i in triples:
        seen[keys[i]] = seen.get(keys[i], 0) + 1
        want_rank[i] = seen[keys[i]]
    assert [want_rank[i] for i in perm] == rank.tolist()


def _rand_orders(rng, n):
    return pa.table({
        "k": pa.array(rng.integers(0, 8, n), pa.int64()),
        "id": pa.array(rng.permutation(n), pa.int64()),
        "v": pa.array(np.round(rng.uniform(0, 100, n), 2), pa.float64()),
    })


def test_topn_and_window_match_duckdb_on_random_tables(ray_session):
    rng = np.random.default_rng(7)
    for trial in range(3):
        t = _rand_orders(rng, int(rng.integers(5, 200)))
        con = duckdb.connect()
        con.register("t", t)

        got = topn_per_key(rd.from_arrow(t), key="k", order_col="v",
                           id_col="id", n=2).to_pandas()
        want = con.execute("""
            SELECT k, id, v, rk FROM (
              SELECT k, id, v, row_number() OVER (
                PARTITION BY k ORDER BY v DESC, id) AS rk FROM t)
            WHERE rk <= 2""").df()
        key = ["k", "id", "v", "rk"]
        assert (sorted(map(tuple, got[key].values.tolist()))
                == sorted(map(tuple, want[key].values.tolist())))

        ev = pa.table({
            "user_id": t["k"],
            "event_id": t["id"],
            "ts": pa.array((np.asarray(t["id"].to_pylist()) * 1_000_000)
                           .astype("datetime64[us]")),
            "value": t["v"],
        })
        con.register("ev", ev)
        got_w = ordered_window(rd.from_arrow(ev)).to_pandas()
        want_w = con.execute("""
            SELECT user_id, event_id, row_number() OVER w AS seq,
                   CAST(coalesce((epoch_us(ts) - lag(epoch_us(ts)) OVER w)
                                 // 1000000, 0) AS BIGINT) AS gap_s,
                   lag(CAST(floor(value*100+0.5) AS BIGINT)) OVER w
                     AS prev_value_cents,
                   CAST(sum(CAST(floor(value*100+0.5) AS BIGINT))
                          OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS cum_value_cents
            FROM ev WINDOW w AS (PARTITION BY user_id
                                 ORDER BY ts, event_id)""").df()
        cols = sorted(got_w.columns)
        a = [tuple(str(x) for x in r)
             for r in got_w[cols].itertuples(index=False)]
        b = [tuple(str(x) for x in r)
             for r in want_w[cols].itertuples(index=False)]
        assert sorted(a) == sorted(b)


def test_rank_features_matches_duckdb_with_ties(ray_session):
    """rank/dense_rank/percent_rank/NTILE vs DuckDB on adversarial
    shapes: heavy value ties and keys with fewer rows than tiles."""
    from kgx.ops.sequence import rank_features
    rng = np.random.default_rng(11)
    n = 120
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 10, n), pa.int64()),
        "event_id": pa.array(rng.permutation(n), pa.int64()),
        # values drawn from 4 levels -> many exact ties per key
        "value": pa.array(rng.choice([1.25, 2.5, 2.5, 7.75], n),
                          pa.float64()),
    })
    # one key with a single row, one with 2 (< tiles=4)
    t = pa.concat_tables([t, pa.table({
        "user_id": pa.array([97, 98, 98], pa.int64()),
        "event_id": pa.array([9001, 9002, 9003], pa.int64()),
        "value": pa.array([3.0, 4.0, 4.0], pa.float64()),
    })])
    got = rank_features(rd.from_arrow(t)).to_pandas() \
        .sort_values(["user_id", "event_id"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", t)
    want = con.sql("""
        WITH e AS (SELECT user_id, event_id,
                     CAST(floor(value*100+0.5) AS BIGINT) AS value_cents
                   FROM events)
        SELECT user_id, event_id, value_cents,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS dense_rnk,
               CAST(floor((rank() OVER w - 1) * 1000000.0
                    / greatest(count(*) OVER (PARTITION BY user_id) - 1,
                               1)) AS BIGINT) AS prank_ppm,
               CAST(ntile(4) OVER w2 AS BIGINT) AS tile
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY value_cents DESC),
               w2 AS (PARTITION BY user_id
                      ORDER BY value_cents DESC, event_id)
        ORDER BY user_id, event_id
    """).df().reset_index(drop=True)
    assert got.astype("int64").equals(want.astype("int64"))
