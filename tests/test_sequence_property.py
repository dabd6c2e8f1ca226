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
