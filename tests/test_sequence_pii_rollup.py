"""Tests for ordered windows, top-n per key, rollup, PII scrub and
corpus segment dedup."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from kgx.ops.linededup import segment_dedup
from kgx.ops.pii import pii_scrub_batch
from kgx.ops.relational import pricing_rollup
from kgx.ops.sequence import ordered_window, topn_per_key

SF = "/root/testdata/sf0.001"


def _sorted(tbl: pa.Table) -> list[tuple]:
    cols = sorted(tbl.column_names)
    rows = [tuple(r[c] for c in cols) for r in tbl.select(cols).to_pylist()]
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


def _duck(sql: str) -> pa.Table:
    con = duckdb.connect()
    for t in ("events", "orders", "lineitem", "documents", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).arrow()


def _collect(ds) -> pa.Table:
    from kgx.functions.collect import collect_arrow
    return collect_arrow(ds)


def test_ordered_window_matches_sql():
    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    got = _collect(ordered_window(ev))
    want = _duck("""
        SELECT user_id, event_id, row_number() OVER w AS seq,
               CAST(coalesce((epoch_us(ts) - lag(epoch_us(ts)) OVER w)
                             // 1000000, 0) AS BIGINT) AS gap_s,
               lag(CAST(floor(value*100+0.5) AS BIGINT)) OVER w
                 AS prev_value_cents,
               CAST(sum(CAST(floor(value*100+0.5) AS BIGINT))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum_value_cents
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """)
    assert _sorted(got) == _sorted(want)


def test_topn_per_key_matches_sql():
    orders = rd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"])
    got = _collect(topn_per_key(orders, key="o_custkey",
                                order_col="o_totalprice",
                                id_col="o_orderkey", n=3))
    want = _duck("""
        SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders) WHERE rk <= 3
    """)
    assert _sorted(got) == _sorted(want)


def test_topn_combiner_bounds_shuffle():
    # a batch with 5 rows of one key emits at most n of them
    t = pa.table({
        "k": pa.array([7] * 5, pa.int64()),
        "id": pa.array([5, 4, 3, 2, 1], pa.int64()),
        "v": pa.array([1.0, 2.0, 2.0, 9.0, 8.0], pa.float64()),
    })
    ds = rd.from_arrow(t)
    out = _collect(topn_per_key(ds, key="k", order_col="v", id_col="id",
                                n=2))
    assert out.num_rows == 2
    assert out["id"].to_pylist() == [2, 1]          # 9.0 then 8.0
    assert out["rk"].to_pylist() == [1, 2]


def test_rollup_matches_sql():
    got = _collect(pricing_rollup(SF))
    want = _duck("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity*100+0.5) AS BIGINT))
                    AS BIGINT) AS sum_qty_cents,
               CAST(sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT))
                    AS BIGINT) AS sum_price_cents,
               count(*) AS n_rows
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """)
    assert _sorted(got) == _sorted(want)
    # exactly one grand-total row, flag-level rows have null status
    nulls = [r for r in got.to_pylist() if r["l_returnflag"] is None]
    assert len(nulls) == 1


def test_pii_scrub_batch():
    out = pii_scrub_batch(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(
            ["mail a.b+c@ex.org or x@y.io, host 10.0.0.1, tel 415-555-0042"],
            pa.string()),
    }))
    assert out["n_emails"].to_pylist() == [2]
    assert out["n_ips"].to_pylist() == [1]
    assert out["n_phones"].to_pylist() == [1]
    assert out["text_clean"].to_pylist() == [
        "mail <EMAIL> or <EMAIL>, host <IP>, tel <PHONE>"]


def test_pii_no_false_positives_on_clean_text():
    out = pii_scrub_batch(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["just ordinary words 12-34 and 1.2"], pa.string()),
    }))
    assert out["n_emails"].to_pylist() == [0]
    assert out["n_ips"].to_pylist() == [0]
    assert out["n_phones"].to_pylist() == [0]
    assert out["text_clean"].to_pylist() == [
        "just ordinary words 12-34 and 1.2"]


def test_segment_dedup_small():
    # doc 0 owns segments A B; doc 1 repeats A then adds C; doc 2 is all
    # repeats -> null text
    seg = lambda ch: " ".join([ch] * 10)             # noqa: E731
    a, b, c = seg("a"), seg("b"), seg("c")
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([f"{a} {b}", f"{a} {c}", f"{b} {a}"], pa.string()),
    }))
    out = {r["doc_id"]: r for r in
           _collect(segment_dedup(docs, seg_tokens=10)).to_pylist()}
    assert out[0]["text_dedup"] == f"{a} {b}" and out[0]["n_dropped"] == 0
    assert out[1]["text_dedup"] == c and out[1]["n_dropped"] == 1
    assert out[2]["text_dedup"] is None and out[2]["n_dropped"] == 2
    assert all(out[d]["n_segs"] == 2 for d in (0, 1, 2))


def test_segment_dedup_matches_sql():
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = _collect(segment_dedup(docs, seg_tokens=10))
    want = _duck("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        segs0 AS (
          SELECT doc_id, tk,
                 unnest(generate_series(
                   0, CAST(ceil(len(tk)/10.0) AS BIGINT) - 1)) AS seg_no
          FROM toks),
        segs AS (
          SELECT doc_id, seg_no,
                 array_to_string(tk[(seg_no*10+1):((seg_no+1)*10)], ' ')
                   AS seg
          FROM segs0),
        ranked AS (
          SELECT doc_id, seg_no, seg,
                 row_number() OVER (PARTITION BY md5(seg)
                                    ORDER BY doc_id, seg_no) AS rn
          FROM segs)
        SELECT doc_id,
               string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                          ORDER BY seg_no) AS text_dedup,
               count(*) AS n_segs,
               CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dropped
        FROM ranked GROUP BY doc_id
    """)
    assert _sorted(got) == _sorted(want)
    # the op actually dropped something on this corpus (it has exact dups)
    assert sum(got["n_dropped"].to_pylist()) > 0


def test_repetition_batch():
    from kgx.ops.text import repetition_batch
    out = repetition_batch(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b a b a", "x"], pa.string()),
    }))
    # "a b a b a": bigrams = ab, ba, ab, ba -> top 2/4 = 500000 ppm
    assert out["n_bigrams"].to_pylist() == [4, 0]
    assert out["top_bigram_ppm"].to_pylist() == [500000, 0]
    # trigrams: aba, bab, aba -> top 2/3
    assert out["n_trigrams"].to_pylist() == [3, 0]
    assert out["top_trigram_ppm"].to_pylist() == [(2 * 1000000) // 3, 0]


def test_repetition_matches_sql():
    from kgx.ops.text import repetition_batch
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = _collect(docs.map_batches(repetition_batch,
                                    batch_format="pyarrow"))
    import __ray_entry__ as entrymod
    want = _duck(entrymod.oracle_sql()["text_repetition"])
    assert _sorted(got) == _sorted(want)


def test_mix_sources_deterministic_and_weighted():
    from kgx.ops.sampling import mix_sources
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source"])
    w = {"src0": 0, "src1": 1_000_000}
    out = _collect(mix_sources(docs, weights_ppm=w, default_ppm=500_000))
    rows = out.to_pylist()
    assert all(not r["keep"] for r in rows if r["source"] == "src0")
    assert all(r["keep"] for r in rows if r["source"] == "src1")
    other = [r for r in rows if r["source"] not in w]
    frac = sum(r["keep"] for r in other) / len(other)
    assert 0.35 < frac < 0.65                      # ~half at 500k ppm
    again = _collect(mix_sources(docs, weights_ppm=w,
                                 default_ppm=500_000))
    assert _sorted(out) == _sorted(again)          # reproducible


def test_grouped_quantiles_matches_sql():
    from kgx.ops.quantile import grouped_quantiles
    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    got = _collect(grouped_quantiles(ev, key="event_type",
                                     value_col="value"))
    import __ray_entry__ as entrymod
    want = _duck(entrymod.oracle_sql()["events_quantile_by_type"])
    assert _sorted(got) == _sorted(want)


def test_unigram_logprob_matches_sql():
    from kgx.ops.vocab import unigram_logprob
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = _collect(unigram_logprob(docs))
    import __ray_entry__ as entrymod
    want = _duck(entrymod.oracle_sql()["text_logprob"])
    assert _sorted(got) == _sorted(want)
    # common-token docs score higher than they would with rare tokens
    assert all(v < 0 for v in got["mean_logprob_micro"].to_pylist())


def test_priority_pivot_matches_sql():
    from kgx.ops.relational import priority_pivot
    got = _collect(priority_pivot(SF))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    want = con.execute("""
        SELECT o_orderstatus,
               CAST(sum(CASE WHEN o_orderpriority='1-URGENT' THEN 1
                             ELSE 0 END) AS BIGINT) AS n_urgent,
               CAST(sum(CASE WHEN o_orderpriority='2-HIGH' THEN 1
                             ELSE 0 END) AS BIGINT) AS n_high,
               CAST(sum(CASE WHEN o_orderpriority='3-MEDIUM' THEN 1
                             ELSE 0 END) AS BIGINT) AS n_medium,
               CAST(sum(CASE WHEN o_orderpriority='4-NOT SPECIFIED' THEN 1
                             ELSE 0 END) AS BIGINT) AS n_not_specified,
               CAST(sum(CASE WHEN o_orderpriority='5-LOW' THEN 1
                             ELSE 0 END) AS BIGINT) AS n_low
        FROM orders GROUP BY o_orderstatus""").arrow()
    assert _sorted(got) == _sorted(want)


def test_shipping_priority_matches_sql():
    """Q3-shaped three-way join == the DuckDB oracle, including the
    descending-revenue / ascending-orderkey tie order within the limit."""
    import __ray_entry__ as entrymod
    from kgx.ops.relational import shipping_priority
    got = _collect(shipping_priority(SF, segment="BUILDING",
                                     cutoff="1998-06-01", n=10))
    want = _duck(entrymod.oracle_sql()["rel_shipping"])
    assert _sorted(got) == _sorted(want)
    assert got.num_rows == 10
    # the Ray result must already be in (revenue desc, orderkey asc) order
    revs = got["revenue_units"].to_pylist()
    keys = got["o_orderkey"].to_pylist()
    assert sorted(zip(revs, keys), key=lambda t: (-t[0], t[1])) \
        == list(zip(revs, keys))


def test_shipping_priority_empty_segment():
    from kgx.ops.relational import shipping_priority
    got = _collect(shipping_priority(SF, segment="NO_SUCH_SEGMENT", n=10))
    assert got.num_rows == 0


def test_funnel_steps_matches_sql():
    import __ray_entry__ as entrymod
    from kgx.ops.sequence import funnel_steps
    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    got = _collect(funnel_steps(ev, steps=("view", "click", "purchase")))
    want = _duck(entrymod.oracle_sql()["events_funnel"])
    assert _sorted(got) == _sorted(want)
    reached = got["steps_reached"].to_pylist()
    assert set(reached) <= {1, 2, 3} and 3 in reached


def test_funnel_steps_strict_ordering():
    """Step 2 at the same timestamp as step 1 does NOT count (strict >),
    and a click BEFORE the first view is ignored."""
    from kgx.ops.sequence import funnel_steps
    us = 1_000_000
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array([10 * us, 10 * us, 20 * us,
                        5 * us, 8 * us, 9 * us], pa.timestamp("us")),
        "event_type": pa.array(["view", "click", "purchase",
                                "click", "view", "view"], pa.string()),
    }))
    out = {r["user_id"]: r for r in
           _collect(funnel_steps(ev)).to_pylist()}
    # user 1: click at t==view -> not counted; purchase can't attach
    assert out[1]["steps_reached"] == 1 and out[1]["step2_ts"] is None
    # user 2: click precedes the first view -> only step 1
    assert out[2]["steps_reached"] == 1
    # user 3: view only
    assert out[3]["steps_reached"] == 1
    assert 4 not in out  # users with no view emit nothing


def test_json_field_stats_counts_distincts_across_batches(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.sequence import json_field_stats
    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 7),
            ("a", 2), ("b", 7), ("b", 9), ("a", None)]
    tbl = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "props": pa.array(
            ["{}" if r[1] is None else '{"k": %d}' % r[1] for r in rows],
            pa.string()),
    })
    out = json_field_stats(rd.from_arrow(tbl).repartition(4)).to_pandas() \
        .set_index("event_type")
    assert out.loc["a", "n_events"] == 4          # null-field row dropped
    assert out.loc["a", "n_distinct_vals"] == 2   # {1, 2} across batches
    assert out.loc["a", "sum_val"] == 6
    assert out.loc["b", "n_distinct_vals"] == 2
    assert out.loc["b", "min_val"] == 7 and out.loc["b", "max_val"] == 9


def test_duplicated_spans_flags_verbatim_copies(ray_session):
    """Lee-et-al-style span report: a 16-token span copied verbatim into
    another document counts against the LATER document only; documents
    under 16 tokens emit no row; a fully unique doc scores 0 ppm."""
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.linededup import duplicated_spans

    base = " ".join(f"tok{i}" for i in range(30))          # 30 tokens
    copier = base + " trailing unique suffix here"          # copies all
    unique = " ".join(f"other{i}" for i in range(40))
    short = "too short"
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([base, copier, unique, short], pa.string()),
    }))
    out = duplicated_spans(ds, window=16).to_pandas().set_index("doc_id")
    assert 3 not in out.index                    # < 16 tokens
    assert out.loc[0, "n_windows"] == 15         # 30 - 16 + 1
    assert out.loc[0, "n_dup_windows"] == 0      # owner, not dup
    assert out.loc[1, "n_dup_windows"] == 15     # every base window
    assert out.loc[1, "n_windows"] == 19         # 34 - 16 + 1
    assert out.loc[1, "dup_ppm"] == 15 * 1_000_000 // 19
    assert out.loc[2, "n_dup_windows"] == 0
    # determinism
    again = duplicated_spans(ds, window=16).to_pandas().set_index("doc_id")
    assert out.equals(again)
