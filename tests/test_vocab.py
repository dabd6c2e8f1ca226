"""kgx.ops.vocab: corpus n-gram top-k and per-doc TF-IDF."""
import math

import pyarrow as pa
import ray.data as rd

from kgx.ops.vocab import document_frequencies, ngram_topk, tfidf_top_terms


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_ngram_topk_counts(ray_session):
    out = ngram_topk(_docs([
        "the cat sat",            # "the cat", "cat sat"
        "the cat ran",            # "the cat", "cat ran"
        "THE CAT sat",            # case-folds to "the cat", "cat sat"
        "",                       # no grams
        "solo",                   # < 2 tokens: no grams
    ]), n=2, k=3).to_pandas()
    assert out["ngram"].tolist() == ["the cat", "cat sat", "cat ran"]
    assert out["n_occurrences"].tolist() == [3, 2, 1]


def test_ngram_topk_partition_invariant(ray_session):
    texts = [f"w{i} w{(i + 1) % 5} w{(i + 2) % 5}" for i in range(40)]
    a = ngram_topk(_docs(texts), n=3, k=10).to_pandas()
    b = ngram_topk(_docs(texts).repartition(7), n=3, k=10).to_pandas()
    assert a.equals(b)


def test_ngram_tie_breaks_lexicographically(ray_session):
    out = ngram_topk(_docs(["bb aa", "aa bb"]), n=2, k=2).to_pandas()
    # both grams occur once; smaller gram first
    assert out["ngram"].tolist() == ["aa bb", "bb aa"]


def test_document_frequencies(ray_session):
    n, vref = document_frequencies(_docs([
        "apple apple banana", "banana cherry", "nothing-matches 123", "",
    ]))
    import ray
    df = ray.get(vref)
    assert n == 4
    assert df == {"apple": 1, "banana": 2, "cherry": 1, "nothing": 1,
                  "matches": 1}


def test_tfidf_top_terms(ray_session):
    texts = ["apple apple banana", "banana cherry", "cherry apple"]
    out = tfidf_top_terms(_docs(texts), k=2).to_pandas()
    # every term has df=2 -> idf = ln(3/2); doc 0: apple tf=2 wins
    idf = math.log(3 / 2)
    d0 = out[out["doc_id"] == 0].sort_values("rank")
    assert d0["term"].tolist() == ["apple", "banana"]
    assert d0["tfidf_ppm"].tolist() == [
        int(round(round(2 * idf, 6) * 1e6)),
        int(round(round(1 * idf, 6) * 1e6))]
    # doc 1 terms tie on score -> lexicographic rank order
    d1 = out[out["doc_id"] == 1].sort_values("rank")
    assert d1["term"].tolist() == ["banana", "cherry"]
    assert d1["rank"].tolist() == [1, 2]


def test_tfidf_k_cut_and_empty_docs(ray_session):
    out = tfidf_top_terms(_docs([
        "alpha beta gamma delta epsilon", "", "x y z",  # short tokens drop
    ]), k=3).to_pandas()
    assert set(out["doc_id"]) == {0}
    assert len(out) == 3


def test_cooccurrence_lift_bruteforce(ray_session):
    import itertools
    import re
    from collections import Counter
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.vocab import cooccurrence_lift
    texts = ["alpha beta gamma", "alpha beta", "alpha delta words here",
             "beta gamma", "unrelated content entirely", "alpha beta gamma"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = cooccurrence_lift(rd.from_arrow(tbl)).to_pandas()
    term = re.compile(r"\b[a-z]{4,}\b")
    sets = [set(term.findall(t.lower())) for t in texts]
    df = Counter(t for s in sets for t in s)
    both = Counter()
    for s in sets:
        both.update(itertools.combinations(sorted(s), 2))
    got = {(r["term_a"], r["term_b"]): (r["n_both"], r["lift_units"])
           for _, r in out.iterrows()}
    want = {p: (c, (c * len(texts) * 1_000_000) // (df[p[0]] * df[p[1]]))
            for p, c in both.items()}
    assert got == want
    # alpha+beta co-occur 3/6 docs vs df 4*4 -> lift > 1.0 for none here;
    # sanity: lift for (beta, gamma) = 3*6e6 // (4*3) = 1.5e6 > 1e6
    assert got[("beta", "gamma")][1] == 1_500_000


def test_bigram_logprob_ranks_fluent_above_shuffled(ray_session):
    """The bigram LM (trained on doc_id % 2 == 0 here) must score text
    with corpus-typical transitions above the same tokens in a scrambled
    order — the signal unigram_logprob cannot see — and skip sub-2-token
    docs."""
    from kgx.ops.vocab import bigram_logprob
    fluent = "the quick brown fox jumps over the lazy dog"
    shuffled = "fox the over quick dog brown lazy jumps the"
    texts = [fluent,        # doc 0: trains
             shuffled,      # doc 1: scored only (odd id)
             fluent,        # doc 2: trains (reinforces fluent bigrams)
             fluent,        # doc 3: scored only
             "single"]      # doc 4: 1 token -> no row (even id is fine:
                            #         vocab contribution only)
    out = bigram_logprob(_docs(texts), train_mod=2).to_pandas() \
        .set_index("doc_id")
    assert 4 not in out.index
    assert out.loc[3, "mean_logprob_micro"] > out.loc[1,
                                                      "mean_logprob_micro"]
    assert out.loc[3, "n_bigrams"] == 8
    # determinism
    again = bigram_logprob(_docs(texts), train_mod=2).to_pandas() \
        .set_index("doc_id")
    assert out.equals(again)


def test_bigram_logprob_matches_handrolled_model(ray_session):
    """Micro-unit arithmetic matches a by-hand bigram model exactly."""
    from kgx.ops.vocab import bigram_logprob
    texts = ["a b a b", "a b c"]
    out = bigram_logprob(_docs(texts), train_mod=2).to_pandas() \
        .set_index("doc_id")
    # training subset = doc 0 only: bigrams ab x2, ba x1; ctx a=2, b=1;
    # vocab {a, b} -> V=2
    lp_ab = math.floor(math.log(3 / 4) * 1e6 + 0.5)   # (2+1)/(2+2)
    lp_ba = math.floor(math.log(2 / 3) * 1e6 + 0.5)   # (1+1)/(1+2)
    lp_bc = math.floor(math.log(1 / 3) * 1e6 + 0.5)   # unseen pair, ctx b
    assert out.loc[0, "mean_logprob_micro"] == math.floor(
        (lp_ab * 2 + lp_ba) / 3)
    assert out.loc[1, "mean_logprob_micro"] == math.floor(
        (lp_ab + lp_bc) / 2)


# ----------------------------------------------------------------------
# bpe_merges
# ----------------------------------------------------------------------

def _brute_bpe(texts, n_merges, min_count=2):
    """Independent naive BPE twin: whole-corpus token list, no
    word-count aggregation — pins the distributed fold + merge loop."""
    import re
    from collections import Counter
    toks = []
    for t in texts:
        s = (t or "").strip()
        if s:
            toks.extend(re.split(r"\s+", s.lower()))
    seqs = [list(w) for w in toks]
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for s in seqs:
            pairs.update(zip(s, s[1:]))
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((l, r, c))
        for s in seqs:
            i = 0
            while i < len(s) - 1:
                if s[i] == l and s[i + 1] == r:
                    s[i:i + 2] = [l + r]
                else:
                    i += 1
    return merges


def test_bpe_merges_matches_bruteforce(ray_session):
    from kgx.ops.vocab import bpe_merges
    texts = ["the theater heats the heather",
             "heat the theater", "", "  ",
             "aaaa aaaa bbbb", "ababab the"]
    out = bpe_merges(_docs(texts), n_merges=12, min_count=2).to_pandas()
    ref = _brute_bpe(texts, 12, 2)
    got = list(zip(out["left"], out["right"], out["pair_count"]))
    assert got == ref
    assert out["rank"].tolist() == list(range(1, len(ref) + 1))


def test_bpe_merges_partition_invariant(ray_session):
    from kgx.ops.vocab import bpe_merges
    texts = [f"w{i % 7}x y{i % 3}z shared shared" for i in range(50)]
    a = bpe_merges(_docs(texts), n_merges=8).to_pandas()
    b = bpe_merges(_docs(texts).repartition(9), n_merges=8).to_pandas()
    assert a.equals(b)


def test_bpe_merges_min_count_stops_early(ray_session):
    from kgx.ops.vocab import bpe_merges
    # every adjacent pair occurs once -> no merge clears min_count=2
    out = bpe_merges(_docs(["abc def"]), n_merges=5,
                     min_count=2).to_pandas()
    assert len(out) == 0


def test_bpe_sql_oracle_same_symbol_runs(ray_session, tmp_path):
    """r5: the unrolled _bpe_oracle's greedy-rewrite rounds must match
    bpe_merges on ADVERSARIAL words the corpus may never exercise —
    same-symbol runs of length 3/4/5 ('www', 'aaaa', 'bbbbb'), an
    alternating chain ('ababab'), and merged-token re-pairing — where
    string-replace-style oracles diverge."""
    import duckdb
    import pyarrow.parquet as pq
    import __ray_entry__ as e
    from kgx.ops.vocab import bpe_merges

    texts = [
        "www aaaa bbbbb ababab",
        "www www aaaa xy xy xy",
        "aa aa aaa aaaa abab ab",
        "zzz zz z ababab ababab",
    ]
    f = str(tmp_path / "documents.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), f)

    got = bpe_merges(
        rd.from_arrow(pa.table({"text": pa.array(texts)})),
        n_merges=12, min_count=2).to_pandas()

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{f}'")
    want = con.sql(e._bpe_oracle(n_merges=12, min_count=2)).df()
    got = got.sort_values("rank").reset_index(drop=True)
    want = want.sort_values("rank").reset_index(drop=True)
    assert got["rank"].tolist() == want["rank"].tolist()
    assert got["left"].tolist() == want["left"].tolist()
    assert got["right"].tolist() == want["right"].tolist()
    assert [int(x) for x in got["pair_count"]] == \
        [int(x) for x in want["pair_count"]]
