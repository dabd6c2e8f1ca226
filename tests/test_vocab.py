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
