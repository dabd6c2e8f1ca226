"""kgx.ops.dsir: DSIR hashed-unigram importance weights."""
import hashlib
import math
import re
from collections import Counter

import pyarrow as pa
import ray.data as rd

from kgx.ops.dsir import dsir_weights

D = 64  # small bucket count so tests exercise collisions


def _docs(rows):
    ids, texts, langs = zip(*rows)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(ids), pa.int64()),
        "text": pa.array(list(texts), pa.string()),
        "lang": pa.array(list(langs), pa.string()),
    }))


def _brute(rows, target_lang="en", n_buckets=D):
    def bucket(tok):
        return int.from_bytes(
            hashlib.md5(tok.encode()).digest()[:8], "big") % n_buckets

    t_c, r_c = Counter(), Counter()
    toks_of = {}
    for did, text, lang in rows:
        s = (text or "").strip()
        if not s:
            continue
        bs = [bucket(t) for t in re.split(r"\s+", s.lower())]
        toks_of[did] = bs
        for b in bs:
            r_c[b] += 1
            if lang == target_lang:
                t_c[b] += 1
    t_tot, r_tot = sum(t_c.values()), sum(r_c.values())
    lr = {b: math.floor(math.log(((t_c[b] + 1.0) * (r_tot + n_buckets))
                                 / ((t_tot + n_buckets) * (r_c[b] + 1.0)))
                        * 1e6 + 0.5)
          for b in range(n_buckets)}
    return {did: (len(bs), sum(lr[b] for b in bs))
            for did, bs in toks_of.items()}


ROWS = [
    (0, "the quick brown fox", "en"),
    (1, "the lazy dog sleeps", "en"),
    (2, "der schnelle braune fuchs", "de"),
    (3, "le chien paresseux dort", "fr"),
    (4, "the quick dog", "en"),
    (5, "", "en"),
    (6, "   ", "de"),
    (7, "fox dog quick", "es"),
]


def test_dsir_matches_bruteforce(ray_session):
    out = dsir_weights(_docs(ROWS), target_lang="en",
                       n_buckets=D).to_pandas()
    ref = _brute(ROWS)
    assert set(out["doc_id"]) == set(ref)
    for _, r in out.iterrows():
        n, s = ref[r["doc_id"]]
        assert (r["n_tokens"], r["dsir_score_micro"]) == (n, s)


def test_dsir_target_tokens_score_higher(ray_session):
    out = dsir_weights(_docs(ROWS), target_lang="en",
                       n_buckets=4096).to_pandas().set_index("doc_id")
    mean = out["dsir_score_micro"] / out["n_tokens"]
    # every English doc outscores every non-English doc per token
    en = {0, 1, 4}
    non = {2, 3, 7}
    assert min(mean[d] for d in en) > max(mean[d] for d in non)


def test_dsir_partition_invariant(ray_session):
    a = dsir_weights(_docs(ROWS), n_buckets=D).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dsir_weights(_docs(ROWS).repartition(5), n_buckets=D) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_dsir_blank_docs_emit_no_rows(ray_session):
    out = dsir_weights(_docs(ROWS), n_buckets=D).to_pandas()
    assert not (set(out["doc_id"]) & {5, 6})
