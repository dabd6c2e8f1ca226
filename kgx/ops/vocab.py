"""Corpus vocabulary statistics: n-gram top-k and per-document TF-IDF.

The training-data side of the engine (the reference has no corpus-
statistics surface; its only term handling is the extraction gazetteer,
/root/reference/indexing/simple_graph_builder.py): corpus-wide frequent
n-grams drive boilerplate detection and tokenizer vocabulary decisions,
and per-document TF-IDF top terms are the classic cheap document
signature next to embeddings.

Scale shapes (100 TB path):

- ``ngram_topk``: one ``map_batches`` emits PARTIAL per-batch n-gram
  counts (a Counter fold per batch — one output row per distinct gram
  per batch, never per occurrence), a narrow ``groupby(gram).sum``
  merges them, and ``sort + limit`` keeps k.  The all-to-all carries
  the batch-distinct gram strings only; corpus text never moves.
- ``tfidf_top_terms``: pass 1 folds per-batch document frequencies the
  same way into a driver-side vocabulary table broadcast via
  ``ray.put`` (PARTITIONING ASSUMPTION: the distinct-term vocabulary
  fits in a worker heap — Heaps' law keeps natural-language vocab
  sublinear in corpus size; a >heap vocabulary would need a co-shuffle
  join on term instead).  Pass 2 streams documents, computes
  tf x ln(N/df) per in-document term and keeps the per-doc top-k —
  no shuffle at all on the corpus side.

Tokenization matches the repo-wide oracle conventions: n-grams over
``\\s+`` runs of ``lower(trim(text))``; TF-IDF terms are the
``[a-z]{4,}`` words of ``lower(text)`` (same ``_TERM_RE`` as the KG
gazetteer).  Scores are rounded to 6 decimals before ranking and
emitted as integer ppm so cross-engine hashes are stable.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from kgx.functions.collect import collect_arrow

_WS = re.compile(r"\s+")
_TERM = re.compile(r"\b[a-z]{4,}\b")


def ngram_topk(docs_ds, *, n: int = 2, k: int = 20):
    """Top-k word n-grams corpus-wide -> (ngram, n_occurrences).

    Occurrences are counted at every position (not distinct per doc);
    ties at the k boundary break on lexicographically smaller gram.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in batch["text"].to_pylist():
            stripped = (text or "").strip()
            if not stripped:
                continue
            toks = _WS.split(stripped.lower())
            counts.update(" ".join(toks[i:i + n])
                          for i in range(len(toks) - n + 1))
        return pa.table({
            "ngram": pa.array(list(counts.keys()), pa.string()),
            "c": pa.array(list(counts.values()), pa.int64()),
        })

    merged = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("ngram").aggregate(Sum("c"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "ngram": batch["ngram"],
            "n_occurrences": batch["sum(c)"].combine_chunks()
                                  .cast(pa.int64()),
        })

    return merged.map_batches(rename, batch_format="pyarrow") \
        .sort(["n_occurrences", "ngram"], descending=[True, False]) \
        .limit(k)


def document_frequencies(docs_ds) -> tuple[int, ray.ObjectRef]:
    """(N docs, broadcast {term: df}) in one streaming pass.

    Per batch the distinct-per-document term sets fold into one partial
    Counter row set; the narrow (term, df) partials merge on the driver
    under the vocabulary-fits-in-heap assumption documented above.
    """
    def partial(batch: pa.Table) -> pa.Table:
        df: Counter = Counter()
        for text in batch["text"].to_pylist():
            df.update(set(_TERM.findall((text or "").lower())))
        # one sentinel row (df=0) keeps the batch's doc count even when
        # no term occurred; the fold below ignores zero-df rows
        terms = list(df.keys()) or [""]
        dfs = list(df.values()) or [0]
        n_col = [batch.num_rows] + [0] * (len(terms) - 1)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "df": pa.array(dfs, pa.int64()),
            "n_docs": pa.array(n_col, pa.int64()),
        })

    parts = collect_arrow(
        docs_ds.map_batches(partial, batch_format="pyarrow"))
    vocab: Counter = Counter()
    n_docs = 0
    if parts.num_rows:
        n_docs = int(np.sum(parts["n_docs"].to_numpy(zero_copy_only=False)))
        terms = parts["term"].to_pylist()
        dfs = parts["df"].to_numpy(zero_copy_only=False)
        for t, d in zip(terms, dfs):
            if d:
                vocab[t] += int(d)
    return n_docs, ray.put(dict(vocab))


def tfidf_top_terms(docs_ds, *, k: int = 5):
    """Per-document top-k terms by TF-IDF ->
    (doc_id, term, tfidf_ppm, rank).

    score = tf * ln(N / df) rounded to 6 decimals (ppm integer output);
    ranks break ties on lexicographically smaller term.  Documents with
    no qualifying term contribute no rows.
    """
    n_docs, vref = document_frequencies(docs_ds)

    def score(batch: pa.Table) -> pa.Table:
        df_map = ray.get(vref)
        out_id, out_t, out_s, out_r = [], [], [], []
        ids = batch["doc_id"].to_pylist()
        for did, text in zip(ids, batch["text"].to_pylist()):
            tf = Counter(_TERM.findall((text or "").lower()))
            scored = sorted(
                (-round(c * math.log(n_docs / df_map[t]), 6), t)
                for t, c in tf.items())[:k]
            for rank, (neg_s, t) in enumerate(scored, start=1):
                out_id.append(did)
                out_t.append(t)
                out_s.append(int(round(-neg_s * 1e6)))
                out_r.append(rank)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "term": pa.array(out_t, pa.string()),
            "tfidf_ppm": pa.array(out_s, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow")


def unigram_logprob(docs_ds):
    """Per-document mean unigram log-probability — the cheap LM-quality
    proxy (KenLM-style perplexity filtering without the LM): documents
    whose tokens are corpus-typical score high; gibberish and boilerplate
    outliers score low.

    Two passes with the same scale shape as :func:`tfidf_top_terms`:
    pass 1 folds per-batch token counts into the corpus unigram table
    (narrow (token, count) partials, driver fold, ``ray.put`` broadcast
    — vocabulary-fits-in-heap assumption as above); pass 2 streams the
    corpus and scores each document map-side, no shuffle.

    Determinism: per-token add-one-smoothed logprob is fixed to integer
    MICRO units first (``floor(ln((c+1)/(T+V)) * 1e6 + 0.5)`` — identical
    IEEE expression in the SQL oracle), so per-document summation is
    order-independent; the mean is ``floor(sum / n)`` in double (exact:
    |sum| << 2^53).  Output: (doc_id, n_tokens, mean_logprob_micro).
    """
    def count_partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in batch["text"].to_pylist():
            stripped = (text or "").strip()
            if stripped:
                counts.update(_WS.split(stripped.lower()))
        return pa.table({
            "tok": pa.array(list(counts.keys()), pa.string()),
            "c": pa.array(list(counts.values()), pa.int64()),
        })

    parts = collect_arrow(
        docs_ds.map_batches(count_partial, batch_format="pyarrow"))
    vocab: Counter = Counter()
    for t, c in zip(parts["tok"].to_pylist(),
                    parts["c"].to_numpy(zero_copy_only=False)):
        vocab[t] += int(c)
    total = sum(vocab.values())
    denom = float(total + len(vocab))
    lp_micro = {t: math.floor(math.log((c + 1.0) / denom) * 1e6 + 0.5)
                for t, c in vocab.items()}
    lref = ray.put(lp_micro)

    def score(batch: pa.Table) -> pa.Table:
        lp = ray.get(lref)
        ids, ns, means = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            stripped = (text or "").strip()
            if not stripped:
                continue
            toks = _WS.split(stripped.lower())
            s = sum(lp[t] for t in toks)
            ids.append(doc_id)
            ns.append(len(toks))
            means.append(math.floor(s / len(toks)))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(ns, pa.int64()),
            "mean_logprob_micro": pa.array(means, pa.int64()),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow")


def bigram_logprob(docs_ds, *, train_mod: int = 4):
    """Per-document mean BIGRAM log-probability — the CCNet-style LM
    perplexity filter shape: a bigram model trains on a deterministic
    corpus subset (``doc_id % train_mod == 0``, standing in for the
    "clean reference corpus" CCNet trains KenLM on) and every document
    is scored against it; fluent text follows corpus-typical token
    transitions, gibberish and shuffled boilerplate do not — a signal
    the unigram :func:`unigram_logprob` cannot see.

    Scale shape: one pass over the TRAINING subset folds per-batch
    (w1, w2, count) partials driver-side (model-fits-in-heap assumption,
    bounded by the sample — the same vocabulary assumption as the
    unigram pass, and exactly why production trains on a sample, not
    100 TB); the model broadcasts once via ``ray.put``; the scoring pass
    streams the whole corpus map-side with zero shuffle.

    Determinism (shared with the SQL oracle, same devices as
    :func:`unigram_logprob`): additive smoothing
    ``p(w2|w1) = (c12 + 1) / (c1 + V)`` with unseen-context fallback
    ``1 / V``; each bigram's logprob is fixed to integer MICRO units
    (``floor(ln(p) * 1e6 + 0.5)``) before the order-independent
    per-document sum; mean = ``floor(sum / n_bigrams)``.  Documents
    with fewer than 2 tokens emit no row.
    Output: (doc_id, n_bigrams, mean_logprob_micro).
    """
    def count_partial(batch: pa.Table) -> pa.Table:
        bg: Counter = Counter()
        toks_seen: Counter = Counter()
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            if doc_id % train_mod != 0:
                continue
            stripped = (text or "").strip()
            if not stripped:
                continue
            toks = _WS.split(stripped.lower())
            toks_seen.update(toks)
            bg.update(zip(toks, toks[1:]))
        return pa.table({
            "w1": pa.array([w1 for w1, _ in bg] +
                           [t for t in toks_seen], pa.string()),
            "w2": pa.array([w2 for _, w2 in bg] +
                           [None] * len(toks_seen), pa.string()),
            "c": pa.array(list(bg.values()) + list(toks_seen.values()),
                          pa.int64()),
        })

    parts = collect_arrow(
        docs_ds.map_batches(count_partial, batch_format="pyarrow"))
    bigrams: Counter = Counter()
    vocab: set = set()
    for w1, w2, c in zip(parts["w1"].to_pylist(), parts["w2"].to_pylist(),
                         parts["c"].to_numpy(zero_copy_only=False)):
        if w2 is None:
            vocab.add(w1)
        else:
            bigrams[(w1, w2)] += int(c)
    if not vocab:
        raise ValueError("bigram_logprob: empty training subset "
                         f"(no doc_id % {train_mod} == 0 rows with text)")
    V = len(vocab)
    ctx: Counter = Counter()
    for (w1, _), c in bigrams.items():
        ctx[w1] += c
    lp_pair = {k: math.floor(math.log((c + 1.0) / (ctx[k[0]] + V)) * 1e6
                             + 0.5)
               for k, c in bigrams.items()}
    lp_ctx = {w: math.floor(math.log(1.0 / (c + V)) * 1e6 + 0.5)
              for w, c in ctx.items()}
    lp_oov = math.floor(math.log(1.0 / V) * 1e6 + 0.5)
    mref = ray.put((lp_pair, lp_ctx, lp_oov))

    def score(batch: pa.Table) -> pa.Table:
        pair, cx, oov = ray.get(mref)
        ids, ns, means = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            stripped = (text or "").strip()
            if not stripped:
                continue
            toks = _WS.split(stripped.lower())
            if len(toks) < 2:
                continue
            s = 0
            for w1, w2 in zip(toks, toks[1:]):
                v = pair.get((w1, w2))   # explicit None checks: a micro
                if v is None:            # value of 0 is legitimate
                    v = cx.get(w1)
                    if v is None:
                        v = oov
                s += v
            n = len(toks) - 1
            ids.append(doc_id)
            ns.append(n)
            means.append(math.floor(s / n))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_bigrams": pa.array(ns, pa.int64()),
            "mean_logprob_micro": pa.array(means, pa.int64()),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow")


def bpe_merges(docs_ds, *, n_merges: int = 50, min_count: int = 2):
    """Learn the top-``n_merges`` byte-pair-encoding merges from corpus
    word frequencies -> (rank, left, right, pair_count).

    The standard scalable BPE trainer shape (Sennrich et al. 2016,
    arXiv:1508.07909; what SentencePiece / HF tokenizers do): the
    CORPUS-side work is one streaming pass folding per-batch word
    counts ((word, count) partials — one row per batch-distinct word,
    never per occurrence) merged by a narrow ``groupby(word).sum``;
    the merge loop then runs driver-side over that aggregated
    word-frequency table, which is vocabulary-sized (Heaps' law —
    the same model-fits-in-heap assumption as
    :func:`document_frequencies`), NOT corpus-sized.  100 TB of text
    changes the counts, not the table's scale.

    Determinism: words are the repo-wide ``\\S+`` tokens of
    ``lower(trim(text))`` split into single-character symbols (no
    end-of-word marker); each iteration merges the adjacent symbol
    pair with the highest summed word count, ties broken on the
    lexicographically smaller (left, right); training stops early when
    the best pair's count drops below ``min_count``.  The merge loop is
    iterative, but with FIXED ``n_merges`` it unrolls into per-round
    argmax + greedy-rewrite SQL (``__ray_entry__._bpe_oracle`` — exact
    driver gate since r5, the same treatment kg_lpa's rounds got); the
    distributed piece (the word-count fold) is additionally driver-gated
    via ``text_wordfreq``/:func:`ngram_topk`, and a pytest twin pins
    same-symbol-run rewrites the corpus never exercises.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in batch["text"].to_pylist():
            stripped = (text or "").strip()
            if stripped:
                counts.update(_WS.split(stripped.lower()))
        return pa.table({
            "word": pa.array(list(counts.keys()), pa.string()),
            "c": pa.array(list(counts.values()), pa.int64()),
        })

    merged = collect_arrow(
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word").aggregate(Sum("c")))
    vocab: dict[tuple[str, ...], int] = {}
    if merged.num_rows:
        for w, c in zip(merged["word"].to_pylist(),
                        merged["sum(c)"].to_numpy(zero_copy_only=False)):
            vocab[tuple(w)] = vocab.get(tuple(w), 0) + int(c)

    ranks, lefts, rights, cnts = [], [], [], []
    for rank in range(1, n_merges + 1):
        pair_c: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pair_c[(sym[i], sym[i + 1])] += c
        if not pair_c:
            break
        best = min(pair_c.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < min_count:
            break
        ranks.append(rank)
        lefts.append(left)
        rights.append(right)
        cnts.append(cnt)
        fused = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == left
                        and sym[i + 1] == right):
                    out.append(fused)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab

    return ray.data.from_arrow(pa.table({
        "rank": pa.array(ranks, pa.int64()),
        "left": pa.array(lefts, pa.string()),
        "right": pa.array(rights, pa.string()),
        "pair_count": pa.array(cnts, pa.int64()),
    }))


def cooccurrence_lift(docs_ds, *, min_units: int = 0):
    """Term-pair association strength by LIFT — the linear-space PMI:
    ``lift = P(a,b) / (P(a) P(b))`` over document co-occurrence, in
    integer 1e-6 units (``lift_units = (c_ab * n_docs * 10^6) //
    (c_a * c_b)``) so the distributed fold hash-matches the SQL oracle
    exactly (a log-space PMI could not).  Lift > 1e6 means the pair
    co-occurs more than independence predicts — the association signal
    that weights co-occurrence KG edges.

    Scale shape: per batch, each document emits its distinct-term pairs
    ONCE (triu over the sorted in-document term set) pre-counted per
    batch, so the (a, b, partial-count) shuffle carries batch-distinct
    pairs, never occurrences; per-term document frequencies ride the
    same broadcast as ``document_frequencies``.  Hub caveat: a document
    with T distinct terms emits C(T, 2) pairs — cap or shingle documents
    beyond ~10^3 distinct terms (the KG extractor's 64-term cap upstream
    already bounds this in the KG path).

    Output: (term_a < term_b, n_both, lift_units) for pairs with
    lift_units >= ``min_units``.  RANGE ASSUMPTION: ``n_both * n_docs *
    10^6`` must fit int64 — beyond ~10^6 co-occurrences x 10^6 docs,
    drop the units scale or move to Python ints in the final map.
    """
    from itertools import combinations

    from ray.data.aggregate import Sum

    def pair_partials(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for text in batch["text"].to_pylist():
            terms = sorted(set(_TERM.findall((text or "").lower())))
            cnt.update(combinations(terms, 2))
        if not cnt:
            return pa.table({"term_a": pa.array([], pa.string()),
                             "term_b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        pairs = list(cnt.keys())
        return pa.table({
            "term_a": pa.array([p[0] for p in pairs], pa.string()),
            "term_b": pa.array([p[1] for p in pairs], pa.string()),
            "n": pa.array(list(cnt.values()), pa.int64()),
        })

    n_docs, df_ref = document_frequencies(docs_ds)
    both = (docs_ds.map_batches(pair_partials, batch_format="pyarrow")
            .groupby(["term_a", "term_b"]).aggregate(Sum("n")))

    def lift(batch: pa.Table, _dref=df_ref) -> pa.Table:
        df = ray.get(_dref)
        a = batch["term_a"].to_pylist()
        b = batch["term_b"].to_pylist()
        nb = batch["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
        ca = np.asarray([df[t] for t in a], dtype=np.int64)
        cb = np.asarray([df[t] for t in b], dtype=np.int64)
        # Exact arbitrary-precision math: n_both * n_docs * 1e6 can exceed
        # int64 past ~9e6 docs, and numpy would wrap silently.  This map runs
        # over the post-groupby distinct-pair table (small), so Python-int
        # arithmetic costs nothing and matches the DuckDB oracle exactly.
        units = np.asarray(
            [int(nbi) * n_docs * 1_000_000 // (int(cai) * int(cbi))
             for nbi, cai, cbi in zip(nb, ca, cb)], dtype=np.int64)
        keep = units >= min_units
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table({
            "term_a": pa.chunked_array([batch["term_a"]]).combine_chunks()
                        .take(idx),
            "term_b": pa.chunked_array([batch["term_b"]]).combine_chunks()
                        .take(idx),
            "n_both": pa.array(nb[keep], pa.int64()),
            "lift_units": pa.array(units[keep], pa.int64()),
        })

    return both.map_batches(lift, batch_format="pyarrow")
