"""BM25 keyword search over the documents table.

The retrieval-side complement of :mod:`kgx.ops.simsearch`: score every
document against a small set of keyword queries with Okapi BM25 and
return the per-query top-k.  The reference has no keyword-retrieval
surface at all (its VectorRAG baseline is embedding-only,
/root/reference/baselines/vector_rag.py); this is the classic sparse
baseline every training-data / RAG pipeline wants next to ANN.

Scale shape (100 TB path) — two streaming passes, zero wide shuffles:

1. **corpus statistics**: one ``map_batches`` emits a single partial
   row per batch — doc count, total token count, and per-QUERY-TERM
   document frequencies (vectorized ``pc.count_substring_regex`` /
   ``match_substring_regex`` per term; the term list is a handful of
   strings, so this is #terms vectorized kernels per batch, not a
   vocabulary-sized structure).  The driver folds the tiny partials
   into (N, avgdl, df_t), computes idf, and broadcasts via ``ray.put``.
2. **scoring**: one ``map_batches`` computes tf per (doc, term) with
   the same vectorized kernels and the BM25 score; each block keeps
   only its own per-query top-k (argpartition), so the final
   ``sort``/``limit`` sees at most blocks x queries x k rows.

Scores are rounded to 6 decimals BEFORE ranking so ordering (and the
DuckDB oracle's, driver query ``bm25_topk``) is identical across
engines; ties break on smaller doc_id.

Term/token conventions match the repo's oracle conventions: document
length = ``\\S+`` runs; query terms are lowercase ``[a-z]{4,}`` words
matched with word boundaries (``TERM_RE`` family, lowercase corpus
match via DuckDB-compatible regex).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from kgx.ops.text import WS_TOKEN_RE


def query_terms(query: str) -> list[str]:
    """Distinct lowercase >=4-letter words of a query, sorted."""
    import re
    return sorted(set(re.findall(r"\b[a-z]{4,}\b", query.lower())))


def _term_pattern(term: str) -> str:
    """Word-boundary regex for one (already [a-z]+) term, case-folded
    the same way in Ray and DuckDB: match against lower(text)."""
    return rf"\b{term}\b"


def corpus_stats(docs_ds, terms: list[str]) -> tuple[int, float, dict]:
    """(N docs, avgdl, {term: df}) in one streaming pass."""
    def partial(batch: pa.Table) -> pa.Table:
        text = pc.utf8_lower(batch["text"].combine_chunks())
        n = batch.num_rows
        toks = pc.sum(pc.count_substring_regex(text, WS_TOKEN_RE)).as_py()
        cols = {"n_docs": pa.array([n], pa.int64()),
                "n_tokens": pa.array([int(toks or 0)], pa.int64())}
        for i, t in enumerate(terms):
            df = pc.sum(pc.cast(pc.match_substring_regex(
                text, _term_pattern(t)), pa.int64())).as_py()
            cols[f"df_{i}"] = pa.array([int(df or 0)], pa.int64())
        return pa.table(cols)

    from kgx.functions.collect import collect_arrow
    parts = collect_arrow(
        docs_ds.map_batches(partial, batch_format="pyarrow"))
    if parts.num_rows == 0:
        return 0, 0.0, {t: 0 for t in terms}
    n_docs = int(pc.sum(parts["n_docs"]).as_py() or 0)
    n_tokens = int(pc.sum(parts["n_tokens"]).as_py() or 0)
    dfs = {t: int(pc.sum(parts[f"df_{i}"]).as_py() or 0)
           for i, t in enumerate(terms)}
    avgdl = (n_tokens / n_docs) if n_docs else 0.0
    return n_docs, avgdl, dfs


def bm25_topk(docs_ds, queries: list[str], *, k: int = 10,
              k1: float = 1.2, b: float = 0.75):
    """documents x queries -> (query_idx, doc_id, score, rank) top-k.

    idf = ln((N - df + 0.5) / (df + 0.5) + 1)  (Lucene-style, >= 0).
    """
    per_query = [query_terms(q) for q in queries]
    all_terms = sorted({t for ts in per_query for t in ts})
    n_docs, avgdl, dfs = corpus_stats(docs_ds, all_terms)
    idf = {t: float(np.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0))
           for t in all_terms}
    bref = ray.put((per_query, idf, avgdl))

    def score_block(batch: pa.Table) -> pa.Table:
        pq, idf_m, av = ray.get(bref)
        text = pc.utf8_lower(batch["text"].combine_chunks())
        ids = batch["doc_id"].combine_chunks().cast(pa.int64()) \
                             .to_numpy(zero_copy_only=False)
        dl = pc.count_substring_regex(text, WS_TOKEN_RE) \
               .to_numpy(zero_copy_only=False).astype(np.float64)
        tf_cache: dict[str, np.ndarray] = {}
        out_q, out_d, out_s = [], [], []
        denom_dl = k1 * (1.0 - b + b * (dl / av if av else dl))
        for qi, terms in enumerate(pq):
            score = np.zeros(len(ids), dtype=np.float64)
            for t in terms:
                tf = tf_cache.get(t)
                if tf is None:
                    tf = pc.count_substring_regex(
                        text, _term_pattern(t)) \
                        .to_numpy(zero_copy_only=False) \
                        .astype(np.float64)
                    tf_cache[t] = tf
                score += idf_m[t] * (tf * (k1 + 1.0)) / (tf + denom_dl)
            score = np.round(score, 6)
            hit = np.flatnonzero(score > 0)
            if len(hit) > k:
                # block-local top-k: score desc, doc_id asc tie-break
                order = np.lexsort((ids[hit], -score[hit]))
                hit = hit[order[:k]]
            out_q.extend([qi] * len(hit))
            out_d.extend(ids[hit].tolist())
            out_s.extend(score[hit].tolist())
        return pa.table({
            "query_idx": pa.array(out_q, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    def merge_topk(group: pa.Table) -> pa.Table:
        # per-query merge of block-local top-k partials (<= blocks x k
        # rows per group); the repo-wide top-k merge idiom
        ids = np.asarray(group["doc_id"].to_pylist(), dtype=np.int64)
        scores = np.asarray(group["score"].to_pylist(), dtype=np.float64)
        order = np.lexsort((ids, -scores))[:k]
        qi = group["query_idx"][0].as_py()
        return pa.table({
            "query_idx": pa.array([qi] * len(order), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "score": pa.array(scores[order], pa.float64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    cand = docs_ds.map_batches(score_block, batch_format="pyarrow")
    return cand.groupby("query_idx").map_groups(merge_topk,
                                                batch_format="pyarrow")
