"""Text-analysis operators over a document corpus.

All are stateless vectorized ``map_batches`` transforms (pyarrow.compute /
polars kernels — no Python loop over rows in the hot path) over a table
with at least ``(doc_id, text)``:

- :func:`token_stats_batch` — whitespace + regex ("BPE-ish") token counts;
- :func:`quality_batch` — quality-scoring features (type/token ratio, mean
  token length, stopword ratio) and a composite score;
- :func:`lang_id_batch` — marker-token n-gram-free language-ID heuristic;
- :func:`fingerprint_batch` — exact md5 fingerprint + byte length;
- :func:`winnow_batch` — winnowing rolling-hash document fingerprints
  (Schleimer et al., SIGMOD 2003), the document-fingerprinting primitive
  for shingle-level provenance.

Each has an exact ANSI-SQL equivalent registered in ``__ray_entry__
.oracle_sql`` (winnowing via order-free aggregates of its selected
fingerprint set).  The reference has no
text-analysis stage at all (its corpus handling is a directory read,
/root/reference/graphrag_lite_x.py:130-148); these operators are the
training-data-pipeline surface the 100 TB target needs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

# Whitespace tokens and a BPE-ish regex tokenization (letter runs / digit
# runs / single punctuation), shared verbatim with the SQL oracles.
WS_TOKEN_RE = r"\S+"
BPE_TOKEN_RE = r"[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9\s]"

# Fixed stopword list (shared with the SQL oracle; keep sorted).
STOPWORDS = ("a", "an", "and", "in", "is", "of", "on", "the", "to", "with")

# Marker tokens per language for the heuristic language-ID.  Deterministic
# argmax by (count desc, lang asc); all-zero -> "und".
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein"),
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "es": ("el", "los", "las", "una", "que", "es", "y"),
    "fr": ("le", "les", "des", "une", "est", "et", "dans"),
}


def _count_re(col: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    return pc.count_substring_regex(col, pattern)


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> per-doc token counts, fully vectorized."""
    text = batch["text"]
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        "n_ws_tokens": pc.cast(_count_re(text, WS_TOKEN_RE), pa.int64()),
        "n_re_tokens": pc.cast(_count_re(text, BPE_TOKEN_RE), pa.int64()),
    })


def quality_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> quality features + composite score.

    type_token_ratio needs a per-row distinct count — done with polars list
    kernels (vectorized), everything else with pyarrow.compute.  Floats are
    rounded to 6 dp so the DuckDB oracle hashes identically.
    """
    text = batch["text"]
    n_tok = pc.cast(_count_re(text, WS_TOKEN_RE), pa.int64())
    # total non-whitespace chars -> mean token length without materializing
    # token lists
    squashed = pc.replace_substring_regex(text, r"\s+", "")
    n_nonws = pc.cast(pc.utf8_length(squashed), pa.int64())

    df = pl.from_arrow(pa.table({"text": text}))
    toks = df["text"].str.extract_all(WS_TOKEN_RE)
    n_distinct = toks.list.n_unique().cast(pl.Int64)
    n_stop = (toks.list.eval(pl.element().is_in(list(STOPWORDS)))
              .list.sum().cast(pl.Int64))

    n_tok_np = n_tok.to_numpy(zero_copy_only=False).astype(np.int64)
    safe = np.maximum(n_tok_np, 1)
    safe_f = safe.astype(np.float64)
    ttr = np.round(n_distinct.to_numpy().astype(np.float64) / safe_f, 6)
    mean_len = np.round(
        n_nonws.to_numpy(zero_copy_only=False).astype(np.float64) / safe_f, 6)
    stop_ratio = np.round(n_stop.to_numpy().astype(np.float64) / safe_f, 6)
    # composite score in exact integer parts-per-million (floor division):
    # float weights would park k/64-style ratios exactly on .5e-6 rounding
    # boundaries, where numpy (half-to-even) and SQL (half-away) disagree
    score_ppm = (4000 * np.minimum(n_tok_np, 100)
                 + (300000 * n_distinct.to_numpy().astype(np.int64)) // safe
                 + (300000 * n_stop.to_numpy().astype(np.int64)) // safe)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": n_tok,
        "n_distinct_tokens": pa.array(n_distinct.to_numpy(), pa.int64()),
        "type_token_ratio": pa.array(ttr, pa.float64()),
        "mean_token_len": pa.array(mean_len, pa.float64()),
        "stopword_ratio": pa.array(stop_ratio, pa.float64()),
        "quality_score_ppm": pa.array(score_ppm, pa.int64()),
    })


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> predicted language by marker-token counts."""
    text = batch["text"]
    langs = sorted(LANG_MARKERS)
    counts = []
    for lang in langs:
        pattern = r"\b(?:" + "|".join(LANG_MARKERS[lang]) + r")\b"
        counts.append(
            _count_re(text, pattern).to_numpy(zero_copy_only=False)
            .astype(np.int64))
    C = np.stack(counts, axis=1)                      # n_rows x n_langs
    best = C.argmax(axis=1)                           # ties -> smallest index
    best_count = C[np.arange(len(C)), best]           # = lang asc (sorted)
    pred = np.where(best_count > 0, np.array(langs)[best], "und")
    return pa.table({
        "doc_id": batch["doc_id"],
        "pred_lang": pa.array(pred.tolist(), pa.string()),
        "marker_hits": pa.array(best_count, pa.int64()),
    })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> exact md5 fingerprint + utf-8 byte length."""
    texts = batch["text"].to_pylist()
    return pa.table({
        "doc_id": batch["doc_id"],
        "fingerprint": pa.array(
            [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts],
            pa.string()),
        "n_bytes": pa.array([len(t.encode("utf-8")) for t in texts],
                            pa.int64()),
    })


def _winnow(tokens: list[str], k: int, w: int) -> list[int]:
    """Winnowing fingerprint: min hash in each window of w k-gram hashes,
    deduplicated while preserving first-selection order.

    The k-gram hash is the big-endian first 4 bytes of md5 — chosen over
    crc32 so the DuckDB oracle can mirror the selected-set aggregates
    exactly (DuckDB has md5 but no crc32)."""
    if len(tokens) < k:
        return []
    hashes = [int.from_bytes(
        hashlib.md5(" ".join(tokens[i:i + k]).encode()).digest()[:4], "big")
        for i in range(len(tokens) - k + 1)]
    if len(hashes) <= w:
        return [min(hashes)]
    out, seen = [], set()
    for i in range(len(hashes) - w + 1):
        m = min(hashes[i:i + w])
        if m not in seen:
            seen.add(m)
            out.append(m)
    return out


def winnow_batch(batch: pa.Table, *, k: int = 3, w: int = 4) -> pa.Table:
    """(doc_id, text) -> winnowing fingerprint set per document."""
    texts = batch["text"].to_pylist()
    prints = [_winnow(t.split(), k, w) for t in texts]
    return pa.table({
        "doc_id": batch["doc_id"],
        "fingerprints": pa.array(prints, pa.list_(pa.int64())),
        "n_fingerprints": pa.array([len(p) for p in prints], pa.int64()),
    })


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition features per document (Rae et al. 2021,
    arXiv:2112.11446 §A1.1): the fraction of all word bigrams / trigrams
    taken by the single most frequent one, in exact integer ppm so the
    distributed result hash-matches the SQL-window oracle.

    (doc_id, text) -> (doc_id, n_bigrams, top_bigram_ppm, n_trigrams,
    top_trigram_ppm); counts are over ``text.split(' ')`` tokens (the
    same splitter as the segment-dedup oracle).  Map-only, no shuffle —
    the hot cost is the per-doc Counter, bounded by tokens/doc.
    """
    from collections import Counter

    n_bi, top_bi, n_tri, top_tri = [], [], [], []
    for t in batch["text"].to_pylist():
        toks = t.split(" ")
        bi = Counter(zip(toks, toks[1:]))
        tri = Counter(zip(toks, toks[1:], toks[2:]))
        nb, nt = sum(bi.values()), sum(tri.values())
        n_bi.append(nb)
        top_bi.append((max(bi.values()) * 1_000_000) // nb if nb else 0)
        n_tri.append(nt)
        top_tri.append((max(tri.values()) * 1_000_000) // nt if nt else 0)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_bigrams": pa.array(n_bi, pa.int64()),
        "top_bigram_ppm": pa.array(top_bi, pa.int64()),
        "n_trigrams": pa.array(n_tri, pa.int64()),
        "top_trigram_ppm": pa.array(top_tri, pa.int64()),
    })


def source_stats(docs_ds):
    """Per-source corpus stats (partial-aggregate groupby): doc count,
    total/mean characters.  The webtext analog is per-domain crawl stats;
    exact SQL oracle over the documents table."""
    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "source": batch["source"],
            "n_chars": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
        })
        return (t.group_by(["source"])
                 .aggregate([("n_chars", "sum"), ("n_chars", "count")]))

    def final(group: pa.Table) -> pa.Table:
        chars = sum(group["n_chars_sum"].to_pylist())
        n = sum(group["n_chars_count"].to_pylist())
        return pa.table({
            "source": group["source"].slice(0, 1),
            "n_docs": pa.array([n], pa.int64()),
            "total_chars": pa.array([chars], pa.int64()),
            "mean_chars_milli": pa.array([(chars * 1000) // n], pa.int64()),
        })

    from kgx.functions.collect import shuffle_coalesce
    partial_ds = shuffle_coalesce(
        docs_ds.map_batches(partial, batch_format="pyarrow"))
    return partial_ds.groupby("source").map_groups(
        final, batch_format="pyarrow")


def filter_quality(docs_ds, *, min_score_ppm: int = 300_000,
                   langs: tuple[str, ...] | None = None):
    """Training-corpus culling: keep documents whose composite quality
    score reaches ``min_score_ppm`` and (optionally) whose predicted
    language is in ``langs``.  Pure map_batches composition of
    :func:`quality_batch` + :func:`lang_id_batch` — no shuffle; emits the
    surviving (doc_id, text, quality_score_ppm, pred_lang) rows.
    """
    def one_batch(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        l = lang_id_batch(batch)
        keep = pc.greater_equal(q["quality_score_ppm"], min_score_ppm)
        if langs:
            lang_ok = pc.is_in(l["pred_lang"],
                               value_set=pa.array(list(langs)))
            keep = pc.and_(keep, lang_ok)
        out = pa.table({
            "doc_id": batch["doc_id"],
            "text": batch["text"],
            "quality_score_ppm": q["quality_score_ppm"],
            "pred_lang": l["pred_lang"],
        })
        return out.filter(keep)

    return docs_ds.map_batches(one_batch, batch_format="pyarrow")


def quality_gate(docs_ds, *, q_num: int = 1, q_den: int = 4,
                 keep_rows: bool = False):
    """Per-source adaptive quality filter: a document passes iff its
    integer quality score (``quality_batch``'s exact ppm composite) is
    >= its OWN source's q-th order-statistic threshold — the adaptive
    analog of a fixed quality cutoff (per-site quality floors differ
    wildly in web corpora).

    The threshold is the exact lower order statistic: the score at
    sorted position ``floor((n-1) * q_num/q_den)`` within the source
    (no interpolation — integer scores stay integers, so the SQL oracle
    matches bit for bit).

    Scale shape: scores compute map-side (vectorized ``quality_batch``
    kernels); ONE narrow ``(source, score)`` groupby computes each
    source's threshold (group size = docs per source — the corpus-skew
    bound; a 10^9-doc source needs the exact-quantile histogram route of
    ``kgx.ops.quantile.exact_quantiles`` instead); the tiny per-source
    threshold map broadcasts and the verdict is a map-side compare.
    Output: (doc_id, source, quality_score_ppm, threshold_ppm, keep) —
    or, with ``keep_rows=True``, the ORIGINAL rows filtered to the
    keepers (the composable form ``kgx.pipelines.curate`` chains).
    """
    import ray

    def scores(batch: pa.Table) -> pa.Table:
        qb = quality_batch(batch)
        t = pa.table({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "quality_score_ppm": qb["quality_score_ppm"],
        })
        if keep_rows and "text" in batch.column_names:
            t = t.append_column("text", batch["text"])
        return t

    scored = docs_ds.map_batches(scores, batch_format="pyarrow") \
                    .materialize()

    def threshold(group: pa.Table) -> pa.Table:
        s = np.sort(group["quality_score_ppm"]
                    .to_numpy(zero_copy_only=False))
        pos = ((len(s) - 1) * q_num) // q_den
        return pa.table({
            "source": group["source"].slice(0, 1),
            "threshold_ppm": pa.array([int(s[pos])], pa.int64()),
        })

    from kgx.functions.collect import collect_arrow, shuffle_coalesce
    thr = collect_arrow(
        shuffle_coalesce(scored.map_batches(
            lambda t: t.select(["source", "quality_score_ppm"]),
            batch_format="pyarrow"))
        .groupby("source").map_groups(threshold, batch_format="pyarrow"))
    tref = ray.put((thr["source"].combine_chunks(),
                    thr["threshold_ppm"].combine_chunks()))

    def verdict(batch: pa.Table, _tref=tref) -> pa.Table:
        srcs, ths = ray.get(_tref)
        idx = pc.index_in(batch["source"].combine_chunks(), value_set=srcs)
        th = pc.take(ths, idx)
        keep = pc.greater_equal(batch["quality_score_ppm"], th)
        if keep_rows:
            return pa.table({
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "text": batch["text"],
            }).filter(keep)
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "quality_score_ppm": batch["quality_score_ppm"],
            "threshold_ppm": th,
            "keep": keep,
        })

    return scored.map_batches(verdict, batch_format="pyarrow")
