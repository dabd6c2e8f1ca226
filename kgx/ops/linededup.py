"""Corpus-wide segment-level exact deduplication (CCNet line dedup).

CCNet / RefinedWeb drop every repeated LINE across the whole corpus
(keeping its first occurrence) before document-level dedup.  The testdata
corpus has no newlines, so the unit here is a fixed-width token segment
(``seg_tokens`` whitespace tokens, last segment ragged) — for a
newline-delimited corpus the splitter is the only thing that changes.

Scale shape (the full text never moves through a wide shuffle):

1. explode map-side to NARROW rows ``(seg_md5, doc_id, seg_no)`` — the
   segment text stays behind;
2. one ``groupby(seg_md5)`` finds each segment's global winner (smallest
   ``(doc_id, seg_no)``) and emits only the LOSING occurrences;
3. the loser list — one ``(doc_id, seg_no)`` pair per *duplicated*
   occurrence, i.e. proportional to the duplication mass, not the corpus
   — is broadcast (``ray.put``) and every document is rebuilt map-side.

PARTITIONING ASSUMPTION: the duplicate-occurrence list fits the object
store (16 bytes per dropped segment; ~1.6 GB per 10^8 duplicated
segments).  For a boilerplate-heavy corpus beyond that, replace step 3
with ``kgx.ops.joins.hash_equijoin`` of the loser rows against the docs
table on ``doc_id`` (one narrow-keyed co-shuffle of the corpus instead
of a broadcast); the semantics are identical.

Exact DuckDB oracle: window ``row_number() OVER (PARTITION BY md5(seg)
ORDER BY doc_id, seg_no)`` + conditional ``string_agg``.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import ray

# seg_no packs into the low bits of a composite int64 key.
_SEG_BITS = 20
_SEG_CAP = 1 << _SEG_BITS


def _segments(text: str, seg_tokens: int) -> list[str]:
    toks = text.split(" ")
    n = math.ceil(len(toks) / seg_tokens)
    return [" ".join(toks[i * seg_tokens:(i + 1) * seg_tokens])
            for i in range(n)]


def segment_dedup(docs_ds, *, seg_tokens: int = 10):
    """(doc_id, text) -> (doc_id, text_dedup, n_segs, n_dropped) where
    every segment that already occurred earlier in the corpus (smaller
    (doc_id, seg_no)) is removed.  ``text_dedup`` is null when every
    segment of the document was a repeat."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, segs_no, md5s = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            segs = _segments(t, seg_tokens)
            if len(segs) >= _SEG_CAP:
                raise ValueError(
                    f"doc {d} has {len(segs)} segments >= {_SEG_CAP}; "
                    "raise _SEG_BITS")
            ids.extend([d] * len(segs))
            segs_no.extend(range(len(segs)))
            # raw 16-byte digest, not hex: halves the shuffle key bytes
            # (the key is internal — the oracle compares only the rebuilt
            # documents, and any injective hash yields the same winners)
            md5s.extend(hashlib.md5(s.encode("utf-8")).digest()
                        for s in segs)
        return pa.table({
            "seg_md5": pa.array(md5s, pa.binary()),
            "doc_id": pa.array(ids, pa.int64()),
            "seg_no": pa.array(segs_no, pa.int64()),
        })

    def losers(group: pa.Table) -> pa.Table:
        ids = np.asarray(group["doc_id"].to_pylist(), dtype=np.int64)
        segs = np.asarray(group["seg_no"].to_pylist(), dtype=np.int64)
        order = np.lexsort((segs, ids))[1:]        # all but the winner
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "seg_no": pa.array(segs[order], pa.int64()),
        })

    from kgx.functions.collect import collect_arrow
    loser_tbl = collect_arrow(
        docs_ds.map_batches(explode, batch_format="pyarrow")
               .groupby("seg_md5").map_groups(losers,
                                              batch_format="pyarrow"))
    if loser_tbl.num_rows:
        drop_keys = (np.asarray(loser_tbl["doc_id"].to_pylist(),
                                dtype=np.int64) * _SEG_CAP
                     + np.asarray(loser_tbl["seg_no"].to_pylist(),
                                  dtype=np.int64))
    else:
        drop_keys = np.array([], dtype=np.int64)
    dref = ray.put(frozenset(drop_keys.tolist()))

    def rebuild(batch: pa.Table) -> pa.Table:
        drop = ray.get(dref)
        out_text, out_nseg, out_ndrop = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            segs = _segments(t, seg_tokens)
            base = d * _SEG_CAP
            kept = [s for i, s in enumerate(segs) if base + i not in drop]
            out_text.append(" ".join(kept) if kept else None)
            out_nseg.append(len(segs))
            out_ndrop.append(len(segs) - len(kept))
        return pa.table({
            "doc_id": batch["doc_id"],
            "text_dedup": pa.array(out_text, pa.string()),
            "n_segs": pa.array(out_nseg, pa.int64()),
            "n_dropped": pa.array(out_ndrop, pa.int64()),
        })

    return docs_ds.map_batches(rebuild, batch_format="pyarrow")


def boilerplate_scrub(docs_ds, *, seg_tokens: int = 10, min_docs: int = 2):
    """CCNet-style PER-SOURCE boilerplate removal: a segment occurring in
    >= ``min_docs`` DISTINCT documents of the same source is boilerplate
    (site chrome / shared disclaimer) and ALL its occurrences are removed
    — unlike :func:`segment_dedup`, which keeps one global winner.

    Scale shape:

    1. explode map-side to narrow ``(source, seg_md5, doc_id)`` rows,
       deduplicated per document IN-BATCH, so the shuffle carries at
       most one row per (doc, segment) — the text stays behind;
    2. one ``groupby(source, seg_md5)`` counts distinct documents (group
       size == the segment's doc frequency) and emits only segments at
       or above ``min_docs`` — the boilerplate set, which is tiny by
       construction (it's the *repeated* mass);
    3. the boilerplate ``(source, seg_md5)`` set broadcasts (``ray.put``)
       and every document is rebuilt map-side.

    Output: (doc_id, text_clean nullable, n_segs, n_removed).
    """

    def explode(batch: pa.Table) -> pa.Table:
        srcs, md5s = [], []
        for d, t, src in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist(),
                             batch["source"].to_pylist()):
            seen = set()
            for s in _segments(t, seg_tokens):
                h = hashlib.md5(s.encode("utf-8")).digest()
                if h not in seen:          # in-batch per-doc distinct
                    seen.add(h)
                    srcs.append(src)
                    md5s.append(h)
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "seg_md5": pa.array(md5s, pa.binary()),
        })

    def frequent(group: pa.Table) -> pa.Table:
        # rows are (source, seg_md5) once per containing doc
        if group.num_rows < min_docs:
            return pa.table({"source": pa.array([], pa.string()),
                             "seg_md5": pa.array([], pa.binary())})
        return group.slice(0, 1).select(["source", "seg_md5"])

    from kgx.functions.collect import collect_arrow
    boiler = collect_arrow(
        docs_ds.map_batches(explode, batch_format="pyarrow")
               .groupby(["source", "seg_md5"])
               .map_groups(frequent, batch_format="pyarrow"))
    bset = frozenset(zip(boiler["source"].to_pylist(),
                         boiler["seg_md5"].to_pylist()))
    bref = ray.put(bset)

    def rebuild(batch: pa.Table) -> pa.Table:
        drop = ray.get(bref)
        out_text, out_nseg, out_ndrop = [], [], []
        for t, src in zip(batch["text"].to_pylist(),
                          batch["source"].to_pylist()):
            segs = _segments(t, seg_tokens)
            kept = [s for s in segs
                    if (src, hashlib.md5(s.encode("utf-8")).digest())
                    not in drop]
            out_text.append(" ".join(kept) if kept else None)
            out_nseg.append(len(segs))
            out_ndrop.append(len(segs) - len(kept))
        return pa.table({
            "doc_id": batch["doc_id"],
            "text_clean": pa.array(out_text, pa.string()),
            "n_segs": pa.array(out_nseg, pa.int64()),
            "n_removed": pa.array(out_ndrop, pa.int64()),
        })

    return docs_ds.map_batches(rebuild, batch_format="pyarrow")
