"""Deterministic corpus sampling / splitting / quota operators.

Training-data pipeline staples the reference lacks entirely:

- :func:`hash_split` — stable train/val assignment from a content-free
  key hash: byte 0 of ``md5(str(doc_id))`` (0-255) against a cutoff.
  Purely map-side (no shuffle), reproducible across runs and engines —
  and expressible in ANSI SQL (the driver's DuckDB oracle hash-matches
  it), unlike seeded RNG splits.
- :func:`mix_sources` — deterministic source-weighted mixture sampling
  (keep probability per source in ppm, decided by a 16-bit md5 bucket):
  the data-mixing step for multi-source corpora, map-only.
- :func:`cap_per_source` — at most ``k`` documents per source, keeping
  the highest quality-score docs (tie -> smallest doc_id): the standard
  domain-quota step for Common-Crawl-style corpora where a few hosts
  dominate.  One ``groupby(source)`` shuffle moving only
  (source, doc_id, score) — never text; per-group top-k via argsort.
  Partitioning assumption: one source's (id, score) rows fit a group —
  they are ~16 bytes/doc, so even a 10^8-doc domain is ~1.6 GB; for
  heavier skew the two-phase pre-top-k combiner of
  ``kgx.ops.simsearch`` applies.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from kgx.ops.text import quality_batch


def hash_split_batch(batch: pa.Table, *, val_cutoff: int = 26) -> pa.Table:
    """(doc_id, ...) -> (doc_id, bucket 0-255, split train|val).

    ``bucket < val_cutoff`` -> val (26/256 ~ 10%).  The bucket is byte 0
    of md5(str(doc_id)) so any engine (and the SQL oracle) reproduces
    the exact assignment.
    """
    ids = batch["doc_id"].to_pylist()
    buckets = [hashlib.md5(str(d).encode()).digest()[0] for d in ids]
    return pa.table({
        "doc_id": batch["doc_id"],
        "bucket": pa.array(buckets, pa.int32()),
        "split": pa.array(
            ["val" if b < val_cutoff else "train" for b in buckets],
            pa.string()),
    })


def hash_split(docs_ds, *, val_cutoff: int = 26):
    """documents -> deterministic (doc_id, bucket, split) assignment."""
    return docs_ds.map_batches(
        lambda t: hash_split_batch(t, val_cutoff=val_cutoff),
        batch_format="pyarrow")


def mix_sources(docs_ds, *, weights_ppm: dict[str, int],
                default_ppm: int = 1_000_000):
    """Deterministic source-weighted mixture sampling: keep each document
    with its source's probability (in ppm), decided by a content-free
    16-bit hash bucket so the draw is reproducible across engines.

    bucket16 = first two bytes of ``md5(str(doc_id))``; keep iff
    ``bucket16 < (ppm * 65536) // 1_000_000`` — exact integer threshold,
    expressible in the SQL oracle.  Map-only (the per-source rate table
    is a plain dict captured in the task closure — kilobytes), no
    shuffle; this is the data-mixing step (e.g. upsample wiki, cap web)
    every multi-source training corpus needs.

    Output: (doc_id, source, bucket16, keep) for every input row —
    downstream consumers filter on ``keep`` (emitting the flag keeps the
    op oracle-checkable over the full table).
    """
    cutoffs = {s: (ppm * 65536) // 1_000_000
               for s, ppm in weights_ppm.items()}
    default_cut = (default_ppm * 65536) // 1_000_000

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        srcs = batch["source"].to_pylist()
        b16 = [int.from_bytes(
            hashlib.md5(str(d).encode()).digest()[:2], "big")
            for d in ids]
        keep = [b < cutoffs.get(s, default_cut)
                for b, s in zip(b16, srcs)]
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "bucket16": pa.array(b16, pa.int64()),
            "keep": pa.array(keep, pa.bool_()),
        })

    return docs_ds.map_batches(assign, batch_format="pyarrow")


def _top_k_group(group: pa.Table, k: int) -> pa.Table:
    ids = np.asarray(group["doc_id"].to_pylist(), dtype=np.int64)
    scores = np.asarray(group["quality_score_ppm"].to_pylist(),
                        dtype=np.int64)
    order = np.lexsort((ids, -scores))[:k]   # score desc, doc_id asc
    return pa.table({
        "source": pa.array([group["source"][0].as_py()] * len(order),
                           pa.string()),
        "doc_id": pa.array(ids[order], pa.int64()),
        "quality_score_ppm": pa.array(scores[order], pa.int64()),
        "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
    })


def cap_per_source(docs_ds, *, k: int = 10):
    """documents (doc_id, source, text) -> the k best-quality docs per
    source: (source, doc_id, quality_score_ppm, rank), rank 1..k by
    (score desc, doc_id asc)."""
    def score(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        return pa.table({
            "source": batch["source"],
            "doc_id": q["doc_id"],
            "quality_score_ppm": q["quality_score_ppm"],
        })

    scored = docs_ds.map_batches(score, batch_format="pyarrow")
    return scored.groupby("source").map_groups(
        lambda g: _top_k_group(g, k), batch_format="pyarrow")


def weighted_sample(docs_ds, *, k: int = 100, weight_col: str = "n_chars"):
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES,
    IPL 2006): each row gets key = ln(u) / w with u a deterministic
    md5-derived uniform and w its weight; the k LARGEST keys are exactly
    a weight-proportional sample without replacement.  Deterministic:
    u comes from the first 12 hex chars of ``md5(str(doc_id))`` (same
    device as ``hash_split``), so engines and runs agree.

    Scale shape: keys compute map-side; each block emits only its local
    top-k (score desc, doc_id asc) and one task merges the <= blocks x k
    partials — the same partial-top-k + single-merge shape as
    ``kgx.ops.simsearch.cosine_topk``, no corpus-sized shuffle.

    Output: (doc_id, weight, samp_key rounded to 12 dp, rank 1..k).
    """
    import hashlib

    import numpy as np

    def keys(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        w = np.asarray(batch[weight_col].to_pylist(), dtype=np.float64)
        v = np.asarray([int(hashlib.md5(str(i).encode()).hexdigest()[:12],
                            16) for i in ids], dtype=np.float64)
        u = (v + 1.0) / float(16 ** 12)            # (0, 1]
        # rank on the key ROUNDED to 12 dp so libm-vs-DuckDB ln() ulp
        # differences cannot flip near-tie ranks (oracle sorts the same
        # rounded numbers; doc_id breaks exact ties)
        key = np.round(np.log(u) / np.maximum(w, 1.0), 12)
        # block-local top-k: key desc, doc_id asc
        order = np.lexsort((ids, -key))[:k]
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "weight": pa.array(w[order].astype(np.int64), pa.int64()),
            "samp_key": pa.array(key[order], pa.float64()),
        })

    def merge(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        w = np.asarray(batch["weight"].to_pylist(), dtype=np.int64)
        key = np.asarray(batch["samp_key"].to_pylist(), dtype=np.float64)
        order = np.lexsort((ids, -key))[:k]
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "weight": pa.array(w[order], pa.int64()),
            "samp_key": pa.array(np.round(key[order], 12), pa.float64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    return (docs_ds.map_batches(keys, batch_format="pyarrow")
            .repartition(1)
            .map_batches(merge, batch_format="pyarrow", batch_size=None))
