"""DSIR-style hashed-n-gram importance weights for data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
arXiv:2302.03169) scores every raw document by how much more likely its
hashed-n-gram features are under a TARGET distribution (the
high-quality corpus you want more of) than under the RAW distribution
(the crawl you are filtering), then resamples by that weight.  The
reference repo has no data-selection surface at all (its corpus is ten
curated articles, /root/reference/data); at 100 TB this is the step
that decides what the KG/extraction stages ever see, so it is a
first-class operator here.

This implementation uses hashed UNIGRAM features (the paper's
bag-of-hashed-ngrams with n=1) over the repo-wide whitespace
tokenization (``\\S+`` of ``lower(trim(text))`` — same tokens as
kgx/ops/vocab.py:unigram_logprob), bucketed to ``n_buckets`` by the
md5-high64 idiom shared with every oracle
(``CAST('0x' || substr(md5(tok), 1, 16) AS UBIGINT) % n_buckets``).

Scale shape (100 TB path):

- Pass 1 streams the corpus once: each batch folds its tokens into a
  <= ``n_buckets``-row partial ((bucket, target_count, raw_count) —
  one row per distinct bucket per batch, never per occurrence); the
  partials fold driver-side into two length-``n_buckets`` int arrays
  (KILOBYTE-scale state — the whole point of feature hashing is that
  the model size is fixed at ``n_buckets``, independent of corpus
  size) and the per-bucket log-ratio table broadcasts once via
  ``ray.put``.
- Pass 2 streams the corpus again and scores each document map-side
  against the broadcast array — zero shuffle; the output is one narrow
  row per document.

Determinism (shared device set with vocab.py): the per-bucket
log-likelihood ratio is fixed to integer MICRO units first ::

    lr_micro[b] = floor(ln( ((t_c+1) * (r_tot+D))
                          / ((t_tot+D) * (r_c+1)) ) * 1e6 + 0.5)

(add-one smoothing on both sides, single ``ln`` of a quotient of exact
integer-valued doubles — the identical IEEE expression runs in the SQL
oracle), so the per-document sum is order-independent integer
arithmetic.  RANGE ASSUMPTION: the smoothed cross products must stay
exactly representable in a double — (t_c+1)*(r_tot+D) < 2^53, i.e.
corpus token counts below ~9e15 / max-bucket-count; beyond that, move
the ratio to Python-int cross multiplication before the ``ln``.

Output: (doc_id, n_tokens, dsir_score_micro) for every document with
non-blank text.  Selection is a downstream ``sort + limit`` (or a
weighted lottery like kgx/ops/sampling.py) over this narrow table.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import ray

from kgx.functions.collect import collect_arrow
from kgx.ops.vocab import _WS


def _bucket_of(tok: str, n_buckets: int) -> int:
    """md5-high64 % n_buckets — byte-for-byte the oracle idiom
    ``CAST('0x' || substr(md5(tok), 1, 16) AS UBIGINT) % n_buckets``."""
    h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8],
                       "big")
    return h % n_buckets


def dsir_weights(docs_ds, *, target_lang: str = "en",
                 n_buckets: int = 4096):
    """Per-document DSIR importance score vs the ``lang == target_lang``
    target slice -> (doc_id, n_tokens, dsir_score_micro).

    ``docs_ds`` needs (doc_id, text, lang).  The target slice stands in
    for the curated target corpus of the DSIR recipe; any boolean
    target predicate computable per row slots in the same way.
    """
    def count_partial(batch: pa.Table) -> pa.Table:
        t_c: dict[int, int] = {}
        r_c: dict[int, int] = {}
        memo: dict[str, int] = {}
        for text, lang in zip(batch["text"].to_pylist(),
                              batch["lang"].to_pylist()):
            stripped = (text or "").strip()
            if not stripped:
                continue
            is_target = lang == target_lang
            for tok in _WS.split(stripped.lower()):
                b = memo.get(tok)
                if b is None:
                    b = memo[tok] = _bucket_of(tok, n_buckets)
                r_c[b] = r_c.get(b, 0) + 1
                if is_target:
                    t_c[b] = t_c.get(b, 0) + 1
        buckets = sorted(r_c)
        return pa.table({
            "bucket": pa.array(buckets, pa.int64()),
            "t_c": pa.array([t_c.get(b, 0) for b in buckets], pa.int64()),
            "r_c": pa.array([r_c[b] for b in buckets], pa.int64()),
        })

    parts = collect_arrow(
        docs_ds.map_batches(count_partial, batch_format="pyarrow"))
    t_arr = np.zeros(n_buckets, dtype=np.int64)
    r_arr = np.zeros(n_buckets, dtype=np.int64)
    if parts.num_rows:
        idx = parts["bucket"].to_numpy(zero_copy_only=False)
        np.add.at(t_arr, idx, parts["t_c"].to_numpy(zero_copy_only=False))
        np.add.at(r_arr, idx, parts["r_c"].to_numpy(zero_copy_only=False))
    t_tot = int(t_arr.sum())
    r_tot = int(r_arr.sum())
    # Identical IEEE expression to the SQL oracle: one ln of a quotient
    # of exact-integer doubles, per bucket, in Python-float (=C double).
    lr_micro = np.asarray(
        [math.floor(math.log(((tc + 1.0) * (r_tot + n_buckets))
                             / ((t_tot + n_buckets) * (rc + 1.0)))
                    * 1e6 + 0.5)
         for tc, rc in zip(t_arr.tolist(), r_arr.tolist())],
        dtype=np.int64)
    lref = ray.put(lr_micro)

    def score(batch: pa.Table, _lref=lref) -> pa.Table:
        lr = ray.get(_lref)
        memo: dict[str, int] = {}
        ids, ns, scores = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            stripped = (text or "").strip()
            if not stripped:
                continue
            toks = _WS.split(stripped.lower())
            s = 0
            for tok in toks:
                b = memo.get(tok)
                if b is None:
                    b = memo[tok] = _bucket_of(tok, n_buckets)
                s += int(lr[b])
            ids.append(doc_id)
            ns.append(len(toks))
            scores.append(s)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(ns, pa.int64()),
            "dsir_score_micro": pa.array(scores, pa.int64()),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow")
