"""Training-pair construction for contrastive / embedding training.

The last mile of a training-data pipeline: turning a curated embedding
corpus into (anchor, positive, negative) training examples.  Two
operators:

- :func:`negative_samples` — k deterministic uniform negatives per
  anchor, drawn by an integer mix (no RNG state, no shuffle): draw j for
  anchor a indexes the sorted id directory at
  ``mix32(a * 1000003 + j * 7919 + seed) % n`` (self-collisions step to
  the next id).  Draws are with replacement across j — the standard
  in-batch-negatives contract, stated rather than hidden.  EXACT DuckDB
  oracle: the same mix arithmetic over a ``list(vec_id ORDER BY
  vec_id)`` directory.
- :func:`contrastive_triplets` — composes the rank-1 exact kNN neighbor
  (:func:`kgx.ops.simsearch.knn_self_join`, the blocked no-broadcast
  form) as the positive with :func:`negative_samples` negatives into
  (anchor, pos_id, j, neg_id) rows.

Scale shape: the only driver/broadcast state is the ID DIRECTORY (the
sorted int64 vec_id column, 8 B/row — ~8 GB at 10^9 rows; past that,
swap the directory for a range-partitioned lookup table and the draw
stays identical).  The draw itself is map-side and vectorized
((anchors x k) uint64 mix, one gather, one collision re-gather); the
triplet join is a narrow (vec_id, pos_id) co-shuffle against the kNN
output.  The reference has no training-pair surface; this extends its
embedding side (/root/reference/baselines/vector_rag.py) toward the
contrastive-training pipelines that consume curated corpora.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from kgx.ops.cluster import _lottery32


def _mix_draw(anchors: np.ndarray, k: int, seed: int) -> np.ndarray:
    """(m, k) uint64 draw keys: mix32(a * 1000003 + j * 7919 + seed),
    j = 1..k — BIGINT-safe in DuckDB (see ``_mix32_sql``)."""
    js = np.arange(1, k + 1, dtype=np.int64)
    x = anchors[:, None] * np.int64(1000003) + js[None, :] * np.int64(7919) \
        + np.int64(seed)
    return _lottery32(x.ravel()).reshape(len(anchors), k)


def negative_samples(emb_ds, *, k: int = 4, seed: int = 101):
    """k deterministic uniform negatives per vec_id.

    Output: (vec_id, j 1..k, neg_id), neg_id != vec_id; draws are with
    replacement across j.  Hash-exact against the DuckDB oracle
    (``mix32`` twin expressions on both sides).
    """
    from kgx.functions.collect import collect_arrow

    ids_tbl = collect_arrow(emb_ds.select_columns(["vec_id"]))
    ids = np.sort(np.asarray(ids_tbl["vec_id"].to_pylist(),
                             dtype=np.int64))
    n = len(ids)
    dref = ray.put(ids)

    def draw(batch: pa.Table) -> pa.Table:
        directory = ray.get(dref)
        anchors = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        if not len(anchors):
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "neg_id": pa.array([], pa.int64())})
        idx = (_mix_draw(anchors, k, seed) % np.uint64(n)).astype(np.int64)
        neg = directory[idx]
        hit = neg == anchors[:, None]            # self-collision: step on
        idx = np.where(hit, (idx + 1) % n, idx)
        neg = directory[idx]
        m = len(anchors)
        return pa.table({
            "vec_id": pa.array(np.repeat(anchors, k), pa.int64()),
            "j": pa.array(np.tile(np.arange(1, k + 1, dtype=np.int64), m),
                          pa.int64()),
            "neg_id": pa.array(neg.ravel(), pa.int64()),
        })

    return emb_ds.map_batches(draw, batch_format="pyarrow")


def contrastive_triplets(emb_ds, *, k_neg: int = 2, seed: int = 101,
                         n_blocks: int = 8):
    """(anchor, positive, negative) triplets: positive = the anchor's
    exact rank-1 cosine neighbor (blocked kNN join, no broadcast),
    negatives = :func:`negative_samples` draws.  Output: (vec_id,
    pos_id, pos_score, j, neg_id), k_neg rows per anchor."""
    from kgx.ops.joins import hash_equijoin
    from kgx.ops.simsearch import knn_self_join

    pos = knn_self_join(emb_ds, k=1, n_blocks=n_blocks) \
        .map_batches(lambda t: pa.table({
            "vec_id": t["vec_id"],
            "pos_id": t["neighbor_id"],
            "pos_score": t["score"],
        }), batch_format="pyarrow")
    neg = negative_samples(emb_ds, k=k_neg, seed=seed)
    joined = hash_equijoin(pos, neg, left_on="vec_id",
                           right_on="vec_id")
    return joined.map_batches(
        lambda t: t.select(["vec_id", "pos_id", "pos_score", "j",
                            "neg_id"]),
        batch_format="pyarrow")
