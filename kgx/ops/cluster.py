"""Distributed k-means over an embedding column + SemDeDup semantic dedup.

The missing embedding-side curation pair for a 100 TB corpus:

- :func:`kmeans_assign` — Lloyd's iterations as broadcast + map-side
  partial sums.  Per iteration the (k x d) centroid matrix is broadcast
  ONCE (``ray.put``); every corpus block computes its assignment argmin
  with one vectorized distance evaluation and emits exactly k partial
  rows ``(cluster, count, sum-vector)``; the driver folds the <=
  k x blocks kilobyte-scale partials and re-rounds the centroids.  The
  corpus is never shuffled — the only data movement is the tiny partial
  stream, so the iteration cost is one streaming read of the embedding
  column regardless of cluster count.
- :func:`semantic_dedup` — SemDeDup (Abbas et al., 2023,
  arXiv:2303.09540): cluster, then within each cluster drop every vector
  whose cosine similarity to an EARLIER (lower-id) cluster member is
  >= threshold.  The pairwise step runs inside ``groupby(cluster)
  .map_groups`` — one matmul per cluster — so the quadratic term is
  bounded by the largest cluster, never the corpus.  PARTITIONING
  ASSUMPTION: one cluster's vectors fit a worker; at 100 TB pick
  k ~ n/10^4 (SemDeDup's own regime) so clusters stay ~10^4 rows.

Determinism (shared with the DuckDB oracle, unrolled like the PageRank
oracle): init centroids are the k lowest ``vec_id`` embeddings;
distances are euclidean rounded to 6 dp with ties broken by lowest
cluster id; centroids are re-rounded to 6 dp every update so both
engines iterate on identical numbers; empty clusters keep their previous
centroid.  The reference has no clustering stage at all (its embedding
use is the VectorRAG baseline, /root/reference/baselines/vector_rag.py);
this is the training-data surface the target scale needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from kgx.ops.simsearch import emb_matrix


def _init_centroids(emb_ds, k: int) -> np.ndarray:
    """Deterministic init: embeddings of the k smallest vec_ids.

    Lossless per-block bottom-k then one driver-side merge of
    <= k x blocks narrow rows — a global ``sort().limit(k)`` here paid
    a full range-exchange barrier over every embedding just to pick k
    rows."""
    from kgx.functions.collect import collect_arrow

    def local_bottomk(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch["vec_id"].combine_chunks())
        return batch.take(order.slice(0, k))

    tbl = collect_arrow(
        emb_ds.select_columns(["vec_id", "embedding"])
              .map_batches(local_bottomk, batch_format="pyarrow"))
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    top = np.argsort(ids, kind="stable")[:k]
    C = emb_matrix(tbl["embedding"])[top]
    return np.round(C, 6)


def _assign(M: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Argmin euclidean assignment against centroids ``C``.

    The full (rows, k, d) subtraction mirrors the oracle's per-pair
    list_distance summation closely enough that 6-dp rounding wipes
    the float-order residue; ties break to the lowest cluster id."""
    d = np.sqrt(((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
    d = np.round(d, 6)
    a = d.argmin(axis=1)                             # first min = lowest id
    return a, d[np.arange(len(a)), a]


# All kmeans stages run as plain map_batches TASKS (work-stealing, no
# actor-pool spin-up per Lloyd iteration — the pool startup dominated the
# wall time at small scale); the broadcast centroid ref resolves via a
# plasma-cached ray.get per task.

def _make_partial_fn(cref):
    def partial(batch: pa.Table) -> pa.Table:
        C = ray.get(cref)
        M = emb_matrix(batch["embedding"])
        a, _ = _assign(M, C)
        k, dim = C.shape
        counts = np.bincount(a, minlength=k)
        sums = np.zeros((k, dim), dtype=np.float64)
        np.add.at(sums, a, M)
        nz = np.flatnonzero(counts)
        return pa.table({
            "cluster": pa.array(nz, pa.int64()),
            "n": pa.array(counts[nz], pa.int64()),
            "vsum": pa.array(list(sums[nz]), pa.list_(pa.float64())),
        })
    return partial


def _make_final_fn(cref):
    def final(batch: pa.Table) -> pa.Table:
        C = ray.get(cref)
        M = emb_matrix(batch["embedding"])
        a, d = _assign(M, C)
        return pa.table({
            "vec_id": batch["vec_id"],
            "cluster": pa.array(a, pa.int64()),
            "dist": pa.array(d, pa.float64()),
        })
    return final


def _lloyd_centroids(emb_ds, *, k: int, iters: int) -> np.ndarray:
    """Run ``iters`` Lloyd updates; returns the final (k, d) centroids.

    The input is materialized ONCE up front: every Lloyd iteration (and
    the init scan) re-reads the corpus, so without caching each pass
    repeats the parquet read+decode.  The object store spills oversize
    corpora to disk, which is still cheaper than iters x decode — the
    standard iterative-refinement trade."""
    from kgx.functions.collect import collect_arrow
    emb_ds = emb_ds.materialize()
    C = _init_centroids(emb_ds, k)
    for _ in range(iters):
        cref = ray.put(C)
        partials = emb_ds.map_batches(_make_partial_fn(cref),
                                      batch_format="pyarrow")
        t = collect_arrow(partials)                  # <= k x blocks rows
        cl = np.asarray(t["cluster"].to_pylist(), dtype=np.int64)
        n = np.asarray(t["n"].to_pylist(), dtype=np.int64)
        vs = np.asarray(t["vsum"].to_pylist(), dtype=np.float64)
        nxt = C.copy()                               # empty -> keep previous
        counts = np.zeros(k, dtype=np.int64)
        np.add.at(counts, cl, n)
        sums = np.zeros_like(C)
        np.add.at(sums, cl, vs)
        live = counts > 0
        nxt[live] = np.round(sums[live] / counts[live, None], 6)
        C = nxt
    return C


def kmeans_assign(emb_ds, *, k: int = 10, iters: int = 3):
    """(vec_id, embedding) -> (vec_id, cluster, dist rounded 6dp) after
    ``iters`` deterministic Lloyd iterations."""
    emb_ds = emb_ds.materialize()   # shared with the Lloyd passes
    C = _lloyd_centroids(emb_ds, k=k, iters=iters)
    return emb_ds.map_batches(_make_final_fn(ray.put(C)),
                              batch_format="pyarrow")


def semantic_dedup(emb_ds, *, k: int = 10, iters: int = 3,
                   threshold: float = 0.4):
    """SemDeDup: kmeans-cluster, then within each cluster mark every
    vector having an earlier (lower vec_id) member with cosine >=
    ``threshold`` as a duplicate of the SMALLEST such member.

    Returns (vec_id, cluster, keep, dup_of nullable) — exact, oracle-
    checkable semantics; similarity is rounded to 6 dp before the
    threshold test so both engines agree at the boundary.
    """
    # one fused tag pass (assignment + embedding stay in the same row)
    # instead of kmeans_assign + a corpus-wide re-join on vec_id; the
    # cache is shared with the Lloyd passes (materialize is a no-op on
    # an already-materialized dataset)
    emb_ds = emb_ds.materialize()
    C = _lloyd_centroids(emb_ds, k=k, iters=iters)
    cref = ray.put(C)

    def tag(batch: pa.Table) -> pa.Table:
        M = emb_matrix(batch["embedding"])
        a, _ = _assign(M, ray.get(cref))
        return batch.append_column("cluster", pa.array(a, pa.int64()))

    from kgx.functions.collect import shuffle_coalesce

    # coalesce the tagged blocks (still full embedding payload — the
    # size-aware helper leaves production-size blocks alone) before the
    # key shuffle's B_in x B_out slice machinery
    tagged = shuffle_coalesce(
        emb_ds.map_batches(tag, batch_format="pyarrow"))

    def dedup_group(group: pa.Table) -> pa.Table:
        ids = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        M = emb_matrix(group["embedding"])[order]
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        Mn = M / norms
        S = np.round(Mn @ Mn.T, 6)
        n = len(ids)
        # first earlier member (strict lower triangle) at or above the
        # threshold, fully vectorized: argmax returns the FIRST True
        hit = np.tril(S >= threshold, -1)
        has = hit.any(axis=1)
        first = hit.argmax(axis=1)
        dup_of = np.where(has, ids[first], -1).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": group["cluster"].take(pa.array(order)),
            "keep": pa.array(dup_of < 0, pa.bool_()),
            "dup_of": pa.array(
                [None if d < 0 else int(d) for d in dup_of], pa.int64()),
        })

    return tagged.groupby("cluster").map_groups(
        dedup_group, batch_format="pyarrow")


def _lottery32(ids: np.ndarray) -> np.ndarray:
    """Deterministic 32-bit multiplicative mix of vec_id — the sampling
    lottery key.  Fully vectorized (uint64 arithmetic, no per-row Python
    hashing) and SQL-expressible without 128-bit tricks: two
    multiply-mod-2^32 rounds with xor-shift spreading, salted so 0 is
    not a fixed point.  The DuckDB oracle computes the identical value
    via HUGEINT casts (see ``_mix32_sql`` in ``__ray_entry__.py``)."""
    h = ids.astype(np.uint64) + np.uint64(1013904223)
    h = (h * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(2246822519)) & np.uint64(0xFFFFFFFF)
    h ^= h >> np.uint64(13)
    return h


def cluster_balanced_sample(emb_ds, *, k: int = 10, iters: int = 3,
                            cap: int = 32):
    """Diversity-preserving subsample: cap every kmeans cluster at
    ``cap`` members, chosen by a deterministic content-independent
    integer lottery (:func:`_lottery32` of the vec_id) with vec_id as
    tie-break.  Dominant clusters (boilerplate-heavy regions of
    embedding space) shrink to the cap; small clusters survive whole —
    the balanced-mixture shape cluster-based curation pipelines use
    after SemDeDup.

    Output: (vec_id, cluster, keep).  Same partitioning assumption as
    :func:`semantic_dedup` (one cluster per worker); the ranking is a
    vectorized argsort per group.
    """
    emb_ds = emb_ds.materialize()   # shared with the Lloyd passes
    C = _lloyd_centroids(emb_ds, k=k, iters=iters)
    cref = ray.put(C)

    def tag(batch: pa.Table) -> pa.Table:
        M = emb_matrix(batch["embedding"])
        a, _ = _assign(M, ray.get(cref))
        return pa.table({
            "vec_id": batch["vec_id"],
            "cluster": pa.array(a, pa.int64()),
        })

    def sample_group(group: pa.Table) -> pa.Table:
        ids = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
        order = np.lexsort((ids, _lottery32(ids)))
        keep = np.zeros(len(ids), dtype=bool)
        keep[order[:cap]] = True
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": group["cluster"],
            "keep": pa.array(keep, pa.bool_()),
        })

    from kgx.functions.collect import shuffle_coalesce
    return (shuffle_coalesce(emb_ds.map_batches(tag,
                                                batch_format="pyarrow"))
            .groupby("cluster").map_groups(sample_group,
                                           batch_format="pyarrow"))


def label_stats(emb_ds, *, label_col: str = "label"):
    """Per-label embedding statistics — the supervised complement of
    kmeans: each label's member count, centroid L2 norm, and cohesion
    (mean euclidean distance of members to their label centroid).

    Two streamed passes, nothing corpus-sized moves: pass 1 folds
    per-label (count, sum-vector) partials map-side exactly like the
    Lloyd partial; the driver builds centroids (per-dim mean rounded to
    6 dp — shared with the SQL oracle, same device as kmeans); pass 2
    broadcasts the centroid matrix and folds per-label distance sums.
    Distances round to 6 dp per vector before summing and the mean
    rounds to 4 dp, wiping cross-engine float-order residue.
    Output: (label, n_vecs, centroid_norm 6dp, mean_dist 4dp).
    """
    from kgx.functions.collect import collect_arrow

    def part1(batch: pa.Table) -> pa.Table:
        M = emb_matrix(batch["embedding"])
        labels = np.asarray(batch[label_col].to_pylist(), dtype=np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), M.shape[1]))
        np.add.at(sums, inv, M)                 # vectorized per-label fold
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(uniq, pa.int64()),
            "n": pa.array(counts, pa.int64()),
            "vsum": pa.array(list(sums), pa.list_(pa.float64())),
        })

    t = collect_arrow(emb_ds.map_batches(part1, batch_format="pyarrow"))
    labels = sorted(set(t["label"].to_pylist()))
    lab_ix = {u: i for i, u in enumerate(labels)}
    dim = len(t["vsum"][0].as_py()) if t.num_rows else 0
    sums = np.zeros((len(labels), dim))
    counts = np.zeros(len(labels), dtype=np.int64)
    for r in t.to_pylist():
        i = lab_ix[r["label"]]
        sums[i] += np.asarray(r["vsum"])
        counts[i] += r["n"]
    C = np.round(sums / counts[:, None], 6)
    cref = ray.put((pa.array(labels, pa.int64()), C))

    def part2(batch: pa.Table) -> pa.Table:
        ls, cc = ray.get(cref)
        M = emb_matrix(batch["embedding"])
        import pyarrow.compute as pc
        li = pc.index_in(pa.array(batch[label_col].to_pylist(), pa.int64()),
                         value_set=ls).to_numpy(zero_copy_only=False) \
               .astype(np.int64)
        d = np.round(np.sqrt(((M - cc[li]) ** 2).sum(axis=1)), 6)
        dsum = np.zeros(len(ls))
        np.add.at(dsum, li, d)
        nz = np.flatnonzero(dsum > 0)
        return pa.table({
            "label": pa.array(np.asarray(ls)[nz], pa.int64()),
            "dsum": pa.array(dsum[nz], pa.float64()),
        })

    t2 = collect_arrow(emb_ds.map_batches(part2, batch_format="pyarrow"))
    dsum = np.zeros(len(labels))
    for r in t2.to_pylist():
        dsum[lab_ix[r["label"]]] += r["dsum"]
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "label": pa.array(labels, pa.int64()),
        "n_vecs": pa.array(counts, pa.int64()),
        "centroid_norm": pa.array(
            np.round(np.sqrt((C ** 2).sum(axis=1)), 6), pa.float64()),
        "mean_dist": pa.array(np.round(dsum / counts, 4), pa.float64()),
    }))
