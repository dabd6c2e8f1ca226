"""Near-duplicate entity merging (SURVEY.md §2.5 O1 extension).

The reference's resolver merges entities whose EMBEDDING cosine exceeds
0.85 in a greedy, order-dependent O(n²) scan
(/root/reference/extraction/entity_resolver.py:25-56).  Exact-on-
normalized-name canonicalization (kgx.stages.canonicalize) replaces most
of that; this optional second pass recovers the *near-miss* merges
("Acme Corp" vs "Acme Corporation") with a scalable, order-independent
construction:

1. character-shingle MinHash signatures of each canonical node's
   normalized name, banded LSH — ``map_batches`` over the nodes table;
2. ``groupby(band, bucket)`` emits candidate pairs with
   signature-estimated Jaccard >= threshold (only same-bucket names are
   ever compared — no pairwise matrix);
3. candidate pairs are tiny (bounded by true near-duplicates); a
   driver-side union-find picks each component's canonical member — the
   highest-``n_instances`` node, ties to the smallest ``entity_id``
   (deterministic, unlike the reference's insertion-order winner);
4. a broadcast remap dict rewrites ids in ``map_batches`` and a final
   ``groupby(entity_id)`` merges member rows (longest description, alias
   and instance union, summed counts) + global re-sort.

The merged node keeps the canonical member's ``entity_id`` (a content
hash of its normalized name), so downstream alias maps resolve every
surface form of every member.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from kgx.functions.normalize import normalize
from kgx.stages.canonicalize import (NODES_SCHEMA, _better_desc,
                                     _cap_instances, DEFAULT_INSTANCE_CAP)


def _char_shingles(norm: str, k: int) -> np.ndarray:
    s = f" {norm} "
    if len(s) <= k:
        grams = [s]
    else:
        grams = [s[i:i + k] for i in range(len(s) - k + 1)]
    return np.unique(np.asarray(
        [int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                        "big") for g in grams], dtype=np.uint64))


def _signature(shingles: np.ndarray, a: np.ndarray,
               b: np.ndarray) -> np.ndarray:
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return (shingles[:, None] * (a | np.uint64(1)) + b).min(axis=0)


def _perm_params(num_perm: int, seed: int):
    rng = np.random.default_rng(seed)
    return (rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64),
            rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64))


def band_nodes(nodes_ds, *, num_perm: int = 32, bands: int = 8, k: int = 3,
               seed: int = 17):
    """nodes -> (band, bucket, entity_id, n_instances, sig) rows."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands

    def to_bands(batch: pa.Table) -> pa.Table:
        a, b = _perm_params(num_perm, seed)  # derived per worker, seeded
        band_c, bucket_c, eid_c, n_c, sig_c = [], [], [], [], []
        for eid, name, n in zip(batch["entity_id"].to_pylist(),
                                batch["name"].to_pylist(),
                                batch["n_instances"].to_pylist()):
            sig = _signature(_char_shingles(normalize(name), k), a, b)
            sig_list = sig.tolist()
            for band in range(bands):
                chunk = sig[band * rows_per_band:(band + 1) * rows_per_band]
                band_c.append(band)
                bucket_c.append(hashlib.blake2b(
                    chunk.tobytes(), digest_size=8).hexdigest())
                eid_c.append(eid)
                n_c.append(n)
                sig_c.append(sig_list)
        return pa.table({
            "band": pa.array(band_c, pa.int32()),
            "bucket": pa.array(bucket_c, pa.string()),
            "entity_id": pa.array(eid_c, pa.string()),
            "n_instances": pa.array(n_c, pa.int64()),
            "sig": pa.array(sig_c, pa.list_(pa.uint64())),
        })

    return nodes_ds.map_batches(to_bands, batch_format="pyarrow")


def candidate_pairs(banded_ds, *, threshold: float):
    """groupby(band, bucket) -> (id_a < id_b, est_jaccard, n_a, n_b)."""
    def pairs(group: pa.Table) -> pa.Table:
        ids = group["entity_id"].to_pylist()
        ns = group["n_instances"].to_pylist()
        sigs = group["sig"].to_pylist()
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        a_c, b_c, j_c, na_c, nb_c = [], [], [], [], []
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                i, j = order[x], order[y]
                if ids[i] == ids[j]:
                    continue
                est = float((np.asarray(sigs[i]) ==
                             np.asarray(sigs[j])).mean())
                if est >= threshold:
                    a_c.append(ids[i]); b_c.append(ids[j])
                    j_c.append(est); na_c.append(ns[i]); nb_c.append(ns[j])
        return pa.table({
            "id_a": pa.array(a_c, pa.string()),
            "id_b": pa.array(b_c, pa.string()),
            "est_jaccard": pa.array(j_c, pa.float64()),
            "n_a": pa.array(na_c, pa.int64()),
            "n_b": pa.array(nb_c, pa.int64()),
        })

    return banded_ds.groupby(["band", "bucket"]).map_groups(
        pairs, batch_format="pyarrow")


def build_remap(pairs_tbl: pa.Table) -> dict[str, str]:
    """Union-find over candidate pairs -> {member_id: canonical_id}.

    Canonical member of each component: max n_instances, tie -> smallest
    entity_id (order-independent, unlike entity_resolver.py:36-45)."""
    parent: dict[str, str] = {}
    weight: dict[str, int] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, na, nb in zip(pairs_tbl["id_a"].to_pylist(),
                            pairs_tbl["id_b"].to_pylist(),
                            pairs_tbl["n_a"].to_pylist(),
                            pairs_tbl["n_b"].to_pylist()):
        for x, n in ((a, na), (b, nb)):
            if x not in parent:
                parent[x] = x
                weight[x] = n
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    comps: dict[str, list[str]] = {}
    for x in parent:
        comps.setdefault(find(x), []).append(x)
    remap: dict[str, str] = {}
    for members in comps.values():
        canon = min(members, key=lambda m: (-weight[m], m))
        for m in members:
            if m != canon:
                remap[m] = canon
    return remap


def _merge_member_group(group: pa.Table,
                        cap: int = DEFAULT_INSTANCE_CAP) -> pa.Table:
    rows = group.to_pylist()
    if len(rows) == 1:
        return group.select([f.name for f in NODES_SCHEMA])
    canon_id = rows[0]["entity_id"]  # all rows share the remapped id
    canon = next(r for r in rows if r["_orig_id"] == canon_id)
    desc = ""
    aliases: set[str] = set()
    insts: list[tuple] = []
    n = 0
    for r in rows:
        desc = _better_desc(desc, r["description"] or "")
        aliases.update(r["aliases"] or [])
        aliases.add(r["name"])
        insts.extend((i["url"], i["chunk_id"]) for i in r["instances"])
        n += r["n_instances"]
    inst = _cap_instances(insts, cap)
    row = {
        "entity_id": [canon_id],
        "name": [canon["name"]],
        "type": [canon["type"]],
        "description": [desc],
        "aliases": [sorted(aliases)],
        "n_instances": [n],
        "instances": [[{"url": u, "chunk_id": c} for u, c in inst]],
    }
    return pa.table({f.name: pa.array(row[f.name], f.type)
                     for f in NODES_SCHEMA})


def _name_embed(norm: str, dim: int) -> np.ndarray:
    """Deterministic character-shingle feature-hash embedding of a
    normalized name: each 3-shingle lands in bucket ``h % dim`` with a
    sign from the hash's top bit, L2-normalized.  Near-duplicate
    surface forms share most shingles, so their cosine is high — the
    sandbox stand-in for the reference resolver's name-embedding model
    (/root/reference/extraction/entity_resolver.py:25-56); a real
    encoder drops in by replacing this one function."""
    sh = _char_shingles(norm, 3)
    v = np.zeros(dim, dtype=np.float64)
    if len(sh):
        idx = (sh % np.uint64(dim)).astype(np.int64)
        sign = np.where((sh >> np.uint64(63)) & np.uint64(1), 1.0, -1.0)
        np.add.at(v, idx, sign)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def band_nodes_cosine(nodes_ds, *, dim: int = 64, n_tables: int = 24,
                      n_bits: int = 4, seed: int = 23):
    """nodes -> (band, bucket, entity_id, n_instances, emb) LSH rows:
    ``n_tables`` independent random-hyperplane sign buckets of ``n_bits``
    each over the name embedding.  A corpus row lands in one bucket PER
    TABLE (n_tables-fold replication of the tiny nodes table), giving
    candidate recall ~1-(1-p^n_bits)^n_tables; exactness comes from the
    cosine verify in :func:`candidate_pairs_cosine`."""

    def to_bands(batch: pa.Table) -> pa.Table:
        rng = np.random.default_rng(seed)
        H = rng.standard_normal((n_tables * n_bits, dim))
        names = batch["name"].to_pylist()
        E = np.stack([_name_embed(normalize(n or ""), dim)
                      for n in names]) if names else np.zeros((0, dim))
        bits = (E @ H.T) > 0                    # rows x (tables*bits)
        w = (1 << np.arange(n_bits, dtype=np.int64))
        n = len(names)
        tbl_ids = np.repeat(np.arange(n_tables, dtype=np.int64), n)
        buckets = np.concatenate(
            [bits[:, t * n_bits:(t + 1) * n_bits].astype(np.int64) @ w
             for t in range(n_tables)]) if n else np.zeros(0, np.int64)
        rows = np.tile(np.arange(n), n_tables)
        rep = batch.take(pa.array(rows, pa.int64()))
        return pa.table({
            "band": pa.array(tbl_ids, pa.int32()),
            "bucket": pa.array(buckets, pa.int64()),
            "entity_id": rep["entity_id"].combine_chunks(),
            "n_instances": rep["n_instances"].combine_chunks(),
            "emb": pa.array([E[r].tolist() for r in rows],
                            pa.list_(pa.float64())),
        })

    return nodes_ds.map_batches(to_bands, batch_format="pyarrow")


def candidate_pairs_cosine(banded_ds, *, threshold: float):
    """groupby(band, bucket) -> exact-cosine-verified pairs >= threshold.
    A pair colliding in several tables is emitted once per table; the
    downstream union-find is idempotent, so no ownership pass is
    needed on this small side."""

    def pairs(group: pa.Table) -> pa.Table:
        ids = group["entity_id"].to_pylist()
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        E = np.asarray(group["emb"].to_pylist(), dtype=np.float64)
        ns = group["n_instances"].to_pylist()
        a_c, b_c, c_c, na_c, nb_c = [], [], [], [], []
        if len(order) > 1:
            sel = np.asarray(order)
            S = E[sel] @ E[sel].T
            iu, ju = np.triu_indices(len(sel), k=1)
            keep = np.flatnonzero(S[iu, ju] >= threshold)
            for x in keep:
                i, j = sel[iu[x]], sel[ju[x]]
                if ids[i] == ids[j]:
                    continue
                a_c.append(ids[i]); b_c.append(ids[j])
                c_c.append(float(np.round(S[iu[x], ju[x]], 6)))
                na_c.append(ns[i]); nb_c.append(ns[j])
        return pa.table({
            "id_a": pa.array(a_c, pa.string()),
            "id_b": pa.array(b_c, pa.string()),
            "cosine": pa.array(c_c, pa.float64()),
            "n_a": pa.array(na_c, pa.int64()),
            "n_b": pa.array(nb_c, pa.int64()),
        })

    return banded_ds.groupby(["band", "bucket"]).map_groups(
        pairs, batch_format="pyarrow")


def cosine_merge_nodes(nodes_ds, *, threshold: float = 0.6,
                       dim: int = 64, n_tables: int = 24, n_bits: int = 4,
                       seed: int = 23, cap: int = DEFAULT_INSTANCE_CAP):
    """Config-gated EMBEDDING-COSINE entity merge — the reference
    resolver's semantics (entity_resolver.py:25-56, cosine >= 0.85 with
    a real encoder) in an order-independent, bucketed construction:
    hyperplane-LSH candidates over name embeddings, exact cosine verify
    in-bucket, union-find canonical pick (max n_instances, tie smallest
    id), broadcast remap + grouped merge — the same downstream flow as
    :func:`neardup_merge_nodes`.  The default threshold 0.6 fits the
    character-shingle stand-in embedding; with a real model plug the
    reference's 0.85 back in."""
    from kgx.functions.collect import collect_arrow
    banded = band_nodes_cosine(nodes_ds, dim=dim, n_tables=n_tables,
                               n_bits=n_bits, seed=seed)
    pairs = collect_arrow(candidate_pairs_cosine(banded,
                                                 threshold=threshold))
    remap = build_remap(pairs)
    if not remap:
        return nodes_ds
    return _apply_remap(nodes_ds, remap, cap)


def _apply_remap(nodes_ds, remap: dict[str, str], cap: int):
    """Broadcast remap rewrite + per-id member merge + global re-sort
    (shared tail of the two near-dup merge passes)."""
    import ray

    remap_ref = ray.put(remap)

    def rewrite(batch: pa.Table) -> pa.Table:
        m = ray.get(remap_ref)
        ids = batch["entity_id"].to_pylist()
        batch = batch.append_column("_orig_id", batch["entity_id"])
        return batch.set_column(
            batch.schema.get_field_index("entity_id"), "entity_id",
            pa.array([m.get(i, i) for i in ids], pa.string()))

    merged = nodes_ds.map_batches(rewrite, batch_format="pyarrow") \
        .groupby("entity_id").map_groups(
            lambda g: _merge_member_group(g, cap), batch_format="pyarrow")
    return merged.sort("entity_id")


def neardup_merge_nodes(nodes_ds, *, threshold: float = 0.7,
                        num_perm: int = 32, bands: int = 8, k: int = 3,
                        seed: int = 17, cap: int = DEFAULT_INSTANCE_CAP):
    """Optional near-dup pass over canonical nodes; returns merged nodes
    sorted by entity_id.  With no near-duplicates this is a no-op."""
    from kgx.functions.collect import collect_arrow
    banded = band_nodes(nodes_ds, num_perm=num_perm, bands=bands, k=k,
                        seed=seed)
    pairs = collect_arrow(candidate_pairs(banded, threshold=threshold))
    remap = build_remap(pairs)
    if not remap:
        return nodes_ds
    return _apply_remap(nodes_ds, remap, cap)
