"""kmeans_assign / semantic_dedup (kgx/ops/cluster.py) vs a sequential
numpy reference, plus SemDeDup invariants.  The DuckDB oracle parity runs
in test_oracle_parity.py (embed_kmeans / dedup_semantic entries)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from kgx.ops.cluster import kmeans_assign, semantic_dedup


def _ref_kmeans(M: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Sequential mirror of the documented semantics."""
    order = np.argsort(ids)
    C = np.round(M[order[:k]], 6)
    for _ in range(iters):
        d = np.round(np.sqrt(((M[:, None] - C[None]) ** 2).sum(-1)), 6)
        a = d.argmin(1)
        nxt = C.copy()
        for c in range(k):
            sel = a == c
            if sel.any():
                nxt[c] = np.round(M[sel].mean(0), 6)
        C = nxt
    d = np.round(np.sqrt(((M[:, None] - C[None]) ** 2).sum(-1)), 6)
    a = d.argmin(1)
    return a, d[np.arange(len(a)), a]


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 8)) * 5
    M = np.concatenate(
        [c + rng.normal(size=(30, 8)) for c in centers]).astype(np.float64)
    ids = np.arange(len(M), dtype=np.int64)
    tbl = pa.table({"vec_id": ids,
                    "embedding": pa.array(list(M), pa.list_(pa.float64()))})
    return rd.from_arrow(tbl), M, ids


def test_kmeans_matches_sequential_reference(emb_ds):
    ds, M, ids = emb_ds
    out = kmeans_assign(ds, k=4, iters=3).to_pandas().sort_values("vec_id")
    a, d = _ref_kmeans(M, ids, 4, 3)
    assert out["cluster"].tolist() == a.tolist()
    np.testing.assert_allclose(out["dist"].to_numpy(), d, atol=1e-9)


def test_semantic_dedup_invariants(emb_ds):
    ds, M, ids = emb_ds
    out = semantic_dedup(ds, k=4, iters=2, threshold=0.9).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    assert len(out) == len(ids)
    dup = out[~out["keep"]]
    # a duplicate always points at a strictly earlier member of its cluster
    assert (dup["dup_of"] < dup["vec_id"]).all()
    cl = dict(zip(out["vec_id"], out["cluster"]))
    assert all(cl[d] == cl[v]
               for v, d in zip(dup["vec_id"], dup["dup_of"]))
    # kept rows carry no dup_of
    assert out[out["keep"]]["dup_of"].isna().all()
    # the lowest id of every cluster is always kept
    first = out.groupby("cluster")["vec_id"].min()
    kept = set(out[out["keep"]]["vec_id"])
    assert set(first).issubset(kept)


def test_semantic_dedup_drops_planted_duplicates(ray_session):
    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 8)) * 4
    # plant: rows 20..29 are near-copies of rows 0..9
    dups = base[:10] + rng.normal(size=(10, 8)) * 1e-3
    M = np.concatenate([base, dups])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(30, dtype=np.int64)),
        "embedding": pa.array(list(M), pa.list_(pa.float64()))})
    out = semantic_dedup(rd.from_arrow(tbl), k=2, iters=2,
                         threshold=0.999).to_pandas()
    out = out.set_index("vec_id").sort_index()
    for j in range(10):
        assert not out.loc[20 + j, "keep"]
        assert out.loc[20 + j, "dup_of"] == j
    assert out.loc[:19, "keep"].all()


def test_cluster_balanced_sample_caps_each_cluster(emb_ds):
    import numpy as np
    from kgx.ops.cluster import _lottery32, cluster_balanced_sample
    ds, M, ids = emb_ds
    out = cluster_balanced_sample(ds, k=4, iters=2, cap=10).to_pandas()
    assert len(out) == len(ids)
    per = out[out["keep"]].groupby("cluster").size()
    sizes = out.groupby("cluster").size()
    for c, n in sizes.items():
        assert per.get(c, 0) == min(10, n)
    # kept rows are exactly the cap smallest lottery keys per cluster
    for c, grp in out.groupby("cluster"):
        ranked = sorted(
            grp["vec_id"],
            key=lambda i: (int(_lottery32(np.asarray([i]))[0]), i))
        assert set(grp[grp["keep"]]["vec_id"]) == set(ranked[:10])


def test_kmeans_and_semdedup_partition_invariant(emb_ds):
    from kgx.ops.cluster import kmeans_assign, semantic_dedup
    ds, M, ids = emb_ds
    a = kmeans_assign(ds, k=4, iters=3).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    b = kmeans_assign(ds.repartition(7), k=4, iters=3).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)
    c = semantic_dedup(ds, k=4, iters=2, threshold=0.9).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    d = semantic_dedup(ds.repartition(5), k=4, iters=2,
                       threshold=0.9).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert c.equals(d)


def test_label_stats_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.cluster import label_stats
    rng = np.random.default_rng(17)
    M = rng.normal(size=(60, 6))
    labels = np.repeat(np.arange(3), 20)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(60, dtype=np.int64)),
        "embedding": pa.array(list(M), pa.list_(pa.float64())),
        "label": pa.array(labels, pa.int64())}))
    out = label_stats(ds.repartition(5)).to_pandas().set_index("label")
    for lb in range(3):
        sel = M[labels == lb]
        C = np.round(sel.mean(axis=0), 6)
        assert out.loc[lb, "n_vecs"] == 20
        assert out.loc[lb, "centroid_norm"] == round(
            float(np.sqrt((C ** 2).sum())), 6)
        d = np.round(np.sqrt(((sel - C) ** 2).sum(axis=1)), 6)
        assert abs(out.loc[lb, "mean_dist"] - round(d.mean(), 4)) < 2e-4


def test_negative_samples_contract(ray_session):
    """k draws per anchor, never self, deterministic, uniform-ish."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.training import negative_samples
    ids = pa.table({"vec_id": pa.array(list(range(50)), pa.int64())})
    out = negative_samples(rd.from_arrow(ids), k=4, seed=7).to_pandas()
    assert len(out) == 200
    assert (out["vec_id"] != out["neg_id"]).all()
    assert set(out["j"]) == {1, 2, 3, 4}
    again = negative_samples(rd.from_arrow(ids), k=4, seed=7).to_pandas()
    assert out.sort_values(["vec_id", "j"]).reset_index(drop=True).equals(
        again.sort_values(["vec_id", "j"]).reset_index(drop=True))
    # a different seed gives a different draw set
    other = negative_samples(rd.from_arrow(ids), k=4, seed=8).to_pandas()
    assert not out["neg_id"].equals(other["neg_id"])
    # rough uniformity: every candidate id drawn at least once over 200
    # draws is too strict; assert spread instead
    assert out["neg_id"].nunique() > 25


def test_contrastive_triplets_compose(ray_session):
    import ray.data as rd
    from kgx.ops.simsearch import knn_self_join
    from kgx.ops.training import contrastive_triplets
    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    out = contrastive_triplets(emb, k_neg=2, seed=101).to_pandas()
    assert len(out) == 2 * 500
    # the positive is exactly the rank-1 kNN neighbor
    knn = knn_self_join(emb, k=1).to_pandas().set_index("vec_id")
    sub = out.drop_duplicates("vec_id").set_index("vec_id")
    assert (sub["pos_id"] == knn.loc[sub.index, "neighbor_id"]).all()
    assert (out["vec_id"] != out["neg_id"]).all()
