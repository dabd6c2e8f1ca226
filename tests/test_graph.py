"""kgx.ops.graph: degree + integer fixed-point PageRank."""
import pyarrow as pa
import ray.data as rd

from kgx.ops.graph import (SCALE, clustering_coefficients, degree_table,
                           pagerank, triangle_counts)


def _edges(pairs):
    s, t = zip(*pairs) if pairs else ((), ())
    return rd.from_arrow(pa.table({
        "subj_name": pa.array(list(s), pa.string()),
        "obj_name": pa.array(list(t), pa.string()),
    }))


def _pagerank_reference(pairs, iters=10, damping_pct=85):
    """Sequential mirror of the operator's exact integer recurrence."""
    adj: dict[str, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    base = ((100 - damping_pct) * (SCALE // n)) // 100
    r = {v: SCALE // n for v in adj}
    for _ in range(iters):
        nxt = {}
        for v in adj:
            s = sum(r[u] // len(adj[u]) for u in adj[v])
            nxt[v] = base + (damping_pct * s) // 100
        r = nxt
    return {v: (len(adj[v]), r[v]) for v in adj}


STAR = [("hub", f"leaf{i}") for i in range(6)]
PATH = [("a", "b"), ("b", "c"), ("c", "d")]
MIXED = STAR + PATH + [("leaf0", "leaf1"), ("a", "hub")]


def test_pagerank_matches_sequential_reference(ray_session):
    for pairs in (STAR, PATH, MIXED):
        ref = _pagerank_reference(pairs)
        out = pagerank(_edges(pairs), iters=10).to_pandas()
        got = {r["name"]: (r["degree"], r["pr_units"])
               for _, r in out.iterrows()}
        assert got == ref


def test_pagerank_star_ranks_hub_highest(ray_session):
    out = pagerank(_edges(STAR)).to_pandas().sort_values(
        "pr_units", ascending=False)
    assert out.iloc[0]["name"] == "hub"
    leafs = out[out["name"] != "hub"]
    assert leafs["pr_units"].nunique() == 1   # symmetric leaves tie exactly
    assert out["degree"].max() == 6


def test_pagerank_partition_invariant(ray_session):
    a = pagerank(_edges(MIXED), iters=7).to_pandas() \
        .sort_values("name").reset_index(drop=True)
    b = pagerank(_edges(MIXED).repartition(5), iters=7).to_pandas() \
        .sort_values("name").reset_index(drop=True)
    assert a.equals(b)


def test_pagerank_mass_conservation_bound(ray_session):
    # floor-division only ever loses mass: total stays in (0.99, 1.0] x SCALE
    out = pagerank(_edges(MIXED), iters=10).to_pandas()
    total = out["pr_units"].sum()
    assert 0.99 * SCALE < total <= SCALE


def test_pagerank_empty(ray_session):
    assert pagerank(_edges([])).count() == 0


def _triangles_reference(pairs):
    """Sequential per-vertex triangle counts of the undirected graph."""
    adj: dict[str, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out: dict[str, int] = {}
    for v, nbrs in adj.items():
        n = sorted(nbrs)
        t = sum(1 for i in range(len(n)) for j in range(i + 1, len(n))
                if n[j] in adj[n[i]])
        if t:
            out[v] = t
    return out


# K4 minus one edge: {a,b,c}, {a,b,d} triangles; c-d edge absent.
DIAMOND = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")]


def test_triangle_counts_matches_sequential_reference(ray_session):
    for pairs in (STAR, PATH, MIXED, DIAMOND,
                  DIAMOND + [("c", "d")]):        # full K4
        ref = _triangles_reference(pairs)
        out = triangle_counts(_edges(pairs)).to_pandas()
        got = ({} if out.empty
               else dict(zip(out["name"], out["n_triangles"])))
        assert got == ref, pairs


def test_triangle_counts_partition_invariant(ray_session):
    a = triangle_counts(_edges(MIXED)).to_pandas() \
        .sort_values("name").reset_index(drop=True)
    b = triangle_counts(_edges(MIXED).repartition(5)).to_pandas() \
        .sort_values("name").reset_index(drop=True)
    assert a.equals(b)


def test_triangle_counts_triangle_free(ray_session):
    assert triangle_counts(_edges(STAR)).count() == 0
    assert triangle_counts(_edges(PATH)).count() == 0


def test_clustering_coefficients_matches_sequential(ray_session):
    for pairs in (PATH, MIXED, DIAMOND, DIAMOND + [("c", "d")]):
        adj: dict[str, set] = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        tri = _triangles_reference(pairs)
        ref = {v: (len(n), tri.get(v, 0),
                   (2 * tri.get(v, 0) * SCALE) // (len(n) * (len(n) - 1)))
               for v, n in adj.items() if len(n) >= 2}
        out = clustering_coefficients(_edges(pairs)).to_pandas()
        got = {r["name"]: (r["degree"], r["n_triangles"], r["lcc_units"])
               for _, r in out.iterrows()}
        assert got == ref, pairs


def test_clustering_coefficients_k4_is_one(ray_session):
    out = clustering_coefficients(
        _edges(DIAMOND + [("c", "d")])).to_pandas()
    assert (out["lcc_units"] == SCALE).all()     # K4: every lcc == 1.0
    assert clustering_coefficients(_edges([])).count() == 0


def test_degree_table(ray_session):
    out = degree_table(_edges(PATH)).to_pandas().set_index("name")
    assert out.loc["a", "degree"] == 1
    assert out.loc["b", "degree"] == 2
    assert out.loc["c", "degree"] == 2
    assert out.loc["d", "degree"] == 1


def test_wcc_two_components_and_singleton_pair(ray_session):
    from kgx.ops.graph import weakly_connected_components
    pairs = PATH + [("x", "y"), ("y", "z")]
    out = weakly_connected_components(_edges(pairs)).to_pandas()
    comp = dict(zip(out["name"], out["component"]))
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a",
                    "x": "x", "y": "x", "z": "x"}


def test_wcc_matches_bruteforce_on_random_graphs(ray_session):
    import itertools
    import random
    from kgx.ops.graph import weakly_connected_components
    rng = random.Random(11)
    names = [f"v{i}" for i in range(14)]
    for trial in range(3):
        pairs = sorted({tuple(sorted(rng.sample(names, 2)))
                        for _ in range(12)})
        # brute force: union-find
        parent = {n: n for n in names}
        def find(u):
            while parent[u] != u:
                parent[u] = parent[parent[u]]
                u = parent[u]
            return u
        for s, t in pairs:
            parent[find(s)] = find(t)
        touched = {v for p in pairs for v in p}
        ref = {}
        for grp_root in {find(v) for v in touched}:
            members = sorted(v for v in touched if find(v) == grp_root)
            for m in members:
                ref[m] = members[0]
        out = weakly_connected_components(_edges(pairs)).to_pandas()
        got = dict(zip(out["name"], out["component"]))
        assert got == ref, pairs


def test_kcore_peels_path_keeps_clique(ray_session):
    from kgx.ops.graph import kcore_vertices
    # a triangle with a pendant path: peeling k=2 removes the path tail
    pairs = [("a", "b"), ("b", "c"), ("a", "c"),   # triangle
             ("c", "d"), ("d", "e")]               # pendant path
    out = kcore_vertices(_edges(pairs), k=2, rounds=8).to_pandas()
    got = dict(zip(out["name"], out["degree"]))
    assert got == {"a": 2, "b": 2, "c": 2}
    # a pure path has no 2-core at all
    assert kcore_vertices(_edges(PATH), k=2, rounds=8).count() == 0
    # k=1 keeps everything
    assert kcore_vertices(_edges(PATH), k=1, rounds=8).count() == 4


def test_kcore_fixed_rounds_truncation_is_deterministic(ray_session):
    from kgx.ops.graph import kcore_vertices
    # a long path needs one round per vertex to fully peel; with only
    # 2 rounds the middle survives with its round-2 subgraph degrees
    chain = [(f"n{i}", f"n{i+1}") for i in range(9)]
    out = kcore_vertices(_edges(chain), k=2, rounds=2).to_pandas()
    got = dict(zip(out["name"], out["degree"]))
    # after round 1 endpoints drop, after round 2 the next pair drops:
    # survivors n2..n7, degrees: ends of the remaining chain have 1 but
    # the final >=k filter drops them -> n3..n6
    assert got == {f"n{i}": 2 for i in range(3, 7)}


def test_neighbor_jaccard_matches_bruteforce(ray_session):
    import itertools
    import random
    from kgx.ops.graph import SCALE, neighbor_jaccard_pairs
    rng = random.Random(5)
    names = [f"v{i}" for i in range(10)]
    for trial in range(3):
        pairs = sorted({tuple(sorted(rng.sample(names, 2)))
                        for _ in range(14)})
        adj = {}
        for s, t in pairs:
            adj.setdefault(s, set()).add(t)
            adj.setdefault(t, set()).add(s)
        ref = {}
        for a, b in itertools.combinations(sorted(adj), 2):
            common = len(adj[a] & adj[b])
            if common == 0:
                continue
            units = (common * SCALE) // (len(adj[a]) + len(adj[b]) - common)
            if units >= SCALE // 5:
                ref[(a, b)] = (common, units)
        out = neighbor_jaccard_pairs(_edges(pairs)).to_pandas()
        got = {(r["name_a"], r["name_b"]): (r["common"], r["jac_units"])
               for _, r in out.iterrows()}
        assert got == ref, pairs


def test_neighbor_jaccard_shared_leaf_star(ray_session):
    from kgx.ops.graph import SCALE, neighbor_jaccard_pairs
    # two hubs sharing all three leaves: J(h1,h2) = 3/3 = 1.0
    pairs = [("h1", "l1"), ("h1", "l2"), ("h1", "l3"),
             ("h2", "l1"), ("h2", "l2"), ("h2", "l3")]
    out = neighbor_jaccard_pairs(_edges(pairs), min_units=SCALE).to_pandas()
    got = {(r["name_a"], r["name_b"]): (r["common"], r["jac_units"])
           for _, r in out.iterrows()}
    # hubs share all 3 leaves; each leaf pair shares both hubs — all J=1.0
    assert got == {("h1", "h2"): (3, SCALE),
                   ("l1", "l2"): (2, SCALE),
                   ("l1", "l3"): (2, SCALE),
                   ("l2", "l3"): (2, SCALE)}


def test_khop_bfs_distances_on_path(ray_session):
    from kgx.ops.graph import khop_neighborhood
    out = khop_neighborhood(_edges(PATH), seed="a", hops=2).to_pandas()
    got = dict(zip(out["name"], out["hop"]))
    assert got == {"a": 0, "b": 1, "c": 2}
    out3 = khop_neighborhood(_edges(PATH), seed="a", hops=3).to_pandas()
    assert dict(zip(out3["name"], out3["hop"]))["d"] == 3


def test_khop_min_distance_over_multiple_routes(ray_session):
    from kgx.ops.graph import khop_neighborhood
    # square a-b-c-d-a: c is 2 hops from a via either route, d and b are 1
    square = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    out = khop_neighborhood(_edges(square), seed="a", hops=4).to_pandas()
    got = dict(zip(out["name"], out["hop"]))
    assert got == {"a": 0, "b": 1, "d": 1, "c": 2}


def test_khop_default_seed_is_min_vertex(ray_session):
    from kgx.ops.graph import khop_neighborhood
    out = khop_neighborhood(_edges(PATH), hops=1).to_pandas()
    got = dict(zip(out["name"], out["hop"]))
    assert got == {"a": 0, "b": 1}


def test_personalized_pagerank_concentrates_on_seed(ray_session):
    """PPR mass must concentrate at the seed (the lexicographically
    smallest vertex): the seed outranks every other vertex, totals stay
    bounded by the scale, and re-runs are byte-identical."""
    from kgx.ops.graph import personalized_pagerank
    from kgx.pipelines.docs_kg import kg_tables
    edges = kg_tables("/root/testdata/sf0.001")["edges"]
    out = personalized_pagerank(edges, iters=10).to_pandas()
    seed = out["name"].min()
    seed_rank = out.set_index("name").loc[seed, "ppr_units"]
    assert seed_rank == out["ppr_units"].max()
    assert (out["ppr_units"] >= 0).all()
    assert out["ppr_units"].sum() <= 10**12  # leaky (dangling) <= scale
    again = personalized_pagerank(edges, iters=10).to_pandas()
    assert out.sort_values("name").reset_index(drop=True).equals(
        again.sort_values("name").reset_index(drop=True))


def test_degree_assortativity_known_graphs(ray_session):
    """A star graph is perfectly disassortative (corr -> -1e6 ppm); a
    cycle's endpoint degrees are constant (zero variance -> 0)."""
    import pyarrow as pa
    import ray.data as rd
    from kgx.ops.graph import degree_assortativity

    star = rd.from_arrow(pa.table({
        "subj_name": pa.array(["hub"] * 4, pa.string()),
        "obj_name": pa.array(["a", "b", "c", "d"], pa.string()),
    }))
    out = degree_assortativity(star).to_pandas()
    assert out["n_directed"].tolist() == [8]
    assert out["corr_ppm"].tolist() == [-1_000_000]

    cycle = rd.from_arrow(pa.table({
        "subj_name": pa.array(["a", "b", "c"], pa.string()),
        "obj_name": pa.array(["b", "c", "a"], pa.string()),
    }))
    out = degree_assortativity(cycle).to_pandas()
    assert out["n_directed"].tolist() == [6]
    assert out["corr_ppm"].tolist() == [0]


# ----------------------------------------------------------------------
# partition_modularity
# ----------------------------------------------------------------------

def _membership(mapping):
    return rd.from_arrow(pa.table({
        "name": pa.array(list(mapping.keys()), pa.string()),
        "community": pa.array(list(mapping.values()), pa.string()),
    }))


def test_modularity_single_community_is_zero(ray_session):
    from kgx.ops.graph import partition_modularity
    memb = {v: "all" for e in MIXED for v in e}
    out = partition_modularity(_edges(MIXED), _membership(memb)) \
        .to_pandas()
    # one community holds every edge: e_c = m, d_c = 2m -> Q = 0
    assert out["n_communities"].tolist() == [1]
    assert out["q_num"].tolist() == [0]
    assert out["n_edges"].tolist() == [len(MIXED)]


def test_modularity_two_cliques_matches_closed_form(ray_session):
    from kgx.ops.graph import partition_modularity
    k4a = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
    k4b = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    bridge = [("a0", "b0")]
    edges = k4a + k4b + bridge
    memb = {v: v[0] for e in edges for v in e}
    out = partition_modularity(_edges(edges), _membership(memb)) \
        .to_pandas()
    # m=13, e_a=e_b=6, d_a=d_b=13: q_num = 2*(4*13*6 - 169) = 286
    assert out["n_communities"].tolist() == [2]
    assert out["n_edges"].tolist() == [13]
    assert out["q_num"].tolist() == [2 * (4 * 13 * 6 - 13 * 13)]
    assert out["q_den"].tolist() == [4 * 13 * 13]


def test_modularity_matches_float_newman_formula(ray_session):
    from kgx.ops.graph import partition_modularity
    edges = MIXED
    memb = {v: ("left" if v[0] in "hl" else "right")
            for e in edges for v in e}
    out = partition_modularity(_edges(edges), _membership(memb)) \
        .to_pandas()
    # float reference: Q = sum_c e_c/m - (d_c/2m)^2
    from collections import Counter
    e_c, d_c = Counter(), Counter()
    for s, t in edges:
        d_c[memb[s]] += 1
        d_c[memb[t]] += 1
        if memb[s] == memb[t]:
            e_c[memb[s]] += 1
    m = len(edges)
    q = sum(e_c[c] / m - (d_c[c] / (2 * m)) ** 2 for c in d_c)
    got = out["q_num"][0] / out["q_den"][0]
    assert abs(got - q) < 1e-12


def test_modularity_partition_invariant(ray_session):
    from kgx.ops.graph import partition_modularity
    edges = [(f"v{i}", f"v{(i * 7 + 1) % 30}") for i in range(60)
             if f"v{i}" < f"v{(i * 7 + 1) % 30}"]
    memb = {v: str(hash(v) % 2) for e in edges for v in e}
    a = partition_modularity(_edges(edges), _membership(memb)).to_pandas()
    b = partition_modularity(_edges(edges).repartition(5),
                             _membership(memb)).to_pandas()
    assert a.equals(b)


# ----------------------------------------------------------------------
# label_propagation
# ----------------------------------------------------------------------

def _lpa_reference(pairs, rounds):
    """Sequential mirror of the synchronous min-tie-break LPA."""
    from collections import Counter
    adj: dict[str, list] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v in adj:
            cnt = Counter(lab[u] for u in adj[v])
            nxt[v] = min(cnt, key=lambda c: (-cnt[c], c))
        lab = nxt
    return lab


def test_lpa_two_cliques_find_their_min_names(ray_session):
    from kgx.ops.graph import label_propagation
    k4a = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
    k4b = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    out = label_propagation(_edges(k4a + k4b + [("a0", "b0")]),
                            rounds=4).to_pandas()
    comm = dict(zip(out["name"], out["community"]))
    assert all(comm[f"a{i}"] == "a0" for i in range(4))
    assert all(comm[f"b{i}"] == "b0" for i in range(1, 4))


def test_lpa_matches_sequential_reference(ray_session):
    from kgx.ops.graph import label_propagation
    out = label_propagation(_edges(MIXED), rounds=3).to_pandas()
    ref = _lpa_reference(MIXED, 3)
    assert dict(zip(out["name"], out["community"])) == ref


def test_lpa_partition_invariant(ray_session):
    from kgx.ops.graph import label_propagation
    edges = [(f"v{i:02d}", f"v{(i * 7 + 1) % 30:02d}") for i in range(60)
             if f"v{i:02d}" != f"v{(i * 7 + 1) % 30:02d}"]
    edges = sorted({(min(a, b), max(a, b)) for a, b in edges})
    a = label_propagation(_edges(edges), rounds=4).to_pandas()
    b = label_propagation(_edges(edges).repartition(6),
                          rounds=4).to_pandas()
    assert a.equals(b)
    assert dict(zip(a["name"], a["community"])) == \
        _lpa_reference(edges, 4)


def test_lpa_communities_score_with_modularity(ray_session):
    """Composition: the detector's output feeds the scorer — two cliques
    joined by one bridge get near-maximal modularity under LPA labels."""
    from kgx.ops.graph import label_propagation, partition_modularity
    k4a = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
    k4b = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    edges = k4a + k4b + [("a0", "b0")]
    memb = label_propagation(_edges(edges), rounds=4) \
        .map_batches(lambda t: t, batch_format="pyarrow")
    out = partition_modularity(_edges(edges), memb).to_pandas()
    q = out["q_num"][0] / out["q_den"][0]
    assert out["n_communities"][0] == 2
    assert q == 2 * (4 * 13 * 6 - 13 * 13) / (4 * 13 * 13)


# ----------------------------------------------------------------------
# weighted_pagerank
# ----------------------------------------------------------------------

def _wedges(triples):
    s, t, w = zip(*triples) if triples else ((), (), ())
    return rd.from_arrow(pa.table({
        "subj_name": pa.array(list(s), pa.string()),
        "obj_name": pa.array(list(t), pa.string()),
        "n_instances": pa.array(list(w), pa.int64()),
    }))


def _wpagerank_reference(triples, iters=10, damping_pct=85):
    adj: dict[str, dict] = {}
    for a, b, w in triples:
        adj.setdefault(a, {})[b] = w
        adj.setdefault(b, {})[a] = w
    n = len(adj)
    ws = {v: sum(adj[v].values()) for v in adj}
    base = ((100 - damping_pct) * (SCALE // n)) // 100
    r = {v: SCALE // n for v in adj}
    for _ in range(iters):
        r = {v: base + (damping_pct
                        * sum((r[u] * adj[u][v]) // ws[u]
                              for u in adj[v])) // 100
             for v in adj}
    return {v: (ws[v], r[v]) for v in adj}


def test_weighted_pagerank_matches_sequential_reference(ray_session):
    from kgx.ops.graph import weighted_pagerank
    triples = [("a", "b", 5), ("b", "c", 1), ("a", "c", 2),
               ("c", "d", 7), ("d", "a", 1)]
    out = weighted_pagerank(_wedges(triples)).to_pandas()
    ref = _wpagerank_reference(triples)
    got = {r["name"]: (r["wdegree"], r["wpr_units"])
           for _, r in out.iterrows()}
    assert got == ref


def test_weighted_pagerank_heavy_edge_attracts_mass(ray_session):
    from kgx.ops.graph import pagerank, weighted_pagerank
    # star: hub h with leaves x, y; edge h-x is 10x heavier than h-y.
    triples = [("h", "x", 10), ("h", "y", 1)]
    w = weighted_pagerank(_wedges(triples)).to_pandas() \
        .set_index("name")["wpr_units"]
    assert w["x"] > w["y"]
    # uniform weights must reproduce the unweighted op exactly
    uni = [("h", "x", 1), ("h", "y", 1)]
    wu = weighted_pagerank(_wedges(uni)).to_pandas() \
        .set_index("name")["wpr_units"]
    pu = pagerank(_edges([("h", "x"), ("h", "y")])).to_pandas() \
        .set_index("name")["pr_units"]
    assert dict(wu) == dict(pu)


def test_weighted_pagerank_partition_invariant(ray_session):
    from kgx.ops.graph import weighted_pagerank
    triples = [(f"v{i}", f"v{(i * 3 + 1) % 20}", (i % 5) + 1)
               for i in range(40) if f"v{i}" != f"v{(i * 3 + 1) % 20}"]
    seen = {}
    for a, b, w in triples:
        seen.setdefault((min(a, b), max(a, b)), w)
    triples = [(a, b, w) for (a, b), w in sorted(seen.items())]
    a = weighted_pagerank(_wedges(triples)).to_pandas()
    b = weighted_pagerank(_wedges(triples).repartition(6)).to_pandas()
    assert a.equals(b)
    ref = _wpagerank_reference(triples)
    got = {r["name"]: (r["wdegree"], r["wpr_units"])
           for _, r in a.iterrows()}
    assert got == ref


def test_modularity_empty_edges_emits_no_rows(ray_session):
    from kgx.ops.graph import partition_modularity
    out = partition_modularity(_edges([]), _membership({})).to_pandas()
    assert len(out) == 0


def test_modularity_missing_member_raises(ray_session):
    import pytest
    from kgx.ops.graph import partition_modularity
    with pytest.raises(Exception):
        partition_modularity(
            _edges([("a", "b")]), _membership({"a": "x"})).to_pandas()
