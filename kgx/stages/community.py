"""Hierarchical community detection over the canonical graph (SURVEY.md
§2.5 O5/O6, §2.4 J5).

The reference detects communities with Infomap (Louvain fallback) on the
networkx view of the global KnowledgeGraph
(/root/reference/indexing/community_detection.py:42-100), enforces a
minimum community size by merging small communities into the largest
valid one (:102-116), and builds a C0..C{L-1} hierarchy with per-community
flow metrics (:118-198).

Here detection runs DRIVER-SIDE on the **canonical** nodes/edges tables —
which are small by construction after the canonicalization and dedup
shuffles (distinct entities ≪ mentions; SURVEY.md §7 step 9) — using
seeded ``networkx.community.louvain_communities`` (Infomap is not in this
environment; the reference itself falls back to Louvain,
community_detection.py:48-53).  Everything is deterministic: seeded
Louvain, community ids assigned in sorted-smallest-member order, sorted
node lists.  The per-community membership map is exported as an Arrow
table for Ray-side broadcast joins (J5).

Semantics preserved:
- min-size merge (community_detection.py:102-116): communities smaller
  than ``min_community_size`` merge into the largest valid community; if
  none is valid the largest small one is kept.
- flow metrics (community_detection.py:139-155): flow = internal /
  (internal + external) edge ratio, description_length = binary entropy
  of that split.
- hierarchy (community_detection.py:157-199): level k+1 re-partitions
  each level-k community bigger than ``2 * min_community_size``; smaller
  ones pass through with a ``parent`` pointer.
"""

from __future__ import annotations

import math

import pyarrow as pa


def _build_nx(nodes: pa.Table, edges: pa.Table, *, use_weights: bool = True):
    import networkx as nx
    g = nx.Graph()
    g.add_nodes_from(nodes["entity_id"].to_pylist())
    for s, o, w in zip(edges["subj_id"].to_pylist(),
                       edges["obj_id"].to_pylist(),
                       edges["strength"].to_pylist()):
        g.add_edge(s, o, weight=float(w) if use_weights else 1.0)
    return g


def _louvain(graph, *, resolution: float, seed: int) -> list[list[str]]:
    import networkx as nx
    if graph.number_of_nodes() == 0:
        return []
    comms = nx.community.louvain_communities(
        graph, resolution=resolution, seed=seed)
    # deterministic order: sort members, then communities by first member
    return sorted((sorted(c) for c in comms), key=lambda c: c[0])


def _enforce_min_size(comms: list[list[str]], min_size: int) -> list[list[str]]:
    """Merge small communities into the largest valid one
    (community_detection.py:102-116 semantics, order-determinized)."""
    valid = [c for c in comms if len(c) >= min_size]
    small = [c for c in comms if len(c) < min_size]
    if not valid and small:
        small.sort(key=lambda c: (-len(c), c[0]))
        valid, small = [small[0]], small[1:]
    if small and valid:
        target = max(range(len(valid)), key=lambda i: (len(valid[i]),))
        merged = sorted(valid[target] + [n for c in small for n in c])
        valid = valid[:target] + [merged] + valid[target + 1:]
    return sorted(valid, key=lambda c: c[0])


def _flow_metrics(nodes: list[str], graph) -> dict:
    """flow = i/(i+e), description_length = entropy
    (community_detection.py:139-155)."""
    if len(nodes) <= 1:
        return {"flow": 0.0, "description_length": 0.0}
    node_set = set(nodes)
    sub = graph.subgraph(nodes)
    internal = sub.number_of_edges()
    external = sum(1 for n in nodes for nb in graph.neighbors(n)
                   if nb not in node_set)
    total = internal + external
    if total == 0:
        return {"flow": 0.0, "description_length": 0.0}
    pi, pe = internal / total, external / total
    dl = -sum(p * math.log2(p) for p in (pi, pe) if p > 0)
    return {"flow": pi, "description_length": dl}


def _density(nodes: list[str], graph) -> float:
    import networkx as nx
    return nx.density(graph.subgraph(nodes)) if len(nodes) > 1 else 0.0


def detect_communities(nodes: pa.Table, edges: pa.Table, *,
                       min_community_size: int = 3,   # config.py:41
                       resolution: float = 1.0,       # config.py:40
                       levels: int = 2,
                       use_weights: bool = True,
                       seed: int = 42) -> dict:
    """nodes/edges tables -> hierarchy {"C0": {"level", "communities"}, ...}.

    Community entry shape mirrors community_detection.py:128-135:
    ``{nodes, size, density, flow, description_length, sub_communities[,
    parent]}``.
    """
    graph = _build_nx(nodes, edges, use_weights=use_weights)
    comms = _enforce_min_size(
        _louvain(graph, resolution=resolution, seed=seed),
        min_community_size)

    hierarchy: dict = {"C0": {"level": 0, "communities": {}}}
    for i, members in enumerate(comms):
        hierarchy["C0"]["communities"][str(i)] = {
            "nodes": members,
            "size": len(members),
            "density": _density(members, graph),
            **_flow_metrics(members, graph),
            "sub_communities": {},
        }

    for level in range(1, levels):
        prev = hierarchy[f"C{level - 1}"]["communities"]
        cur: dict = {}
        counter = 0
        for cid in sorted(prev, key=lambda c: (len(c), c)):
            cdata = prev[cid]
            members = cdata["nodes"]
            if len(members) <= min_community_size * 2:
                nid = f"{level}_{counter}"
                cur[nid] = {**cdata, "parent": cid, "sub_communities": {}}
                cdata["sub_communities"][nid] = len(members)
                counter += 1
                continue
            subs = _louvain(graph.subgraph(members),
                            resolution=resolution, seed=seed)
            for sub_nodes in subs:
                if len(sub_nodes) < min_community_size:
                    continue
                nid = f"{level}_{counter}"
                cur[nid] = {
                    "nodes": sub_nodes,
                    "size": len(sub_nodes),
                    "density": _density(sub_nodes, graph),
                    **_flow_metrics(sub_nodes, graph),
                    "parent": cid,
                    "sub_communities": {},
                }
                cdata["sub_communities"][nid] = len(sub_nodes)
                counter += 1
        hierarchy[f"C{level}"] = {"level": level, "communities": cur}
    return hierarchy


def community_assignments(hierarchy: dict) -> pa.Table:
    """hierarchy -> (level, community_id, entity_id) membership table —
    the small broadcast side of Ray-side community joins (J5)."""
    lv_col, cid_col, eid_col = [], [], []
    for level_key in sorted(hierarchy, key=lambda k: int(k[1:])):
        level = hierarchy[level_key]["level"]
        for cid in sorted(hierarchy[level_key]["communities"]):
            for eid in hierarchy[level_key]["communities"][cid]["nodes"]:
                lv_col.append(level)
                cid_col.append(cid)
                eid_col.append(eid)
    return pa.table({
        "level": pa.array(lv_col, pa.int32()),
        "community_id": pa.array(cid_col, pa.string()),
        "entity_id": pa.array(eid_col, pa.string()),
    })


def get_community_tables(community_id: str, hierarchy: dict,
                         nodes: pa.Table, edges: pa.Table,
                         claims: pa.Table | None = None) -> dict:
    """Membership join (J5, community_detection.py:221-254): entities in
    the community; edges with BOTH endpoints inside; claims with ANY
    entity inside."""
    import pyarrow.compute as pc

    for level_key in sorted(hierarchy, key=lambda k: int(k[1:])):
        comm = hierarchy[level_key]["communities"].get(community_id)
        if comm is not None:
            level = hierarchy[level_key]["level"]
            break
    else:
        return {}
    member_set = set(comm["nodes"])
    members = pa.array(sorted(member_set), pa.string())

    ents = nodes.filter(pc.is_in(nodes["entity_id"], value_set=members))
    rels = edges.filter(
        pc.and_(pc.is_in(edges["subj_id"], value_set=members),
                pc.is_in(edges["obj_id"], value_set=members)))
    out = {"community_id": community_id, "level": level,
           "size": len(member_set), "flow": comm.get("flow", 0.0),
           "description_length": comm.get("description_length", 0.0),
           "entities": ents, "relationships": rels}
    if claims is not None and claims.num_rows:
        keep = [any(e in member_set for e in ids)
                for ids in claims["entity_ids"].to_pylist()]
        out["claims"] = claims.filter(pa.array(keep, pa.bool_()))
    else:
        out["claims"] = None
    return out
