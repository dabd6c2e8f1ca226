"""Reference-format graph serialization (SURVEY.md §2.1 S2-S5).

The reference persists the whole graph as one JSON file
(``KnowledgeGraph.save/to_dict``,
/root/reference/models/knowledge_graph.py:174-196) plus
``community_hierarchy.json`` (/root/reference/main.py:105-118), and
exports three pandas DataFrames with denormalized endpoint names
(``to_dataframes``, knowledge_graph.py:231-283).

Our canonical store is the sharded nodes/edges/claims Parquet the
pipeline emits — these helpers exist for interchange with reference
tooling: a user of the reference can load our output with their existing
`KnowledgeGraph.load` and vice versa.  JSON is a driver-side export of
the (small) canonical tables, NOT a pipeline stage; at scale the Parquet
tables are the product.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from kgx.stages.canonicalize import NODES_SCHEMA
from kgx.stages.edges import CLAIMS_SCHEMA, EDGES_SCHEMA


def graph_to_dict(nodes: pa.Table, edges: pa.Table,
                  claims: pa.Table | None = None,
                  community_summaries: dict | None = None) -> dict:
    """Tables -> the reference's ``to_dict`` JSON shape
    (knowledge_graph.py:174-186): ``{entities, relationships, claims,
    community_summaries}`` keyed by id."""
    # claims-per-entity backfill (the reference appends claim text onto
    # each referenced entity, knowledge_graph.py:96-99)
    entity_claims: dict[str, list[str]] = {}
    claim_rows = claims.to_pylist() if claims is not None else []
    for c in claim_rows:
        for eid in c["entity_ids"]:
            entity_claims.setdefault(eid, []).append(c["content"])

    entities = {}
    for r in nodes.to_pylist():
        entities[r["entity_id"]] = {
            "name": r["name"],
            "type": r["type"],
            "description": r["description"],
            "id": r["entity_id"],
            "instances": [{"source_id": i["url"],
                           "text_chunk_id": i["chunk_id"]}
                          for i in r["instances"]],
            "claims": sorted(entity_claims.get(r["entity_id"], [])),
            # Extra keys beyond the reference shape (harmless to reference
            # tooling) so export -> load is lossless: the instances list is
            # capped at instance_cap while n_instances is the exact count,
            # and aliases carry the resolved surface forms.
            "aliases": sorted(r["aliases"] or []),
            "n_instances": r["n_instances"],
        }
    relationships = {}
    for r in edges.to_pylist():
        relationships[r["edge_id"]] = {
            "source_id": r["subj_id"],
            "target_id": r["obj_id"],
            "description": r["pred"],
            "strength": r["strength"],
            "id": r["edge_id"],
            "instances": [{"source_id": i["url"],
                           "text_chunk_id": i["chunk_id"]}
                          for i in r["instances"]],
            "n_instances": r["n_instances"],
        }
    claims_out = {}
    for r in claim_rows:
        claims_out[r["claim_id"]] = {
            "content": r["content"],
            "entity_ids": r["entity_ids"],
            "id": r["claim_id"],
            "instances": [{"source_id": i["url"],
                           "text_chunk_id": i["chunk_id"]}
                          for i in r["instances"]],
            "n_instances": r["n_instances"],
        }
    return {
        "entities": entities,
        "relationships": relationships,
        "claims": claims_out,
        "community_summaries": community_summaries or {},
    }


def save_graph_json(directory: str, nodes: pa.Table, edges: pa.Table,
                    claims: pa.Table | None = None,
                    community_summaries: dict | None = None,
                    hierarchy: dict | None = None) -> str:
    """Write ``knowledge_graph.json`` (+ optional
    ``community_hierarchy.json``) in the reference's directory layout
    (main.py:105-118).  Keys are content-hash ids, so re-export of the
    same tables is byte-stable."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, "knowledge_graph.json")
    with open(path, "w") as f:
        json.dump(graph_to_dict(nodes, edges, claims, community_summaries),
                  f, indent=2, sort_keys=True)
    if hierarchy is not None:
        with open(os.path.join(directory, "community_hierarchy.json"),
                  "w") as f:
            json.dump(hierarchy, f, indent=2, sort_keys=True)
    return path


def load_graph_json(path: str) -> dict[str, pa.Table]:
    """``knowledge_graph.json`` -> {"nodes","edges","claims"} Arrow tables
    (the inverse mapping of :func:`graph_to_dict`; reference loader at
    knowledge_graph.py:198-229)."""
    with open(path) as f:
        d = json.load(f)

    def insts(lst):
        return [{"url": i["source_id"], "chunk_id": i["text_chunk_id"]}
                for i in lst]

    # Prefer the explicit extra keys our exporter writes (lossless
    # round-trip of capped instances + aliases); degrade gracefully on
    # JSON from reference tooling that lacks them.
    node_rows = [{
        "entity_id": e["id"], "name": e["name"], "type": e["type"],
        "description": e["description"],
        "aliases": sorted(e.get("aliases") or {e["name"]}),
        "n_instances": e.get("n_instances", len(e["instances"])),
        "instances": insts(e["instances"]),
    } for e in d.get("entities", {}).values()]
    node_rows.sort(key=lambda r: r["entity_id"])

    names = {e["id"]: e["name"] for e in d.get("entities", {}).values()}
    edge_rows = [{
        "edge_id": r["id"], "subj_id": r["source_id"],
        "obj_id": r["target_id"],
        "subj_name": names.get(r["source_id"], ""),
        "obj_name": names.get(r["target_id"], ""),
        "pred": r["description"], "strength": float(r["strength"]),
        "n_instances": r.get("n_instances", len(r["instances"])),
        "instances": insts(r["instances"]),
    } for r in d.get("relationships", {}).values()]
    edge_rows.sort(key=lambda r: (r["subj_id"], r["pred"], r["obj_id"]))

    claim_rows = [{
        "claim_id": c["id"], "content": c["content"],
        "entity_ids": c["entity_ids"],
        "n_instances": c.get("n_instances", len(c["instances"])),
        "instances": insts(c["instances"]),
    } for c in d.get("claims", {}).values()]
    claim_rows.sort(key=lambda r: r["claim_id"])

    def tbl(rows, schema):
        return (pa.Table.from_pylist(rows, schema=schema) if rows
                else schema.empty_table())

    return {"nodes": tbl(node_rows, NODES_SCHEMA),
            "edges": tbl(edge_rows, EDGES_SCHEMA),
            "claims": tbl(claim_rows, CLAIMS_SCHEMA)}


def to_dataframes(nodes: pa.Table, edges: pa.Table,
                  claims: pa.Table | None = None):
    """The reference's tabular export (``to_dataframes``,
    knowledge_graph.py:231-283): entities / relationships (with
    denormalized source/target names) / claims (with entity_names) as
    pandas DataFrames."""
    entities_df = nodes.select(
        ["entity_id", "name", "type", "description",
         "n_instances"]).to_pandas()
    rel_df = edges.select(
        ["edge_id", "subj_id", "subj_name", "obj_id", "obj_name", "pred",
         "strength", "n_instances"]).to_pandas()
    names = dict(zip(nodes["entity_id"].to_pylist(),
                     nodes["name"].to_pylist()))
    if claims is not None and claims.num_rows:
        rows = claims.to_pylist()
        claims_df = pa.table({
            "claim_id": pa.array([r["claim_id"] for r in rows]),
            "content": pa.array([r["content"] for r in rows]),
            "entity_names": pa.array(
                [sorted(names.get(e, "?") for e in r["entity_ids"])
                 for r in rows], pa.list_(pa.string())),
            "n_instances": pa.array([r["n_instances"] for r in rows],
                                    pa.int64()),
        }).to_pandas()
    else:
        claims_df = CLAIMS_SCHEMA.empty_table().select(
            ["claim_id", "content"]).to_pandas()
    return entities_df, rel_df, claims_df
