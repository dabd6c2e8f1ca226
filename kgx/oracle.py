"""Sequential single-process oracle of the full KG pipeline.

Reference-faithful sequential implementation (the execution shape of
/root/reference/indexing/simple_graph_builder.py:50-152 — everything in
driver memory, one pass) using the SAME pure functions and merge semantics
as the Ray pipeline.  The e2e test asserts the distributed pipeline's
nodes/edges/claims tables are exactly equal to this oracle's — i.e. the
shuffles, salting, in-batch combining and broadcast join change nothing —
and both score P/R >= 0.95 against the planted truth sidecar.
"""

from __future__ import annotations

import pyarrow as pa

from kgx.functions.chunker import chunk_text
from kgx.functions.html_text import extract_text
from kgx.functions.normalize import claim_id, edge_id, entity_id, normalize
from kgx.stages.canonicalize import (NODES_SCHEMA, _argmax_count,
                                     _cap_instances, _new_state, merge_states)
from kgx.stages.edges import CLAIMS_SCHEMA, EDGES_SCHEMA
from kgx.stages.extract import GazetteerExtractor, TermExtractor


def run_oracle(pages: pa.Table, *, chunk_size=200, chunk_overlap=50,
               min_strength=0.5, extractor: str = "gazetteer",
               lang_filter: str | None = None,
               instance_cap: int = 200) -> dict[str, pa.Table]:
    """pages Arrow table -> {"nodes","edges","claims"} Arrow tables."""
    ex = GazetteerExtractor() if extractor == "gazetteer" else TermExtractor()

    # texts + chunks, sequentially
    chunks = []
    for row in pages.to_pylist():
        if lang_filter and row["lang"] != lang_filter:
            continue
        text = row["text"] if row["text"] is not None else extract_text(row["html"])
        chunks.extend(chunk_text(text, row["url"], chunk_size, chunk_overlap))

    chunk_tbl = pa.table({
        "url": pa.array([c["url"] for c in chunks], pa.string()),
        "chunk_id": pa.array([c["chunk_id"] for c in chunks], pa.string()),
        "text": pa.array([c["text"] for c in chunks], pa.string()),
    })
    ext = ex(chunk_tbl) if chunk_tbl.num_rows else None

    # canonicalize mentions (single global merge — no salting, no batching)
    ent_states: dict[str, dict] = {}
    rows = ext.to_pylist() if ext is not None else []
    for r in rows:
        if r["kind"] != "mention":
            continue
        st = ent_states.setdefault(r["norm_mention"], _new_state())
        one = _new_state()
        one["nc"][r["mention"]] = 1
        one["tc"][r["type"]] = 1
        one["d"] = r["description"] or ""
        one["n"] = 1
        one["inst"] = [(r["url"], r["chunk_id"])]
        one["al"] = [r["mention"]]
        merge_states(st, one, instance_cap)

    alias = {}
    node_rows = []
    for norm in sorted(ent_states):
        st = ent_states[norm]
        eid = entity_id(norm)
        name = _argmax_count(st["nc"])
        alias[norm] = (eid, name)
        node_rows.append({
            "entity_id": eid, "name": name, "type": _argmax_count(st["tc"]),
            "description": st["d"], "aliases": st["al"],
            "n_instances": st["n"],
            "instances": [{"url": u, "chunk_id": c} for u, c in st["inst"]],
        })
    node_rows.sort(key=lambda r: r["entity_id"])

    # edges
    edge_states: dict[tuple, dict] = {}
    for r in rows:
        if r["kind"] != "triple" or r["strength"] is None or \
                r["strength"] < min_strength:
            continue
        s = alias.get(normalize(r["subj"]))
        o = alias.get(normalize(r["obj"]))
        if s is None or o is None:
            continue
        key = (s[0], r["pred"], o[0])
        st = edge_states.setdefault(
            key, {"sn": s[1], "on": o[1], "sum": 0.0, "n": 0, "inst": []})
        st["sum"] += float(r["strength"])
        st["n"] += 1
        st["inst"] = _cap_instances(st["inst"] + [(r["url"], r["chunk_id"])],
                                    instance_cap)
    edge_rows = []
    for (sid, pred, oid) in sorted(edge_states):
        st = edge_states[(sid, pred, oid)]
        edge_rows.append({
            "edge_id": edge_id(sid, pred, oid), "subj_id": sid, "obj_id": oid,
            "subj_name": st["sn"], "obj_name": st["on"], "pred": pred,
            "strength": st["sum"] / st["n"], "n_instances": st["n"],
            "instances": [{"url": u, "chunk_id": c} for u, c in st["inst"]],
        })

    # claims
    claim_states: dict[str, dict] = {}
    for r in rows:
        if r["kind"] != "claim" or not r["content"]:
            continue
        ids = sorted({alias[normalize(e)][0] for e in (r["entities"] or [])
                      if normalize(e) in alias})
        if not ids:
            continue
        key = r["content"].lower()
        st = claim_states.setdefault(
            key, {"c": r["content"], "ids": [], "n": 0, "inst": []})
        st["c"] = min(st["c"], r["content"])
        st["ids"] = sorted(set(st["ids"]) | set(ids))
        st["n"] += 1
        st["inst"] = _cap_instances(st["inst"] + [(r["url"], r["chunk_id"])],
                                    instance_cap)
    claim_rows = []
    for key in sorted(claim_states, key=lambda k: claim_id(k)):
        st = claim_states[key]
        claim_rows.append({
            "claim_id": claim_id(key), "content": st["c"],
            "entity_ids": st["ids"], "n_instances": st["n"],
            "instances": [{"url": u, "chunk_id": c} for u, c in st["inst"]],
        })

    def tbl(rows_, schema):
        if not rows_:
            return schema.empty_table()
        return pa.Table.from_pylist(rows_, schema=schema)

    return {"nodes": tbl(node_rows, NODES_SCHEMA),
            "edges": tbl(edge_rows, EDGES_SCHEMA),
            "claims": tbl(claim_rows, CLAIMS_SCHEMA)}


def triple_pr(edges: pa.Table, nodes: pa.Table,
              truth: pa.Table) -> tuple[float, float]:
    """Precision/recall of emitted (subj_norm, pred, obj_norm) triples vs
    the truth sidecar (north_rule P/R metric)."""
    id2norm = {}
    for r in nodes.select(["entity_id", "name"]).to_pylist():
        id2norm[r["entity_id"]] = normalize(r["name"])
    got = {(id2norm.get(r["subj_id"]), r["pred"], id2norm.get(r["obj_id"]))
           for r in edges.select(["subj_id", "pred", "obj_id"]).to_pylist()}
    want = {(r["subj_norm"], r["pred"], r["obj_norm"])
            for r in truth.to_pylist()}
    if not got or not want:
        return (0.0, 0.0)
    inter = len(got & want)
    return inter / len(got), inter / len(want)
