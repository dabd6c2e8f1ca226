"""Entity canonicalization: salted two-phase groupby(norm_mention) merge.

Replaces the reference's order-dependent O(n²) greedy resolver
(``EntityResolver.resolve_entities``,
/root/reference/extraction/entity_resolver.py:25-56) and the global mutable
dedup store (``KnowledgeGraph.add_entity``,
/root/reference/models/knowledge_graph.py:25-45) with an order-independent,
associative merge over the normalized-mention shuffle key:

1. **in-batch combine** (``map_batches``): partial-aggregate each Arrow batch
   of mentions to one state row per (norm_mention) with a deterministic salt,
   so the shuffle moves one row per key per batch instead of every mention;
2. **phase 1** ``groupby([norm_mention, salt]).map_groups``: partial merge —
   a head-skew key ("United States" in ~20% of pages) is split across
   ``n_salts`` reducers instead of landing on one;
3. **phase 2** ``groupby(norm_mention).map_groups``: final merge + finalize
   into the nodes schema.

Merge semantics preserve the reference's ``Entity.merge``
(/root/reference/models/entity.py:40-64) made order-independent:
longest description wins (tie -> lexicographically smallest); canonical
name/type are the most frequent raw surface/type (tie -> smallest);
instances are the distinct min-K ``(url, chunk_id)`` pairs (min-K of a union
is associative) with the exact occurrence count kept separately in
``n_instances``.  All of this is property-tested: single-phase == two-phase.
"""

from __future__ import annotations

import json
import zlib

import pyarrow as pa

from kgx.functions.normalize import entity_id

NODES_SCHEMA = pa.schema([
    ("entity_id", pa.string()),
    ("name", pa.string()),
    ("type", pa.string()),
    ("description", pa.string()),
    ("aliases", pa.list_(pa.string())),
    ("n_instances", pa.int64()),
    ("instances", pa.list_(pa.struct([("url", pa.string()),
                                      ("chunk_id", pa.string())]))),
])

DEFAULT_N_SALTS = 32
DEFAULT_INSTANCE_CAP = 200


def _new_state() -> dict:
    return {"nc": {}, "tc": {}, "d": "", "n": 0, "inst": [], "al": []}


def _better_desc(a: str, b: str) -> str:
    """Longest wins; ties break to the lexicographically smallest."""
    if len(a) != len(b):
        return a if len(a) > len(b) else b
    return min(a, b)


def _merge_counts(dst: dict, src: dict) -> None:
    for k, v in src.items():
        dst[k] = dst.get(k, 0) + v


def _cap_instances(pairs: list, cap: int) -> list:
    """Distinct min-K of (url, chunk_id) pairs — associative under union."""
    return sorted(set(map(tuple, pairs)))[:cap]


def merge_states(a: dict, b: dict, cap: int = DEFAULT_INSTANCE_CAP) -> dict:
    _merge_counts(a["nc"], b["nc"])
    _merge_counts(a["tc"], b["tc"])
    a["d"] = _better_desc(a["d"], b["d"])
    a["n"] += b["n"]
    a["inst"] = _cap_instances(a["inst"] + b["inst"], cap)
    a["al"] = sorted(set(a["al"]) | set(b["al"]))
    return a


def _argmax_count(counts: dict) -> str:
    """Most frequent; ties break to the lexicographically smallest key."""
    return min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def combine_mentions_batch(batch: pa.Table, *,
                           n_salts: int = DEFAULT_N_SALTS,
                           cap: int = DEFAULT_INSTANCE_CAP) -> pa.Table:
    """In-batch combiner: mentions batch -> one (norm, salt, state) row/key.

    Instances/aliases accumulate raw per batch (bounded by the batch row
    count) and are deduped/sorted/capped ONCE per key at emit — per-row
    ``sorted(set(...))`` maintenance is quadratic on hot keys.
    """
    states: dict[str, dict] = {}
    salts: dict[str, int] = {}
    for url, chunk_id, mention, norm, etype, desc in zip(
            batch["url"].to_pylist(), batch["chunk_id"].to_pylist(),
            batch["mention"].to_pylist(), batch["norm_mention"].to_pylist(),
            batch["type"].to_pylist(), batch["description"].to_pylist()):
        if not norm:
            continue
        st = states.get(norm)
        if st is None:
            st = states[norm] = _new_state()
            salts[norm] = zlib.crc32(url.encode()) % n_salts
        st["nc"][mention] = st["nc"].get(mention, 0) + 1
        st["tc"][etype] = st["tc"].get(etype, 0) + 1
        st["d"] = _better_desc(st["d"], desc or "")
        st["n"] += 1
        st["inst"].append((url, chunk_id))
    keys = sorted(states)
    for k in keys:
        st = states[k]
        st["inst"] = _cap_instances(st["inst"], cap)
        st["al"] = sorted(st["nc"])
    return pa.table({
        "norm_mention": pa.array(keys, pa.string()),
        "salt": pa.array([salts[k] for k in keys], pa.int32()),
        "state": pa.array([json.dumps(states[k], sort_keys=True) for k in keys],
                          pa.string()),
    })


def _fold_state_rows(jsons, cap: int) -> dict:
    """Fold a group's state rows with ONE final dedupe/sort/cap instead of
    per-merge ``sorted(set(...))`` maintenance (capped min-K and sorted
    union are associative, so the result is byte-identical to the pairwise
    :func:`merge_states` fold — asserted by the parity tests)."""
    acc = _new_state()
    inst: set = set()
    al: set = set()
    for s in jsons:
        b = json.loads(s)
        _merge_counts(acc["nc"], b["nc"])
        _merge_counts(acc["tc"], b["tc"])
        acc["d"] = _better_desc(acc["d"], b["d"])
        acc["n"] += b["n"]
        inst.update(map(tuple, b["inst"]))
        al.update(b["al"])
    acc["inst"] = sorted(inst)[:cap]
    acc["al"] = sorted(al)
    return acc


def reduce_partial_group(group: pa.Table, *,
                         cap: int = DEFAULT_INSTANCE_CAP) -> pa.Table:
    """Phase-1 reducer: merge all states of one (norm, salt) group."""
    acc = _fold_state_rows(group["state"].to_pylist(), cap)
    return pa.table({
        "norm_mention": pa.array([group["norm_mention"][0].as_py()], pa.string()),
        "state": pa.array([json.dumps(acc, sort_keys=True)], pa.string()),
    })


def finalize_group(group: pa.Table, *,
                   cap: int = DEFAULT_INSTANCE_CAP) -> pa.Table:
    """Phase-2 reducer: merge remaining states and emit one nodes row."""
    acc = _fold_state_rows(group["state"].to_pylist(), cap)
    norm = group["norm_mention"][0].as_py()
    row = {
        "entity_id": [entity_id(norm)],
        "name": [_argmax_count(acc["nc"])],
        "type": [_argmax_count(acc["tc"])],
        "description": [acc["d"]],
        "aliases": [acc["al"]],
        "n_instances": [acc["n"]],
        "instances": [[{"url": u, "chunk_id": c} for u, c in acc["inst"]]],
    }
    return pa.table({f.name: pa.array(row[f.name], f.type) for f in NODES_SCHEMA})


def canonicalize(mentions_ds, *, n_salts: int = DEFAULT_N_SALTS,
                 cap: int = DEFAULT_INSTANCE_CAP,
                 combine_batch_size: int = 65536):
    """mentions Dataset -> canonical nodes Dataset, sorted by entity_id.

    ``mentions_ds`` needs columns (url, chunk_id, mention, norm_mention,
    type, description).  The two groupbys are the only shuffles; both run
    over pre-combined state rows (<= one row per key per combine batch,
    then <= n_salts rows per key).  The combine batch is large on purpose:
    each shuffled block carries one state row per key per batch, so bigger
    batches mean a smaller all-to-all.
    """
    combined = mentions_ds.map_batches(
        lambda b: combine_mentions_batch(b, n_salts=n_salts, cap=cap),
        batch_format="pyarrow", batch_size=combine_batch_size)
    partial = combined.groupby(["norm_mention", "salt"]).map_groups(
        lambda g: reduce_partial_group(g, cap=cap), batch_format="pyarrow")
    nodes = partial.groupby("norm_mention").map_groups(
        lambda g: finalize_group(g, cap=cap), batch_format="pyarrow")
    return nodes.sort("entity_id")
