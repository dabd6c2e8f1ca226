"""Fused in-task combining of the tagged extraction output.

The streaming pipeline's original shape materialized the full tagged
extraction table (one row per mention/triple/claim — the corpus-sized
intermediate) and re-scanned it twice to feed the nodes and edges
shuffles.  At N workers that materialize + double scan is a fixed,
non-scaling cost that caps scaling efficiency.

This module instead runs the per-batch combiners INSIDE the fused
read->text->chunk->extract task chain, so what leaves the extraction
tasks is one aggregation-state row per key per block — hundreds to
thousands of times smaller than the tagged table.  Only those states are
materialized and shuffled:

    pages -> text -> chunk -> extract -> combine   (one fused task chain)
      -> repartition(few blocks) -> materialize    (tiny)
    nodes = states[kind=m] -> salted groupby x2 -> sort   (existing reducers)
    edges = states[kind=t] -> broadcast resolve -> groupby -> sort

Unified state row: (kind: "m"|"t", key, salt, state-json).  Mention
states reuse :func:`kgx.stages.canonicalize.combine_mentions_batch`
verbatim; triple states reuse
:func:`kgx.stages.edges._combine_triples_unresolved` (key = normalized
subject, state carries raw s/p/o + sum/n/instances), so merge semantics
are bit-identical to the unfused path — asserted by the stream-vs-
checkpointed parity test.  The checkpointed ``run_pipeline`` keeps the
full tagged checkpoint on purpose (partition-level resume + the claims
consumer need it); this fused shape is the throughput path.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc
import ray

from kgx.functions.normalize import normalize
from kgx.stages.canonicalize import (DEFAULT_INSTANCE_CAP, DEFAULT_N_SALTS,
                                     combine_mentions_batch, finalize_group,
                                     reduce_partial_group)
from kgx.stages.edges import (DEFAULT_MIN_STRENGTH, _combine_triples_unresolved,
                              _finalize_edge_group)

STATES_SCHEMA = pa.schema([
    ("kind", pa.string()),       # "m" mention-state | "t" triple-state
    ("key", pa.string()),        # m: norm_mention; t: normalize(subj)
    ("salt", pa.int32()),        # m only (0 for t)
    ("state", pa.string()),      # json merge state
])


def make_combine_extracted_fn(*, n_salts: int = DEFAULT_N_SALTS,
                              cap: int = DEFAULT_INSTANCE_CAP,
                              min_strength: float = DEFAULT_MIN_STRENGTH):
    """Tagged extraction batch -> unified per-key state rows."""
    def combine(tagged: pa.Table) -> pa.Table:
        m_in = tagged.filter(pc.equal(tagged["kind"], "mention"))
        m = combine_mentions_batch(m_in, n_salts=n_salts, cap=cap)
        t_in = tagged.filter(pc.equal(tagged["kind"], "triple"))
        t = _combine_triples_unresolved(t_in, min_strength=min_strength,
                                        cap=cap)
        nm, nt = m.num_rows, t.num_rows
        return pa.Table.from_arrays([
            pa.array(["m"] * nm + ["t"] * nt, pa.string()),
            pa.concat_arrays([m["norm_mention"].combine_chunks(),
                              t["norm"].combine_chunks()]),
            pa.concat_arrays([m["salt"].combine_chunks(),
                              pa.array([0] * nt, pa.int32())]),
            pa.concat_arrays([m["state"].combine_chunks(),
                              t["state"].combine_chunks()]),
        ], schema=STATES_SCHEMA)
    return combine


def nodes_from_states(states_ds, *, cap: int = DEFAULT_INSTANCE_CAP):
    """Mention states -> canonical nodes (same two-phase reducers)."""
    m = states_ds.map_batches(
        lambda t: pa.table({
            "norm_mention": t.filter(pc.equal(t["kind"], "m"))["key"],
            "salt": t.filter(pc.equal(t["kind"], "m"))["salt"],
            "state": t.filter(pc.equal(t["kind"], "m"))["state"],
        }),
        batch_format="pyarrow")
    partial = m.groupby(["norm_mention", "salt"]).map_groups(
        lambda g: reduce_partial_group(g, cap=cap), batch_format="pyarrow")
    nodes = partial.groupby("norm_mention").map_groups(
        lambda g: finalize_group(g, cap=cap), batch_format="pyarrow")
    return nodes.sort("entity_id")


class _ResolveTripleStates:
    """Broadcast-resolve pre-combined triple states: rewrite each raw
    (s, p, o) state to its (subj_id, pred, obj_id) key, dropping states
    with an unresolvable endpoint (J1 semantics).  States whose raw keys
    resolve to the same id-key are merged by the downstream groupby."""

    def __init__(self, alias_ref):
        self.alias = ray.get(alias_ref) if isinstance(
            alias_ref, ray.ObjectRef) else alias_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["kind"], "t"))
        sid_c, pred_c, oid_c, st_c = [], [], [], []
        for key, s_json in zip(t["key"].to_pylist(),
                               t["state"].to_pylist()):
            st = json.loads(s_json)
            s = self.alias.get(key)                      # key = norm(subj)
            o = self.alias.get(st["no"])
            if s is None or o is None:
                continue
            sid_c.append(s[0])
            pred_c.append(st["p"])
            oid_c.append(o[0])
            st_c.append(json.dumps(
                {"sn": s[1], "on": o[1], "sum": st["sum"], "n": st["n"],
                 "inst": st["inst"]}, sort_keys=True))
        return pa.table({
            "subj_id": pa.array(sid_c, pa.string()),
            "pred": pa.array(pred_c, pa.string()),
            "obj_id": pa.array(oid_c, pa.string()),
            "state": pa.array(st_c, pa.string()),
        })


def edges_from_states(states_ds, alias_ref, *,
                      cap: int = DEFAULT_INSTANCE_CAP):
    """Triple states -> canonical edges via the broadcast alias map and
    the shared merge/finalize groupby + global dedup-sort."""
    from kgx.stages.edges import make_task_resolver
    resolved = states_ds.map_batches(
        make_task_resolver(_ResolveTripleStates, alias_ref),
        batch_format="pyarrow")
    edges = resolved.groupby(["subj_id", "pred", "obj_id"]).map_groups(
        lambda g: _finalize_edge_group(g, cap), batch_format="pyarrow")
    return edges.sort(["subj_id", "pred", "obj_id"])
