"""Broadcast vs co-shuffle endpoint resolution equivalence (SURVEY.md §7
hard parts: the strategy switch must not change results)."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from kgx.pipelines.kg import KGConfig, run_pipeline
from kgx.stages.edges import (build_alias_map, resolve_and_dedup_edges,
                              resolve_and_dedup_edges_auto,
                              resolve_and_dedup_edges_coshuffle)


def _graph_inputs(smoke_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("coshuffle"))
    paths = run_pipeline(smoke_corpus["pages"], out, KGConfig())
    nodes_tbl = pq.read_table(paths["nodes"],
                              columns=["entity_id", "name", "aliases"])
    triples = rd.read_parquet(
        paths["extracted"],
        columns=["kind", "url", "chunk_id", "subj", "pred", "obj",
                 "strength"],
        filter=pc.field("kind") == "triple")
    nodes_ds = rd.read_parquet(paths["nodes"],
                               columns=["entity_id", "name", "aliases"])
    return nodes_tbl, triples, nodes_ds, paths


def test_coshuffle_equals_broadcast(ray_session, smoke_corpus,
                                    tmp_path_factory):
    nodes_tbl, triples, nodes_ds, paths = _graph_inputs(
        smoke_corpus, tmp_path_factory)
    alias_ref = ray.put(build_alias_map(nodes_tbl))

    broadcast = pa.concat_tables(list(resolve_and_dedup_edges(
        triples, alias_ref).iter_batches(batch_format="pyarrow")))
    coshuffle = pa.concat_tables(list(resolve_and_dedup_edges_coshuffle(
        triples, nodes_ds).iter_batches(batch_format="pyarrow")))
    assert coshuffle.to_pylist() == broadcast.to_pylist()
    # and both equal the checkpointed pipeline's own edges output
    want = pq.read_table(paths["edges"])
    assert broadcast.to_pylist() == want.to_pylist()


def test_auto_switches_to_coshuffle(ray_session, smoke_corpus,
                                    tmp_path_factory):
    nodes_tbl, triples, nodes_ds, _paths = _graph_inputs(
        smoke_corpus, tmp_path_factory)
    alias_ref = ray.put(build_alias_map(nodes_tbl))
    # threshold 0 forces the co-shuffle path; result must be unchanged
    forced = pa.concat_tables(list(resolve_and_dedup_edges_auto(
        triples, nodes_ds, alias_ref,
        broadcast_max_nodes=0).iter_batches(batch_format="pyarrow")))
    broadcast = pa.concat_tables(list(resolve_and_dedup_edges(
        triples, alias_ref).iter_batches(batch_format="pyarrow")))
    assert forced.to_pylist() == broadcast.to_pylist()


def test_pipeline_coshuffle_strategy(ray_session, smoke_corpus,
                                     tmp_path_factory):
    out_a = str(tmp_path_factory.mktemp("strat_a"))
    out_b = str(tmp_path_factory.mktemp("strat_b"))
    pa_ = run_pipeline(smoke_corpus["pages"], out_a, KGConfig())
    pb_ = run_pipeline(smoke_corpus["pages"], out_b,
                       KGConfig(resolve_strategy="coshuffle"))
    ea = pq.read_table(pa_["edges"])
    eb = pq.read_table(pb_["edges"])
    assert ea.to_pylist() == eb.to_pylist()
