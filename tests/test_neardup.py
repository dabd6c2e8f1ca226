"""Near-duplicate entity merging (SURVEY.md §2.5 O1 extension:
MinHash-LSH name merge replacing the reference's 0.85-cosine greedy
resolver)."""

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from kgx.pipelines.kg import KGConfig, run_pipeline
from kgx.stages.canonicalize import NODES_SCHEMA
from kgx.stages.neardup import build_remap, neardup_merge_nodes


def _node(eid, name, n, desc="d", aliases=None):
    return {
        "entity_id": eid, "name": name, "type": "ORGANIZATION",
        "description": desc, "aliases": aliases or [name],
        "n_instances": n,
        "instances": [{"url": f"u{eid}", "chunk_id": f"u{eid}_0"}],
    }


def _nodes_ds(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=NODES_SCHEMA))


class TestNearDup:
    def test_merges_near_duplicate_names(self, ray_session):
        rows = [
            _node("a1", "Acme Corporation", 10, desc="The Acme company"),
            _node("b2", "Acme Corporatio", 2),     # typo variant
            _node("c3", "Globex Industries", 5),
        ]
        out = pa.concat_tables(list(neardup_merge_nodes(
            _nodes_ds(rows), threshold=0.5).iter_batches(
                batch_format="pyarrow")))
        assert out.num_rows == 2
        merged = out.filter(
            pa.compute.equal(out["entity_id"], "a1")).to_pylist()[0]
        assert merged["n_instances"] == 12          # counts summed
        assert "Acme Corporatio" in merged["aliases"]
        assert merged["name"] == "Acme Corporation"  # higher-count canonical
        assert merged["description"] == "The Acme company"  # longest wins
        assert len(merged["instances"]) == 2         # instance union

    def test_no_near_dups_is_identity(self, ray_session):
        rows = [_node("a1", "Alpha Systems", 3),
                _node("b2", "Zebra Logistics", 4)]
        out = pa.concat_tables(list(neardup_merge_nodes(
            _nodes_ds(rows), threshold=0.7).iter_batches(
                batch_format="pyarrow")))
        assert sorted(out["entity_id"].to_pylist()) == ["a1", "b2"]
        assert sorted(out["n_instances"].to_pylist()) == [3, 4]

    def test_remap_transitive_component(self):
        pairs = pa.table({
            "id_a": ["a", "b"], "id_b": ["b", "c"],
            "est_jaccard": [0.9, 0.9],
            "n_a": [5, 1], "n_b": [1, 9],
        })
        remap = build_remap(pairs)
        # one component {a,b,c}; canonical = c (most instances)
        assert remap == {"a": "c", "b": "c"}

    def test_deterministic(self, ray_session):
        rows = [_node("a1", "Acme Corporation", 10),
                _node("b2", "Acme Corporatio", 2),
                _node("c3", "Acme Corporatin", 1)]
        r1 = pa.concat_tables(list(neardup_merge_nodes(
            _nodes_ds(rows), threshold=0.4).iter_batches(
                batch_format="pyarrow"))).to_pylist()
        r2 = pa.concat_tables(list(neardup_merge_nodes(
            _nodes_ds(rows), threshold=0.4).iter_batches(
                batch_format="pyarrow"))).to_pylist()
        assert r1 == r2

    def test_cosine_merge_merges_near_duplicate_names(self, ray_session):
        """The config-gated cosine variant (reference entity_resolver
        semantics) merges shingle-similar names via LSH candidates +
        exact cosine verify, with the same canonical pick."""
        from kgx.stages.neardup import cosine_merge_nodes
        rows = [
            _node("a1", "Acme Corporation", 10, desc="The Acme company"),
            _node("b2", "Acme Corporatio", 2),     # typo variant
            _node("c3", "Globex Industries", 5),
        ]
        out = pa.concat_tables(list(cosine_merge_nodes(
            _nodes_ds(rows), threshold=0.6).iter_batches(
                batch_format="pyarrow")))
        assert out.num_rows == 2
        merged = out.filter(
            pa.compute.equal(out["entity_id"], "a1")).to_pylist()[0]
        assert merged["n_instances"] == 12
        assert "Acme Corporatio" in merged["aliases"]
        assert merged["name"] == "Acme Corporation"
        # distinct names survive untouched
        assert "c3" in out["entity_id"].to_pylist()

    def test_cosine_merge_identity_and_determinism(self, ray_session):
        from kgx.stages.neardup import cosine_merge_nodes
        rows = [_node("a1", "Alpha Systems", 3),
                _node("b2", "Zebra Logistics", 4)]
        out = pa.concat_tables(list(cosine_merge_nodes(
            _nodes_ds(rows), threshold=0.6).iter_batches(
                batch_format="pyarrow")))
        assert sorted(out["entity_id"].to_pylist()) == ["a1", "b2"]
        rows2 = [_node("a1", "Acme Corporation", 10),
                 _node("b2", "Acme Corporatio", 2),
                 _node("c3", "Acme Corporatin", 1)]
        r1 = pa.concat_tables(list(cosine_merge_nodes(
            _nodes_ds(rows2), threshold=0.5).iter_batches(
                batch_format="pyarrow"))).to_pylist()
        r2 = pa.concat_tables(list(cosine_merge_nodes(
            _nodes_ds(rows2), threshold=0.5).iter_batches(
                batch_format="pyarrow"))).to_pylist()
        assert r1 == r2

    def test_cosine_pipeline_knob_is_semantic(self, smoke_corpus,
                                              tmp_path_factory):
        out = str(tmp_path_factory.mktemp("cm"))
        p1 = run_pipeline(smoke_corpus["pages"], out, KGConfig())
        n_before = pq.read_table(p1["nodes"]).num_rows
        p2 = run_pipeline(smoke_corpus["pages"], out,
                          KGConfig(cosine_merge_threshold=0.95))
        t = pq.read_table(p2["nodes"])
        assert t.schema.equals(NODES_SCHEMA)
        assert 0 < t.num_rows <= n_before

    def test_pipeline_knob_is_semantic(self, smoke_corpus, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("nd"))
        p1 = run_pipeline(smoke_corpus["pages"], out, KGConfig())
        n_before = pq.read_table(p1["nodes"]).num_rows
        # rerun with the knob ON: nodes stage must re-run (semantic hash
        # change), and the result must still be a valid nodes table
        p2 = run_pipeline(smoke_corpus["pages"], out,
                          KGConfig(neardup_threshold=0.9))
        t = pq.read_table(p2["nodes"])
        assert t.schema.equals(NODES_SCHEMA)
        assert 0 < t.num_rows <= n_before
