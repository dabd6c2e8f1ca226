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


class TestPrefixHammingPairs:
    """Pigeonhole-blocked fuzzy prefix dedup vs a brute-force reference."""

    def _brute(self, ids, texts, P=24, k=2):
        pres = [(t or "")[:P].ljust(P, "\x01") for t in texts]
        out = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = sum(a != b for a, b in zip(pres[i], pres[j]))
                if d <= k:
                    out.add((min(ids[i], ids[j]),
                             max(ids[i], ids[j]), d))
        return out

    def test_matches_bruteforce_on_mutated_corpus(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from kgx.ops.dedup import prefix_hamming_pairs
        rng = np.random.default_rng(3)
        base = ["the quick brown fox jumps over the lazy dog",
                "pack my box with five dozen liquor jugs",
                "short", ""]
        texts, ids = [], []
        n = 0
        for b in base:
            for _ in range(12):                 # mutated variants
                s = list(b)
                for _ in range(int(rng.integers(0, 4))):
                    if s:
                        s[int(rng.integers(0, len(s)))] = chr(
                            97 + int(rng.integers(0, 26)))
                texts.append("".join(s))
                ids.append(n)
                n += 1
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())})
        got = prefix_hamming_pairs(rd.from_arrow(t)).to_pandas()
        got_set = set(zip(got.doc_a, got.doc_b, got.dist))
        assert got_set == self._brute(ids, texts)

    def test_each_pair_emitted_once(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from kgx.ops.dedup import prefix_hamming_pairs
        # identical prefixes -> all three chunks match; ownership must
        # still emit the pair exactly once
        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(["same exact prefix here!!"] * 3,
                                       pa.string())})
        got = prefix_hamming_pairs(rd.from_arrow(t)).to_pandas()
        assert sorted(zip(got.doc_a, got.doc_b)) == [(1, 2), (1, 3),
                                                     (2, 3)]
        assert (got.dist == 0).all()
