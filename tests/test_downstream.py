"""Community detection, summarization, query path, graph JSON I/O
(SURVEY.md §2.5 O5/O6, §2.2 M12-M14, §3.3, §2.1 S2-S5)."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kgx.pipelines.kg import KGConfig, run_pipeline
from kgx.pipelines.query import (answer_question, lexical_cosine,
                                 map_community_answer, rank_summaries)
from kgx.stages.community import (community_assignments, detect_communities,
                                  get_community_tables)
from kgx.stages.summarize import (DeterministicSummarizer, clean_summary,
                                  prepare_input_text, summarize_hierarchy)
from kgx.state.graph_io import (graph_to_dict, load_graph_json,
                                save_graph_json, to_dataframes)


@pytest.fixture(scope="module")
def graph_tables(smoke_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kgout"))
    paths = run_pipeline(smoke_corpus["pages"], out, KGConfig())
    return {
        "nodes": pq.read_table(paths["nodes"]),
        "edges": pq.read_table(paths["edges"]),
        "claims": pq.read_table(paths["claims"]),
    }


@pytest.fixture(scope="module")
def hierarchy(graph_tables):
    return detect_communities(graph_tables["nodes"], graph_tables["edges"],
                              min_community_size=3, levels=2, seed=42)


@pytest.fixture(scope="module")
def summaries(graph_tables, hierarchy):
    return summarize_hierarchy(hierarchy, graph_tables["nodes"],
                               graph_tables["edges"],
                               graph_tables["claims"])


class TestCommunityDetection:
    def test_partition_covers_and_respects_min_size(self, graph_tables,
                                                    hierarchy):
        c0 = hierarchy["C0"]["communities"]
        all_members = [n for c in c0.values() for n in c["nodes"]]
        assert len(all_members) == len(set(all_members))  # disjoint
        connected = set()
        for r in graph_tables["edges"].to_pylist():
            connected.add(r["subj_id"])
            connected.add(r["obj_id"])
        assert connected <= set(all_members)
        sizes = [c["size"] for c in c0.values()]
        # min-size rule: at most one community may be small, and only if
        # it was the sole/largest one (O5 semantics)
        assert all(s >= 3 for s in sizes) or len(sizes) == 1

    def test_deterministic_across_runs(self, graph_tables, hierarchy):
        again = detect_communities(graph_tables["nodes"],
                                   graph_tables["edges"],
                                   min_community_size=3, levels=2, seed=42)
        assert json.dumps(again, sort_keys=True) == json.dumps(
            hierarchy, sort_keys=True)

    def test_flow_and_density_bounds(self, hierarchy):
        for level in hierarchy.values():
            for c in level["communities"].values():
                assert 0.0 <= c["flow"] <= 1.0
                assert 0.0 <= c["density"] <= 1.0
                assert c["description_length"] >= 0.0

    def test_sub_level_parents(self, hierarchy):
        c0 = hierarchy["C0"]["communities"]
        for cid, c in hierarchy["C1"]["communities"].items():
            assert c["parent"] in c0
            assert cid in c0[c["parent"]]["sub_communities"]

    def test_assignments_table(self, hierarchy):
        t = community_assignments(hierarchy)
        assert t.column_names == ["level", "community_id", "entity_id"]
        lv0 = t.filter(pa.compute.equal(t["level"], 0))
        c0 = hierarchy["C0"]["communities"]
        assert lv0.num_rows == sum(c["size"] for c in c0.values())

    def test_membership_join_semantics(self, graph_tables, hierarchy):
        cid = sorted(hierarchy["C0"]["communities"])[0]
        ct = get_community_tables(cid, hierarchy, graph_tables["nodes"],
                                  graph_tables["edges"],
                                  graph_tables["claims"])
        members = set(hierarchy["C0"]["communities"][cid]["nodes"])
        assert set(ct["entities"]["entity_id"].to_pylist()) <= members
        for r in ct["relationships"].to_pylist():
            assert r["subj_id"] in members and r["obj_id"] in members
        if ct["claims"] is not None:
            for r in ct["claims"].to_pylist():
                assert any(e in members for e in r["entity_ids"])


class TestSummarize:
    def test_schema_and_clamp(self, summaries):
        for s in summaries.values():
            assert set(s) >= {"title", "summary", "rating",
                              "rating explanation", "findings", "level"}
            assert 0 <= s["rating"] <= 10
            assert s["findings"]

    def test_clean_summary_defaults(self):
        s = clean_summary({"rating": 99})
        assert s["rating"] == 5.0
        assert s["title"] == "Untitled Community"
        assert s["findings"][0]["summary"] == "Limited information available"

    def test_deterministic(self, graph_tables, hierarchy, summaries):
        again = summarize_hierarchy(hierarchy, graph_tables["nodes"],
                                    graph_tables["edges"],
                                    graph_tables["claims"])
        assert json.dumps(again, sort_keys=True) == json.dumps(
            summaries, sort_keys=True)

    def test_prepare_input_text_sections(self, graph_tables, hierarchy):
        cid = sorted(hierarchy["C0"]["communities"])[0]
        ct = get_community_tables(cid, hierarchy, graph_tables["nodes"],
                                  graph_tables["edges"],
                                  graph_tables["claims"])
        text = prepare_input_text(ct)
        assert text.startswith("Entities\nid,entity,description")
        assert "Relationships\nid,source,target,description" in text
        assert "Claims\nid,claim,entities" in text

    def test_parent_cites_children(self, hierarchy, summaries):
        for cid, c in hierarchy["C0"]["communities"].items():
            if c["sub_communities"]:
                assert "Sub-communities:" in summaries[cid]["summary"]


class TestQuery:
    def test_lexical_cosine(self):
        assert lexical_cosine("alan turing", "alan turing") == 1.0
        assert lexical_cosine("alan turing", "zzz qqq") == 0.0

    def test_rank_deterministic_topk(self, summaries):
        q = "Who works for Acme Corporation?"
        r1 = rank_summaries(q, summaries, level=0, k=3)
        r2 = rank_summaries(q, summaries, level=0, k=3)
        assert r1 == r2 and len(r1) <= 3
        scores = [s for _, s in r1]
        assert scores == sorted(scores, reverse=True)

    def test_answer_shape_and_relevance(self, summaries):
        ans = answer_question("Who works for Acme Corporation?", summaries)
        assert set(ans) == {"question", "answer", "topics",
                            "used_communities"}
        assert "acme" in ans["answer"].lower() or ans["topics"] == []

    def test_map_helpfulness(self, summaries):
        cid = sorted(summaries)[0]
        m = map_community_answer("zzz-no-overlap-term", cid, summaries[cid])
        assert m["helpfulness"] == 0

    def test_no_match_answer(self, summaries):
        ans = answer_question("zzz qqq xyzzy", summaries)
        assert ans["topics"] == []
        assert "No community" in ans["answer"]


class TestGraphIO:
    def test_json_roundtrip_preserves_graph(self, graph_tables, tmp_path):
        path = save_graph_json(str(tmp_path), graph_tables["nodes"],
                               graph_tables["edges"], graph_tables["claims"])
        loaded = load_graph_json(path)
        want_edges = graph_tables["edges"].select(
            ["edge_id", "subj_id", "obj_id", "pred", "strength"])
        got_edges = loaded["edges"].select(
            ["edge_id", "subj_id", "obj_id", "pred", "strength"])
        assert got_edges.to_pylist() == want_edges.to_pylist()
        assert (loaded["nodes"]["entity_id"].to_pylist()
                == graph_tables["nodes"]["entity_id"].to_pylist())
        assert (loaded["claims"]["claim_id"].to_pylist()
                == graph_tables["claims"]["claim_id"].to_pylist())
        # lossless round-trip of the capped-instances count and aliases
        assert (loaded["nodes"]["n_instances"].to_pylist()
                == graph_tables["nodes"]["n_instances"].to_pylist())
        assert (loaded["nodes"]["aliases"].to_pylist()
                == [sorted(a) for a in
                    graph_tables["nodes"]["aliases"].to_pylist()])
        assert (loaded["edges"]["n_instances"].to_pylist()
                == graph_tables["edges"]["n_instances"].to_pylist())

    def test_reference_dict_shape(self, graph_tables):
        d = graph_to_dict(graph_tables["nodes"], graph_tables["edges"],
                          graph_tables["claims"])
        assert set(d) == {"entities", "relationships", "claims",
                          "community_summaries"}
        ent = next(iter(d["entities"].values()))
        # reference keys present; extra keys (aliases, n_instances) make
        # the export a lossless inverse of load_graph_json
        assert set(ent) >= {"name", "type", "description", "id",
                            "instances", "claims"}
        assert set(ent["instances"][0]) == {"source_id", "text_chunk_id"}
        rel = next(iter(d["relationships"].values()))
        assert set(rel) >= {"source_id", "target_id", "description",
                            "strength", "id", "instances"}

    def test_export_is_byte_stable(self, graph_tables, tmp_path):
        p1 = save_graph_json(str(tmp_path / "a"), graph_tables["nodes"],
                             graph_tables["edges"], graph_tables["claims"])
        p2 = save_graph_json(str(tmp_path / "b"), graph_tables["nodes"],
                             graph_tables["edges"], graph_tables["claims"])
        assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_to_dataframes_denormalized(self, graph_tables):
        ents, rels, claims = to_dataframes(graph_tables["nodes"],
                                           graph_tables["edges"],
                                           graph_tables["claims"])
        assert "subj_name" in rels.columns and "obj_name" in rels.columns
        assert len(ents) == graph_tables["nodes"].num_rows
        assert "entity_names" in claims.columns


class TestLocalSearch:
    def test_local_search_grounds_answer_in_subgraph(self, graph_tables):
        from kgx.pipelines.query import local_search
        out = local_search("Who founded Acme Corporation?",
                           graph_tables["nodes"], graph_tables["edges"],
                           graph_tables["claims"])
        assert out["mode"] == "local"
        assert any("acme" in e["name"].lower() for e in out["entities"])
        assert out["relationships"], "seeded subgraph should have edges"
        # every relationship endpoint is inside the expanded subgraph
        names = {e["name"] for e in out["entities"]}
        for r in out["relationships"]:
            assert r["subj"] in names and r["obj"] in names
        # hop 0 seeds come first, distances monotone in listing
        hops = [e["hop"] for e in out["entities"]]
        assert hops == sorted(hops)
        assert "acme" in out["answer"].lower()

    def test_local_search_no_match(self, graph_tables):
        from kgx.pipelines.query import local_search
        out = local_search("zzqy nonexistent gibberish",
                           graph_tables["nodes"], graph_tables["edges"],
                           graph_tables["claims"])
        assert out["entities"] == [] and out["relationships"] == []
        assert out["answer"] == "No grounded facts found."

    def test_local_search_deterministic(self, graph_tables):
        from kgx.pipelines.query import local_search
        a = local_search("What does Globex Industries do?",
                         graph_tables["nodes"], graph_tables["edges"],
                         graph_tables["claims"])
        b = local_search("What does Globex Industries do?",
                         graph_tables["nodes"], graph_tables["edges"],
                         graph_tables["claims"])
        assert a == b


class TestJsonlExportSink:
    def test_export_counts_and_resume(self, ray_session, tmp_path):
        import json
        import os
        from kgx.sinks import export_curated_jsonl
        from kgx.pipelines.curate import curate_corpus
        from kgx.functions.collect import collect_arrow

        sf = "/root/testdata/sf0.001"
        out = str(tmp_path / "export")
        m1 = export_curated_jsonl(sf, out, seq_len=256)
        want = collect_arrow(curate_corpus(sf, seq_len=256)).num_rows
        assert m1["n_rows"] == want > 0
        assert m1["n_files"] >= 1
        files = sorted(f for f in os.listdir(out)
                       if f.endswith(".json") and not f.startswith("_"))
        assert files == m1["files"]
        # every line is a JSON object with the packing columns
        with open(os.path.join(out, files[0])) as f:
            row = json.loads(f.readline())
        for col in ("doc_id", "n_tokens", "begin_token", "seq_id"):
            assert col in row
        # resume: same input fingerprint -> skip (manifest mtime stable)
        mpath = os.path.join(out, "_MANIFEST.json")
        mt = os.path.getmtime(mpath)
        m2 = export_curated_jsonl(sf, out, seq_len=256)
        assert m2 == m1
        assert os.path.getmtime(mpath) == mt
        # config change -> rewrite
        m3 = export_curated_jsonl(sf, out, seq_len=128)
        assert m3["n_rows"] == want
        assert m3["config"]["seq_len"] == 128


def test_jsonl_gzip_ingest(ray_session, tmp_path):
    """Compressed JSONL (.jsonl.gz — the shape web-text dumps actually
    ship as) reads through the same tolerant field mapping; arrow's
    codec inference handles the compression per file, distributed."""
    import gzip
    import json
    from kgx.sources.pages import read_jsonl_pages

    p = tmp_path / "dump.jsonl.gz"
    rows = [{"url": f"https://x/{i}", "text": f"doc {i} text",
             "lang": "en"} for i in range(20)]
    with gzip.open(p, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = read_jsonl_pages(str(p)).to_pandas().sort_values("url")
    assert len(out) == 20
    assert out.iloc[0]["text"] == "doc 0 text"
    assert set(out.columns) == {"url", "warc_ts", "html", "text", "lang"}
