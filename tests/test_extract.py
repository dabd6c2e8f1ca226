"""Extractor unit tests: gazetteer/term extraction + LLM payload parsers
(FIXTURES.md §4 extractor parse cases)."""

import pyarrow as pa

from kgx.stages.extract import (EXTRACTED_SCHEMA, GazetteerExtractor,
                                TermExtractor, parse_extraction,
                                parse_fallback_entities, parse_json_response)


def _chunk(text, url="u", chunk_id="u_0"):
    return pa.table({"url": [url], "chunk_id": [chunk_id], "text": [text]})


class TestGazetteerExtractor:
    def test_mentions_and_aliases(self):
        ex = GazetteerExtractor()
        out = ex(_chunk("Ada Lovelace met ADA LOVELACE near Bérlin."))
        rows = out.filter(pa.compute.equal(out["kind"], "mention")).to_pylist()
        norms = sorted(r["norm_mention"] for r in rows)
        assert norms == ["ada lovelace", "ada lovelace", "berlin"]
        surfaces = {r["mention"] for r in rows}
        assert {"Ada Lovelace", "ADA LOVELACE", "Bérlin"} == surfaces

    def test_relation_with_strength(self):
        ex = GazetteerExtractor()
        out = ex(_chunk("Grace Hopper is the CEO of Acme Corporation."))
        tri = out.filter(pa.compute.equal(out["kind"], "triple")).to_pylist()
        assert len(tri) == 1
        assert tri[0]["pred"] == "is the CEO of"
        assert abs(tri[0]["strength"] - 0.9) < 1e-6

    def test_low_strength_pattern_emitted(self):
        # 'visited' (0.4) is emitted raw; the strength FILTER is downstream
        ex = GazetteerExtractor()
        out = ex(_chunk("Alan Turing visited Paris."))
        tri = out.filter(pa.compute.equal(out["kind"], "triple")).to_pylist()
        assert len(tri) == 1 and abs(tri[0]["strength"] - 0.4) < 1e-6

    def test_claim_requires_entity(self):
        ex = GazetteerExtractor()
        out = ex(_chunk("It is reported that Acme Corporation announced record "
                        "results this quarter."))
        claims = out.filter(pa.compute.equal(out["kind"], "claim")).to_pylist()
        assert len(claims) == 1
        assert claims[0]["entities"] == ["Acme Corporation"]
        # no entity in the claim sentence -> dropped
        out2 = ex(_chunk("It is reported that nothing happened."))
        assert out2.filter(pa.compute.equal(out2["kind"], "claim")).num_rows == 0

    def test_empty_and_null_text(self):
        ex = GazetteerExtractor()
        batch = pa.table({"url": ["u", "v"], "chunk_id": ["u_0", "v_0"],
                          "text": [None, ""]})
        assert ex(batch).num_rows == 0


class TestTermExtractor:
    def test_terms_and_pairs(self):
        ex = TermExtractor()
        out = ex(_chunk("alpha beta alpha gamma xy"))
        mentions = out.filter(pa.compute.equal(out["kind"], "mention")).to_pylist()
        assert [m["mention"] for m in mentions] == ["alpha", "beta", "alpha", "gamma"]
        tri = out.filter(pa.compute.equal(out["kind"], "triple")).to_pylist()
        pairs = {(t["subj"], t["obj"]) for t in tri}
        assert pairs == {("alpha", "beta"), ("alpha", "gamma"), ("beta", "gamma")}

    def test_max_terms_cap(self):
        ex = TermExtractor(max_terms=2)
        out = ex(_chunk("aaaa bbbb cccc dddd"))
        tri = out.filter(pa.compute.equal(out["kind"], "triple")).to_pylist()
        assert len(tri) == 1  # only first 2 distinct terms pair up

    def test_no_claims_by_default(self):
        out = TermExtractor()(_chunk("alpha beta"))
        assert out.filter(
            pa.compute.equal(out["kind"], "claim")).num_rows == 0

    def test_emit_claims(self):
        ex = TermExtractor(emit_claims=True, max_terms=2)
        out = ex(_chunk("alpha beta alpha gamma xy"))
        claims = out.filter(pa.compute.equal(out["kind"], "claim")).to_pylist()
        assert len(claims) == 1
        assert claims[0]["content"] == "alpha beta alpha gamma xy"
        assert sorted(claims[0]["entities"]) == ["alpha", "beta"]  # capped
        # a chunk with zero terms emits no claim
        empty = ex(_chunk("xy z"))
        assert empty.filter(
            pa.compute.equal(empty["kind"], "claim")).num_rows == 0


class TestLLMParsers:
    # mirror /root/reference/extraction/simple_entity_extractor.py:170-218,260
    def test_json_substring_extraction(self):
        raw = 'Sure! Here is the JSON:\n{"entities": []}\nHope that helps.'
        assert parse_json_response(raw) == {"entities": []}

    def test_bad_json_degrades(self):
        out = parse_json_response("no braces here")
        assert "error" in out and out["raw_response"] == "no braces here"
        out2 = parse_json_response("{not valid json}")
        assert "error" in out2

    def test_parse_extraction_validates(self):
        payload = {
            "entities": [
                {"name": "Acme", "type": "ORGANIZATION"},
                {"name": "NoType"},                       # dropped: no type
                {"type": "PERSON"},                       # dropped: no name
            ],
            "relationships": [
                {"source": "Acme", "target": "Acme", "description": "self",
                 "strength": 0.8},
                {"source": "Acme", "target": "Unknown Co"},  # dropped endpoint
            ],
        }
        out = parse_extraction(payload, "u", "u_0")
        kinds = out["kind"].to_pylist()
        assert kinds.count("mention") == 1 and kinds.count("triple") == 1
        m = out.filter(pa.compute.equal(out["kind"], "mention")).to_pylist()[0]
        assert m["description"] == "A ORGANIZATION"  # default desc

    def test_fallback_line_parser(self):
        raw = "Entities found:\nAcme Corp (Organization)\nParis (Location)\nnoise"
        out = parse_fallback_entities(raw, "u", "u_0")
        assert out.num_rows == 2
        assert out.schema.equals(EXTRACTED_SCHEMA)
