"""LLM production path with injected transports: client retry/backoff,
robust JSON extraction, and the full LLMExtractor flow (SURVEY.md §2.3
T1, §2.2 M3-M8/M10) — no network, canned/flaky transports."""

import json

import pyarrow as pa
import pytest

from kgx.functions.llm_client import LLMClient, TransportError
from kgx.functions.prompts import DEFAULT_ENTITY_TYPES, PromptTemplates
from kgx.stages.extract import (LLMExtractor, parse_claims,
                                parse_fallback_claims)

ENTITY_JSON = json.dumps({
    "entities": [
        {"name": "Ada Lovelace", "type": "PERSON",
         "description": "First programmer"},
        {"name": "Analytical Engine", "type": "TECHNOLOGY"},
    ],
    "relationships": [
        {"source": "Ada Lovelace", "target": "Analytical Engine",
         "description": "programmed", "strength": 0.9},
        {"source": "Ada Lovelace", "target": "Unknown Entity",
         "description": "related to", "strength": 0.9},
    ],
})
CLAIM_JSON = json.dumps({
    "claims": [{"content": "Ada Lovelace wrote the first program.",
                "entities": "Ada Lovelace"}],
})


class TestLLMClient:
    def test_retry_then_success(self):
        attempts = []

        def flaky(prompt, temp):
            attempts.append(temp)
            if len(attempts) < 3:
                raise TransportError("boom")
            return "ok"

        waits = []
        c = LLMClient(flaky, max_tries=5, sleep=waits.append)
        assert c.generate("hi") == "ok"
        assert waits == [1.0, 2.0]  # expo base 2: 2^0, 2^1

    def test_exhausted_retries_raise(self):
        c = LLMClient(lambda p, t: (_ for _ in ()).throw(
            TransportError("down")), max_tries=3, sleep=lambda s: None)
        with pytest.raises(TransportError):
            c.generate("hi")

    def test_extract_json_substring(self):
        c = LLMClient(lambda p, t: "Sure! Here it is: {\"a\": 1} Done.")
        assert c.extract_json("x") == {"a": 1}

    def test_extract_json_retry_at_temp0(self):
        temps = []

        def transport(prompt, temp):
            temps.append(temp)
            return "not json" if len(temps) == 1 else "{\"b\": 2}"

        c = LLMClient(transport, temperature=0.4)
        assert c.extract_json("x") == {"b": 2}
        assert temps[0] == pytest.approx(0.2)  # max(0.1, temp/2)
        assert temps[1] == 0.0                 # simplified retry at temp 0

    def test_extract_json_error_fallback(self):
        c = LLMClient(lambda p, t: "never json")
        out = c.extract_json("x")
        assert out["error"] == "Failed to parse response as JSON"
        assert "raw_response" in out

    def test_no_transport_raises(self):
        with pytest.raises(NotImplementedError):
            LLMClient().generate("hi")


class TestPrompts:
    def test_templates_fill(self):
        p = PromptTemplates()
        e = p.entity_extraction("some text")
        assert "some text" in e
        assert all(t in e for t in DEFAULT_ENTITY_TYPES)
        c = p.claim_extraction("txt", ["A", "B"])
        assert "A, B" in c and "txt" in c
        assert "Question: q" in p.query_map("q", "r")


class TestClaimParsers:
    def test_parse_claims_coerces_str_entities(self):
        t = parse_claims(json.loads(CLAIM_JSON), "u", "c0")
        assert t.num_rows == 1
        assert t["entities"][0].as_py() == ["Ada Lovelace"]

    def test_fallback_claims_regex(self):
        raw = "CLAIM: X founded Y - ENTITIES: [X, Y]\nnoise line"
        t = parse_fallback_claims(raw, "u", "c0")
        assert t.num_rows == 1
        assert t["content"][0].as_py() == "X founded Y"
        assert t["entities"][0].as_py() == ["X", "Y"]


def _canned_transport(prompt, temp):
    if "factual claims" in prompt:
        return CLAIM_JSON
    return ENTITY_JSON


PIPE_ENTITY_RAW = (
    'Sure:\n("entity"|Ada Lovelace|PERSON|First programmer)**'
    '("entity"|Analytical Engine|TECHNOLOGY|)**'
    '("relationship"|Ada Lovelace|Analytical Engine|programmed|0.9)**'
    '("relationship"|Ada Lovelace|Unknown Entity|related to|0.9)\n'
    'END_OF_EXTRACTION\nignored trailing text')
PIPE_CLAIM_RAW = (
    '("claim"|Ada Lovelace wrote the first program|Ada Lovelace)**'
    '("claim"||Nobody)**not a record\nEND_OF_CLAIMS')


class TestPipeFormat:
    def test_parse_pipe_extraction(self):
        from kgx.stages.extract import parse_pipe_extraction
        t = parse_pipe_extraction(PIPE_ENTITY_RAW, "u", "u_0")
        kinds = t["kind"].to_pylist()
        assert kinds.count("mention") == 2
        # empty description defaults like the JSON parser
        ment = t.filter(pa.compute.equal(t["kind"], "mention")).to_pylist()
        assert ment[1]["description"] == "A TECHNOLOGY"
        # endpoint not extracted in this chunk -> relationship dropped
        assert kinds.count("triple") == 1
        tri = t.filter(pa.compute.equal(t["kind"], "triple")).to_pylist()[0]
        assert (tri["subj"], tri["pred"], tri["obj"],
                round(tri["strength"], 3)) == \
            ("Ada Lovelace", "programmed", "Analytical Engine", 0.9)

    def test_parse_pipe_claims(self):
        from kgx.stages.extract import parse_pipe_claims
        t = parse_pipe_claims(PIPE_CLAIM_RAW, "u", "u_0")
        assert t.num_rows == 1  # empty-content claim dropped
        assert t["entities"][0].as_py() == ["Ada Lovelace"]

    def test_extractor_pipe_format_end_to_end(self):
        def pipe_transport(prompt, temp):
            if "factual claims" in prompt:
                return PIPE_CLAIM_RAW
            return PIPE_ENTITY_RAW
        ex = LLMExtractor(transport=pipe_transport, prompt_format="pipe")
        out = ex(pa.table({
            "url": pa.array(["u1"], pa.string()),
            "chunk_id": pa.array(["u1_0"], pa.string()),
            "text": pa.array(["Ada Lovelace programmed the Analytical "
                              "Engine."], pa.string()),
        }))
        kinds = out["kind"].to_pylist()
        assert kinds.count("mention") == 2
        assert kinds.count("triple") == 1
        assert kinds.count("claim") == 1

    def test_unknown_format_rejected(self):
        with pytest.raises(ValueError):
            LLMExtractor(transport=_canned_transport, prompt_format="xml")


class TestLLMExtractor:
    def _batch(self):
        return pa.table({
            "url": pa.array(["u1"], pa.string()),
            "chunk_id": pa.array(["u1_0"], pa.string()),
            "text": pa.array(["Ada Lovelace programmed the Analytical "
                              "Engine."], pa.string()),
        })

    def test_full_flow_with_canned_transport(self):
        ex = LLMExtractor(transport=_canned_transport)
        out = ex(self._batch())
        kinds = out["kind"].to_pylist()
        assert kinds.count("mention") == 2
        # the relationship to an entity NOT in this chunk is dropped
        # (intra-chunk endpoint rule, simple_entity_extractor.py:205-208)
        assert kinds.count("triple") == 1
        assert kinds.count("claim") == 1
        triple = out.filter(pa.compute.equal(out["kind"], "triple"))
        assert triple["subj"][0].as_py() == "Ada Lovelace"
        assert triple["strength"][0].as_py() == pytest.approx(0.9)

    def test_fallback_path(self):
        def broken(prompt, temp):
            if "one per line" in prompt:
                return "Ada Lovelace (PERSON)\nAnalytical Engine (TECHNOLOGY)"
            return "never json"
        ex = LLMExtractor(transport=broken, extract_claims=False)
        out = ex(self._batch())
        assert out["kind"].to_pylist().count("mention") == 2
        assert "triple" not in out["kind"].to_pylist()

    def test_empty_batch(self):
        ex = LLMExtractor(transport=_canned_transport)
        out = ex(pa.table({
            "url": pa.array([], pa.string()),
            "chunk_id": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
        }))
        assert out.num_rows == 0

    def _wide_batch(self, n=24):
        return pa.table({
            "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
            "chunk_id": pa.array([f"u{i}_0" for i in range(n)], pa.string()),
            "text": pa.array(["Ada Lovelace programmed the Analytical "
                              f"Engine. {i}" for i in range(n)], pa.string()),
        })

    def test_bounded_concurrent_fanout_is_deterministic(self):
        """max_concurrency is honored: per-batch fan-out runs multiple
        chunks in flight but never more than the bound, survives flaky
        transport retries, and emits byte-identical output to the
        sequential (max_concurrency=1) path."""
        import threading
        import time

        lock = threading.Lock()
        state = {"inflight": 0, "peak": 0, "failed": set()}

        def flaky_slow(prompt, temp):
            with lock:
                state["inflight"] += 1
                state["peak"] = max(state["peak"], state["inflight"])
                # fail each distinct prompt exactly once (retry path)
                first = prompt not in state["failed"]
                state["failed"].add(prompt)
            try:
                time.sleep(0.005)
                if first:
                    raise TransportError("transient")
                return _canned_transport(prompt, temp)
            finally:
                with lock:
                    state["inflight"] -= 1

        batch = self._wide_batch()
        conc = LLMExtractor(transport=flaky_slow, max_concurrency=4,
                            extract_claims=False)
        conc.client.sleep = lambda s: None  # don't wait out the backoff
        got = conc(batch)
        seq = LLMExtractor(transport=_canned_transport, max_concurrency=1,
                           extract_claims=False)(batch)
        assert got.to_pylist() == seq.to_pylist()
        assert 1 < state["peak"] <= 4


class TestEmulatingTransports:
    """ClaimEmulatingTransport / PipeTermTransport must reproduce
    TermExtractor(emit_claims=True) semantics through the full
    LLMExtractor flow — the parity the kg_claims_llm / kg_nodes_pipe /
    kg_claims_pipe driver oracles rely on."""

    def _batch(self, texts):
        import pyarrow as pa
        n = len(texts)
        return pa.table({
            "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
            "chunk_id": pa.array([f"u{i}_0" for i in range(n)], pa.string()),
            "text": pa.array(texts, pa.string()),
        })

    TEXTS = ["alpha beta alpha gamma", "no-Terms HERE 123", "",
             "delta delta epsilon zeta delta"]

    def _term_reference(self):
        from kgx.stages.extract import TermExtractor
        return TermExtractor(emit_claims=True)(self._batch(self.TEXTS))

    @staticmethod
    def _rows(table):
        """Row multiset of the mention/claim rows (LLMExtractor emits
        chunk-major, TermExtractor kind-major — order is irrelevant to
        the downstream groupbys and oracles)."""
        import json
        return sorted(json.dumps(r, sort_keys=True)
                      for r in table.to_pylist()
                      if r["kind"] in ("mention", "claim"))

    def test_claim_emulating_matches_term_extractor(self):
        from kgx.functions.fake_llm import ClaimEmulatingTransport
        from kgx.stages.extract import LLMExtractor
        got = LLMExtractor(transport=ClaimEmulatingTransport(),
                           max_concurrency=1)(self._batch(self.TEXTS))
        assert self._rows(got) == self._rows(self._term_reference())

    def test_pipe_transport_matches_term_extractor(self):
        from kgx.functions.fake_llm import PipeTermTransport
        from kgx.stages.extract import LLMExtractor
        got = LLMExtractor(transport=PipeTermTransport(),
                           prompt_format="pipe",
                           max_concurrency=1)(self._batch(self.TEXTS))
        assert self._rows(got) == self._rows(self._term_reference())

    def test_pipe_zero_term_chunk_falls_back_clean(self):
        """A chunk with no terms parses to 0 pipe records, triggering the
        line-format fallback prompt; the transport must answer THAT in
        the fallback grammar (pipe records there parse into junk)."""
        from kgx.functions.fake_llm import PipeTermTransport
        from kgx.stages.extract import LLMExtractor
        got = LLMExtractor(transport=PipeTermTransport(),
                           prompt_format="pipe", extract_claims=False,
                           max_concurrency=1)(
            self._batch(["NO TERMS 42"]))
        assert got.num_rows == 0

    def test_corpus_text_is_pipe_grammar_clean(self):
        """The pipe claim record embeds raw chunk text; the synthetic
        documents tables must stay free of the record grammar."""
        import duckdb
        bad = duckdb.connect().execute(
            "SELECT count(*) FROM read_parquet("
            "'/root/testdata/sf0.001/documents.parquet') "
            "WHERE text LIKE '%|%' OR text LIKE '%**%' "
            "OR text LIKE '%(%' OR text LIKE '%)%'").fetchone()[0]
        assert bad == 0


def _chunk_batch(texts):
    return pa.table({
        "url": pa.array([f"u://{i}" for i in range(len(texts))]),
        "chunk_id": pa.array([f"u://{i}_0" for i in range(len(texts))]),
        "text": pa.array(texts),
    })


class TestFaultInjection:
    """r5 (VERDICT item 7): retry + parse-retry + quarantine under the
    seeded fault transport reproduce the fault-free tables; poisoned
    chunks land as kind='error' rows, never silently dropped."""

    def test_transient_and_malformed_recover_exactly(self):
        from kgx.functions.fake_llm import (FaultInjectingTransport,
                                            TermEmulatingTransport)
        texts = [f"alpha bravo{i} charlie delta echo{i}" for i in range(40)]
        clean = LLMExtractor(transport=TermEmulatingTransport(),
                             extract_claims=False, max_concurrency=1)
        # poison off: every fault is recoverable -> byte-equal output
        faulty = LLMExtractor(
            transport=FaultInjectingTransport(
                seed=7, poison_ppm=0, transient_ppm=500_000,
                malformed_ppm=500_000, transient_fails=2),
            extract_claims=False, max_concurrency=4,
            client_kwargs={"sleep": lambda _s: None})
        b = _chunk_batch(texts)
        assert faulty(b).to_pylist() == clean(b).to_pylist()

    def test_poison_quarantines_never_drops(self):
        from kgx.functions.fake_llm import FaultInjectingTransport
        texts = [f"golf hotel{i} india juliet" for i in range(30)]
        tr = FaultInjectingTransport(seed=3, poison_ppm=400_000,
                                     transient_ppm=0, malformed_ppm=0)
        ext = LLMExtractor(transport=tr, extract_claims=False,
                           max_concurrency=4,
                           client_kwargs={"sleep": lambda _s: None})
        out = ext(_chunk_batch(texts))
        import pyarrow.compute as pc
        errors = out.filter(pc.equal(out["kind"], "error"))
        # the seeded predicate decides who is poisoned — recompute it
        import hashlib
        poisoned = {f"u://{i}_0" for i, t in enumerate(texts)
                    if int(hashlib.md5(f"3:poison:{t}".encode())
                           .hexdigest()[:16], 16) % 1_000_000 < 400_000}
        assert poisoned, "seed produced no poison -- vacuous test"
        assert set(errors["chunk_id"].to_pylist()) == poisoned
        # every non-poisoned chunk still contributed mentions
        ok = out.filter(pc.equal(out["kind"], "mention"))
        assert set(ok["chunk_id"].to_pylist()) == \
            {f"u://{i}_0" for i in range(30)} - poisoned
        # quarantine rows carry the reason
        assert all("TransportError" in d
                   for d in errors["description"].to_pylist())

    def test_quarantine_off_raises(self):
        from kgx.functions.fake_llm import FaultInjectingTransport
        tr = FaultInjectingTransport(seed=3, poison_ppm=1_000_000,
                                     transient_ppm=0, malformed_ppm=0)
        ext = LLMExtractor(transport=tr, extract_claims=False,
                           quarantine=False, max_concurrency=1,
                           client_kwargs={"sleep": lambda _s: None})
        with pytest.raises(TransportError):
            ext(_chunk_batch(["kilo lima mike november"]))

    def test_missing_transport_still_raises_config_error(self):
        # quarantine must not swallow the no-transport config error
        ext = LLMExtractor(extract_claims=False, max_concurrency=1)
        with pytest.raises(NotImplementedError):
            ext(_chunk_batch(["oscar papa quebec romeo"]))
