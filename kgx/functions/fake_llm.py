"""Deterministic stand-in LLM transports for the sandboxed production path.

The sandbox has no network, so the LLM extraction stage
(:class:`kgx.stages.extract.LLMExtractor`, SURVEY.md §2.3 T1) runs with an
injected transport.  :class:`TermEmulatingTransport` is the oracle-grade
one: it behaves like a model that extracts every ``[a-z]{min_len,}`` token
occurrence from the prompt's text segment as a ``TERM`` entity — exactly
the :class:`kgx.stages.extract.TermExtractor` mention semantics, which are
SQL-expressible, so the FULL production path (actor-pool hosting, bounded
thread fan-out, retry client, JSON parse) can be gated by the same DuckDB
oracle as the deterministic extractor (driver query ``kg_nodes_llm``).

This is explicitly a parity harness, not a model: swap in a real
HTTP/vLLM transport outside the sandbox (same ``(prompt, temperature) ->
str`` contract, must be thread-safe for ``max_concurrency > 1``).
"""

from __future__ import annotations

import json
import re

# LLMClient.extract_json appends JSON_SUFFIX AFTER the prompt and uses
# RETRY_PREFIX on its parse-retry; both are imported from llm_client so a
# rewording there cannot silently break the transports here.
from kgx.functions.llm_client import JSON_SUFFIX, RETRY_PREFIX  # noqa: E402

# The prompt templates (kgx/functions/prompts.py) all place the document
# text after this marker, at the end of the prompt.
TEXT_MARKER = "\nText:\n"


class TermEmulatingTransport:
    """Thread-safe (stateless) canned transport: term-occurrence entities,
    no relationships, JSON contract of ENTITY_EXTRACTION_TEMPLATE."""

    def __init__(self, min_len: int = 4):
        self.term_re = re.compile(rf"\b[a-z]{{{min_len},}}\b")

    def __call__(self, prompt: str, temperature: float = 0.0) -> str:
        # split on the FIRST marker and keep the remainder whole, so a
        # document that itself contains the marker stays intact
        if TEXT_MARKER not in prompt:
            return json.dumps({"entities": [], "relationships": []})
        text = prompt.split(TEXT_MARKER, 1)[1]
        if JSON_SUFFIX in text:
            text = text.rsplit(JSON_SUFFIX, 1)[0]
        if text.endswith("\n"):
            text = text[:-1]
        ents = [{"name": t, "type": "TERM", "description": f"term {t}"}
                for t in self.term_re.findall(text)]
        return json.dumps({"entities": ents, "relationships": []})


def _prompt_text(prompt: str) -> str:
    """The document text segment of a prompt (after the FIRST text
    marker, before the strict-JSON suffix the client appends)."""
    text = prompt.split(TEXT_MARKER, 1)[1]
    if JSON_SUFFIX in text:
        text = text.rsplit(JSON_SUFFIX, 1)[0]
    if text.endswith("\n"):
        text = text[:-1]
    return text


def _capped_distinct_terms(terms: list[str], max_terms: int) -> list[str]:
    """TermExtractor's claim-entity semantics
    (kgx/stages/extract.py TermExtractor.__call__): distinct terms in
    first-occurrence order, capped, then sorted."""
    distinct: list[str] = []
    seen: set[str] = set()
    for t in terms:
        if t not in seen:
            seen.add(t)
            distinct.append(t)
            if len(distinct) >= max_terms:
                break
    distinct.sort()
    return distinct


class ClaimEmulatingTransport(TermEmulatingTransport):
    """TermEmulatingTransport plus the claim pass: a claim prompt gets
    ONE claim whose content is the chunk text and whose entities are the
    capped distinct terms — exactly ``TermExtractor(emit_claims=True)``,
    so the full LLM claim path (bounded fan-out, retry client, JSON
    parse, resolution, content-key dedup) is gated by the same DuckDB
    oracle as the deterministic extractor (driver query
    ``kg_claims_llm``)."""

    def __init__(self, min_len: int = 4, max_terms: int = 64):
        super().__init__(min_len)
        self.max_terms = max_terms

    def __call__(self, prompt: str, temperature: float = 0.0) -> str:
        if "extracting factual claims" not in prompt:
            return super().__call__(prompt, temperature)
        if TEXT_MARKER not in prompt:
            return json.dumps({"claims": []})
        text = _prompt_text(prompt)
        terms = _capped_distinct_terms(self.term_re.findall(text),
                                       self.max_terms)
        if not terms:
            return json.dumps({"claims": []})
        return json.dumps(
            {"claims": [{"content": text, "entities": terms}]})


class PipeTermTransport:
    """Pipe-record twin of :class:`ClaimEmulatingTransport`: the same
    term semantics emitted in the reference's richer pipe-record grammar
    (kgx/functions/prompts.py PIPE_* templates), so
    ``prompt_format="pipe"`` — parse_pipe_extraction/parse_pipe_claims —
    is exercised end-to-end under the same oracles (driver queries
    ``kg_nodes_pipe``/``kg_claims_pipe``).  Term names match
    ``[a-z]{min_len,}`` so they can never contain the record grammar's
    ``|``/``**``/parens; claim content is the raw chunk text, which the
    synthetic corpora keep grammar-clean (asserted in pytest)."""

    def __init__(self, min_len: int = 4, max_terms: int = 64):
        self.term_re = re.compile(rf"\b[a-z]{{{min_len},}}\b")
        self.max_terms = max_terms

    def __call__(self, prompt: str, temperature: float = 0.0) -> str:
        if TEXT_MARKER not in prompt:
            return "END_OF_EXTRACTION"
        text = _prompt_text(prompt)
        if "extracting factual claims" in prompt:
            terms = _capped_distinct_terms(self.term_re.findall(text),
                                           self.max_terms)
            if not terms:
                return "END_OF_CLAIMS"
            rec = f'("claim"|{text}|{",".join(terms)})'
            return rec + "\nEND_OF_CLAIMS"
        if "END_OF_EXTRACTION" not in prompt:
            # the line-format FALLBACK prompt (a zero-term chunk's pipe
            # response parses to 0 rows and LLMExtractor retries with
            # ENTITY_FALLBACK_TEMPLATE): answer in its "Name (Type)"
            # grammar — pipe records here would parse into junk mentions
            return "\n".join(f"{t} (TERM)"
                             for t in self.term_re.findall(text))
        recs = "**".join(f'("entity"|{t}|TERM|term {t})'
                         for t in self.term_re.findall(text))
        return recs + "\nEND_OF_EXTRACTION"


class FaultInjectingTransport:
    """Deterministic fault harness around a canned transport (r4 VERDICT
    item 7; reference failure semantics utils/llm_client.py:38-43,
    100-155 + simple_entity_extractor.py:87-90,114-117).

    Faults are keyed on md5 of the prompt's TEXT segment (seeded), so
    the SAME chunks fault on every run and the poison predicate has an
    exact SQL twin (the text_dsir md5-prefix trick):

    - ``poison``  (h < poison_ppm): EVERY call raises TransportError —
      the chunk exhausts the retry budget and must land in the
      extractor's kind="error" quarantine sidecar, never dropped.
    - ``transient`` (next band): the first ``transient_fails`` calls
      for that chunk raise, later ones succeed — recovered entirely
      inside LLMClient.generate's backoff, so results are byte-equal
      to the fault-free run.
    - ``malformed`` (next band): the primary extract_json call returns
      unparseable text; the temperature-0 RETRY prompt gets the valid
      response — recovered by the parse-retry fallback, results again
      byte-equal.

    Thread-safe: the transient attempt counter is lock-guarded (the
    extractor fans chunks over a thread pool).
    """

    def __init__(self, inner=None, *, seed: int = 7,
                 poison_ppm: int = 30_000, transient_ppm: int = 200_000,
                 malformed_ppm: int = 200_000, transient_fails: int = 2):
        import threading
        self.inner = inner or TermEmulatingTransport()
        self.seed = seed
        self.poison_ppm = poison_ppm
        self.transient_ppm = transient_ppm
        self.malformed_ppm = malformed_ppm
        self.transient_fails = transient_fails
        self._counts: dict[str, int] = {}
        self._lock = threading.Lock()

    # the lock (and its per-actor attempt counts) are runtime state, not
    # config — recreate them after the ship-to-actor pickle
    def __getstate__(self):
        state = self.__dict__.copy()
        state["_counts"], state["_lock"] = {}, None
        return state

    def __setstate__(self, state):
        import threading
        self.__dict__.update(state)
        self._counts, self._lock = {}, threading.Lock()

    def _band(self, text: str, kind: str) -> tuple[str, str]:
        import hashlib
        key = f"{self.seed}:{kind}:{text}"
        h = int(hashlib.md5(key.encode("utf-8")).hexdigest()[:16], 16) \
            % 1_000_000
        if kind == "poison":
            return ("poison" if h < self.poison_ppm else "", key)
        if kind == "transient":
            return ("transient" if h < self.transient_ppm else "", key)
        return ("malformed" if h < self.malformed_ppm else "", key)

    def __call__(self, prompt: str, temperature: float = 0.0) -> str:
        from kgx.functions.llm_client import TransportError
        if TEXT_MARKER not in prompt:
            return self.inner(prompt, temperature)
        text = _prompt_text(prompt)
        band, _ = self._band(text, "poison")
        if band == "poison":
            raise TransportError("injected: permanently unreachable")
        band, key = self._band(text, "transient")
        if band == "transient":
            with self._lock:
                n = self._counts.get(key, 0)
                if n < self.transient_fails:
                    self._counts[key] = n + 1
                    raise TransportError(f"injected: timeout #{n + 1}")
        band, _ = self._band(text, "malformed")
        if band == "malformed" and not prompt.startswith(RETRY_PREFIX):
            return "SORRY -- no json here [truncated garbage"
        return self.inner(prompt, temperature)
