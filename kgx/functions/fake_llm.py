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

# The prompt templates (kgx/functions/prompts.py) all place the document
# text after this marker, at the end of the prompt.
TEXT_MARKER = "\nText:\n"
# LLMClient.extract_json appends this strict-JSON instruction AFTER the
# prompt (kgx/functions/llm_client.py:extract_json); it follows the text
# segment and must be cut before term extraction.
JSON_SUFFIX = "\n\nYour response must be a valid, parseable JSON object."


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
