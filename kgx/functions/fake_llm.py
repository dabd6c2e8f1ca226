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
