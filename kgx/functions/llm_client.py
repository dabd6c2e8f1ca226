"""LLM client with retry/backoff and robust JSON extraction (SURVEY.md
§2.3 T1, §2.2 M10; reference utils/llm_client.py).

The reference wraps an OpenAI-compatible ``/chat/completions`` endpoint
with exponential backoff x5 (llm_client.py:38-43,94-99), and
``extract_json`` does find('{')..rfind('}') substring parsing with one
retry at temperature 0 on a simplified prompt before degrading to an
``{"error", "raw_response"}`` dict (llm_client.py:100-155).

This client keeps those exact semantics with the transport injected:
``transport(prompt, temperature) -> str``.  In production that is an
HTTP call built once per actor (the client is the per-actor state of the
LLM extractor/summarizer pools); in this sandbox tests inject canned or
flaky transports.  Async fan-out is bounded per actor, mirroring the
reference's semaphore (utils/async_utils.py:52-58).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable


class TransportError(Exception):
    """Retryable transport failure (analog of aiohttp/timeout errors)."""


# Prompt literals shared with the sandbox transports: fake_llm.py keys its
# text-segment extraction and malformed-band retry detection on these
# exact strings, so they live here (single definition) and are imported
# there — rewording them cannot silently desynchronize the transport.
JSON_SUFFIX = ("\n\nYour response must be a valid, parseable JSON "
               "object. Do not include any explanations or text "
               "outside of the JSON object.")
RETRY_PREFIX = ("Please return the following as a valid JSON "
                "object with no additional text.\n\n")


class LLMClient:
    """Retrying completion client with injected transport.

    ``transport(prompt, temperature) -> str`` raising
    :class:`TransportError` on retryable failures.  ``max_tries``/``base``
    follow the reference's ``backoff.expo`` settings
    (llm_client.py:38-43); ``sleep`` is injectable so tests don't wait.
    """

    def __init__(self, transport: Callable[[str, float], str] | None = None,
                 *, temperature: float = 0.1, max_tries: int = 5,
                 base: float = 2.0, sleep: Callable[[float], None] = time.sleep):
        self.transport = transport
        self.temperature = temperature
        self.max_tries = max_tries
        self.base = base
        self.sleep = sleep
        self.calls = 0

    def _call(self, prompt: str, temperature: float) -> str:
        if self.transport is None:
            raise NotImplementedError(
                "LLMClient needs a transport; none is available in this "
                "sandbox (no network).")
        self.calls += 1
        return self.transport(prompt, temperature)

    def generate(self, prompt: str,
                 temperature: float | None = None) -> str:
        """Completion with exponential backoff x max_tries
        (llm_client.py:38-43): waits base^attempt between tries."""
        temp = self.temperature if temperature is None else temperature
        last: Exception | None = None
        for attempt in range(self.max_tries):
            try:
                return self._call(prompt, temp)
            except TransportError as exc:
                last = exc
                if attempt + 1 < self.max_tries:
                    self.sleep(self.base ** attempt)
        raise last  # type: ignore[misc]

    def extract_json(self, prompt: str,
                     temperature: float | None = None) -> dict:
        """Robust JSON extraction (llm_client.py:100-155): strict-JSON
        instruction suffix, substring parse, one temperature-0 retry with
        a simplified prompt, then the error-dict fallback."""
        json_temp = (temperature if temperature is not None
                     else max(0.1, self.temperature / 2))
        enhanced = prompt.strip() + JSON_SUFFIX
        text = self.generate(enhanced, temperature=json_temp)
        parsed = _substring_json(text)
        if parsed is not None:
            return parsed
        retry_prompt = RETRY_PREFIX + prompt.strip()
        retry_text = self.generate(retry_prompt, temperature=0.0)
        parsed = _substring_json(retry_text)
        if parsed is not None:
            return parsed
        return {
            "error": "Failed to parse response as JSON",
            "raw_response": retry_text[:500] + ("..." if len(retry_text) > 500
                                                else ""),
        }


def _substring_json(text: str) -> dict | None:
    start, end = text.find("{"), text.rfind("}")
    try:
        if 0 <= start < end:
            return json.loads(text[start:end + 1])
        return json.loads(text)
    except json.JSONDecodeError:
        return None
