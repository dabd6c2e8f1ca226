"""Token-window chunking with the reference's window semantics.

Mirrors ``TextChunker.chunk_text`` (/root/reference/extraction/text_chunker.py:67-118):
fixed window of ``size`` tokens with ``overlap`` clamped to ``<= size // 2``
(text_chunker.py:63), stride ``size - overlap``, a single-chunk short-circuit
for docs <= size, and chunk ids ``f"{source_id}_{i}"``.

Deviations (documented, deliberate):
- tokenizer is whitespace ``str.split()`` (no tiktoken in this environment;
  SURVEY.md §7 constraint 3) and chunk text is the re-joined token window
  (``" ".join``), which makes the operator exactly expressible in ANSI SQL
  for the DuckDB oracle (list slicing over ``string_split_regex``).
- the chunk count is the closed form ``1 + ceil((n - size) / stride)`` for
  ``n > size`` — every token is covered and the final window may be short,
  equivalent to the reference's loop with its break-at-tail rule.
"""

from __future__ import annotations

import math

DEFAULT_CHUNK_SIZE = 200
DEFAULT_CHUNK_OVERLAP = 50


def chunk_token_windows(n_tokens: int, size: int, overlap: int) -> list[int]:
    """Start offsets of each chunk window over ``n_tokens`` tokens."""
    if n_tokens <= 0:
        return []
    if n_tokens <= size:
        return [0]
    overlap = min(overlap, size // 2)
    stride = size - overlap
    n_chunks = 1 + math.ceil((n_tokens - size) / stride)
    return [i * stride for i in range(n_chunks)]


def chunk_text(text: str, source_id: str,
               size: int = DEFAULT_CHUNK_SIZE,
               overlap: int = DEFAULT_CHUNK_OVERLAP) -> list[dict]:
    """Chunk one document into overlapping token windows.

    Returns rows ``(url, chunk_id, chunk_index, text, n_tokens)``; an
    empty/whitespace-only document yields zero chunks.
    """
    tokens = text.split()
    out = []
    for i, start in enumerate(chunk_token_windows(len(tokens), size, overlap)):
        window = tokens[start:start + size]
        out.append({
            "url": source_id,
            "chunk_id": f"{source_id}_{i}",
            "chunk_index": i,
            "text": " ".join(window),
            "n_tokens": len(window),
        })
    return out
