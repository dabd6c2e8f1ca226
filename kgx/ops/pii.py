"""PII scrubbing for a web-text training corpus.

A stateless vectorized ``map_batches`` transform: emails, IPv4 addresses
and NANP-style phone numbers are counted and replaced with redaction
tokens.  Both pyarrow.compute and DuckDB run RE2, so the patterns below
are shared verbatim with the SQL oracle (``__ray_entry__.oracle_sql``)
and the replacement output hash-matches exactly.

No shuffle, no state — this is the cheapest possible stage shape and
composes ahead of chunking/dedup in a real pipeline.  The reference has
no PII handling; this is part of the training-data surface the 100 TB
target needs (C4/RefinedWeb-style scrubbing).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe, shared verbatim with the DuckDB oracle.  Replacement order is
# email -> ipv4 -> phone (identical on both sides; the token strings
# cannot themselves match a later pattern).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_scrub_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """(doc_id, text) -> (doc_id, text_clean, n_emails, n_ips, n_phones).

    Counts are taken in replacement order on the progressively cleaned
    text (so an address inside an already-redacted span is not counted
    twice); the SQL oracle interleaves identically.
    """
    text = batch[text_col]
    n_email = pc.cast(pc.count_substring_regex(text, EMAIL_RE), pa.int64())
    clean = pc.replace_substring_regex(text, EMAIL_RE, EMAIL_TOKEN)
    n_ip = pc.cast(pc.count_substring_regex(clean, IPV4_RE), pa.int64())
    clean = pc.replace_substring_regex(clean, IPV4_RE, IP_TOKEN)
    n_phone = pc.cast(pc.count_substring_regex(clean, PHONE_RE), pa.int64())
    clean = pc.replace_substring_regex(clean, PHONE_RE, PHONE_TOKEN)
    return pa.table({
        "doc_id": batch["doc_id"],
        "text_clean": clean,
        "n_emails": n_email,
        "n_ips": n_ip,
        "n_phones": n_phone,
    })


def scrub_pii(docs_ds, *, text_col: str = "text"):
    """Map-only PII scrub over a (doc_id, text) dataset."""
    return docs_ds.map_batches(
        lambda b: pii_scrub_batch(b, text_col=text_col),
        batch_format="pyarrow")
