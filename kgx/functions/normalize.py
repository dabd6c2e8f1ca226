"""Mention normalization and deterministic content-hash ids.

``normalize`` preserves the reference semantics of
``EntityResolver.normalize`` (/root/reference/extraction/entity_resolver.py:14-20):
NFKD unicode-normalize -> ascii-fold (encode/decode ignore) -> lowercase ->
collapse ``[^a-z0-9]+`` runs to a single space -> strip.  It is the shuffle
key for entity canonicalization, so it must stay bit-stable.

SQL equivalent used by the DuckDB oracles (exact for ASCII/Latin-accented
input; chars NFKD can't fold, e.g. ``ß``, diverge and are excluded from
oracle-checked fixtures)::

    trim(regexp_replace(lower(strip_accents(x)), '[^a-z0-9]+', ' ', 'g'))

Ids are content hashes (sha1), never uuid4 — the reference's uuid4 defaults
(/root/reference/models/entity.py:24, relationship.py:25, claim.py:21) are
its main source of nondeterminism and are deliberately not reproduced, so
re-runs and resumed runs emit byte-identical tables.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata

_SQUASH = re.compile(r"[^a-z0-9]+")


def normalize(text: str) -> str:
    """Canonical form of an entity mention; the canonicalization shuffle key."""
    t = unicodedata.normalize("NFKD", text)
    t = t.encode("ascii", "ignore").decode("ascii")
    t = t.lower()
    t = _SQUASH.sub(" ", t)
    return t.strip()


def _sha1(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def entity_id(norm_name: str) -> str:
    """Deterministic node id: sha1 of the normalized name."""
    return _sha1("ent:" + norm_name)


def edge_id(subj_id: str, pred: str, obj_id: str) -> str:
    """Deterministic edge id over the full (subj, pred, obj) triple key."""
    return _sha1("edge:" + subj_id + "|" + pred + "|" + obj_id)


def claim_id(content_lower: str) -> str:
    """Deterministic claim id: sha1 of the lowercased claim content
    (dedup key per /root/reference/models/knowledge_graph.py:81-91)."""
    return _sha1("claim:" + content_lower)
