"""Query path: community-summary ranking -> map -> reduce answer
(SURVEY.md §3.3; reference querying/answer_generator.py,
utils/embedding_utils.py, querying/map_reduce.py).

The reference answers a question by (a) filtering community summaries to
a level (answer_generator.py:67-85 — including an UNSEEDED
``random.shuffle`` at :84, dropped here for determinism, SURVEY §2.6 K4),
(b) ranking them top-k by embedding cosine (embedding_utils.py:17-40),
(c) mapping an LLM over each selected summary with a helpfulness score,
sorted descending (answer_generator.py:87-114, map_reduce.py:119), and
(d) reducing to a final JSON answer
{answer, topics, used_entities/relationships/chunks}
(answer_generator.py:145-151).

This module keeps that exact pipeline shape with a deterministic lexical
scorer standing in for the embedding model (no model in this
environment): rank score = token-set cosine between question and summary
text; helpfulness = overlap count.  Community summaries number at most a
few hundred after aggregation, so ranking runs driver-side — the same
placement as the reference; the heavy lifting (building the summaries)
happened in the distributed stages upstream.
"""

from __future__ import annotations

import math
import re

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_STOP = frozenset("a an and in is of on the to with for by at as".split())


def _terms(text: str) -> set[str]:
    return {t for t in _TOKEN_RE.findall(text.lower()) if t not in _STOP}


def lexical_cosine(a: str, b: str) -> float:
    """Deterministic stand-in for the embedding cosine of
    embedding_utils.py:33-36: token-set cosine |A∩B| / sqrt(|A||B|)."""
    ta, tb = _terms(a), _terms(b)
    if not ta or not tb:
        return 0.0
    return len(ta & tb) / math.sqrt(len(ta) * len(tb))


def _summary_text(s: dict) -> str:
    parts = [s.get("title", ""), s.get("summary", "")]
    parts += [f"{f.get('summary', '')} {f.get('explanation', '')}"
              for f in s.get("findings", [])]
    return " ".join(parts)


def rank_summaries(question: str, summaries: dict[str, dict], *,
                   level: int = 0, k: int = 10) -> list[tuple[str, float]]:
    """Top-k (community_id, score) for the question at one hierarchy
    level — K1 (embedding_utils.py:17-40) with deterministic ordering:
    score desc, community_id asc."""
    scored = [(cid, lexical_cosine(question, _summary_text(s)))
              for cid, s in summaries.items() if s.get("level", 0) == level]
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def map_community_answer(question: str, community_id: str,
                         summary: dict) -> dict:
    """Map phase for one community (answer_generator.py:87-107):
    deterministic extractive answer + helpfulness score.

    The answer keeps the findings whose text shares terms with the
    question; helpfulness = total overlapping-term count (the analog of
    the LLM's 0-10 self-score)."""
    q = _terms(question)
    kept, helpfulness = [], 0
    for f in summary.get("findings", []):
        text = f"{f.get('summary', '')} {f.get('explanation', '')}"
        overlap = len(q & _terms(text))
        if overlap:
            kept.append((overlap, f["summary"]))
            helpfulness += overlap
    kept.sort(key=lambda t: (-t[0], t[1]))
    return {
        "community_id": community_id,
        "title": summary.get("title", ""),
        "answer": "; ".join(s for _, s in kept) or summary.get("summary", ""),
        "helpfulness": helpfulness,
    }


def reduce_answers(question: str, mapped: list[dict],
                   summaries: dict[str, dict]) -> dict:
    """Reduce phase (answer_generator.py:109-151): helpfulness-sorted
    merge (K2) into the reference's Answer schema."""
    ranked = sorted(mapped, key=lambda m: (-m["helpfulness"],
                                           m["community_id"]))
    topics = [{
        "topic": m["title"],
        "description": m["answer"],
        "sources": [m["community_id"]],
    } for m in ranked if m["helpfulness"] > 0]
    lines = [f"## {t['topic']}\n{t['description']}" for t in topics]
    answer_md = "\n\n".join(lines) if lines else (
        "No community in the knowledge graph matches the question.")
    used = sorted({m["community_id"] for m in ranked})
    return {
        "question": question,
        "answer": answer_md,
        "topics": topics,
        "used_communities": used,
    }


def answer_question(question: str, summaries: dict[str, dict], *,
                    level: int = 0, k: int = 10) -> dict:
    """Full query pipeline: filter level -> rank top-k -> map -> reduce."""
    ranked = rank_summaries(question, summaries, level=level, k=k)
    mapped = [map_community_answer(question, cid, summaries[cid])
              for cid, _score in ranked]
    return reduce_answers(question, mapped, summaries)


def seed_entities(question: str, nodes) -> list[str]:
    """Entity ids whose name or alias shares a term with the question,
    ranked (lexical cosine desc, entity_id asc).  Deterministic stand-in
    for the embedding entity matcher of GraphRAG-style local search."""
    q = _terms(question)
    scored = []
    for r in nodes.to_pylist():
        names = " ".join([r["name"]] + list(r.get("aliases") or []))
        ts = _terms(names)
        if q & ts:
            scored.append((r["entity_id"],
                           len(q & ts) / math.sqrt(len(q) * len(ts))))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return [eid for eid, _ in scored]


def local_search(question: str, nodes, edges, claims, *, hops: int = 2,
                 max_seeds: int = 5, k_edges: int = 10,
                 k_claims: int = 10) -> dict:
    """Entity-centric LOCAL search — the counterpart of the global
    community-summary path (``answer_question``): seed entities matched
    from the question expand ``hops`` steps through the canonical edge
    table; the answer context is the subgraph's entity descriptions,
    its strongest relationships, and the claims grounded in it.

    Placement note: this runs DRIVER-SIDE over the canonical tables —
    the same placement as the reference's query stage (the canonical KG
    is the small output of the distributed build; the distributed
    k-hop over raw edge streams is kgx.ops.graph.khop_neighborhood).
    Deterministic: seed ranking, BFS order and context ranking all
    tie-break on ids.
    """
    adj: dict[str, set] = {}
    for r in edges.to_pylist():
        adj.setdefault(r["subj_id"], set()).add(r["obj_id"])
        adj.setdefault(r["obj_id"], set()).add(r["subj_id"])

    seeds = seed_entities(question, nodes)[:max_seeds]
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    for h in range(1, hops + 1):
        nxt = sorted({n for f in frontier for n in adj.get(f, ())}
                     - dist.keys())
        for n in nxt:
            dist[n] = h
        frontier = nxt
        if not frontier:
            break

    in_sub = dist.keys()
    sub_nodes = [r for r in nodes.to_pylist() if r["entity_id"] in in_sub]
    sub_edges = [r for r in edges.to_pylist()
                 if r["subj_id"] in in_sub and r["obj_id"] in in_sub]
    sub_edges.sort(key=lambda r: (-r["strength"], r["edge_id"]))
    sub_claims = [r for r in claims.to_pylist()
                  if any(e in in_sub for e in (r["entity_ids"] or []))]
    sub_claims.sort(key=lambda r: (-len(set(r["entity_ids"] or [])
                                        & in_sub), r["claim_id"]))

    name_of = {r["entity_id"]: r["name"] for r in sub_nodes}
    answer_bits = []
    for r in sub_edges[:k_edges]:
        answer_bits.append(f"{r['subj_name']} {r['pred']} {r['obj_name']}")
    return {
        "question": question,
        "mode": "local",
        "seed_entities": [name_of.get(s, s) for s in seeds],
        "entities": [
            {"name": r["name"], "type": r["type"], "hop": dist[r["entity_id"]],
             "description": r["description"]}
            for r in sorted(sub_nodes,
                            key=lambda r: (dist[r["entity_id"]],
                                           r["entity_id"]))],
        "relationships": [
            {"subj": r["subj_name"], "pred": r["pred"],
             "obj": r["obj_name"], "strength": r["strength"]}
            for r in sub_edges[:k_edges]],
        "claims": [r["content"] for r in sub_claims[:k_claims]],
        "answer": ("; ".join(answer_bits)
                   if answer_bits else "No grounded facts found."),
    }
