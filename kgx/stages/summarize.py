"""Community summarization (SURVEY.md §2.2 M12-M14, reference
indexing/summarizer.py).

The reference formats each community's entities/relationships/claims into
CSV-ish prompt tables (+ sub-community summaries), asks the LLM for a
JSON report, and validates it with ``_clean_summary``
(/root/reference/indexing/summarizer.py:130-208).  Summaries are produced
deepest level first so parents can cite their children
(summarizer.py:68-69).

Two summarizer implementations share the interface:

- :class:`DeterministicSummarizer` — extractive, seeded-free, fully
  reproducible: title from the highest-degree entities, summary/findings
  from the strongest relationships, rating from size+density+flow.  Used
  in tests/benchmarks (no LLM in this environment).
- :class:`LLMSummarizer` — production shape mirroring the reference's
  prompt -> JSON -> clean flow; transport raises without a configured
  endpoint.

Both emit the reference's summary schema (summarizer.py:181-208):
``{title, summary, rating: float 0-10, "rating explanation",
findings: [{summary, explanation}]}``.
"""

from __future__ import annotations

import pyarrow as pa

from kgx.stages.community import get_community_tables


def prepare_input_text(community: dict) -> str:
    """CSV-ish prompt tables, mirroring ``_prepare_input_text``
    (/root/reference/indexing/summarizer.py:133-162): Entities /
    Relationships / Claims sections."""
    ents: pa.Table = community["entities"]
    rels: pa.Table = community["relationships"]
    claims = community.get("claims")

    lines = ["Entities", "id,entity,description"]
    for r in ents.select(["entity_id", "name", "description"]).to_pylist():
        lines.append(f"{r['entity_id']},{r['name']},{r['description']}")
    lines += ["", "Relationships", "id,source,target,description"]
    for r in rels.select(["edge_id", "subj_name", "obj_name",
                          "pred"]).to_pylist():
        lines.append(f"{r['edge_id']},{r['subj_name']},{r['obj_name']},"
                     f"{r['pred']}")
    lines += ["", "Claims", "id,claim,entities"]
    if claims is not None:
        for r in claims.select(["claim_id", "content"]).to_pylist():
            lines.append(f"{r['claim_id']},{r['content']},")
    return "\n".join(lines)


def clean_summary(raw: dict) -> dict:
    """Validate/default the summary JSON, mirroring ``_clean_summary``
    (/root/reference/indexing/summarizer.py:181-208): field defaults,
    rating reset to 5.0 outside [0, 10], default finding when empty."""
    out = {
        "title": raw.get("title", "Untitled Community"),
        "summary": raw.get("summary", "No summary provided"),
        "rating": float(raw.get("rating", 5.0)),
        "rating explanation": raw.get("rating explanation",
                                      "No explanation provided"),
        "findings": [],
    }
    if not (0 <= out["rating"] <= 10):
        out["rating"] = 5.0
    findings = raw.get("findings", [])
    if isinstance(findings, list):
        for f in findings:
            if isinstance(f, dict):
                out["findings"].append({
                    "summary": f.get("summary", "No finding summary"),
                    "explanation": f.get("explanation",
                                         "No finding explanation"),
                })
    if not out["findings"]:
        out["findings"].append({
            "summary": "Limited information available",
            "explanation": "Insufficient data to generate detailed "
                           "findings for this community.",
        })
    return out


class DeterministicSummarizer:
    """Extractive summarizer: no model, no randomness, same schema."""

    def __init__(self, *, max_findings: int = 5):
        self.max_findings = max_findings

    def summarize(self, community: dict,
                  sub_summaries: list[dict] | None = None) -> dict:
        ents: pa.Table = community["entities"]
        rels: pa.Table = community["relationships"]
        names = ents["name"].to_pylist()

        # degree within the community, deterministic tie-break by name
        deg: dict[str, int] = {n: 0 for n in names}
        rel_rows = rels.select(["subj_name", "obj_name", "pred",
                                "strength", "n_instances"]).to_pylist()
        for r in rel_rows:
            for n in (r["subj_name"], r["obj_name"]):
                if n in deg:
                    deg[n] += 1
        top = sorted(deg, key=lambda n: (-deg[n], n))[:3]

        title = " / ".join(top) if top else "Untitled Community"
        rel_rows.sort(key=lambda r: (-(r["strength"] or 0.0),
                                     -(r["n_instances"] or 0),
                                     r["subj_name"], r["pred"], r["obj_name"]))
        findings = [{
            "summary": f"{r['subj_name']} {r['pred']} {r['obj_name']}",
            "explanation": (f"Observed in {r['n_instances']} chunk(s) with "
                            f"mean strength {round(r['strength'], 3)}."),
        } for r in rel_rows[:self.max_findings]]

        n, density = community["size"], 0.0
        flow = community.get("flow", 0.0)
        if ents.num_rows > 1:
            density = (2 * rels.num_rows) / (ents.num_rows * (ents.num_rows - 1))
        rating = round(min(10.0, 2.0 + min(n, 8) * 0.5 + density * 2 + flow * 2), 2)

        summary_text = (
            f"A community of {n} entities centred on {title}. "
            f"It contains {rels.num_rows} internal relationship(s); "
            f"flow {round(flow, 3)}, density {round(density, 3)}.")
        if sub_summaries:
            subs = "; ".join(s["title"] for s in sub_summaries)
            summary_text += f" Sub-communities: {subs}."
        return clean_summary({
            "title": title,
            "summary": summary_text,
            "rating": rating,
            "rating explanation": (
                "Deterministic score from community size, internal density "
                "and flow."),
            "findings": findings,
        })


class LLMSummarizer:
    """Production path: prompt -> LLM JSON -> :func:`clean_summary`
    (reference flow at summarizer.py:20-59).  No network in this sandbox."""

    def __init__(self, endpoint: str | None = None, model: str = "local"):
        self.endpoint = endpoint
        self.model = model

    def _complete(self, prompt: str) -> str:
        raise NotImplementedError(
            "LLMSummarizer transport requires a configured endpoint; "
            "use DeterministicSummarizer in this environment.")

    def summarize(self, community: dict,
                  sub_summaries: list[dict] | None = None) -> dict:
        from kgx.stages.extract import parse_json_response
        prompt = prepare_input_text(community)
        payload = parse_json_response(self._complete(prompt))
        if "error" in payload:
            payload = {}
        return clean_summary(payload)


def summarize_hierarchy(hierarchy: dict, nodes: pa.Table, edges: pa.Table,
                        claims: pa.Table | None = None,
                        summarizer=None) -> dict[str, dict]:
    """Summarize every community, deepest level first
    (summarizer.py:68-69), feeding child summaries to parents.

    Driver-side over the small canonical tables — same placement argument
    as community detection (SURVEY.md §7 step 9).  Returns
    ``{community_id: summary}``; each summary also carries ``level`` and
    ``parent`` for query-time filtering.
    """
    summarizer = summarizer or DeterministicSummarizer()
    summaries: dict[str, dict] = {}
    levels = sorted(hierarchy, key=lambda k: int(k[1:]), reverse=True)
    for level_key in levels:
        for cid in sorted(hierarchy[level_key]["communities"]):
            cdata = hierarchy[level_key]["communities"][cid]
            community = get_community_tables(cid, hierarchy, nodes, edges,
                                             claims)
            subs = [summaries[s] for s in sorted(cdata["sub_communities"])
                    if s in summaries]
            s = summarizer.summarize(community, sub_summaries=subs)
            s["level"] = hierarchy[level_key]["level"]
            if "parent" in cdata:
                s["parent"] = cdata["parent"]
            summaries[cid] = s
    return summaries
