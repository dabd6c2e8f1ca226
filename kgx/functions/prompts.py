"""Prompt templates for the LLM extraction/summarization/query paths
(SURVEY.md §2.2 M3/M6, §2.10; reference utils/prompts.py:6-241 and the
inline templates at extraction/simple_entity_extractor.py:127-168 and
extraction/simple_claim_extractor.py:136-169).

Own wording, same contract: each template states the task, the JSON
schema the parsers in :mod:`kgx.stages.extract` expect, and the
fill-ins.  ``PromptTemplates`` is the formatter surface users can swap
(reference prompts.py:205-241 exposes the same hook).

DEFAULT_ENTITY_TYPES mirrors the reference's six defaults
(/root/reference/config.py:51-53).
"""

from __future__ import annotations

DEFAULT_ENTITY_TYPES = [
    "PERSON", "ORGANIZATION", "LOCATION", "EVENT", "CONCEPT", "TECHNOLOGY",
]

ENTITY_EXTRACTION_TEMPLATE = """\
You are extracting a knowledge graph from text.

Identify every entity of these types: {entity_types}.
Then identify relationships between entities found in THIS text.

Return ONLY a JSON object of this exact shape:
{{
  "entities": [
    {{"name": "<entity name>", "type": "<one of the types>",
      "description": "<one sentence>"}}
  ],
  "relationships": [
    {{"source": "<entity name>", "target": "<entity name>",
      "description": "<predicate phrase>", "strength": <0.0-1.0>}}
  ]
}}

Relationship endpoints must be names from the "entities" list.

Text:
{text}
"""

ENTITY_FALLBACK_TEMPLATE = """\
List every named entity in the text below, one per line, formatted as:
Entity Name (Entity Type)

Text:
{text}
"""

CLAIM_EXTRACTION_TEMPLATE = """\
You are extracting factual claims from text.

Known entities in this text: {entity_names}.

Return ONLY a JSON object of this exact shape:
{{
  "claims": [
    {{"content": "<one self-contained factual statement>",
      "entities": ["<entity name>", ...]}}
  ]
}}

Each claim's "entities" must name entities from the known list.

Text:
{text}
"""

CLAIM_FALLBACK_TEMPLATE = """\
List every factual claim in the text below, one per line, formatted as:
CLAIM: <statement> - ENTITIES: [<name>, <name>]

Text:
{text}
"""

PIPE_ENTITY_TEMPLATE = """\
You are extracting a knowledge graph from text.

Identify every entity of these types: {entity_types}, then the
relationships between entities found in THIS text.

Emit one record per item, records separated by **, using exactly:
("entity"|<name>|<type>|<one-sentence description>)
("relationship"|<source name>|<target name>|<predicate phrase>|<strength 0.0-1.0>)

Relationship endpoints must be names you emitted as entity records.
Finish with the line END_OF_EXTRACTION.

Text:
{text}
"""

PIPE_CLAIM_TEMPLATE = """\
You are extracting factual claims from text.

Known entities in this text: {entity_names}.

Emit one record per claim, records separated by **, using exactly:
("claim"|<one self-contained factual statement>|<entity name>,<entity name>)

Claim entities must come from the known list.
Finish with the line END_OF_CLAIMS.

Text:
{text}
"""

COMMUNITY_SUMMARY_TEMPLATE = """\
You are writing an analyst report about one community of a knowledge
graph.  Its entities, relationships and claims follow as CSV tables.

Return ONLY a JSON object of this exact shape:
{{
  "title": "<short community name>",
  "summary": "<executive summary paragraph>",
  "rating": <0.0-10.0 importance score>,
  "rating explanation": "<one sentence>",
  "findings": [
    {{"summary": "<insight headline>", "explanation": "<paragraph>"}}
  ]
}}

{community_tables}
"""

QUERY_MAP_TEMPLATE = """\
Using ONLY the community report below, answer the question.  Also score
how helpful the report is for this question from 0 (useless) to 10.

Return ONLY a JSON object: {{"answer": "<answer>", "helpfulness": <0-10>}}

Question: {question}

Community report:
{report}
"""

QUERY_REDUCE_TEMPLATE = """\
Combine the partial answers below (listed most helpful first) into one
final markdown answer with a short section per distinct topic.

Return ONLY a JSON object of this exact shape:
{{
  "answer": "<markdown>",
  "topics": [{{"topic": "<name>", "description": "<text>",
               "sources": ["<community id>"]}}]
}}

Question: {question}

Partial answers:
{partial_answers}
"""


class PromptTemplates:
    """Formatter surface (reference prompts.py:205-241): override any
    ``*_template`` attribute to customize a stage's prompt."""

    entity_template = ENTITY_EXTRACTION_TEMPLATE
    entity_fallback_template = ENTITY_FALLBACK_TEMPLATE
    claim_template = CLAIM_EXTRACTION_TEMPLATE
    claim_fallback_template = CLAIM_FALLBACK_TEMPLATE
    pipe_entity_template = PIPE_ENTITY_TEMPLATE
    pipe_claim_template = PIPE_CLAIM_TEMPLATE
    summary_template = COMMUNITY_SUMMARY_TEMPLATE
    query_map_template = QUERY_MAP_TEMPLATE
    query_reduce_template = QUERY_REDUCE_TEMPLATE

    def entity_extraction(self, text: str,
                          entity_types: list[str] | None = None) -> str:
        types = ", ".join(entity_types or DEFAULT_ENTITY_TYPES)
        return self.entity_template.format(entity_types=types, text=text)

    def entity_fallback(self, text: str) -> str:
        return self.entity_fallback_template.format(text=text)

    def claim_extraction(self, text: str, entity_names: list[str]) -> str:
        return self.claim_template.format(
            entity_names=", ".join(entity_names), text=text)

    def claim_fallback(self, text: str) -> str:
        return self.claim_fallback_template.format(text=text)

    def pipe_entity_extraction(self, text: str,
                               entity_types: list[str] | None = None) -> str:
        """Pipe-record extraction prompt (the reference's richer format,
        utils/prompts.py:6-52 — own wording, same record grammar)."""
        types = ", ".join(entity_types or DEFAULT_ENTITY_TYPES)
        return self.pipe_entity_template.format(entity_types=types, text=text)

    def pipe_claim_extraction(self, text: str,
                              entity_names: list[str]) -> str:
        """Pipe-record claim prompt (utils/prompts.py:85-124 analog)."""
        return self.pipe_claim_template.format(
            entity_names=", ".join(entity_names), text=text)

    def community_summary(self, community_tables: str) -> str:
        return self.summary_template.format(community_tables=community_tables)

    def query_map(self, question: str, report: str) -> str:
        return self.query_map_template.format(question=question,
                                              report=report)

    def query_reduce(self, question: str, partial_answers: str) -> str:
        return self.query_reduce_template.format(
            question=question, partial_answers=partial_answers)
