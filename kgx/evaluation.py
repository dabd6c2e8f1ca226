"""GraphRAG-vs-VectorRAG evaluation harness (reference
evaluation/evaluate_graphrag.py:43-178 + evaluation/llm_judge.py).

The reference indexes a corpus, answers N questions with both GraphRAG
and a VectorRAG baseline, has an LLM judge each pair on four criteria
(comprehensiveness, diversity, empowerment, directness —
llm_judge.py:5-10), tallies wins and writes a CSV
(evaluate_graphrag.py:181-207).

This harness keeps the full flow with a DETERMINISTIC judge: each
criterion is a reproducible metric over the answer texts, scored 0-100,
winner by higher score (tie -> 0), same result row schema as the
reference CSV.  Corpus stats logging mirrors evaluate_graphrag.py:84-89
(O7).
"""

from __future__ import annotations

import re

EVAL_CRITERIA = ("comprehensiveness", "diversity", "empowerment",
                 "directness")  # llm_judge.py:5-10

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def _terms(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def _score(criterion: str, question: str, answer: str) -> int:
    """Deterministic 0-100 proxy for each judge criterion."""
    toks = _terms(answer)
    if not toks:
        return 0
    if criterion == "comprehensiveness":      # detail: bounded length
        return min(100, len(toks))
    if criterion == "diversity":              # varied: distinct-token ratio
        return round(100 * len(set(toks)) / len(toks))
    if criterion == "empowerment":            # structure: sentences/sections
        n_sent = len(_SENT_RE.split(answer)) + answer.count("\n## ")
        return min(100, 10 * n_sent)
    if criterion == "directness":             # addresses the question terms
        q = set(_terms(question))
        return round(100 * len(q & set(toks)) / max(1, len(q)))
    raise ValueError(criterion)


def judge_answers(question: str, answer1: str, answer2: str) -> dict:
    """Per-criterion comparison in the reference judge's result shape
    (llm_judge.py:12-67): winner 1|2|0, score1/score2, reasoning."""
    results = {"question": question, "evaluations": []}
    for criterion in EVAL_CRITERIA:
        s1 = _score(criterion, question, answer1)
        s2 = _score(criterion, question, answer2)
        winner = 0 if s1 == s2 else (1 if s1 > s2 else 2)
        results["evaluations"].append({
            "criterion": criterion,
            "judgment": {
                "winner": winner,
                "reasoning": f"deterministic {criterion} score "
                             f"{s1} vs {s2}",
            },
            "score1": s1,
            "score2": s2,
        })
    return results


def corpus_stats(docs_ds) -> dict:
    """O7 (evaluate_graphrag.py:84-89): document count + corpus KB."""
    import pyarrow.compute as pc
    n, kb = 0, 0.0
    for b in docs_ds.iter_batches(batch_format="pyarrow"):
        n += b.num_rows
        kb += pc.sum(pc.binary_length(
            pc.cast(b["text"], "binary"))).as_py() / 1024.0
    return {"n_docs": n, "total_kb": round(kb, 2)}


def evaluate(questions: list[str], graph_answers: list[str],
             vector_answers: list[str]) -> dict:
    """Tally per-criterion wins (evaluate_graphrag.py:150-162)."""
    rows, wins = [], {"graphrag": 0, "vectorrag": 0, "tie": 0}
    for q, a1, a2 in zip(questions, graph_answers, vector_answers):
        judged = judge_answers(q, a1, a2)
        for ev in judged["evaluations"]:
            w = ev["judgment"]["winner"]
            wins["graphrag" if w == 1 else "vectorrag" if w == 2
                 else "tie"] += 1
            rows.append({
                "question": q,
                "criterion": ev["criterion"],
                "winner": w,
                "graphrag_score": ev["score1"],
                "vectorrag_score": ev["score2"],
                "reasoning": ev["judgment"]["reasoning"],
            })
    return {"wins": wins, "rows": rows}


def save_evaluation_to_csv(result: dict, path: str) -> str:
    """S6 (evaluate_graphrag.py:181-207): results CSV via pandas."""
    import pandas as pd
    pd.DataFrame(result["rows"]).to_csv(path, index=False)
    return path
