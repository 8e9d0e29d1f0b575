"""Parity comparators (port of the reference's evaluation semantics).

- ``triple_prf``: set-based precision/recall/F1 on (…, subj, pred, obj)
  tuples — the headline P/R ≥ 0.95 gate.
- ``entity_faithfulness``: every (ns, value) pair referenced in an emitted
  statement must appear in the paragraph's annotation set; errors classed as
  wrong-namespace vs manufactured-entity and scored correct/total — the
  semantics of utilities/compare_annotations.py:25-137.
"""
from __future__ import annotations

import re
from typing import Dict, Iterable, List, Sequence, Set, Tuple

_NS_ID = re.compile(r"([A-Za-z][A-Za-z0-9]*):(\"[^\"]+\"|[^\s\(\),]+)")


def triple_prf(
    got: Set[Tuple], want: Set[Tuple]
) -> Tuple[float, float, float]:
    tp = len(got & want)
    p = tp / len(got) if got else (1.0 if not want else 0.0)
    r = tp / len(want) if want else 1.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return p, r, f1


def extract_ns_pairs(statement: str) -> List[Tuple[str, str]]:
    """(namespace, value) pairs in a BEL statement, quotes stripped —
    the reference's extract_ns_id semantics (compare_annotations.py:25-36)."""
    out = []
    for ns, val in _NS_ID.findall(statement):
        out.append((ns, val.strip('"')))
    return out


def simplify_annotations(annotations: Sequence[dict]) -> List[str]:
    """Annotations → "db:entry_name" strings (the eval harness's compact
    form, llm_tests/test_pipeline.py:50-55)."""
    return [
        f"{a.get('db', '')}:{a.get('entry_name', '')}" for a in annotations
    ]


def reviewer_consensus(
    votes_by_statement: Dict[str, Sequence[str]], majority: int = 3
) -> Dict[str, Dict]:
    """Per-statement reviewer consensus (comp_reviews.py:28-65 semantics):
    count identical error fingerprints across reviewers; consensus when the
    top fingerprint has ≥ ``majority`` votes."""
    from collections import Counter

    out = {}
    for stmt, votes in votes_by_statement.items():
        counts = Counter(votes)
        top, n = counts.most_common(1)[0] if counts else ("", 0)
        out[stmt] = {
            "votes": dict(counts),
            "top": top,
            "top_count": n,
            "consensus": n >= majority,
        }
    return out


def entity_faithfulness(
    statements: Iterable[str],
    annotations: Sequence[dict],
) -> Dict:
    """Score one paragraph's statements against its annotation set.

    An annotation contributes (db, entry_name) and (db, id-without-prefix)
    as acceptable groundings.  Each ns:value mention in a statement is
    'correct' if the exact pair appears; 'wrong namespace' if the value is
    known under a different db; else 'manufactured entity'.
    overall = correct / total (compare_annotations.py:66-137).
    """
    allowed: Set[Tuple[str, str]] = set()
    values_by_any_db: Set[str] = set()
    for a in annotations:
        db = a.get("db", "")
        for v in (a.get("entry_name"), a.get("id")):
            if not v:
                continue
            bare = v.split(":", 1)[1] if ":" in v else v
            allowed.add((db, v))
            allowed.add((db, bare))
            values_by_any_db.update({v, bare})
    correct = wrong_ns = manufactured = 0
    errors = []
    for stmt in statements:
        for ns, val in extract_ns_pairs(stmt):
            if (ns, val) in allowed:
                correct += 1
            elif val in values_by_any_db:
                wrong_ns += 1
                errors.append({"kind": "wrong namespace", "ns": ns, "value": val})
            else:
                manufactured += 1
                errors.append(
                    {"kind": "manufactured entity", "ns": ns, "value": val}
                )
    total = correct + wrong_ns + manufactured
    return {
        "correct": correct,
        "wrong_namespace": wrong_ns,
        "manufactured": manufactured,
        "total": total,
        "overall_score": (correct / total) if total else 1.0,
        "errors": errors,
    }
