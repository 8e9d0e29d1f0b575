"""PII scrubbing over a documents table (doc_id, text).

Training-data pipelines scrub personally-identifying strings before
anything reaches a tokenizer.  Two operators, both pure vectorized maps
(no shuffle, no state — the cheapest possible shape at 100 TB):

- ``pii_stats``   — per-document match counts per PII class
- ``pii_redact``  — replace every match with a typed placeholder token

The regexes are RE2-compatible (no lookaround) so the SAME pattern string
runs in Arrow's ``count_substring_regex`` / ``replace_substring_regex``
AND in the DuckDB oracle (``regexp_extract_all`` / ``regexp_replace``,
both RE2) — identical matches by construction.  Redaction order is fixed
(emails → phones → IPv4) because the classes can overlap textually; the
oracle applies the same order.

Reference scope note: the reference engine has no scrubbing stage; this
is one of the beyond-reference corpus operators (SURVEY.md §"LLM-data-
pipeline operators").
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe patterns, shared verbatim with the DuckDB oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# (class name, pattern, placeholder) in redaction order.
PII_CLASSES = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ipv4", IPV4_RE, "<IPV4>"),
)


def pii_stats(batch: pa.Table) -> pa.Table:
    """(doc_id, n_email, n_phone, n_ipv4) — non-overlapping match counts
    per class, each counted on the ORIGINAL text (order-independent)."""
    text = batch.column("text")
    cols = {"doc_id": batch.column("doc_id")}
    for name, pat, _ in PII_CLASSES:
        cols[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(text, pat), pa.int64()
        )
    return pa.table(cols)


def pii_redact(batch: pa.Table) -> pa.Table:
    """(doc_id, redacted) — all PII classes replaced by placeholders,
    applied in the fixed PII_CLASSES order."""
    text = batch.column("text")
    for _, pat, repl in PII_CLASSES:
        text = pc.replace_substring_regex(text, pat, repl)
    return pa.table({"doc_id": batch.column("doc_id"), "redacted": text})


def pii_scrub(batch: pa.Table) -> pa.Table:
    """Fused stats + redaction in one pass over the batch:
    (doc_id, n_email, n_phone, n_ipv4, redacted)."""
    stats = pii_stats(batch)
    red = pii_redact(batch)
    return stats.append_column("redacted", red.column("redacted"))


def inject_synthetic_pii(batch: pa.Table) -> pa.Table:
    """Deterministically append PII-bearing contact lines derived from
    doc_id (integer arithmetic only, so a SQL replica reproduces the
    bytes exactly).  Test/benchmark harness for the scrub operators —
    the sandbox corpus contains no digits, so without injection every
    count is trivially zero and the regexes are never exercised."""
    doc = pc.cast(batch.column("doc_id"), pa.int64())

    def s(x):
        return pc.cast(x, pa.string())

    def mod(x, m):
        return pc.subtract(x, pc.multiply(pc.divide(x, m), m))

    email = pc.binary_join_element_wise(
        "user", s(doc), "@example.com", ""
    )
    p1 = s(pc.add(mod(doc, 700), 200))  # 3 digits
    p2 = s(pc.add(mod(pc.divide(doc, 3), 900), 100))  # 3 digits
    p3 = s(pc.add(mod(pc.divide(doc, 11), 9000), 1000))  # 4 digits
    phone = pc.binary_join_element_wise(p1, p2, p3, "-")
    ip = pc.binary_join_element_wise(
        "10", s(mod(doc, 256)), s(mod(pc.divide(doc, 256), 256)),
        s(mod(doc, 100)), ".",
    )
    text = pc.binary_join_element_wise(
        batch.column("text"), "contact", email, "or", ip, "tel", phone, " "
    )
    return batch.set_column(
        batch.schema.get_field_index("text"), "text", text
    )
