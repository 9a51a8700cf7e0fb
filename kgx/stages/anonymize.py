"""PII anonymization stage (reference M9 semantics, anonymizer.py:8-60):
email regex -> [EMAIL], phone regex -> [PHONE], case-insensitive custom
terms -> [REDACTED], and dictionary-NER PERSON mentions -> [PERSON].

Two deployment shapes:

* ``mask_pii_batch`` — the pure-regex subset, vectorized pandas, shared
  verbatim with the DuckDB oracle (patterns are RE2- and CPython-compatible,
  applied in a fixed order: email, phone, terms).
* ``PersonMasker`` — the model-backed part (the reference's spaCy NER loaded
  once per process, anonymizer.py:4-5): an actor-pool ``map_batches`` class
  whose alias automaton comes from the broadcast KB (``ray.put`` ref in
  ``__init__``), replacing PER-typed mention spans right-to-left so earlier
  offsets stay valid (the reference's index-preserving rewrite order,
  anonymizer.py:29-33).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

_EMAIL_RE = re.compile(EMAIL_PATTERN)
_PHONE_RE = re.compile(PHONE_PATTERN)


def mask_regex_pii(text: str, custom_terms: list[str]) -> str:
    """email -> [EMAIL], phone -> [PHONE], custom terms (ci) -> [REDACTED]."""
    s = _EMAIL_RE.sub("[EMAIL]", text or "")
    s = _PHONE_RE.sub("[PHONE]", s)
    for term in custom_terms:
        s = re.sub(re.escape(term), "[REDACTED]", s, flags=re.IGNORECASE)
    return s


def mask_pii_batch(df: pd.DataFrame, custom_terms: list[str]) -> pd.DataFrame:
    clean = (
        df["text"].fillna("")
        .str.replace(EMAIL_PATTERN, "[EMAIL]", regex=True)
        .str.replace(PHONE_PATTERN, "[PHONE]", regex=True)
    )
    for term in custom_terms:
        clean = clean.str.replace(
            f"(?i){re.escape(term)}", "[REDACTED]", regex=True
        )
    return pd.DataFrame({"doc_id": df["doc_id"], "clean_text": clean})


class PersonMasker:
    """Actor-pool stage: mask PER-typed alias mentions + regex PII in a text
    column.  State (alias automaton filtered to PER entities) built once per
    actor from the broadcast alias table."""

    def __init__(self, alias_ref, custom_terms: list[str], column: str = "text"):
        from ..functions.extract_kg import AliasMatcher

        if isinstance(alias_ref, list):  # serial/oracle path: rows directly
            alias_rows = alias_ref
        else:  # Ray path: broadcast ObjectRef resolved once per actor
            import ray

            alias_rows = ray.get(alias_ref)
        per_rows = [r for r in alias_rows if r["ner_type"] == "PER"]
        self.matcher = AliasMatcher(per_rows)
        self.custom_terms = custom_terms
        self.column = column

    def mask(self, text: str) -> str:
        s = text or ""
        # Right-to-left so replacements don't shift pending match offsets.
        for b, e, _surf in reversed(self.matcher.find(s)):
            s = s[:b] + "[PERSON]" + s[e:]
        return mask_regex_pii(s, self.custom_terms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = self.column
        vals = [self.mask(t) for t in batch[col].to_pylist()]
        i = batch.schema.get_field_index(col)
        return batch.set_column(i, col, pa.array(vals, type=pa.string()))
