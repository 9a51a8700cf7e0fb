"""Ray stages for the text-analysis suite (language ID, quality scoring,
token counting, fingerprinting) over a documents corpus.

Vectorization note: token/marker counting uses pandas ``str.count`` /
``str.findall``-free C regex paths where they exist; the md5 fingerprint is
per-row hashlib (C inside), applied to the normalized string.  All decision
logic lives in ``kgx.functions.textstats`` — shared with the serial oracle
and mirrored by the generated DuckDB SQL.
"""

from __future__ import annotations

import pandas as pd

from ..functions import textstats as ts


def token_count_batch(df: pd.DataFrame) -> pd.DataFrame:
    text = df["text"].fillna("")
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_tokens": text.str.count(ts.TOKEN_PATTERN).astype("int64"),
        }
    )


def _marker_count(lower: pd.Series, words) -> pd.Series:
    """Marker-word occurrences under ASCII token semantics.  ``re.ASCII``
    pins ``\\b`` to [A-Za-z0-9_] boundaries so this agrees with the scalar
    path (ASCII tokenize + set membership) and the DuckDB oracle
    (regexp_extract_all '[a-z0-9_]+') on text where a marker abuts a
    non-ASCII word character, e.g. 'éthe' (ADVICE.md 2026-08-17)."""
    import re

    pat = r"\b(?:" + "|".join(words) + r")\b"
    return lower.str.count(pat, flags=re.ASCII).astype("int64")


def quality_batch(df: pd.DataFrame) -> pd.DataFrame:
    text = df["text"].fillna("")
    lower = text.str.lower()
    nt = text.str.count(ts.TOKEN_PATTERN).astype("int64")
    nc = text.str.len().astype("int64")
    nstop = _marker_count(lower, ts.QUALITY_STOPWORDS)
    ok = (
        (nt >= ts.QUALITY_MIN_TOKENS)
        & (nc >= ts.QUALITY_MIN_CHARS)
        & (ts.QUALITY_STOP_RATIO_DEN * nstop <= ts.QUALITY_STOP_RATIO_NUM * nt)
    )
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_chars": nc,
            "n_tokens": nt,
            "n_stop": nstop,
            "quality_pass": ok.astype("int64"),
        }
    )


def langid_batch(df: pd.DataFrame) -> pd.DataFrame:
    lower = df["text"].fillna("").str.lower()
    counts = {
        lang: _marker_count(lower, ts.LANG_MARKERS[lang]) for lang in ts.LANG_ORDER
    }
    import numpy as np

    stacked = np.stack([counts[lang].to_numpy() for lang in ts.LANG_ORDER])
    best = stacked.argmax(axis=0)  # argmax returns the FIRST max -> LANG_ORDER wins ties
    langs = np.array(ts.LANG_ORDER, dtype=object)[best]
    langs[stacked.max(axis=0) == 0] = ts.LANG_UNKNOWN
    return pd.DataFrame({"doc_id": df["doc_id"], "pred_lang": langs})


def fingerprint_batch(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "fp": df["text"].fillna("").map(ts.fingerprint),
        }
    )


def bpe_count_batch(df: pd.DataFrame) -> pd.DataFrame:
    """BPE-style pre-token counts (ts.BPE_PATTERN) — the subword-ish
    complement to the word-regex token counter."""
    text = df["text"].fillna("")
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_bpe": text.str.count(ts.BPE_PATTERN).astype("int64"),
        }
    )


def repetition_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Within-document trigram duplication stats (Gopher-style repetition
    quality signal, integer pass rule shared with the SQL oracle)."""
    rows = df["text"].fillna("").map(ts.repetition_row)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_tri": rows.map(lambda r: r["n_tri"]).astype("int64"),
            "n_uniq": rows.map(lambda r: r["n_uniq"]).astype("int64"),
            "rep_pass": rows.map(lambda r: r["rep_pass"]).astype("int64"),
        }
    )
