"""Text-analysis primitives for the training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

Reference semantics inherited: quality-metric aggregates G7
(tests/test_quality.py:86-384 — thresholded ratio checks over documents) and
the value predicates M11 (generator.py:136-165).  Everything here is defined
TWICE on purpose — once in Python (used by the Ray stages and the serial
oracle) and once as DuckDB SQL fragments generated from the *same* constants
(used by ``__ray_entry__.oracle_sql``) — so the driver's side-by-side
correctness gate checks real parity, not two copies that drift.

Every decision rule uses integer arithmetic only (cross-multiplied ratio
thresholds, counts, argmax over counts) so Python and DuckDB agree exactly —
no float round-trips in any compared column.
"""

from __future__ import annotations

from .text import _TOKEN_RE, WS_CODEPOINTS, md5_fingerprint, tokenize

# ---------------------------------------------------------------------------
# Shared constants (single source for Python AND generated SQL)
# ---------------------------------------------------------------------------

TOKEN_PATTERN = "[A-Za-z0-9_]+"          # must stay RE2- and CPython-compatible
TOKEN_PATTERN_LOWER = "[a-z0-9_]+"

# Stop words used by the quality scorer (subset of config/filters.yaml
# stop_words; reference J4 stop-word filtering, config/filters.yaml:71-123).
QUALITY_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "at",
    "is", "was", "are", "were", "with", "for", "by", "it", "this", "that",
)

# Quality rule (integer arithmetic only):
#   pass iff n_tokens >= MIN_TOKENS
#        and n_chars  >= MIN_CHARS
#        and STOP_RATIO_DEN * n_stop <= STOP_RATIO_NUM * n_tokens
# i.e. stopword ratio <= NUM/DEN (reference G7 thresholded ratios,
# test_quality.py:119-138).
QUALITY_MIN_TOKENS = 10
QUALITY_MIN_CHARS = 20
QUALITY_STOP_RATIO_NUM = 3
QUALITY_STOP_RATIO_DEN = 10

# Language-ID marker words (n-gram-heuristic stand-in: tiny disjoint
# function-word lists per language).  Winner = first language in LANG_ORDER
# reaching the max marker count; all-zero -> "und" (reference G3 keyword
# argmax with strict-> first-wins tie-break, post_processor.py:178-201).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of", "was"),
    "es": ("el", "los", "las", "una", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "les", "des", "et", "est"),
}
LANG_ORDER = ("en", "es", "de", "fr")
LANG_UNKNOWN = "und"


# ---------------------------------------------------------------------------
# Python implementations (scalar; the Ray stages vectorize over batches)
# ---------------------------------------------------------------------------


def n_tokens(text: str | None) -> int:
    return len(_TOKEN_RE.findall(text or ""))


def n_stopwords(text: str | None) -> int:
    sw = set(QUALITY_STOPWORDS)
    return sum(1 for t in tokenize(text or "") if t in sw)


def quality_row(text: str | None) -> dict:
    """(n_chars, n_tokens, n_stop, quality_pass) for one document."""
    t = text or ""
    nt = n_tokens(t)
    ns = n_stopwords(t)
    nc = len(t)
    ok = (
        nt >= QUALITY_MIN_TOKENS
        and nc >= QUALITY_MIN_CHARS
        and QUALITY_STOP_RATIO_DEN * ns <= QUALITY_STOP_RATIO_NUM * nt
    )
    return {"n_chars": nc, "n_tokens": nt, "n_stop": ns, "quality_pass": int(ok)}


def lang_marker_counts(text: str | None) -> dict[str, int]:
    toks = tokenize(text or "")
    counts = {}
    for lang in LANG_ORDER:
        markers = set(LANG_MARKERS[lang])
        counts[lang] = sum(1 for t in toks if t in markers)
    return counts


def predict_lang(text: str | None) -> str:
    """First language in LANG_ORDER attaining the max marker count; "und" if
    no marker hits at all (equivalent to the strict-> replacement loop)."""
    counts = lang_marker_counts(text)
    m = max(counts.values())
    if m == 0:
        return LANG_UNKNOWN
    for lang in LANG_ORDER:
        if counts[lang] == m:
            return lang
    return LANG_UNKNOWN  # unreachable


def fingerprint(text: str | None) -> str:
    """Document fingerprint: md5 of lowercased whitespace-normalized text."""
    return md5_fingerprint(text or "")


# BPE-style pre-tokenizer (GPT-2-ish): contraction suffixes, space-prefixed
# letter/digit/punct runs, whitespace runs.  Deliberately RE2-compatible (no
# lookahead, ASCII classes) and leftmost-first in BOTH engines, so the same
# string yields the same token count in Python and DuckDB.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"

import re as _re

_BPE_RE = _re.compile(BPE_PATTERN)


def n_bpe_tokens(text: str | None) -> int:
    """Number of BPE-style pre-tokens (whitespace runs count as tokens,
    exactly as regexp_extract_all counts them)."""
    return len(_BPE_RE.findall(text or ""))


# Repetition quality rule (Gopher-style within-document duplication,
# Rae et al. '21 §A1.1 made integer-exact): over word trigrams,
#   rep_pass iff REP_DEN * (n_tri - n_uniq) <= REP_NUM * n_tri
# i.e. duplicate-trigram fraction <= NUM/DEN.  Docs with < 3 tokens have
# n_tri = 0 and pass vacuously.
REP_NGRAM = 3
REP_NUM = 3
REP_DEN = 10


def repetition_row(text: str | None) -> dict:
    toks = tokenize(text or "")
    n = max(len(toks) - REP_NGRAM + 1, 0)
    grams = {" ".join(toks[i : i + REP_NGRAM]) for i in range(n)}
    n_uniq = len(grams)
    ok = REP_DEN * (n - n_uniq) <= REP_NUM * n
    return {"n_tri": n, "n_uniq": n_uniq, "rep_pass": int(ok)}


# ---------------------------------------------------------------------------
# SQL fragment generators (DuckDB) — built from the SAME constants above.
# ``col`` is the SQL expression for the text column (already null-coalesced).
# ---------------------------------------------------------------------------


# RE2 class equal to CPython's Unicode \s (generated from the shared
# constant; RE2's own \s is ASCII-only — NBSP et al. would silently differ).
SQL_WS_CLASS = "[" + "".join(f"\\x{{{c:04X}}}" for c in WS_CODEPOINTS) + "]"


def sql_norm_text(col: str) -> str:
    """normalize_ws(col): collapse whitespace runs, strip ends.  The trim
    also uses the full class (SQL trim() only strips ASCII spaces), applied
    as a regex strip of leading/trailing normalized spaces."""
    collapsed = f"regexp_replace({col}, '{SQL_WS_CLASS}+', ' ', 'g')"
    return f"trim({collapsed})"


def sql_token_list(col: str) -> str:
    return f"regexp_extract_all(lower({col}), '{TOKEN_PATTERN_LOWER}')"


def sql_n_tokens(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{TOKEN_PATTERN}'))"


def _sql_in_list(words: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def sql_n_stopwords(col: str) -> str:
    return (
        f"len(list_filter({sql_token_list(col)}, "
        f"t -> t IN {_sql_in_list(QUALITY_STOPWORDS)}))"
    )


def sql_quality_pass(nt: str, nc: str, ns: str) -> str:
    """Integer-only pass rule over SQL expressions for the three counts."""
    return (
        f"CASE WHEN {nt} >= {QUALITY_MIN_TOKENS} AND {nc} >= {QUALITY_MIN_CHARS} "
        f"AND {QUALITY_STOP_RATIO_DEN} * {ns} <= {QUALITY_STOP_RATIO_NUM} * {nt} "
        f"THEN 1 ELSE 0 END"
    )


def sql_lang_count(col: str, lang: str) -> str:
    return (
        f"len(list_filter({sql_token_list(col)}, "
        f"t -> t IN {_sql_in_list(LANG_MARKERS[lang])}))"
    )


def sql_predict_lang(count_exprs: dict[str, str]) -> str:
    """CASE chain mirroring predict_lang: earliest lang in LANG_ORDER at the
    max, 'und' when the max is zero."""
    all_counts = ", ".join(count_exprs[l] for l in LANG_ORDER)
    branches = []
    for lang in LANG_ORDER[:-1]:
        branches.append(f"WHEN {count_exprs[lang]} = greatest({all_counts}) THEN '{lang}'")
    return (
        f"CASE WHEN greatest({all_counts}) = 0 THEN '{LANG_UNKNOWN}' "
        + " ".join(branches)
        + f" ELSE '{LANG_ORDER[-1]}' END"
    )


def sql_fingerprint(col: str) -> str:
    return f"md5({sql_norm_text(f'lower({col})')})"


def sql_n_bpe_tokens(col: str) -> str:
    pat = BPE_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({col}, '{pat}'))"


def sql_repetition(col: str) -> str:
    """Full SELECT computing (doc_id, n_tri, n_uniq, rep_pass) — trigram
    duplication stats with the integer pass rule, toks hoisted into a CTE."""
    return f"""
WITH t AS (
  SELECT doc_id, {sql_token_list(col)} AS toks FROM documents
), g AS (
  SELECT doc_id,
    greatest(len(toks) - {REP_NGRAM - 1}, 0) AS n_tri,
    len(list_distinct(list_transform(
      generate_series(1, greatest(len(toks) - {REP_NGRAM - 1}, 0)),
      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS n_uniq
  FROM t
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_tri AS BIGINT) AS n_tri,
       CAST(n_uniq AS BIGINT) AS n_uniq,
       CAST(CASE WHEN {REP_DEN} * (n_tri - n_uniq) <= {REP_NUM} * n_tri
            THEN 1 ELSE 0 END AS BIGINT) AS rep_pass
FROM g
"""
