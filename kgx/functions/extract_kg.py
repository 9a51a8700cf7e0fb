"""Knowledge-graph extraction core: alias-dictionary mention matching,
OpenIE-style (subj, pred, obj) extraction, and weighted entity linking.

Pure Python, shared verbatim by the Ray actor stages (kgx.stages.*) and the
serial oracle (kgx.oracle) — the conformance gate then measures only what
*distribution* changes.  Reference semantics inherited (SURVEY.md §2):

* mention detection  — T1/T4 stateful model stages (anonymizer.py:4-5 NER
  loaded once; tagger.py:25-52 batched tagging): here a compiled
  leftmost-longest alias automaton built once per actor.
* triple extraction  — T3 synthesizer + M13 fail-open parse
  (gemini_backend.py:51-139): rule-file-driven, malformed input yields an
  empty result, never an exception.
* entity linking     — J2/J3/J4 weighted as-of/fuzzy join (aligner.py:23-110):
  candidate generation -> bounded candidate set -> weighted combination
  w_alias*prior + w_embed*cos + w_ctx*overlap -> argmax, NIL fallback.

Scale note: the alias automaton here is a sorted-alternation regex, fine for
O(10^3..10^4) aliases; at web scale swap the compiled pattern for an
Aho-Corasick automaton behind the same ``find_mentions`` signature — the
stage contract (state built once per actor in ``__init__``) is unchanged.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from .text import (
    _SENT_BOUND_RE,
    normalize_entity_key,
    overlap_asym,
    tokenize,
)


@dataclass(frozen=True)
class AliasCandidate:
    entity_id: int
    canonical_name: str
    ner_type: str
    prior: float


class AliasMatcher:
    """Case-insensitive leftmost-longest surface matcher over an alias dict.

    Built ONCE per actor (``__init__`` of the stage class) from the broadcast
    alias table; matching per batch is a single compiled-regex scan.
    """

    def __init__(self, alias_rows: list[dict]):
        # alias_rows: [{alias, entity_id, canonical_name, ner_type, prior}]
        self.index: dict[str, list[AliasCandidate]] = {}
        for r in alias_rows:
            self.index.setdefault(r["alias"].lower(), []).append(
                AliasCandidate(int(r["entity_id"]), r["canonical_name"],
                               r["ner_type"], float(r["prior"]))
            )
        for v in self.index.values():
            # deterministic candidate order: prior desc, entity_id asc
            v.sort(key=lambda c: (-c.prior, c.entity_id))
        # Longest-first alternation => leftmost-longest match in Python re.
        alts = sorted(self.index, key=len, reverse=True)
        if alts:
            pat = r"\b(?:" + "|".join(re.escape(a) for a in alts) + r")\b"
            self.pattern: re.Pattern | None = re.compile(pat, re.IGNORECASE)
        else:
            self.pattern = None

    def find(self, text: str) -> list[tuple[int, int, str]]:
        """Non-overlapping (begin, end, surface) matches, left to right."""
        if self.pattern is None:
            return []
        return [(m.start(), m.end(), m.group(0)) for m in self.pattern.finditer(text)]

    def candidates(self, surface: str) -> list[AliasCandidate]:
        return self.index.get(surface.lower(), [])


class PredicateMatcher:
    """Leftmost-longest matcher over the predicate phrase lexicon
    (config/rules/predicates.yaml — the reference's editable prompt-file
    analog, SURVEY.md §2.10)."""

    def __init__(self, rules: list[dict]):
        self.by_phrase = {r["phrase"].lower(): (r["pred"], float(r["conf"])) for r in rules}
        alts = sorted(self.by_phrase, key=len, reverse=True)
        if alts:
            self.pattern: re.Pattern | None = re.compile(
                r"\b(?:" + "|".join(re.escape(p) for p in alts) + r")\b", re.IGNORECASE
            )
        else:
            self.pattern = None

    def find(self, text: str) -> list[tuple[int, int, str, float]]:
        """(begin, end, canonical_pred, conf) occurrences."""
        if self.pattern is None:
            return []
        out = []
        for m in self.pattern.finditer(text):
            pred, conf = self.by_phrase[m.group(0).lower()]
            out.append((m.start(), m.end(), pred, conf))
        return out


def sentence_bounds(text: str) -> list[tuple[int, int]]:
    starts = [0]
    for m in _SENT_BOUND_RE.finditer(text):
        starts.append(m.end())
    starts.append(len(text))
    return [(starts[i], starts[i + 1]) for i in range(len(starts) - 1)]


def extract_raw_triples(
    seg_text: str,
    aliases: AliasMatcher,
    predicates: PredicateMatcher,
    min_conf: float = 0.0,
    max_obj_chars: int = 500,
) -> list[dict]:
    """SVO extraction within one segment, sentence by sentence.

    Per sentence: for each predicate occurrence, subject = the nearest
    mention ending at or before the predicate, object = the nearest mention
    starting at or after it (bounded candidate window — the reference's
    ±3-frame candidate window semantics, processing.yaml:53-58).  Fail-open:
    a sentence with no parse emits nothing (M13 contract).
    """
    out: list[dict] = []
    for sb, se in sentence_bounds(seg_text):
        sent = seg_text[sb:se]
        preds = predicates.find(sent)
        if not preds:
            continue
        ments = aliases.find(sent)
        if len(ments) < 2:
            continue
        for pb, pe, pred, conf in preds:
            if conf < min_conf:
                continue
            subj = None
            for mb, me, msurf in ments:
                if me <= pb:
                    subj = (mb, me, msurf)  # last mention before the predicate
                elif mb >= pe:
                    break
            obj = None
            for mb, me, msurf in ments:
                if mb >= pe:
                    obj = (mb, me, msurf)  # first mention after the predicate
                    break
            if subj is None or obj is None:
                continue
            out.append(
                {
                    "subj_surface": subj[2],
                    "pred": pred,
                    "obj_surface": obj[2][:max_obj_chars],
                    "conf": conf,
                    "context": sent.strip(),
                }
            )
    return out


# ---------------------------------------------------------------------------
# Entity linking
# ---------------------------------------------------------------------------


def cosine(a: list[float], b: list[float]) -> float:
    s = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        s += x * y
        na += x * x
        nb += y * y
    if na == 0.0 or nb == 0.0:
        return 0.0
    return s / math.sqrt(na * nb)


def link_surface(
    surface: str,
    ctx_tokens: set[str],
    ctx_vec: list[float],
    aliases: AliasMatcher,
    embeddings: dict[int, list[float]],
    w_alias: float,
    w_embed: float,
    w_ctx: float,
    min_score: float,
) -> tuple[str, str, int]:
    """Resolve a surface form -> (canonical_name, entity_key, entity_id).

    Weighted argmax over alias candidates (J2 semantics, aligner.py:59-81);
    deterministic tie-break (score desc, entity_id asc); fallback = NIL:
    canonical name is the surface itself, key its normalized form, id -1
    (the reference's closest-frame-text fallback, aligner.py:77-81).
    """
    cands = aliases.candidates(surface)
    best: tuple[float, int, AliasCandidate] | None = None
    for c in cands:
        emb = embeddings.get(c.entity_id)
        if emb:
            # both sides come out of hash_embed L2-normalized, so the
            # cosine IS the dot product — skips two norm recomputations
            # per candidate on the hottest loop of phase A
            cos = 0.0
            for x, y in zip(ctx_vec, emb):
                cos += x * y
        else:
            cos = 0.0
        name_toks = set(tokenize(c.canonical_name))
        ctx = overlap_asym(name_toks, ctx_tokens)
        score = w_alias * c.prior + w_embed * cos + w_ctx * ctx
        keyed = (-score, c.entity_id)
        if best is None or keyed < (-best[0], best[1]):
            best = (score, c.entity_id, c)
    if best is not None and best[0] >= min_score:
        c = best[2]
        return c.canonical_name, normalize_entity_key(c.canonical_name), c.entity_id
    return surface, normalize_entity_key(surface), -1
