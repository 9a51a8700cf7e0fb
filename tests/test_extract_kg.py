"""Unit tests for mention matching, triple extraction and linking (no Ray)."""

from __future__ import annotations

from kgx.functions.extract_kg import (
    AliasMatcher,
    PredicateMatcher,
    extract_raw_triples,
    link_surface,
)
from kgx.functions.text import hash_embed, tokenize

ALIASES = [
    {"alias": "Acme Corp", "entity_id": 0, "canonical_name": "Acme Corp", "ner_type": "ORG", "prior": 1.0},
    {"alias": "Acme", "entity_id": 0, "canonical_name": "Acme Corp", "ner_type": "ORG", "prior": 0.7},
    {"alias": "Acme", "entity_id": 1, "canonical_name": "Acme Systems", "ner_type": "ORG", "prior": 0.3},
    {"alias": "Acme Systems", "entity_id": 1, "canonical_name": "Acme Systems", "ner_type": "ORG", "prior": 1.0},
    {"alias": "Globex", "entity_id": 2, "canonical_name": "Globex Corp", "ner_type": "ORG", "prior": 1.0},
    {"alias": "Springfield", "entity_id": 3, "canonical_name": "Springfield", "ner_type": "LOC", "prior": 1.0},
]
RULES = [
    {"phrase": "acquired", "pred": "acquired", "conf": 0.9},
    {"phrase": "is headquartered in", "pred": "headquartered_in", "conf": 0.95},
]


class TestAliasMatcher:
    def test_leftmost_longest(self):
        m = AliasMatcher(ALIASES)
        found = m.find("Acme Systems acquired Globex.")
        assert found[0][2] == "Acme Systems"  # not the shorter "Acme"

    def test_case_insensitive_and_boundaries(self):
        m = AliasMatcher(ALIASES)
        assert m.find("ACME CORP rocks")[0][2] == "ACME CORP"
        assert m.find("Acmeish things") == []  # word boundary respected

    def test_empty_dict(self):
        assert AliasMatcher([]).find("anything") == []


class TestTripleExtraction:
    def setup_method(self):
        self.am = AliasMatcher(ALIASES)
        self.pm = PredicateMatcher(RULES)

    def test_simple_svo(self):
        rows = extract_raw_triples("Acme Corp acquired Globex.", self.am, self.pm)
        assert len(rows) == 1
        r = rows[0]
        assert (r["subj_surface"], r["pred"], r["obj_surface"]) == ("Acme Corp", "acquired", "Globex")

    def test_longest_predicate_phrase_wins(self):
        rows = extract_raw_triples(
            "Globex is headquartered in Springfield.", self.am, self.pm
        )
        assert rows[0]["pred"] == "headquartered_in"

    def test_no_mentions_fail_open(self):
        assert extract_raw_triples("Nothing acquired nothing.", self.am, self.pm) == []
        assert extract_raw_triples("", self.am, self.pm) == []

    def test_two_sentences_two_triples(self):
        rows = extract_raw_triples(
            "Acme Corp acquired Globex. Globex is headquartered in Springfield.",
            self.am, self.pm,
        )
        assert [r["pred"] for r in rows] == ["acquired", "headquartered_in"]

    def test_subject_is_nearest_preceding_mention(self):
        rows = extract_raw_triples(
            "Springfield Acme Systems acquired Globex.", self.am, self.pm
        )
        assert rows[0]["subj_surface"] == "Acme Systems"


class TestLinking:
    def setup_method(self):
        self.am = AliasMatcher(ALIASES)
        self.emb = {
            0: hash_embed(tokenize("Acme Corp"), 32),
            1: hash_embed(tokenize("Acme Systems"), 32),
            2: hash_embed(tokenize("Globex Corp"), 32),
        }

    def _link(self, surface, ctx):
        toks = set(tokenize(ctx))
        vec = hash_embed(sorted(toks), 32)
        return link_surface(surface, toks, vec, self.am, self.emb,
                            w_alias=0.5, w_embed=0.3, w_ctx=0.2, min_score=0.15)

    def test_unambiguous(self):
        name, key, eid = self._link("Globex", "Globex did a thing")
        assert (name, eid) == ("Globex Corp", 2)

    def test_ambiguous_prior_wins_without_context(self):
        name, _, eid = self._link("Acme", "something happened")
        assert eid == 0  # higher prior

    def test_context_can_flip_ambiguous(self):
        name, _, eid = self._link("Acme", "Acme Systems shipped new systems hardware")
        assert eid in (0, 1)  # deterministic either way
        # and deterministic across calls
        assert self._link("Acme", "Acme Systems shipped new systems hardware")[2] == eid

    def test_nil_fallback(self):
        name, key, eid = self._link("Unknown Startup", "ctx")
        assert eid == -1
        assert name == "Unknown Startup"
        assert key == "unknown startup"
