"""Guards for the assumptions behind the kg_* / sketch DuckDB oracles
(kgx.sql_oracles): hash-function identity, template well-formedness,
token-adjacency == regex-scan equivalence, and corpus/KB vocabulary
disjointness on the actual driver testdata.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

from kgx import synth
from kgx.functions.extract_kg import AliasMatcher, PredicateMatcher
from kgx.functions.text import stable_hash64


@pytest.fixture(scope="module")
def kb():
    return synth.build_knowledge_base()


class TestHashIdentity:
    def test_md5_number_upper_equals_stable_hash64(self):
        import duckdb

        con = duckdb.connect()
        for s in ["", "a", "hello world", "token123", "|".join(map(str, range(9)))]:
            got = con.execute("select md5_number_upper('0:' || ?)", [s]).fetchone()[0]
            assert int(got) == stable_hash64(s), s


class TestTemplates:
    def test_well_formed(self, kb):
        tmpls = synth.sql_templates(kb)
        assert len(tmpls) == synth._SQL_TEMPLATE_COUNT
        for t in tmpls:
            # no sentence punctuation, no regex-breaking chars, single spaces
            assert re.fullmatch(r"[A-Za-z0-9 ]+", t), t
            assert "  " not in t

    def test_templates_contain_extractable_relations(self, kb):
        from kgx import config_loader

        cfg = config_loader.resolve_settings()
        preds = PredicateMatcher(cfg["rules"]["predicates"])
        aliases = AliasMatcher(kb["alias_table"].to_pylist())
        n_with_triples = 0
        for t in synth.sql_templates(kb):
            if preds.find(t) and len(aliases.find(t)) >= 2:
                n_with_triples += 1
        assert n_with_triples == synth._SQL_TEMPLATE_COUNT


def _token_matches_longest_per_start(text: str, alias_lens: set[int], index: set[str]):
    """Token-sequence adjacency matcher — EXACTLY what the SQL oracle
    expresses (lead() windows + longest-per-start)."""
    toks_l = re.findall(r"[a-z0-9_]+", text.lower())
    toks_o = re.findall(r"[A-Za-z0-9_]+", text)
    out = []
    for p in range(len(toks_l)):
        best = None
        for n in sorted(alias_lens, reverse=True):
            if p + n <= len(toks_l) and " ".join(toks_l[p : p + n]) in index:
                best = n
                break
        if best:
            out.append((p, " ".join(toks_o[p : p + best])))
    return out


class TestRegexTokenEquivalence:
    """The oracle's core claim: over single-space text whose matches never
    overlap except at a shared start, the \\b-regex leftmost-longest scan ==
    token-adjacency longest-per-start."""

    def test_on_templates_and_chunk_cuts(self, kb):
        matcher = AliasMatcher(kb["alias_table"].to_pylist())
        index = set(matcher.index.keys())
        alias_lens = {len(a.split()) for a in index}
        for t in synth.sql_templates(kb):
            # whole template and a few chunk-boundary cuts (mid-word cuts
            # happen when the 400-char window lands inside the template)
            views = [t] + [t[:c] for c in (7, 15, len(t) // 2)] + [t[c:] for c in (7, 15, len(t) // 2)]
            for v in views:
                want = [(m[2]) for m in matcher.find(v)]
                got = [s for _, s in _token_matches_longest_per_start(v, alias_lens, index)]
                assert got == want, v


class TestCorpusDisjointness:
    """The salad text of the driver corpora contains no alias or predicate
    matches — mention/predicate signal comes only from the appended
    templates (verified here so a future testdata change fails loudly
    instead of silently breaking oracle parity)."""

    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
    def test_no_kb_matches_in_raw_documents(self, kb, sf):
        import pyarrow.parquet as pq

        from kgx import config_loader

        path = Path("/root/testdata") / sf / "documents.parquet"
        if not path.exists():
            pytest.skip("testdata missing")
        cfg = config_loader.resolve_settings()
        matcher = AliasMatcher(kb["alias_table"].to_pylist())
        preds = PredicateMatcher(cfg["rules"]["predicates"])
        texts = pq.read_table(path, columns=["text"])["text"].to_pylist()
        assert all(not matcher.find(t or "") for t in texts)
        assert all(not preds.find(t or "") for t in texts)
