"""Text-analysis unit tests: scalar semantics, edge cases, and the
pandas-vectorized batch functions agreeing with the scalar definitions."""

from __future__ import annotations

import pandas as pd

from kgx.functions import textstats as ts
from kgx.stages import text_analysis as tstage


class TestScalar:
    def test_token_count(self):
        assert ts.n_tokens("a b  c_d e-f") == 5  # e-f -> two tokens
        assert ts.n_tokens("") == 0
        assert ts.n_tokens(None) == 0

    def test_quality_empty_fails(self):
        assert ts.quality_row("")["quality_pass"] == 0

    def test_quality_stopword_heavy_fails(self):
        text = "the the the the the the and and and and is is of of was"
        r = ts.quality_row(text)
        assert r["n_stop"] == r["n_tokens"]
        assert r["quality_pass"] == 0

    def test_quality_good_text_passes(self):
        text = "database engines stream arrow blocks through object stores quickly today"
        assert ts.quality_row(text + " " + text)["quality_pass"] == 1

    def test_langid_markers(self):
        assert ts.predict_lang("the cat and the dog is here") == "en"
        assert ts.predict_lang("el gato y los perros") == "es"
        assert ts.predict_lang("der hund und die katze ist") == "de"
        assert ts.predict_lang("le chat et les chiens") == "fr"
        assert ts.predict_lang("xyzzy plugh") == "und"
        assert ts.predict_lang("") == "und"

    def test_langid_tie_prefers_order(self):
        # "la" is not a marker anywhere (disjoint sets); craft an exact tie:
        # one en marker ("the") and one fr marker ("le") -> en wins (earlier).
        assert ts.predict_lang("the le") == "en"

    def test_fingerprint_normalizes(self):
        assert ts.fingerprint("  A  b\tC ") == ts.fingerprint("a b c")
        assert ts.fingerprint("a b c") != ts.fingerprint("a b d")


class TestBatchParity:
    docs = pd.DataFrame(
        {
            "doc_id": list(range(6)),
            "text": [
                "the cat and the dog is here",
                "el gato y los perros",
                "",
                None,
                "database engines stream arrow blocks through stores quickly today yes",
                "the the the the the and and and is of was",
            ],
        }
    )

    def test_token_count_batch(self):
        out = tstage.token_count_batch(self.docs)
        for _, r in out.iterrows():
            t = self.docs.loc[self.docs.doc_id == r.doc_id, "text"].iloc[0]
            assert r.n_tokens == ts.n_tokens(t)

    def test_quality_batch(self):
        out = tstage.quality_batch(self.docs)
        for _, r in out.iterrows():
            t = self.docs.loc[self.docs.doc_id == r.doc_id, "text"].iloc[0]
            want = ts.quality_row(t)
            assert r.n_chars == want["n_chars"]
            assert r.n_tokens == want["n_tokens"]
            assert r.n_stop == want["n_stop"]
            assert r.quality_pass == want["quality_pass"]

    def test_langid_batch(self):
        out = tstage.langid_batch(self.docs)
        for _, r in out.iterrows():
            t = self.docs.loc[self.docs.doc_id == r.doc_id, "text"].iloc[0]
            assert r.pred_lang == ts.predict_lang(t)

    def test_fingerprint_batch(self):
        out = tstage.fingerprint_batch(self.docs)
        for _, r in out.iterrows():
            t = self.docs.loc[self.docs.doc_id == r.doc_id, "text"].iloc[0]
            assert r.fp == ts.fingerprint(t)
