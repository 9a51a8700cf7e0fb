"""Regression tests for the round-1 ADVICE findings (ADVICE.md 2026-08-17):
simhash bit-63 truncation, ASCII-vs-Unicode marker counting, Unicode
whitespace parity between normalize_ws and the generated SQL, and
control-character urls through the exact-dedup lineage aggregation.
"""

from __future__ import annotations

import re

import pyarrow as pa

from kgx.functions import textstats as ts
from kgx.functions.text import WS_CODEPOINTS, normalize_ws, simhash64


class TestWhitespaceParity:
    def test_ws_codepoints_equal_python_s(self):
        got = {c for c in range(0x110000) if re.match(r"\s", chr(c))}
        assert got == set(WS_CODEPOINTS)

    def test_sql_norm_text_matches_python_on_unicode_ws(self):
        import duckdb

        con = duckdb.connect()
        cases = [
            "a\xa0b",                 # NBSP — ubiquitous on real web text
            "x  y　z",       # line sep + ideographic space
            "\x85lead\x1ctrail\x1f",  # NEL + ASCII control whitespace
            "  plain  ascii  ",
        ]
        for s in cases:
            got = con.execute(
                f"select {ts.sql_norm_text('?')}", [s]
            ).fetchone()[0]
            assert got == normalize_ws(s), repr(s)

    def test_sql_fingerprint_matches_python_on_unicode_ws(self):
        import duckdb

        con = duckdb.connect()
        s = "Acme\xa0Corp  acquired Globex"
        got = con.execute(f"select {ts.sql_fingerprint('?')}", [s]).fetchone()[0]
        assert got == ts.fingerprint(s)


class TestMarkerCountAsciiParity:
    def test_batch_matches_scalar_on_nonascii_adjacent_marker(self):
        import pandas as pd

        from kgx.stages.text_analysis import langid_batch, quality_batch

        texts = ["éthe cat sat", "naïvethe end", "der die das und ist", "the the"]
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        q = quality_batch(df)
        for i, t in enumerate(texts):
            assert int(q["n_stop"][i]) == ts.quality_row(t)["n_stop"], t
        lid = langid_batch(df)
        for i, t in enumerate(texts):
            assert lid["pred_lang"][i] == ts.predict_lang(t), t


class TestSimhashBit63:
    def _text_with_bit63(self):
        from kgx.functions.text import stable_hash64

        for i in range(200):
            # fully distinct token sets — shared tokens would pin the high bits
            t = " ".join(f"w{stable_hash64(f'{i}-{j}') % 99999}" for j in range(9))
            if simhash64(t) >> 63:
                return t
        raise AssertionError("no bit-63 simhash found in probe space")

    def test_band_rows_store_signature_losslessly(self):
        from kgx.stages.dedup import _simhash_band_rows

        t = self._text_with_bit63()
        sim = simhash64(t)
        assert sim >> 63 == 1
        batch = pa.table(
            {"doc_id": [1], "text": [t]},
            schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        )
        rows = _simhash_band_rows(batch, bands=4)
        stored = rows["sim"][0].as_py()
        assert stored & ((1 << 64) - 1) == sim  # bit 63 survives the int64 carry
        assert stored < 0  # two's-complement view, not modulo truncation


class TestControlCharLineage:
    def test_dedup_survives_x1f_in_url(self, ray_session, cfg):
        import ray.data as rd

        from kgx.stages.kg_stages import LINKED_FULL
        from kgx.stages.wide import dedup_and_categorize

        evil_url = "https://evil.example/a\x1fb\x00c"
        rows = []
        for url, seg in [(evil_url, 0), ("https://ok.example/x", 1)]:
            rows.append(
                {
                    "url": url, "seg_id": seg,
                    "subj": "Acme Corp", "subj_key": "acme corp", "subj_id": 1,
                    "pred": "acquired",
                    "obj": "Globex Corp", "obj_key": "globex corp", "obj_id": 2,
                    "conf": 0.9, "subj_surface": "Acme", "obj_surface": "Globex",
                }
            )
        tbl = pa.table(
            {f.name: [r[f.name] for r in rows] for f in LINKED_FULL},
            schema=LINKED_FULL,
        )
        out = dedup_and_categorize(rd.from_arrow(tbl), cfg).to_pandas()
        # one deduped triple; min-lineage url preserved byte-for-byte
        assert len(out) == 1
        assert out["url"][0] == evil_url
        assert out["n_support"][0] == 2
