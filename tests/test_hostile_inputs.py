"""Fail-open robustness on hostile page payloads (reference contract M13 /
fail-open OCR, extractor.py:393-394: bad input yields empty output, never an
exception) — and the Ray pipeline must still agree byte-for-byte with the
serial oracle on every such row."""

from __future__ import annotations

import pyarrow as pa
import pytest

from kgx.functions.text import extract_text_from_html, page_text
from kgx import schema as S

HOSTILE_HTML = [
    b"",                                        # empty payload
    b"<html><body><p>unclosed everywhere",      # never-closed tags
    b"<p>" + b"<div>" * 2000 + b"deep" ,        # pathological nesting
    b"\xff\xfe\x00broken utf8 \x80\x81",        # invalid UTF-8
    b"<script>while(1){}</script>plain",        # script dropped, text kept
    b"<nav><nav><nav>x</nav></nav></nav>done",  # nested drop-blocks
    b"a < b and c > d & e",                     # bare specials, no tags
    "<p>café ☃ \U0001f600</p>".encode("utf-8"),  # multibyte
    b"<!-- unterminated comment <p>hidden",
    b"<STYLE>x{}</STYLE><P>CAPS TAGS</P>",
]


class TestExtractFailOpen:
    @pytest.mark.parametrize("html", HOSTILE_HTML)
    def test_never_raises(self, html):
        out = extract_text_from_html(html)
        assert isinstance(out, str)

    def test_script_content_dropped(self):
        assert extract_text_from_html(b"<script>while(1){}</script>plain") == "plain"

    def test_caps_tags_stripped(self):
        assert extract_text_from_html(b"<STYLE>x{}</STYLE><P>CAPS</P>") == "CAPS"

    def test_none_inputs(self):
        assert page_text(None, None) == ""
        assert extract_text_from_html(None) == ""


class TestHostilePagesThroughPipeline:
    def test_pipeline_matches_oracle_on_hostile_rows(self, ray_session, cfg, kb):
        import ray.data as rd

        from kgx import oracle, pipeline

        rows = {
            "url": [f"https://hostile.example/{i}" for i in range(len(HOSTILE_HTML))],
            "warc_ts": [0] * len(HOSTILE_HTML),
            "html": HOSTILE_HTML,
            "text": [None] * len(HOSTILE_HTML),
            "lang": ["en"] * len(HOSTILE_HTML),
        }
        pages = pa.table(rows, schema=S.PAGES)
        ora = oracle.extract_text(pages)
        got = (
            pipeline.page_text_ds(rd.from_arrow(pages), cfg)
            .select_columns(["url", "text"])
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        want = ora.to_pandas().sort_values("url").reset_index(drop=True)
        assert got.equals(want)
