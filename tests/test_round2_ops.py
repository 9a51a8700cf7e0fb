"""Unit tests for the round-2 operator additions: BPE-style pre-tokenizer
counts, Gopher-style repetition stats, and the as-of self-join.
"""

from __future__ import annotations

import pandas as pd
import pytest

from kgx.functions import textstats as ts


class TestBpeTokens:
    CASES = [
        "",
        "hello world",
        "it's John's 2nd try, isn't it?!",
        "   leading  and   trailing   ",
        "mixed123alpha 45.6% -- ok!!",
        "don't we'll I'm they're you've he'd",
        "tabs\tand\nnewlines\r\nmix",
    ]

    def test_python_matches_duckdb(self):
        import duckdb

        con = duckdb.connect()
        for s in self.CASES:
            got = con.execute(
                f"select {ts.sql_n_bpe_tokens('?')}", [s]
            ).fetchone()[0]
            assert int(got) == ts.n_bpe_tokens(s), repr(s)

    def test_contractions_split(self):
        # "it's" -> ["it", "'s"]; the suffix branch fires before the punct one
        assert ts.n_bpe_tokens("it's") == 2
        assert ts.n_bpe_tokens("cat") == 1
        assert ts.n_bpe_tokens("") == 0


class TestRepetition:
    def test_rule(self):
        r = ts.repetition_row("a b c d e f g h")
        assert r["n_tri"] == 6 and r["n_uniq"] == 6 and r["rep_pass"] == 1
        rep = ts.repetition_row("spam spam spam spam spam spam spam spam")
        assert rep["n_uniq"] == 1 and rep["rep_pass"] == 0
        short = ts.repetition_row("one two")
        assert short["n_tri"] == 0 and short["rep_pass"] == 1  # vacuous pass

    def test_python_matches_duckdb(self):
        import duckdb

        con = duckdb.connect()
        texts = ["a b c a b c a b c", "x", "", "w1 w2 w3 w4 w1 w2 w3 w4"]
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
        )
        sql = ts.sql_repetition("coalesce(text,'')")
        got = con.execute(sql).fetchdf().sort_values("doc_id").reset_index(drop=True)
        for i, t in enumerate(texts):
            want = ts.repetition_row(t)
            assert got["n_tri"][i] == want["n_tri"], t
            assert got["n_uniq"][i] == want["n_uniq"], t
            assert got["rep_pass"][i] == want["rep_pass"], t


class TestAsofJoin:
    def test_prev_order_semantics(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.pipelines.relational import prev_order_asof

        # customer 1: orders on days 1, 5, 5, 9 — the two same-date orders
        # must both resolve to day-1's order (strictly earlier), and day 9
        # resolves to the max-orderkey order of day 5
        day = 86_400_000_000
        rows = [
            (1, 10, 1 * day), (1, 11, 5 * day), (1, 12, 5 * day), (1, 13, 9 * day),
            (2, 20, 3 * day),  # singleton -> no prev
        ]
        tbl = pa.table(
            {
                "o_custkey": [r[0] for r in rows],
                "o_orderkey": [r[1] for r in rows],
                "o_orderdate": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
            }
        )
        pq.write_table(tbl, tmp_path / "orders.parquet")
        out = (
            prev_order_asof(str(tmp_path))
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        got = {
            int(r.o_orderkey): (int(r.prev_orderkey), int(r.gap_days))
            for r in out.itertuples()
        }
        assert got == {
            10: (-1, -1),
            11: (10, 4),
            12: (10, 4),
            13: (12, 4),  # tie among day-5 orders -> max orderkey (12)
            20: (-1, -1),
        }


class TestThumbnailStage:
    def test_dims_sampling_and_fail_open(self):
        import pyarrow as pa

        from kgx.stages.multimodal import (
            SAMPLE_STRIDE,
            ThumbnailStage,
            encode_payload,
        )

        body = bytes(range(64)) * 3  # 192 bytes
        batch = pa.table(
            {
                "doc_id": [7, 8],
                "payload": [encode_payload(body, 100, 60), b"JUNK"],
            },
            schema=pa.schema([("doc_id", pa.int64()), ("payload", pa.binary())]),
        )
        out = ThumbnailStage()(batch).to_pylist()
        assert len(out) == 1  # corrupt payload dropped fail-open
        r = out[0]
        assert (r["t_width"], r["t_height"]) == (25, 15)
        sampled = body[::SAMPLE_STRIDE]
        assert r["n_sampled"] == len(sampled)
        assert r["sample_sum"] == sum(sampled)
