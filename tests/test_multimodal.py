"""Multimodal payload plumbing: header codec roundtrip, fail-open on
corruption, actor-pool decode stage, and the explicit real-codec stub."""

from __future__ import annotations

import pyarrow as pa
import pytest

from kgx.stages import multimodal as M


class TestCodec:
    def test_roundtrip(self):
        p = M.encode_payload(b"body-bytes", 320, 240)
        assert M.decode_payload(p) == (320, 240, len(b"body-bytes"))

    def test_corrupt_magic_fails_open(self):
        assert M.decode_payload(b"XXXX\x00\x01\x00\x01body") is None

    def test_short_payload_fails_open(self):
        assert M.decode_payload(b"KX") is None
        assert M.decode_payload(None) is None

    def test_real_decoder_is_marked_stub(self):
        with pytest.raises(NotImplementedError):
            M.decode_image_real(b"anything")


class TestStage:
    def test_payload_stats_roundtrip(self, ray_session):
        import ray.data as rd

        docs = pa.table(
            {"doc_id": [0, 1, 7], "text": ["abc", "", "héllo wörld"]},
            schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        )
        out = M.payload_stats(rd.from_arrow(docs)).to_pandas().set_index("doc_id")
        assert out.loc[0, "width"] == 16 and out.loc[0, "n_bytes"] == 3
        assert out.loc[1, "n_bytes"] == 0
        # utf-8 bytes, not chars
        assert out.loc[7, "n_bytes"] == len("héllo wörld".encode("utf-8"))
        assert out.loc[7, "width"] == 7 % 640 + 16
        assert out.loc[7, "height"] == (7 * 7) % 480 + 16
