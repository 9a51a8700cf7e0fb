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


class TestVectorKernels:
    """The vectorized header-parse / stride-sample kernels must agree with
    the scalar reference ``decode_payload`` on hostile mixed batches."""

    def _hostile_batch(self) -> pa.Table:
        payloads = [
            M.encode_payload(b"hello world " * 40, 320, 240),  # valid
            None,                                              # null
            b"KX",                                             # short
            b"XXXX\x00\x01\x00\x01body",                       # bad magic
            M.encode_payload(b"", 17, 23),                     # empty body
            M.encode_payload(bytes(range(256)), 640 + 15, 480 + 15),
        ]
        return pa.table(
            {"doc_id": list(range(len(payloads))), "payload": payloads},
            schema=pa.schema([("doc_id", pa.int64()), ("payload", pa.binary())]),
        )

    def test_decoder_matches_scalar_reference(self):
        batch = self._hostile_batch()
        got = M.PayloadDecoder()(batch).to_pandas().set_index("doc_id")
        for doc_id, payload in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            meta = M.decode_payload(payload)
            if meta is None:
                assert doc_id not in got.index
            else:
                w, h, nb = meta
                row = got.loc[doc_id]
                assert (row["width"], row["height"], row["n_bytes"]) == (w, h, nb)

    def test_decoder_on_sliced_array(self):
        # zero-copy slices carry a nonzero arr.offset — the buffer math must
        # honor it
        batch = self._hostile_batch().slice(2, 4)
        got = M.PayloadDecoder()(batch)
        assert got["doc_id"].to_pylist() == [4, 5]
        assert got["n_bytes"].to_pylist() == [0, 256]

    def test_thumbnail_matches_scalar_stride(self):
        batch = self._hostile_batch()
        got = M.ThumbnailStage()(batch).to_pandas().set_index("doc_id")
        assert set(got.index) == {0, 4, 5}
        for doc_id, payload in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            meta = M.decode_payload(payload)
            if meta is None:
                continue
            w, h, _ = meta
            body = bytes(payload[M.HEADER.size:])
            sampled = body[:: M.SAMPLE_STRIDE]
            row = got.loc[doc_id]
            assert row["t_width"] == max(w // M.THUMB_SCALE, 1)
            assert row["t_height"] == max(h // M.THUMB_SCALE, 1)
            assert row["n_sampled"] == len(sampled)
            assert row["sample_sum"] == sum(sampled)

    def test_attach_payload_null_text(self):
        batch = pa.table(
            {"doc_id": [3, 9], "text": [None, "ok"]},
            schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        )
        out = M.attach_payload_batch(batch)
        metas = [M.decode_payload(p) for p in out["payload"].to_pylist()]
        assert metas[0] == (3 % 640 + 16, (3 * 7) % 480 + 16, 0)
        assert metas[1] == (9 % 640 + 16, (9 * 7) % 480 + 16, 2)


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
