"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded by an actor-pool stage.

The reference's binary modality is PNG frames referenced by path
(extractor.py:157-161) decoded by stateful tools loaded once (Tesseract path
at import, ocr/reader.py:5-7).  Here the payload is an embedded Arrow
``binary`` column — the 100 TB-correct layout: bytes travel inside blocks
through the object store, never as side files.

Because no image/audio codecs exist in this container, the *codec* is a
deterministic fake: an 8-byte KX1 header (magic, width, height) prepended to
the body bytes.  Everything around it — schema, batch sizing for wide rows,
actor-pool decode, fail-open on corrupt payloads — is real and tested.  The
genuine decoder entry point is ``decode_image_real`` below, a clearly-marked
NotImplementedError stub to swap for PIL/ffmpeg off-sandbox.
"""

from __future__ import annotations

import struct

import pyarrow as pa

MAGIC = b"KX1\x00"
HEADER = struct.Struct("<4sHH")  # magic, width, height


def encode_payload(body: bytes, width: int, height: int) -> bytes:
    return HEADER.pack(MAGIC, width, height) + body


def decode_payload(payload: bytes | None) -> tuple[int, int, int] | None:
    """(width, height, body_bytes) or None on a corrupt/short payload —
    fail-open like the reference's OCR-error keep (extractor.py:393-394)."""
    if payload is None or len(payload) < HEADER.size:
        return None
    magic, width, height = HEADER.unpack_from(bytes(payload[: HEADER.size]))
    if magic != MAGIC:
        return None
    return width, height, len(payload) - HEADER.size


def decode_image_real(payload: bytes) -> "object":
    """REAL image decode — intentionally unimplemented in this sandbox.

    Swap-in point for PIL/opencv: must return an ndarray(h, w, c).  The
    Ray-side contract (actor-pool map_batches over binary column, small
    batch_size for wide rows) does not change.
    """
    raise NotImplementedError("image codecs are not available in this environment")


def payload_width(doc_id: int) -> int:
    return doc_id % 640 + 16


def payload_height(doc_id: int) -> int:
    return (doc_id * 7) % 480 + 16


def attach_payload_batch(batch: pa.Table) -> pa.Table:
    """documents -> (doc_id, payload:binary): fake-image payload whose header
    dims derive from doc_id and whose body is the utf8 text bytes."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    payloads = [
        encode_payload((t or "").encode("utf-8"), payload_width(d), payload_height(d))
        for d, t in zip(doc_ids, texts)
    ]
    return pa.table(
        {"doc_id": doc_ids, "payload": payloads},
        schema=pa.schema([("doc_id", pa.int64()), ("payload", pa.binary())]),
    )


class PayloadDecoder:
    """Actor-pool stage: parse headers, emit typed metadata, drop the bytes.

    ``__init__`` is where a real codec would load (once per actor); batches
    of binary payloads should be SMALL (the wide-record rule, SURVEY.md
    §7.4.6) — callers pass batch_size<=64 for multi-MB payloads.
    """

    def __init__(self):
        self.header = HEADER  # stand-in for codec handle loaded once

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "width": [], "height": [], "n_bytes": []}
        for doc_id, payload in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            meta = decode_payload(payload)
            if meta is None:
                continue
            w, h, body = meta
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["n_bytes"].append(body)
        return pa.table(
            out,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("width", pa.int64()),
                 ("height", pa.int64()), ("n_bytes", pa.int64())]
            ),
        )


def payload_stats(docs_ds):
    """documents -> decoded payload metadata via the actor-pool decoder."""
    payloads = docs_ds.map_batches(attach_payload_batch, batch_format="pyarrow")
    return payloads.map_batches(
        PayloadDecoder, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )


# Thumbnail/frame-sample parameters (deterministic fake-codec semantics: a
# real implementation swaps the body transform for PIL.resize / frame
# extraction; dims math, stride sampling and the Ray plumbing are the same).
THUMB_SCALE = 4     # each dimension shrinks 4x (floor, min 1)
SAMPLE_STRIDE = 16  # every 16th body byte survives (the frame-sample analog)


class ThumbnailStage:
    """Actor-pool resize + frame-sample stage over binary payloads.

    Decodes the header, computes thumbnail dims (w//4, h//4, floored at 1)
    and stride-samples the body bytes (byte 0, 16, 32, ... — the
    deterministic stand-in for both pixel downsampling and every-Nth-frame
    extraction).  Emits integer metadata + a checksum of the sampled bytes
    so correctness is oracle-checkable end to end; corrupt payloads drop
    (fail-open).  Real codec swap-in point: ``decode_image_real``.
    """

    def __init__(self, scale: int = THUMB_SCALE, stride: int = SAMPLE_STRIDE):
        self.scale = scale
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        out = {"doc_id": [], "t_width": [], "t_height": [],
               "n_sampled": [], "sample_sum": []}
        for doc_id, payload in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            meta = decode_payload(payload)
            if meta is None:
                continue
            w, h, _ = meta
            body = np.frombuffer(bytes(payload[HEADER.size:]), dtype=np.uint8)
            sampled = body[:: self.stride]
            out["doc_id"].append(doc_id)
            out["t_width"].append(max(w // self.scale, 1))
            out["t_height"].append(max(h // self.scale, 1))
            out["n_sampled"].append(int(sampled.size))
            out["sample_sum"].append(int(sampled.astype(np.int64).sum()))
        return pa.table(
            out,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("t_width", pa.int64()),
                 ("t_height", pa.int64()), ("n_sampled", pa.int64()),
                 ("sample_sum", pa.int64())]
            ),
        )


def thumbnails(docs_ds):
    """documents -> thumbnail metadata via the actor-pool resize stage."""
    payloads = docs_ds.map_batches(attach_payload_batch, batch_format="pyarrow")
    return payloads.map_batches(
        ThumbnailStage, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )
