"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched UDFs.

The Spark-side plumbing is real and tested: schemas, partitioning, UDF
signatures, Arrow batch shapes, and the binary container parsing. The
actual codec decode (JPEG/Opus/H.264) is STUBBED — the sandbox has no
image/audio libraries — behind `_decode_pixels`, which raises
NotImplementedError and falls back to a deterministic fake so the
downstream geometry (resize math, frame sampling) is exercised for
real.

Synthetic container format (SMX1), generated from the embeddings table:

    magic   4s   b"SMX1"
    kind    u8   0=image 1=audio 2=video
    width   u16  big-endian
    height  u16
    dur_ms  u32
    codec   u8
    body    sha256 keystream of media_id (deterministic)
"""
from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

__all__ = ["gen_media_corpus", "media_metadata", "media_thumbnail",
           "media_frame_sample", "synth_media", "parse_media_header"]

_HDR = struct.Struct(">4sBHHIB")


def synth_media(media_id: int) -> bytes:
    kind = media_id % 3
    width = 64 + (media_id * 7) % 512
    height = 64 + (media_id * 13) % 512
    dur_ms = (media_id * 31) % 60000
    codec = media_id % 4
    body_len = 256 + (media_id * 11) % 1024
    stream = bytearray()
    counter = 0
    seed = str(media_id).encode()
    while len(stream) < body_len:
        stream += hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        counter += 1
    hdr = _HDR.pack(b"SMX1", kind, width, height, dur_ms, codec)
    return hdr + bytes(stream[:body_len])


def parse_media_header(payload: bytes) -> dict | None:
    if len(payload) < _HDR.size:
        return None
    magic, kind, width, height, dur_ms, codec = _HDR.unpack_from(payload)
    if magic != b"SMX1":
        return None
    return {"kind": int(kind), "width": int(width), "height": int(height),
            "dur_ms": int(dur_ms), "codec": int(codec),
            "body": payload[_HDR.size:]}


def _decode_pixels(body: bytes, width: int, height: int):
    """Codec decode — STUB. Real deployments plug Pillow/ffmpeg here;
    this container has no real codec, so raise and let callers use the
    deterministic fallback."""
    raise NotImplementedError("codec decode not available in this sandbox")


def _fake_pixel_stat(body: bytes) -> float:
    """Deterministic stand-in for decoded-pixel statistics."""
    return sum(body) / max(len(body), 1)


def gen_media_corpus(emb: DataFrame) -> DataFrame:
    """embeddings(vec_id, ...) -> (media_id, kind, payload)."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("vec_id").to_pylist()
            payloads = [synth_media(int(i)) for i in ids]
            kinds = [int(i) % 3 for i in ids]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()),
                 pa.array(kinds, pa.int32()),
                 pa.array(payloads, pa.binary())],
                names=["media_id", "kind", "payload"])

    sc = emb.sparkSession.sparkContext
    return (emb.select("vec_id")
            .repartition(max(sc.defaultParallelism, 8))
            .mapInArrow(gen, "media_id long, kind int, payload binary"))


def media_metadata(media: DataFrame) -> DataFrame:
    """Parse the binary container header per row (real parsing)."""

    def parse(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out = {k: [] for k in ("media_id", "kind", "width", "height",
                                   "dur_ms", "codec", "body_bytes")}
            for mid, p in zip(ids, payloads):
                h = parse_media_header(p or b"")
                if h is None:
                    continue
                out["media_id"].append(mid)
                out["kind"].append(h["kind"])
                out["width"].append(h["width"])
                out["height"].append(h["height"])
                out["dur_ms"].append(h["dur_ms"])
                out["codec"].append(h["codec"])
                out["body_bytes"].append(len(h["body"]))
            yield pa.RecordBatch.from_arrays(
                [pa.array(out["media_id"], pa.int64()),
                 pa.array(out["kind"], pa.int32()),
                 pa.array(out["width"], pa.int32()),
                 pa.array(out["height"], pa.int32()),
                 pa.array(out["dur_ms"], pa.int64()),
                 pa.array(out["codec"], pa.int32()),
                 pa.array(out["body_bytes"], pa.int64())],
                names=["media_id", "kind", "width", "height", "dur_ms",
                       "codec", "body_bytes"])

    return media.mapInArrow(
        parse, "media_id long, kind int, width int, height int, "
               "dur_ms long, codec int, body_bytes long")


def media_thumbnail(media: DataFrame, max_side: int = 128) -> DataFrame:
    """Resize geometry (integer math, exactly reproducible in SQL) +
    stubbed pixel statistics; images only."""

    def thumb(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out = {k: [] for k in ("media_id", "out_w", "out_h", "px")}
            for mid, p in zip(ids, payloads):
                h = parse_media_header(p or b"")
                if h is None or h["kind"] != 0:
                    continue
                w, ht = h["width"], h["height"]
                m = max(w, ht)
                if m <= max_side:
                    ow, oh = w, ht
                else:
                    ow = max(1, (w * max_side) // m)
                    oh = max(1, (ht * max_side) // m)
                try:
                    px = _decode_pixels(h["body"], w, ht)
                except NotImplementedError:
                    px = _fake_pixel_stat(h["body"])
                out["media_id"].append(mid)
                out["out_w"].append(ow)
                out["out_h"].append(oh)
                out["px"].append(px)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out["media_id"], pa.int64()),
                 pa.array(out["out_w"], pa.int32()),
                 pa.array(out["out_h"], pa.int32()),
                 pa.array(out["px"], pa.float64())],
                names=["media_id", "out_w", "out_h", "px"])

    return media.mapInArrow(
        thumb, "media_id long, out_w int, out_h int, px double")


def media_frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: one sample per `every_ms`,
    inclusive of t=0 -> dur_ms // every_ms + 1 frames."""

    def frames(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            o_id, o_n = [], []
            for mid, p in zip(ids, payloads):
                h = parse_media_header(p or b"")
                if h is None or h["kind"] != 2:
                    continue
                o_id.append(mid)
                o_n.append(h["dur_ms"] // every_ms + 1)
            yield pa.RecordBatch.from_arrays(
                [pa.array(o_id, pa.int64()), pa.array(o_n, pa.int32())],
                names=["media_id", "n_frames"])

    return media.mapInArrow(frames, "media_id long, n_frames int")
