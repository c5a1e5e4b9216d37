"""Pure-numpy media codecs for the multimodal plane.

The sandbox has no Pillow/ffmpeg, but two production formats need no
codec library at all — they are fixed-layout containers over raw
samples — so they are implemented for real here:

- BMP (Windows bitmap, 24-bit BI_RGB, the uncompressed baseline every
  image tool emits): BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up
  rows, 4-byte row padding, BGR byte order.
- WAV (RIFF PCM16, the uncompressed audio interchange format):
  RIFF/WAVE header, fmt chunk (PCM, mono/stereo), data chunk of
  little-endian int16 samples.

Compressed codecs (JPEG/Opus/H.264) remain stubbed in multimodal.py —
implementing an entropy decoder from scratch is out of scope and real
deployments plug Pillow/ffmpeg into the same `_decode_*` hooks.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_bmp", "decode_bmp", "encode_wav_pcm16",
           "decode_wav_pcm16"]


# ------------------------------------------------------------------ BMP

_BMP_FILE = struct.Struct("<2sIHHI")          # magic, size, res, res, off
_BMP_INFO = struct.Struct("<IiiHHIIiiII")     # BITMAPINFOHEADER


def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (bottom-up,
    BGR in-file, rows padded to 4 bytes)."""
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    body = rows.tobytes()
    off = _BMP_FILE.size + _BMP_INFO.size
    hdr = _BMP_FILE.pack(b"BM", off + len(body), 0, 0, off)
    info = _BMP_INFO.pack(_BMP_INFO.size, w, h, 1, 24, 0, len(body),
                          2835, 2835, 0, 0)
    return hdr + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (h, w, 3) uint8 RGB. Handles
    bottom-up and top-down (negative height) row order."""
    if data[:2] != b"BM" or len(data) < _BMP_FILE.size + _BMP_INFO.size:
        raise ValueError("not a BMP")
    _, _, _, _, off = _BMP_FILE.unpack_from(data, 0)
    (isz, w, h, planes, bpp, comp, _, _, _, _, _) = \
        _BMP_INFO.unpack_from(data, _BMP_FILE.size)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    topdown = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = off + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    px = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not topdown:
        px = px[::-1]
    return np.ascontiguousarray(px)


# ------------------------------------------------------------------ WAV

def encode_wav_pcm16(samples: np.ndarray, rate: int,
                     channels: int = 1) -> bytes:
    """int16 samples (frames,) or (frames, channels) -> RIFF/WAVE PCM."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if channels != s.shape[1]:
        raise ValueError("channel count mismatch")
    data = s.tobytes()
    block = 2 * channels
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block,
                      block, 16)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav_pcm16(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 -> (rate, int16 array (frames, channels)).
    Walks the chunk list (tolerates extra chunks like LIST/fact)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, end = 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    rate = channels = None
    samples = None
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            tag, channels, rate, _, _, bits = \
                struct.unpack_from("<HHIIHH", body, 0)
            if tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (tag={tag}, bits={bits})")
            if not 0 < rate < 2 ** 31 or channels == 0:
                # the fmt rate field is unsigned 32-bit: a crafted
                # value >= 2^31 would "decode" here and then blow up
                # the int32 Arrow column at BATCH assembly — outside
                # the per-row guard (r5 review)
                raise ValueError(f"implausible WAV fmt (rate={rate}, "
                                 f"channels={channels})")
        elif cid == b"data":
            samples = np.frombuffer(
                body[:len(body) & ~1], dtype="<i2")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples.reshape(-1, channels)
