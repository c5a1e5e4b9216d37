"""Multimodal plumbing tests: container parsing, resize geometry,
frame sampling, and the explicitly stubbed codec decode."""
import struct

import pytest

from pdfio_spark.pipeline.multimodal import (_decode_pixels,
                                             _fake_pixel_stat,
                                             parse_media_header, synth_media)


@pytest.fixture(scope="module")
def mspark():
    """One Spark session for this module — per-test get_spark()+stop()
    paid a JVM cycle each AND (getOrCreate) could tear down a session
    shared with another module under reordered execution (r5 test
    review)."""
    from pdfio_spark.pipeline.session import get_spark
    s = get_spark(cpus=2, app="mm_tests", shuffle_partitions=4)
    yield s
    s.stop()


def test_container_roundtrip():
    for mid in (0, 1, 2, 17, 499, 100000):
        p = synth_media(mid)
        h = parse_media_header(p)
        assert h is not None
        assert h["kind"] == mid % 3
        assert h["width"] == 64 + (mid * 7) % 512
        assert h["height"] == 64 + (mid * 13) % 512
        assert h["dur_ms"] == (mid * 31) % 60000
        assert h["codec"] == mid % 4
        assert len(h["body"]) == 256 + (mid * 11) % 1024


def test_deterministic_bytes():
    assert synth_media(42) == synth_media(42)


def test_garbage_rejected():
    assert parse_media_header(b"") is None
    assert parse_media_header(b"NOPE" + b"\x00" * 20) is None


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_pixels(b"xx", 2, 1)
    assert _fake_pixel_stat(b"\x00\xff") == 127.5


def test_resize_geometry():
    # mirrors media_thumbnail's integer math
    def dims(w, h, m=128):
        big = max(w, h)
        if big <= m:
            return w, h
        return max(1, (w * m) // big), max(1, (h * m) // big)
    assert dims(64, 64) == (64, 64)
    assert dims(512, 256) == (128, 64)
    assert dims(300, 500) == ((300 * 128) // 500, 128)
    assert dims(10000, 1) == (128, 1)


# ----------------------------------------------- r4: real codecs (BMP/WAV)

def test_bmp_roundtrip_exact():
    import numpy as np
    from pdfio_spark.pipeline.codecs import decode_bmp, encode_bmp
    rng = np.random.default_rng(7)
    for h, w in ((1, 1), (5, 3), (16, 16), (7, 21)):  # odd widths pad
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_rejects_garbage_and_unsupported():
    import numpy as np
    from pdfio_spark.pipeline.codecs import decode_bmp, encode_bmp
    with pytest.raises(ValueError):
        decode_bmp(b"not a bmp at all")
    data = bytearray(encode_bmp(np.zeros((2, 2, 3), np.uint8)))
    data[28] = 8  # bpp=8 -> unsupported
    with pytest.raises(ValueError):
        decode_bmp(bytes(data))
    with pytest.raises(ValueError):  # truncated body
        decode_bmp(bytes(encode_bmp(np.zeros((4, 4, 3), np.uint8))[:-5]))


def test_wav_roundtrip_mono_stereo():
    import numpy as np
    from pdfio_spark.pipeline.codecs import (decode_wav_pcm16,
                                             encode_wav_pcm16)
    mono = (np.sin(np.arange(800) / 10) * 12000).astype(np.int16)
    rate, out = decode_wav_pcm16(encode_wav_pcm16(mono, 16000))
    assert rate == 16000 and np.array_equal(out[:, 0], mono)
    st = np.stack([mono, -mono], axis=1).astype(np.int16)
    rate, out = decode_wav_pcm16(encode_wav_pcm16(st, 44100, channels=2))
    assert rate == 44100 and out.shape == (800, 2)
    assert np.array_equal(out, st)


def test_wav_tolerates_extra_chunks():
    import numpy as np
    import struct
    from pdfio_spark.pipeline.codecs import (decode_wav_pcm16,
                                             encode_wav_pcm16)
    wav = bytearray(encode_wav_pcm16(np.arange(10, dtype=np.int16), 8000))
    # splice a LIST chunk between fmt and data
    fmt_end = wav.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = bytes(wav[:fmt_end]) + extra + bytes(wav[fmt_end:])
    spliced = (b"RIFF" + struct.pack("<I", len(spliced) - 8)
               + spliced[8:])
    rate, out = decode_wav_pcm16(spliced)
    assert rate == 8000 and out.shape[0] == 10


def test_media_thumbnail_real_bmp_path(mspark, tmp_path):
    """An SMX row whose body is a REAL BMP must go through the real
    decode + nearest-neighbor resize: px is the mean of the resized
    pixels (computed independently here), not the keystream fake."""
    import numpy as np
    from pdfio_spark.pipeline.multimodal import (_resize_nearest,
                                                 make_container,
                                                 media_thumbnail)
    from pdfio_spark.pipeline.codecs import encode_bmp
    spark = mspark
    rng = np.random.default_rng(42)
    w, h = 200, 300
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    payload = make_container(0, w, h, 0, 1, encode_bmp(px))
    df = spark.createDataFrame(
        [(1, 0, bytearray(payload))],
        "media_id long, kind int, payload binary")
    row = media_thumbnail(df).collect()[0]
    ow, oh = (w * 128) // h, 128
    assert (row.out_w, row.out_h) == (ow, oh)
    want = float(np.mean(_resize_nearest(px, ow, oh)))
    assert row.px == pytest.approx(want, abs=1e-9)
    assert row.decoded is True


def test_media_audio_stats_real_and_stubbed(mspark):
    import numpy as np
    from pdfio_spark.pipeline.multimodal import (make_container,
                                                 media_audio_stats)
    from pdfio_spark.pipeline.codecs import encode_wav_pcm16
    spark = mspark
    samples = (np.sin(np.arange(1600) / 5) * 9000).astype(np.int16)
    wav_row = make_container(1, 0, 0, 100, 1,
                             encode_wav_pcm16(samples, 16000))
    opus_row = make_container(1, 0, 0, 100, 2, b"\x01\x02\x03junk")
    df = spark.createDataFrame(
        [(1, 1, bytearray(wav_row)), (2, 1, bytearray(opus_row))],
        "media_id long, kind int, payload binary")
    rows = {r.media_id: r for r in media_audio_stats(df).collect()}
    assert rows[1].decoded and rows[1].rate == 16000
    assert rows[1].n_frames == 1600
    want_rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
    assert rows[1].rms == pytest.approx(want_rms, rel=1e-12)
    assert not rows[2].decoded and rows[2].rms is None


def test_decode_fallbacks_on_malformed_magic_bodies(mspark):
    """Review finding (r4): a keystream body that happens to start with
    b'BM' or b'RIFF' raises ValueError inside the real decoders — the
    Spark stages must fall back per-row (fake stat / decoded=false),
    never fail the task. P(BM prefix) is 2^-16 per image row, so a
    large corpus WILL hit it."""
    import numpy as np
    import struct
    from pdfio_spark.pipeline.multimodal import (make_container,
                                                 media_audio_stats,
                                                 media_thumbnail)
    from pdfio_spark.pipeline.codecs import encode_wav_pcm16
    spark = mspark
    bm_garbage = make_container(0, 100, 50, 0, 0,
                                b"BM" + b"\x99" * 60)
    # valid stereo WAV truncated to an odd sample count
    st = np.stack([np.arange(10, dtype=np.int16)] * 2, axis=1)
    wav = bytearray(encode_wav_pcm16(st, 8000, channels=2))
    trunc = bytes(wav[:-6])  # cuts mid-frame
    riff_bad = make_container(1, 0, 0, 10, 0, trunc)
    img_df = spark.createDataFrame(
        [(1, 0, bytearray(bm_garbage))],
        "media_id long, kind int, payload binary")
    row = media_thumbnail(img_df).collect()[0]
    assert row.px == pytest.approx(
        sum(b"BM" + b"\x99" * 60) / 62)  # fake-stat fallback
    assert row.decoded is False  # downgrade is visible (ADVICE r4)
    aud_df = spark.createDataFrame(
        [(2, 1, bytearray(riff_bad))],
        "media_id long, kind int, payload binary")
    arow = media_audio_stats(aud_df).collect()[0]
    assert arow.decoded is False and arow.rms is None


def test_wav_implausible_rate_rejected():
    """r5 review: a crafted fmt chunk with rate >= 2^31 used to
    'decode' and then blow up the int32 Arrow column at batch assembly
    — outside the per-row guard. decode must reject it so the row
    falls back (decoded=False)."""
    import struct
    import numpy as np
    from pdfio_spark.pipeline.codecs import decode_wav_pcm16, \
        encode_wav_pcm16
    wav = bytearray(encode_wav_pcm16(
        np.zeros(8, dtype=np.int16), 8000))
    i = wav.find(b"fmt ")
    struct.pack_into("<I", wav, i + 8 + 4, 0x80000000)  # rate field
    with pytest.raises(ValueError, match="implausible"):
        decode_wav_pcm16(bytes(wav))


def test_injected_codec_routes_decode(mspark, tmp_path):
    """Pluggable codec hooks (r5 verdict): set_media_codecs injects a
    fake JPEG decoder; media_thumbnail must route the jpeg-magic body
    through it (shipped to workers via the task closure), and clearing
    the registry must restore the deterministic fallback."""
    import numpy as np
    from pdfio_spark.pipeline import multimodal as mm
    spark = mspark
    w, h = 40, 20
    fake_px = np.full((h, w, 3), 77, dtype=np.uint8)
    jpeg_body = b"\xff\xd8\xe0fakejpegpayload"
    payload = mm.make_container(0, w, h, 0, 2, jpeg_body)
    df = spark.createDataFrame(
        [(5, 0, bytearray(payload))],
        "media_id long, kind int, payload binary")
    try:
        mm.set_media_codecs({"jpeg": lambda body: fake_px.copy()})
        row = mm.media_thumbnail(df).collect()[0]
        assert row.decoded is True and row.px == 77.0
        assert (row.out_w, row.out_h) == (w, h)
        # a decoder returning wrong-dimension pixels (e.g. transposed)
        # must hit the per-row fallback, not warp the geometry (r5
        # review: same contract as the built-in BMP path)
        mm.set_media_codecs({"jpeg": lambda body: fake_px[:5, :5]})
        row = mm.media_thumbnail(df).collect()[0]
        assert row.decoded is False
        # unregistered format still falls back cleanly
        mm.set_media_codecs(None)
        row = mm.media_thumbnail(df).collect()[0]
        assert row.decoded is False
        assert row.px == pytest.approx(sum(jpeg_body) / len(jpeg_body))
    finally:
        mm.set_media_codecs(None)


def test_injected_video_codec_routes_frame_sample(mspark):
    """r6 (r5 verdict #8 follow-through): media_frame_sample must
    route video bodies through an injected decoder — real frames,
    wall-time sampling by fps, mean-pixel stat — and fall back to the
    oracled header synthesis (dur_ms // every_ms + 1, decoded=false)
    without a codec or on a decode error."""
    import numpy as np
    from pdfio_spark.pipeline import multimodal as mm
    spark = mspark
    # 10 fps x 3 s = 30 frames; Annex-B start-code magic
    frames = [np.full((8, 8, 3), i * 8, dtype=np.uint8)
              for i in range(30)]
    body = b"\x00\x00\x00\x01fake-h264-nalus"
    payload = mm.make_container(2, 8, 8, 5000, 0, body)
    df = spark.createDataFrame(
        [(9, 2, bytearray(payload))],
        "media_id long, kind int, payload binary")
    try:
        mm.set_media_codecs(
            {"h264": lambda b: (10.0, [f.copy() for f in frames])})
        row = mm.media_frame_sample(df).collect()[0]
        # every_ms=1000 at 10 fps -> every 10th frame: 0,10,20
        assert row.decoded is True and row.n_frames == 3
        assert row.mean_px == pytest.approx(
            np.mean([0, 80, 160]))
        # a decoder that raises falls back per row to the header count
        mm.set_media_codecs({"h264": lambda b: 1 / 0})
        row = mm.media_frame_sample(df).collect()[0]
        assert row.decoded is False and row.n_frames == 6
        assert row.mean_px is None
        # no codec: the r5 header-synthesis values, flagged undecoded
        mm.set_media_codecs(None)
        row = mm.media_frame_sample(df).collect()[0]
        assert row.decoded is False and row.n_frames == 6
    finally:
        mm.set_media_codecs(None)


def test_mp4_largesize_never_misroutes_to_h264():
    """r6 review: an mp4 whose leading box uses largesize encoding
    starts 00 00 00 01 — the Annex-B start code. With only an h264
    decoder registered, the mp4 must NOT be handed to it; a
    recognized-but-unregistered format raises."""
    from pdfio_spark.pipeline.multimodal import _decode_frames
    mp4_largesize = b"\x00\x00\x00\x01ftypisom" + b"\x00" * 16
    calls = []

    def h264(body):
        calls.append(body)
        return (10.0, [])

    with pytest.raises(NotImplementedError):
        _decode_frames(mp4_largesize, {"h264": h264})
    assert calls == []
    # a real Annex-B body (no ftyp at offset 4) still routes to h264
    fps, frames = _decode_frames(b"\x00\x00\x00\x01nalu-data" + b"\x00" * 8,
                                 {"h264": h264})
    assert fps == 10.0 and calls


from hypothesis import given, settings, strategies as st  # noqa: E402


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_property(data):
    import numpy as np
    from pdfio_spark.pipeline.codecs import decode_bmp, encode_bmp
    h = data.draw(st.integers(min_value=1, max_value=24))
    w = data.draw(st.integers(min_value=1, max_value=24))
    seed = data.draw(st.integers(min_value=0, max_value=2**31))
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                              dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(data):
    import numpy as np
    from pdfio_spark.pipeline.codecs import (decode_wav_pcm16,
                                             encode_wav_pcm16)
    n = data.draw(st.integers(min_value=1, max_value=500))
    ch = data.draw(st.integers(min_value=1, max_value=2))
    rate = data.draw(st.sampled_from([8000, 16000, 44100]))
    seed = data.draw(st.integers(min_value=0, max_value=2**31))
    s = np.random.default_rng(seed).integers(-32768, 32768, (n, ch)) \
        .astype(np.int16)
    r, out = decode_wav_pcm16(encode_wav_pcm16(s, rate, channels=ch))
    assert r == rate and np.array_equal(out, s)


@given(st.binary(min_size=0, max_size=512))
@settings(max_examples=60, deadline=None)
def test_codec_decoders_never_crash_unexpectedly(blob):
    """Decoders must raise ValueError (the per-row fallback contract),
    never segfault-ish numpy/struct surprises, on arbitrary bytes."""
    from pdfio_spark.pipeline.codecs import decode_bmp, decode_wav_pcm16
    for dec in (decode_bmp, decode_wav_pcm16):
        try:
            dec(b"BM" + blob if dec is decode_bmp else b"RIFF" + blob)
        except (ValueError, struct.error):
            pass  # the documented per-row fallback exception classes
        # anything else (numpy broadcast errors, OverflowError, ...)
        # propagates and FAILS the test — the prior
        # `except (ValueError, Exception)` swallowed everything and
        # asserted nothing (r5 test review)
