"""Multimodal plumbing tests: container parsing, resize geometry,
frame sampling, and the explicitly stubbed codec decode."""
import pytest

from pdfio_spark.pipeline.multimodal import (_decode_pixels,
                                             _fake_pixel_stat,
                                             parse_media_header, synth_media)


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
