"""HTML main-content extraction: the boilerplate-strip heuristic must
recover the document text byte-identically from the synthetic pages,
and behave like a real extractor on hand-written/malformed HTML."""
import pytest

from pdfio_spark.fixtures import chunk_text, sanitize
from pdfio_spark.pipeline.html_extract import (
    build_html_for_doc, expected_main_text, extract_main_html)

_expected = expected_main_text  # probe-aware (charset rotation, r4)


class TestRoundTrip:
    # doc_ids 0..11 sweep all 3 containers x all 4 charsets
    @pytest.mark.parametrize("doc_id", list(range(12)))
    def test_byte_identical(self, doc_id):
        text = "some words " * (7 + doc_id * 13)
        r = extract_main_html(build_html_for_doc(doc_id, text))
        assert r["status"] == "ok"
        assert r["main_text"] == _expected(doc_id, text)
        assert r["title"] == f"Doc {doc_id}"
        assert r["n_blocks"] == len(chunk_text(
            f"Doc {doc_id}: " + sanitize(text), 60, 8)) \
            + (1 if doc_id % 4 in (2, 3) else 0)

    def test_empty_doc_text_still_wins(self):
        # content is just the 'Doc N: ' prefix — shorter than some
        # boilerplate, must still beat link-dense containers
        r = extract_main_html(build_html_for_doc(42, ""))
        assert r["status"] == "ok"
        assert r["main_text"] == _expected(42, "")
        assert r["main_text"].startswith("Doc 42: ")

    def test_special_chars_sanitized(self):
        # sanitize() replaces <, &, > before the page is built
        r = extract_main_html(build_html_for_doc(7, "a<b&c>d"))
        assert r["main_text"] == _expected(7, "a<b&c>d")
        assert "<" not in r["main_text"]


class TestBoilerplateDrop:
    def test_nav_footer_sidebar_absent(self):
        r = extract_main_html(build_html_for_doc(3, "real content here"))
        for boiler in ("Home", "Archive", "Log in", "Related story",
                       "rights reserved", "Privacy", "pageview",
                       "Example Site"):
            assert boiler not in r["main_text"], boiler
        assert "real content here" in r["main_text"]

    def test_link_farm_loses_without_semantic_tags(self):
        # two plain divs: a link farm (more raw chars) vs short content
        page = (b"<html><body>"
                b'<div><p><a href="/1">A long related link text one</a>'
                b'</p><p><a href="/2">A long related link text two</a>'
                b'</p><p><a href="/3">A long related link text tri</a>'
                b"</p></div>"
                b"<div><p>short real article body</p></div>"
                b"</body></html>")
        r = extract_main_html(page)
        assert r["main_text"] == "short real article body"

    def test_mixed_block_link_density(self):
        # a block that is half link text: the content div with more
        # non-link mass must still win
        page = (b"<html><body>"
                b'<div><p>teaser <a href="/x">click here for more and '
                b"more</a></p></div>"
                b"<div><p>the actual article paragraph with plenty of "
                b"plain prose text</p></div></body></html>")
        r = extract_main_html(page)
        assert r["main_text"].startswith("the actual article")


class TestRealHtmlQuirks:
    def test_entities_unescaped(self):
        page = (b"<html><body><div><p>Fish &amp; Chips &#65;1 "
                b"&lt;tasty&gt;</p></div></body></html>")
        r = extract_main_html(page)
        assert r["main_text"] == "Fish & Chips A1 <tasty>"

    def test_comments_ignored(self):
        page = (b"<html><body><div><!-- <p>not content</p> -->"
                b"<p>visible</p></div></body></html>")
        r = extract_main_html(page)
        assert r["main_text"] == "visible"

    def test_unclosed_tags_tolerated(self):
        page = (b"<html><body><div><p>first para"
                b"<p>second para</div>")  # no </p>, no </body>
        r = extract_main_html(page)
        assert r["main_text"] == "first para\nsecond para"

    def test_script_style_never_leak(self):
        page = (b"<html><head><style>p{color:red}</style></head><body>"
                b"<div><script>var hidden = 'SECRET';</script>"
                b"<p>shown</p></div></body></html>")
        r = extract_main_html(page)
        assert "SECRET" not in r["main_text"]
        assert "color" not in r["main_text"]
        assert r["main_text"] == "shown"

    def test_garbage_bytes_quarantine(self):
        r = extract_main_html(b"\x00\xff\xfe not html at all \x80")
        assert r["status"] in ("empty", "ok")  # tolerant parse, no crash

    def test_empty_input(self):
        r = extract_main_html(b"")
        assert r["status"] == "empty"
        assert r["n_blocks"] == 0

    def test_nested_blocks_merge(self):
        # <li><p>..</p></li> is one block, not two
        page = (b"<html><body><div><ul><li>item <p>detail</p></li>"
                b"</ul></div></body></html>")
        r = extract_main_html(page)
        assert r["n_blocks"] == 1
        assert r["main_text"] == "item detail"


# --------------------------------------------------------------- fuzz

from hypothesis import given, settings, strategies as st  # noqa: E402


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_html_extract_never_crashes_on_mutation(data):
    """Bit-flipped web pages must produce a status row, never an
    exception — same row-level quarantine contract as the PDF plane."""
    page = bytearray(build_html_for_doc(11, "fuzz the web page"))
    n_flips = data.draw(st.integers(min_value=1, max_value=8))
    for _ in range(n_flips):
        i = data.draw(st.integers(min_value=0, max_value=len(page) - 1))
        page[i] = data.draw(st.integers(min_value=0, max_value=255))
    r = extract_main_html(bytes(page))
    assert r["status"] in ("ok", "empty", "error")
    assert isinstance(r["main_text"], str)
    assert isinstance(r["n_blocks"], int)


@given(st.binary(min_size=0, max_size=2048))
@settings(max_examples=60, deadline=None)
def test_html_extract_never_crashes_on_garbage(blob):
    r = extract_main_html(blob)
    assert r["status"] in ("ok", "empty", "error")


class TestInlineMarkup:
    def test_inline_tags_do_not_split_blocks(self):
        page = (b"<html><body><div><p>plain <b>bold</b> and "
                b"<i>italic</i> and <span class=x>span</span> text</p>"
                b"</div></body></html>")
        r = extract_main_html(page)
        assert r["n_blocks"] == 1
        assert r["main_text"] == "plain bold and italic and span text"

    def test_br_becomes_newline(self):
        page = (b"<html><body><div><p>line one<br>line two<br/>line "
                b"three</p></div></body></html>")
        r = extract_main_html(page)
        assert r["main_text"] == "line one\nline two\nline three"


class TestCharsetSniffing:
    """r4: BOM > <meta charset> > utf-8-replace (WHATWG-style). The
    legacy-encoding pages carry non-ASCII probes that only decode
    correctly through the sniffed charset."""

    def test_windows_1252_meta(self):
        from pdfio_spark.pipeline.html_extract import CP1252_PROBE
        page = build_html_for_doc(2, "legacy page body")  # 2%4=2
        assert b'charset="windows-1252"' in page
        # the probe bytes are NOT valid utf-8 (0xe9 etc.) — a blind
        # utf-8 decode would mojibake them
        assert CP1252_PROBE.encode("cp1252") in page
        r = extract_main_html(page)
        assert r["status"] == "ok"
        assert r["main_text"].endswith("\n" + CP1252_PROBE)
        assert "�" not in r["main_text"]

    def test_shift_jis_http_equiv(self):
        from pdfio_spark.pipeline.html_extract import SJIS_PROBE
        page = build_html_for_doc(3, "japanese page body")  # 3%4=3
        assert b"charset=shift_jis" in page
        assert SJIS_PROBE.encode("shift_jis") in page
        r = extract_main_html(page)
        assert r["status"] == "ok"
        assert r["main_text"].endswith("\n" + SJIS_PROBE)
        assert "�" not in r["main_text"]

    def test_utf16_bom_wins(self):
        page = build_html_for_doc(1, "utf16 page body")  # 1%4=1
        assert page[:2] in (b"\xff\xfe", b"\xfe\xff")
        r = extract_main_html(page)
        assert r["status"] == "ok"
        assert r["main_text"] == _expected(1, "utf16 page body")

    def test_utf8_bom(self):
        from pdfio_spark.pipeline.html_extract import decode_html
        assert decode_html(b"\xef\xbb\xbfcaf\xc3\xa9") == "café"

    def test_latin1_label_means_cp1252(self):
        from pdfio_spark.pipeline.html_extract import decode_html
        # 0x96 is an en dash in cp1252 but a C1 control in ISO-8859-1
        html = b'<meta charset="iso-8859-1"><p>a\x96b</p>'
        assert "a–b" in decode_html(html)

    def test_unknown_label_falls_back_utf8(self):
        from pdfio_spark.pipeline.html_extract import decode_html
        html = '<meta charset="no-such-enc"><p>café</p>'.encode()
        assert "café" in decode_html(html)

    def test_meta_outside_first_1k_ignored(self):
        from pdfio_spark.pipeline.html_extract import decode_html
        html = b"<!--" + b"x" * 1100 + b'--><meta charset="utf-16">ok'
        # sniff window passed: decoded as utf-8, not utf-16
        assert "ok" in decode_html(html)


def test_more_legacy_charset_labels():
    """Any Python-codec label in <meta charset> is honored — gbk,
    euc-kr, big5 spot checks (common in real Common Crawl)."""
    from pdfio_spark.pipeline.html_extract import decode_html
    cases = [("gbk", "中文网页"), ("euc-kr", "한국어 페이지"),
             ("big5", "繁體中文")]
    for label, text in cases:
        html = f'<meta charset="{label}"><p>{text}</p>'.encode(label)
        assert text in decode_html(html), label
