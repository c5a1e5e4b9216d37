"""Generality check on real third-party PDFs present in the container
(TeX- and DocBook-produced, real subset fonts and xref structures) —
not fixtures we wrote. Skipped where absent."""
import os

import pytest

from pdfio_spark.pd.extract import extract_doc

REAL_PDFS = [
    ("/usr/share/doc/libtasn1-doc/libtasn1.pdf", 36, "Libtasn1"),
    ("/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf", 17,
     "Shared MIME-info Database"),
]


@pytest.mark.parametrize("path,pages,marker", REAL_PDFS)
def test_real_pdf(path, pages, marker):
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    r = extract_doc(open(path, "rb").read())
    assert r["status"] == "ok", r["err"]
    assert r["n_pages"] == pages
    assert marker in r["text"]
    assert len(r["text"]) > 1000


GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "data", "golden")
#: full-document extraction pins for the real third-party PDFs
#: (sha256 of the extracted text; regenerate ONLY on a deliberate
#: extraction-semantics change)
REAL_PDF_TEXT_SHA = {
    "/usr/share/doc/libtasn1-doc/libtasn1.pdf":
        ("eb1da61d62706ca5", "libtasn1"),
    "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf":
        ("6dac643cc478629d", "mimespec"),
}


@pytest.mark.parametrize("path", sorted(REAL_PDF_TEXT_SHA))
def test_real_pdf_golden_text(path):
    """Committed golden texts for the foreign PDFs (r5 verdict #5):
    the FULL extracted text is pinned by hash and two pages are pinned
    byte-for-byte against committed files — not just marker checks."""
    import hashlib
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    from pdfio_spark.pd.pagetree import PDDoc
    sha16, name = REAL_PDF_TEXT_SHA[path]
    data = open(path, "rb").read()
    r = extract_doc(data)
    assert r["status"] == "ok"
    assert hashlib.sha256(
        r["text"].encode()).hexdigest()[:16] == sha16
    doc = PDDoc(data)
    for pno in (1, 9):
        golden = open(os.path.join(GOLDEN_DIR, f"{name}_p{pno}.txt"),
                      encoding="utf-8").read()
        assert doc.get_page(pno).extract_text() == golden


@pytest.mark.parametrize("pack", ["classic", "objstm"])
@pytest.mark.parametrize("encrypt", [None, "rc4-128", "aes-128",
                                     "aes-256"])
def test_real_pdf_writer_roundtrip(pack, encrypt):
    """Foreign-structure generality under every packaging x encryption
    combination: the REAL pdfTeX document (subset Type1 fonts, foreign
    object graph) is rewritten by cos/writer.py — optionally packed
    into object streams + xref stream, optionally encrypted — and must
    extract byte-identically to the committed golden. This is how the
    sandbox (two real PDFs, no PDF producers) gets genuinely foreign
    encrypted and ObjStm corpora."""
    import hashlib
    path = "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf"
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    from pdfio_spark.cos.writer import rewrite_pdf
    src = open(path, "rb").read()
    out = rewrite_pdf(src, encrypt=encrypt, pack=pack)
    r = extract_doc(out)
    assert r["status"] == "ok", r["err"]
    assert hashlib.sha256(
        r["text"].encode()).hexdigest()[:16] == "6dac643cc478629d"


@pytest.mark.parametrize("style", ["classic", "xrefstm"])
def test_real_pdf_append_update(style):
    """Incremental update of a REAL foreign PDF (r6): page 1's
    contents are replaced via an appended section; the original bytes
    stay a byte prefix, page 1 shows the amendment, and page 9 still
    matches its committed golden through the /Prev chain."""
    import zlib
    path = "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf"
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    from pdfio_spark.cos.doc import CosDoc
    from pdfio_spark.cos.objects import Name, Ref, Stream
    from pdfio_spark.cos.writer import append_update
    from pdfio_spark.pd.pagetree import PDDoc
    src = open(path, "rb").read()
    doc = CosDoc(src)

    def first_page_ref(node_ref):
        node = doc.get_object(node_ref)
        if node.get(Name("Type")) == Name("Page"):
            return node_ref, node
        return first_page_ref(node.get(Name("Kids"))[0])

    root = doc.get(doc.trailer, Name("Root"))
    page_ref, page = first_page_ref(root[Name("Pages")])
    new_num = int(doc.trailer[Name("Size")])
    # show text with a font that actually exists in the page's
    # (possibly inherited) resources — pdfTeX names are /F21-style
    res = doc.get(page, Name("Resources"))
    fname = sorted(doc.get(res, Name("Font")))[0]
    body = (b"BT /" + str(fname).encode() +
            b" 24 Tf 72 700 Td (AMENDED PAGE ONE) Tj ET")
    payload = zlib.compress(body)
    new_page = dict(page)
    new_page[Name("Contents")] = Ref(new_num, 0)
    out = append_update(
        src, {page_ref: new_page,
              (new_num, 0): Stream({Name("Filter"): Name("FlateDecode"),
                                    Name("Length"): len(payload)},
                                   payload)},
        style=style)
    assert out[:len(src)] == src
    upd = PDDoc(out)
    p1 = upd.get_page(1).extract_text()
    assert "AMENDED PAGE ONE" in p1
    golden = open(os.path.join(GOLDEN_DIR, "mimespec_p9.txt"),
                  encoding="utf-8").read()
    assert upd.get_page(9).extract_text() == golden


def test_real_pdf_encrypted_wrong_password_quarantined():
    """A real foreign PDF encrypted with a NON-empty user password must
    quarantine (the crawl contract: only empty-password docs open)."""
    path = "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf"
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    from pdfio_spark.cos.writer import rewrite_pdf
    out = rewrite_pdf(open(path, "rb").read(), encrypt="rc4-128",
                      user_pw=b"secret")
    r = extract_doc(out)
    assert r["status"] != "ok"


REAL_HTML = [
    ("/usr/share/doc/libffi8/html/The-Basics.html",
     "The Basics", "pointer to the function"),
    ("/usr/share/doc/libffi8/html/Introduction.html",
     "Introduction", "Compilers for high level languages"),
    ("/usr/share/doc/base-passwd/users-and-groups.html",
     "Users and Groups", "superuser"),
]

#: byte-pinned goldens for the same pages (r5): marker checks prove
#: presence; these prove the extractor's FULL output is stable
REAL_HTML_GOLDEN = {
    "/usr/share/doc/libffi8/html/The-Basics.html":
        "libffi_basics_main.txt",
    "/usr/share/doc/libffi8/html/Introduction.html":
        "libffi_intro_main.txt",
    "/usr/share/doc/base-passwd/users-and-groups.html":
        "basepasswd_users_main.txt",
}


@pytest.mark.parametrize("path", sorted(REAL_HTML_GOLDEN))
def test_real_html_golden_main_text(path):
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    from pdfio_spark.pipeline.html_extract import extract_main_html
    golden = open(os.path.join(GOLDEN_DIR, REAL_HTML_GOLDEN[path]),
                  encoding="utf-8").read()
    r = extract_main_html(open(path, "rb").read())
    assert r["status"] == "ok"
    assert r["main_text"] == golden


@pytest.mark.parametrize("path,title_marker,content_marker", REAL_HTML)
def test_real_html_main_content(path, title_marker, content_marker):
    """Real third-party pages (texinfo- and DocBook-generated): the
    block scorer must keep the article body and drop the per-page
    Next/Previous navigation and any script/style text."""
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    from pdfio_spark.pipeline.html_extract import extract_main_html
    r = extract_main_html(open(path, "rb").read())
    assert r["status"] == "ok"
    assert title_marker in r["title"]
    assert content_marker in r["main_text"]
    assert len(r["main_text"]) > 500
    # texinfo nav bar ("Next: ..., Previous: ...") is link-dense boiler
    assert "Next:" not in r["main_text"]
    # no markup or script/style leakage into extracted text
    assert "</" not in r["main_text"]
    assert "javascript" not in r["main_text"].lower()


def test_package_data_loads_from_zip(tmp_path):
    """spark-submit --py-files ships the package as a ZIP: every data
    file (encodings/AFM JSON, ALL signing/trust PEMs) must load through
    importlib.resources from inside the archive — a plain open() on a
    filesystem path would break exactly here (CLAUDE.md invariant; the
    r4 trust-store PEMs are the newest way to regress it)."""
    import os
    import shutil
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_base = str(tmp_path / "pdfio_spark_pkg")
    staged = tmp_path / "stage"
    shutil.copytree(os.path.join(repo, "pdfio_spark"),
                    staged / "pdfio_spark")
    shutil.make_archive(zip_base, "zip", staged)
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "from pdfio_spark.fixtures import test_trust_pems, _test_identity\n"
        "import pdfio_spark.fixtures as fx\n"
        "assert len(test_trust_pems()) == 4\n"
        "for which in fx._IDENTITY_FILES:\n"
        "    cert, key, extras = fx._test_identity(which)\n"
        "    assert cert is not None and key is not None\n"
        "import pdfio_spark.pd.fonts as fonts  # loads afm/encodings json\n"
        "from pdfio_spark.fixtures import build_fixture\n"
        "from pdfio_spark.pd.extract import extract_doc\n"
        "r = extract_doc(build_fixture('flate_simple', ['zip probe']))\n"
        "assert r['status'] == 'ok' and 'zip probe' in r['text']\n"
        "print('ZIP-OK')\n")
    r = subprocess.run([sys.executable, "-c", probe, zip_base + ".zip"],
                       capture_output=True, text=True, cwd=str(tmp_path))
    assert "ZIP-OK" in r.stdout, r.stderr[-2000:]
