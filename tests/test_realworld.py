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
