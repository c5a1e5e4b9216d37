"""Reference-parity API facade: the public names PDFIO.jl exports
(src/PDFIO.jl:8-74) mapped 1:1 onto this engine, so a user of the
reference can switch by renaming the import. Semantics match the
reference's docstrings; objects returned are this engine's native ones
(PDDoc/PDPage/PDFont/CosDoc, plain dicts for outlines/destinations).

Julia-only constructs are represented Pythonically:
  - `@cn_str` (cn"Name" literals)   -> `cn("Name")` returning Name
  - CosNull                          -> None
  - CosTrue/CosFalse                 -> True/False
  - set!                             -> plain dict assignment
"""
from __future__ import annotations

from .cos.doc import CosDoc, PDFError
from .cos.objects import HexStr, LitStr, Name, Ref, Stream
from .pd.dates import CDDate
from .pd.fonts import PDFont
from .pd.pagetree import PDDoc, PDPage
from .pd.navigation import (find_page_for_label, get_outline,
                            get_page_label, pd_destination)
from .pd.signature import validate_signatures

__all__ = [
    # Common
    "CDTextString", "CDDate", "CDRect", "getUTCTime",
    # PD
    "PDDoc", "pdDocOpen", "pdDocClose", "pdDocGetCatalog",
    "pdDocGetNamesDict", "pdDocGetInfo", "pdDocGetCosDoc", "pdDocGetPage",
    "pdDocGetPageCount", "pdDocGetPageRange", "pdDocHasPageLabels",
    "pdDocGetPageLabel", "pdDocGetOutline", "pdDocHasSignature",
    "pdDocValidateSignatures",
    "PDPage", "pdPageGetContents", "pdPageIsEmpty", "pdPageGetCosObject",
    "pdPageGetContentObjects", "pdPageGetMediaBox", "pdPageGetCropBox",
    "pdPageGetFonts", "pdPageExtractText", "pdPageGetPageNumber",
    "PDFont", "pdFontIsBold", "pdFontIsItalic", "pdFontIsFixedW",
    "pdFontIsAllCap", "pdFontIsSmallCap",
    "PDDestination", "pdOutlineItemGetAttr",
    "PDPageObject", "PDPageObjectGroup", "PDPageTextObject",
    "PDPageTextRun", "PDPageMarkedContent", "PDPageElement",
    "PDPageInlineImage",
    "pdPageEvalContent", "PDPage_BeginGroup", "PDPage_EndGroup",
    "PDOutline", "PDOutlineItem",
    # Cos
    "CosDoc", "cosDocOpen", "cosDocClose", "cosDocGetRoot",
    "cosDocGetObject", "cosDocIsEncrypted", "cosDocGetID", "cosDocGetInfo",
    "cosDocGetPageLabel", "cosDocGetPageNumbers", "merge_streams",
    "find_ntree", "readfrom", "cn", "CosNull", "PDFError",
    "CosObject", "CosDict", "CosString", "CosLiteralString", "CosArray",
    "CosStream", "CosIndirectObjectRef", "CosBoolean", "CosTrue",
    "CosFalse", "CosNumeric", "CosFloat", "CosInt", "CosName", "set_",
    "CosTreeNode", "createTreeNode",
]

# ------------------------------------------------------------- Common

CDTextString = str
CDRect = tuple
CosNull = None


def cn(name: str) -> Name:
    """cn"..." CosName literal (@cn_str)."""
    return Name(name)


def getUTCTime(d: CDDate) -> CDDate:
    """getUTCTime (CDObject.jl:118): the date normalized to UTC —
    returned as a CDDate like the reference (r4; a plain datetime
    broke further CDDate comparisons for ported callers)."""
    return CDDate(d.utc().strftime("D:%Y%m%d%H%M%SZ"))


# ----------------------------------------------------------------- PD

def pdDocOpen(src) -> PDDoc:
    """pdDocOpen (PDDoc.jl:60-74): path or bytes -> PDDoc. The engine
    is bytes-first (documents arrive as a binary column); a path is
    read eagerly."""
    if isinstance(src, (bytes, bytearray, memoryview)):
        return PDDoc(bytes(src))
    with open(src, "rb") as f:
        return PDDoc(f.read())


def pdDocClose(doc: PDDoc) -> None:
    """pdDocClose (PDDoc.jl:80-88): no temp files to release here —
    payloads are in-memory by design (SURVEY §4.3)."""


def pdDocGetCatalog(doc: PDDoc):
    return doc.catalog


def pdDocGetNamesDict(doc: PDDoc):
    return doc.get_names_dict()


def pdDocGetInfo(doc: PDDoc) -> dict:
    return doc.get_info()


def pdDocGetCosDoc(doc: PDDoc) -> CosDoc:
    return doc.cos


def pdDocGetPage(doc: PDDoc, num: int) -> PDPage:
    return doc.get_page(num)


def pdDocGetPageCount(doc: PDDoc) -> int:
    return doc.page_count()


def pdDocGetPageRange(doc: PDDoc, r) -> list[PDPage]:
    """pdDocGetPageRange (PDDoc.jl:148-162): 1-based inclusive range or
    iterable of page numbers."""
    if isinstance(r, tuple) and len(r) == 2:
        nums = range(r[0], r[1] + 1)
    else:
        nums = r
    return [doc.get_page(n) for n in nums]


def pdDocHasPageLabels(doc: PDDoc) -> bool:
    return doc.cos.get(doc.catalog, Name("PageLabels")) is not None


def pdDocGetPageLabel(doc: PDDoc, pageno: int):
    return get_page_label(doc, pageno)


def pdDocGetOutline(doc: PDDoc) -> list[dict]:
    return get_outline(doc)


def pdDocHasSignature(doc: PDDoc) -> bool:
    return doc.has_signature()


def pdDocValidateSignatures(doc: PDDoc, data: bytes | None = None,
                            export: bool = False,
                            trust=None, crls=None,
                            ocsp=None) -> list[dict]:
    """pdDocValidateSignatures (PDDoc.jl:519-562). The engine needs the
    original bytes for /ByteRange; PDDoc keeps them. `trust` (a
    pd.signature.TrustStore) enables chain-of-trust anchoring — the
    reference's CertStore path (PDSignature.jl:13-48). `export=True`
    attaches each signer's certs (subject/issuer/PEM) to the status —
    the reference writes them to `<pdf>.pem` (PDDoc.jl:548-559); here
    the PEM text rides in the result so a Spark caller can persist it
    to a column/sink instead of an executor-local file. `crls` (r6,
    beyond the reference) passes revocation lists per call — the
    highest-precedence path of validate_signatures' CRL lookup;
    `ocsp` is its pre-fetched-OCSP-response twin (RFC 6960)."""
    return validate_signatures(
        doc, data if data is not None else doc.cos.data, trust=trust,
        export_certs=export, crls=crls, ocsp=ocsp)


def pdPageGetContents(page: PDPage) -> bytes:
    return page.content_bytes()


def pdPageIsEmpty(page: PDPage) -> bool:
    return page.is_empty()


def pdPageGetCosObject(page: PDPage):
    return page.cospage


def pdPageGetContentObjects(page: PDPage):
    return page.content_objects()


def pdPageGetMediaBox(page: PDPage):
    return page.get_media_box()


def pdPageGetCropBox(page: PDPage):
    return page.get_crop_box()


def pdPageGetFonts(page: PDPage) -> dict:
    return page.get_fonts()


def pdPageExtractText(page: PDPage) -> str:
    return page.extract_text()


def pdPageEvalContent(page: PDPage, state=None):
    """pdPageEvalContent (PDPage.jl:143-147): evaluate the page content
    stream into a graphics state (the layout accumulator) and return it
    so callers can run show_text_layout themselves. An existing GState
    may be passed, mirroring the reference's optional `state` arg."""
    if state is None:
        return page.eval_content()
    from .pd.content import eval_content as _eval
    state["source"] = page
    _eval(page.content_objects(), state, page)
    return state


def pdPageGetPageNumber(page: PDPage) -> int:
    return page.pageno


# font flag accessors (PDFonts.jl:532-588 pdFontIs*)
_FLAG_FIXED = 1
_FLAG_ITALIC = 1 << 6
_FLAG_ALLCAP = 1 << 16
_FLAG_SMALLCAP = 1 << 17
_FLAG_FORCEBOLD_SYNTH = 0x80000000


def pdFontIsBold(font: PDFont) -> bool:
    # reference parity (PDFonts.jl:538): ONLY the synthetic bold bit —
    # a ForceBold-only FontDescriptor (spec bit 19) is NOT bold there
    return bool(font.flags & _FLAG_FORCEBOLD_SYNTH)


def pdFontIsItalic(font: PDFont) -> bool:
    return bool(font.flags & _FLAG_ITALIC)


def pdFontIsFixedW(font: PDFont) -> bool:
    return bool(font.flags & _FLAG_FIXED)


def pdFontIsAllCap(font: PDFont) -> bool:
    return bool(font.flags & _FLAG_ALLCAP)


def pdFontIsSmallCap(font: PDFont) -> bool:
    return bool(font.flags & _FLAG_SMALLCAP)


def PDDestination(doc: PDDoc, dest) -> dict | None:
    """PDDestination (PDOutline.jl:32-67): full layout matrix."""
    return pd_destination(doc, dest)


def pdOutlineItemGetAttr(item: dict, attr: str):
    """pdOutlineItemGetAttr (PDOutline.jl): Title/Level/PageNo/Dest."""
    key = {"Title": "title", "Level": "level",
           "PageNo": "page_no", "Dest": "dest"}.get(attr, attr)
    return item.get(key)


# content-object type aliases (PDPageElement.jl exports)
from .pd.content import (Element as PDPageElement,          # noqa: E402
                         Group as PDPageObjectGroup,
                         InlineImage as PDPageInlineImage,
                         MarkedContent as PDPageMarkedContent,
                         TextObject as PDPageTextObject,
                         TextRun as PDPageTextRun)

PDPageObject = PDPageElement  # abstract supertype in the reference


# ---------------------------------------------------------------- Cos

def cosDocOpen(src) -> CosDoc:
    if isinstance(src, (bytes, bytearray, memoryview)):
        return CosDoc(bytes(src))
    with open(src, "rb") as f:
        return CosDoc(f.read())


def cosDocClose(doc: CosDoc) -> None:
    pass


def cosDocGetRoot(doc: CosDoc):
    return doc.get_root()


def cosDocGetObject(doc: CosDoc, obj, key=None):
    """cosDocGetObject (CosDoc.jl:274-309): resolve a ref, or fetch+
    resolve `key` from a container."""
    if key is not None:
        return doc.get(obj, key if isinstance(key, Name) else Name(key))
    return doc.get_object(obj)


def cosDocIsEncrypted(doc: CosDoc) -> bool:
    return doc.is_encrypted()


def cosDocGetID(doc: CosDoc):
    """cosDocGetID (CosDoc.jl:270): trailer /ID, dereferenced."""
    return doc.get_id()


def cosDocGetInfo(doc: CosDoc):
    """cosDocGetInfo (CosDoc.jl:267): trailer /Info, dereferenced."""
    return doc.get_info()


class _CosDocView:
    """Adapter giving a bare CosDoc + catalog the (doc.cos, doc.catalog,
    doc.page_count()) surface the pd.navigation label helpers expect —
    so the cosDoc-level label API (CosDoc.jl:628-686) shares one
    implementation with the PD-level one."""
    __slots__ = ("cos", "catalog")

    def __init__(self, cos: CosDoc, catalog):
        self.cos = cos
        self.catalog = cos.get_object(catalog)

    def page_count(self) -> int:
        pages = self.cos.get(self.catalog, Name("Pages"))
        cnt = self.cos.get(pages, Name("Count")) if pages else None
        return int(cnt) if cnt is not None else 0


def cosDocGetPageLabel(doc: CosDoc, catalog, num: int):
    """cosDocGetPageLabel (CosDoc.jl:680-686): 1-based page number ->
    label string from the /PageLabels number tree."""
    return get_page_label(_CosDocView(doc, catalog), num)


def cosDocGetPageNumbers(doc: CosDoc, catalog, label: str) -> range | None:
    """cosDocGetPageNumbers (CosDoc.jl:628-642): label -> the 1-based
    range of page numbers carrying it (PDF allows one label on many
    pages). Returns a Python range, the reference's Range{Int}."""
    hit = find_page_for_label(_CosDocView(doc, catalog), label)
    if hit is None:
        return None
    first, n = hit
    return range(first, first + n)


def merge_streams(doc: CosDoc, stms) -> bytes:
    """merge_streams (CosDoc.jl:688-708): concatenate the decoded
    payloads of a /Contents array. The reference spools to a temp file;
    payloads here are in-memory by documented design (SURVEY §4.3), so
    the merged bytes are returned directly."""
    return doc.merge_streams(stms)


def find_ntree(doc: CosDoc, root, key):
    """find_ntree (CosDoc.jl:616-626 usage): generic name/number-tree
    lookup. An int key searches the /Nums tree (exact match); a str key
    searches the /Names tree."""
    from .pd.navigation import _collect_number_tree, _find_name_tree
    root = doc.get_object(root)
    if isinstance(key, int):
        pairs: list = []
        _collect_number_tree(doc, root, pairs)
        for k, v in pairs:
            if k == key:
                return doc.get_object(v)
        return None
    return _find_name_tree(doc, root, key)


def readfrom(doc: CosDoc, frm: int, nbytes: int) -> bytes:
    """readfrom (CosDoc.jl:80-86): raw byte-range read from the
    document — the /ByteRange primitive signature validation uses."""
    return doc.data[frm:frm + nbytes]


# ---- COS type aliases (PDFIO.jl export block; SURVEY §1.1 maps the
# parse-tree value domain onto native Python types, so the reference's
# type names alias the natives a parse actually produces) ----

import numpy as _np                                        # noqa: E402

CosObject = object                 # abstract supertype
CosDict = dict
CosArray = list
CosString = bytes                  # LitStr / HexStr are bytes subclasses
CosLiteralString = LitStr
CosStream = Stream
CosIndirectObjectRef = Ref
CosBoolean = bool
CosTrue = True
CosFalse = False
CosInt = int
CosFloat = _np.float32             # PDF reals parse as float32 (CLAUDE.md)
CosNumeric = (int, float, _np.integer, _np.floating)  # isinstance tuple
CosName = Name

#: outline results are plain dicts (list of them = the outline) — the
#: reference's PDOutline/PDOutlineItem structs map onto them
PDOutline = list
PDOutlineItem = dict


def set_(d: dict, key, value):
    """set!(dict, key, value) (CosObject.jl): Julia's bang function —
    spelled set_ here ('!' is not a Python identifier character; the
    facade-parity test maps the name). Returns the dict, like the
    reference."""
    d[key if isinstance(key, Name) else Name(key)] = value
    return d


class PDPage_BeginGroup:
    """Transient begin-of-group token (PDPageElement.jl:289-294). This
    engine's interpreter collapses groups directly into
    PDPageObjectGroup during parsing, so these tokens are never
    emitted — the type exists so ported pattern-matching code loads."""
    __slots__ = ("elem", "objT")

    def __init__(self, elem=None, objT=None):
        self.elem = elem
        self.objT = objT


class PDPage_EndGroup:
    """Transient end-of-group token (PDPageElement.jl:296-303) — see
    PDPage_BeginGroup."""
    __slots__ = ("elem",)

    def __init__(self, elem=None):
        self.elem = elem


class CosTreeNode:
    """Name/number-tree node (CosObject.jl:476-484): values (leaf
    pairs), kids (child refs), range (/Limits) — lazily walkable
    without loading the full tree."""
    __slots__ = ("values", "kids", "range")

    def __init__(self):
        self.values = None
        self.kids = None
        self.range = None


def createTreeNode(kind, dct, doc: CosDoc | None = None) -> CosTreeNode:
    """createTreeNode(K, dict) (CosObject.jl:486-499): build one tree
    node from a /Names- or /Nums-bearing dict; kind is int (number
    tree) or str (name tree). Pass `doc` to resolve an indirect node
    dict. Use find_ntree for whole-tree lookups."""
    if doc is not None:
        dct = doc.get_object(dct)
    node = CosTreeNode()
    limits = dct.get(Name("Limits"))
    if isinstance(limits, list) and len(limits) == 2:
        node.range = (limits[0], limits[1])
    kids = dct.get(Name("Kids"))
    if isinstance(kids, list):
        node.kids = list(kids)
    leaf_key = Name("Nums") if kind is int else Name("Names")
    pairs = dct.get(leaf_key)
    if isinstance(pairs, list):
        node.values = [(pairs[i], pairs[i + 1])
                       for i in range(0, len(pairs) - 1, 2)]
    return node
