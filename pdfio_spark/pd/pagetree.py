"""PD document semantics: catalog, page tree, resources, XObjects.

Mirrors PDDocImpl / PDPageImpl (/root/reference/src/PDDocImpl.jl,
PDPage.jl, PDXObject.jl) with an added cycle guard on the page-tree DFS
and Parent chains (the reference has none — corrupt web PDFs can cycle).
"""
from __future__ import annotations

import numpy as np

from ..cos.doc import CosDoc
from ..cos.lexer import Buf
from ..cos.objects import Name, Stream, f32
from .content import Group, eval_content, load_objects, new_state
from .fonts import PDFont
from .layout import show_text_layout

__all__ = ["PDDoc", "PDPage"]

_MAX_DEPTH = 64


class PDDoc:
    """Per-document handle: catalog + pageno<->ref maps + font cache."""

    def __init__(self, data: bytes):
        self.cos = CosDoc(data)
        self.catalog = self.cos.get_root()
        if not isinstance(self.catalog, dict):
            raise ValueError("invalid catalog")
        self.pagerefs: list = []     # DFS order (pagen2r)
        self._pageno_by_id: dict | None = None  # lazy id(ref)->pageno
        self.fonts: dict = {}        # id(cosfont) -> PDFont
        self.xobjs: dict = {}
        self.is_tagged = "none"
        self._update_page_tree()
        self._update_structure_tree()

    # ---- page tree DFS (PDDocImpl.jl:50-78) with cycle guard ----
    def _update_page_tree(self) -> None:
        pages = self.cos.get(self.catalog, Name("Pages"))
        seen: set[int] = set()

        def walk(node, depth: int) -> None:
            if node is None or depth > _MAX_DEPTH or id(node) in seen:
                return
            seen.add(id(node))
            typ = self.cos.get(node, Name("Type"))
            if typ == Name("Pages"):
                kids = self.cos.get(node, Name("Kids"))
                if isinstance(kids, list):
                    for ref in kids:
                        obj = self.cos.get_object(ref)
                        if isinstance(obj, dict):
                            # splice parent for inheritance walks
                            obj.setdefault(Name("Parent"), node)
                            walk(obj, depth + 1)
            else:
                self.pagerefs.append(node)

        walk(pages, 0)

    def _update_structure_tree(self) -> None:
        """isTagged flag (PDDocImpl.jl:94-107)."""
        marking = self.cos.get(self.catalog, Name("MarkInfo"))
        if marking is not None:
            tagged = self.cos.get(marking, Name("Marked"))
            suspect = self.cos.get(marking, Name("Suspect"))
            self.is_tagged = ("suspect" if suspect is True else
                              "tagged" if tagged is True else "none")

    def pageno_of(self, page_obj) -> int | None:
        """1-based page number of a resolved page dict, O(1) after the
        first call — destination resolution used to linearly scan
        pagerefs per outline item, O(items x pages) on exactly the
        page-heavy outliers the pipeline shards for (r5 core
        review)."""
        if self._pageno_by_id is None:
            self._pageno_by_id = {id(p): i + 1
                                  for i, p in enumerate(self.pagerefs)}
        return self._pageno_by_id.get(id(page_obj))

    def page_count(self) -> int:
        return len(self.pagerefs)

    def get_page(self, num: int) -> "PDPage":
        """1-based like the reference; num < 1 raises instead of
        silently wrapping to the tail via Python negative indexing
        (get_page(0) used to return the LAST page — r4 review fix)."""
        if num < 1:
            raise IndexError(f"page number {num} out of range (1-based)")
        return PDPage(self, self.pagerefs[num - 1], num)

    def get_info(self) -> dict:
        """pdDocGetInfo (PDDoc.jl:302-317) -> plain dict of str values."""
        info = self.cos.get_info()
        out = {}
        if isinstance(info, dict):
            from .fonts import pdf_doc_decode
            for k, v in info.items():
                v = self.cos.get_object(v)
                if isinstance(v, (bytes,)):
                    try:
                        out[str(k)] = pdf_doc_decode(v)
                    except Exception:
                        pass
                elif isinstance(v, Name):
                    out[str(k)] = str(v)
        return out

    def get_names_dict(self):
        """pdDocGetNamesDict (/root/reference/src/PDDoc.jl:345-346)."""
        return self.cos.get(self.catalog, Name("Names"))

    def get_structure_tree(self) -> dict | None:
        """StructTreeRoot reader (PDDocStruct.jl:24-40): returns
        {k, role_map, class_map, parent_tree_next} or None if the doc
        has no /StructTreeRoot."""
        root = self.cos.get(self.catalog, Name("StructTreeRoot"))
        if root is None:
            return None
        ptn = self.cos.get(root, Name("ParentTreeNextKey"))
        return {
            "k": self.cos.get(root, Name("K")),
            "role_map": self.cos.get(root, Name("RoleMap")) or {},
            "class_map": self.cos.get(root, Name("ClassMap")) or {},
            "parent_tree_next": int(ptn) if ptn is not None else -1,
        }

    def walk_structure(self, max_elems: int = 100000):
        """Depth-first StructElem walk (PDDocStruct.jl:43-65 fields:
        S/ID/R/T/Lang/Alt/E/ActualText). Yields one dict per element
        with the raw role and the RoleMap-resolved standard role."""
        from .fonts import pdf_doc_decode
        tree = self.get_structure_tree()
        if tree is None:
            return
        role_map = tree["role_map"]

        def txt(elem, key):
            v = self.cos.get(elem, Name(key))
            if isinstance(v, bytes):
                try:
                    return pdf_doc_decode(v)
                except Exception:
                    return ""
            return str(v) if v is not None else ""

        n = 0
        stack = [(k, 0) for k in reversed(self._as_list(tree["k"]))]
        while stack and n < max_elems:
            node, depth = stack.pop()
            elem = self.cos.get_object(node)
            if not isinstance(elem, dict):
                continue  # marked-content ids (ints) / MCR dicts: leaf
            # /S (and the RoleMap value) may be indirect — resolve like
            # every other field here (r4 review fix; a Ref used to
            # stringify into its repr)
            s = self.cos.get(elem, Name("S"))
            if s is None:
                continue
            role = str(s)
            mapped = role_map.get(Name(role)) if isinstance(role_map, dict) \
                else None
            mapped = self.cos.get_object(mapped)
            r = self.cos.get(elem, Name("R"))
            yield {
                "role": role,
                "mapped_role": str(mapped) if mapped is not None else role,
                "depth": depth,
                "title": txt(elem, "T"),
                "lang": txt(elem, "Lang"),
                "alt": txt(elem, "Alt"),
                "expansion": txt(elem, "E"),
                "actual_text": txt(elem, "ActualText"),
                "revision": int(r) if r is not None else 0,
            }
            n += 1
            kids = self.cos.get(elem, Name("K"))
            for kid in reversed(self._as_list(kids)):
                if not isinstance(kid, (int, float)):
                    stack.append((kid, depth + 1))

    @staticmethod
    def _as_list(v) -> list:
        if v is None:
            return []
        return v if isinstance(v, list) else [v]

    def has_signature(self) -> bool:
        """pdDocHasSignature: AcroForm field walk detecting /FT /Sig
        (/root/reference/src/PDDocImpl.jl:141-153). Detection only —
        cryptographic validation is out of scope v1."""
        acro = self.cos.get(self.catalog, Name("AcroForm"))
        if acro is None:
            return False
        fields = self.cos.get(acro, Name("Fields"))
        seen: set[int] = set()

        def walk(flds, depth: int) -> bool:
            if not isinstance(flds, list) or depth > 16:
                return False
            for fobj in flds:
                fld = self.cos.get_object(fobj)
                if not isinstance(fld, dict) or id(fld) in seen:
                    continue
                seen.add(id(fld))
                if self.cos.get(fld, Name("FT")) == Name("Sig"):
                    return True
                kids = self.cos.get(fld, Name("Kids"))
                if kids is not None and walk(kids, depth + 1):
                    return True
            return False

        return walk(fields, 0)

    def get_pd_font(self, cosfont) -> PDFont | None:
        if cosfont is None:
            return None
        key = id(cosfont)
        font = self.fonts.get(key)
        if font is None:
            from .fonts import get_pdfont_cached
            font = get_pdfont_cached(self.cos, cosfont)
            self.fonts[key] = font
        return font

    def get_pd_xobject(self, cosxobj):
        if not isinstance(cosxobj, Stream):
            return None
        key = id(cosxobj)
        xobj = self.xobjs.get(key)
        if xobj is None:
            subtype = cosxobj.dict.get(Name("Subtype"))
            if subtype == Name("Form"):
                xobj = FormXObject(self, cosxobj)
            else:
                xobj = _NullXObject()
            self.xobjs[key] = xobj
        return xobj


class _NullXObject:
    def do(self, state) -> None:
        return None


class FormXObject:
    """(PDXObject.jl:1-94): recursive interpret with Matrix*CTM and
    shared text_layout / h_profile."""

    def __init__(self, doc: PDDoc, cosxobj: Stream):
        self.doc = doc
        self.cosxobj = cosxobj
        mat = doc.cos.get(cosxobj.dict, Name("Matrix"))
        if isinstance(mat, list) and len(mat) == 6:
            a, b, c, d, e, fv = (f32(x) for x in mat)
            self.matrix = np.array([[a, b, 0.0], [c, d, 0.0], [e, fv, 1.0]],
                                   dtype=np.float32)
        else:
            self.matrix = np.identity(3, dtype=np.float32)
        self.fonts: dict = {}
        self.xobjs: dict = {}
        self.content: Group | None = None
        self._depth = 0

    def _find_resource(self, restype: Name, resname: Name):
        cos = self.doc.cos
        resources = cos.get(self.cosxobj.dict, Name("Resources"))
        if resources is None:
            return None
        ress = cos.get(resources, restype)
        if ress is None:
            return None
        return cos.get(ress, resname)

    def get_font(self, fontname: Name):
        font = self.fonts.get(fontname)
        if font is None:
            font = self.doc.get_pd_font(
                self._find_resource(Name("Font"), fontname))
            self.fonts[fontname] = font
        return font

    def get_xobject(self, xobjname: Name):
        xobj = self.xobjs.get(xobjname)
        if xobj is None:
            xobj = self.doc.get_pd_xobject(
                self._find_resource(Name("XObject"), xobjname))
            self.xobjs[xobjname] = xobj
        return xobj

    def do(self, state) -> None:
        if self._depth > 8:  # cycle guard (absent in reference)
            return
        if self.content is None:
            self.content = Group()
            data = self.cosxobj.decoded(self.doc.cos)
            load_objects(self.content, Buf(data))
        if not self.content.objs:
            return
        self._depth += 1
        try:
            # fresh state sharing layout+histogram (PDXObject.jl:82-94)
            from .content import GState
            xstate = GState()
            xstate["CTM"] = self.matrix @ state["CTM"]
            xstate["text_layout"] = state["text_layout"]
            xstate["h_profile"] = state["h_profile"]
            eval_content(self.content, xstate, self)
        finally:
            self._depth -= 1


class PDPage:
    """Page handle: contents, resources with Parent-chain inheritance."""

    def __init__(self, doc: PDDoc, cospage: dict, pageno: int):
        self.doc = doc
        self.cospage = cospage
        self.pageno = pageno
        self.fonts: dict = {}
        self.xobjs: dict = {}
        self._content: Group | None = None

    def is_empty(self) -> bool:
        return self.cospage.get(Name("Contents")) is None

    def content_bytes(self) -> bytes:
        """Resolve /Contents (stream | array of streams) and decode
        (PDPage.jl:228-272)."""
        cos = self.doc.cos
        contents = cos.get(self.cospage, Name("Contents"))
        if contents is None:
            return b""
        if isinstance(contents, list):
            return cos.merge_streams(contents)
        if isinstance(contents, Stream):
            return contents.decoded(cos)
        return b""

    def content_objects(self) -> Group:
        if self._content is None:
            self._content = Group()
            load_objects(self._content, Buf(self.content_bytes()))
        return self._content

    def _find_resource(self, restype: Name, resname: Name):
        """Walk the /Parent chain (PDPage.jl:274-311) with cycle guard."""
        cos = self.doc.cos
        pgnode = self.cospage
        depth = 0
        while pgnode is not None and depth < _MAX_DEPTH:
            resources = cos.get(pgnode, Name("Resources"))
            if resources is not None:
                ress = cos.get(resources, restype)
                if ress is not None:
                    res = cos.get(ress, resname)
                    if res is not None:
                        return res
            pgnode = cos.get(pgnode, Name("Parent"))
            depth += 1
        return None

    def get_media_box(self) -> tuple | None:
        """pdPageGetMediaBox (PDPage.jl:76-79): inheritable, floats."""
        box = self.find_attribute(Name("MediaBox"))
        if isinstance(box, list) and len(box) == 4:
            return tuple(float(v) for v in box)
        return None

    def get_crop_box(self) -> tuple | None:
        """pdPageGetCropBox (PDPage.jl:81-84): defaults to MediaBox."""
        box = self.find_attribute(Name("CropBox"))
        if isinstance(box, list) and len(box) == 4:
            return tuple(float(v) for v in box)
        return self.get_media_box()

    def get_fonts(self) -> dict:
        """pdPageGetFonts (PDPage.jl:134-141): ALL fonts visible to the
        page, merging /Resources/Font dicts up the Parent chain."""
        cos = self.doc.cos
        merged: dict = {}
        pgnode = self.cospage
        depth = 0
        while pgnode is not None and depth < _MAX_DEPTH:
            resources = cos.get(pgnode, Name("Resources"))
            if resources is not None:
                fonts = cos.get(resources, Name("Font"))
                if isinstance(fonts, dict):
                    for k, v in fonts.items():
                        merged.setdefault(k, v)
            pgnode = cos.get(pgnode, Name("Parent"))
            depth += 1
        return {Name(str(k)): self.doc.get_pd_font(cos.get_object(v))
                for k, v in merged.items()}

    def find_attribute(self, resname: Name):
        """Inheritable attribute up the parent chain (PDPage.jl:322-333)."""
        cos = self.doc.cos
        pgnode = self.cospage
        depth = 0
        while pgnode is not None and depth < _MAX_DEPTH:
            res = cos.get(pgnode, resname)
            if res is not None:
                return res
            pgnode = cos.get(pgnode, Name("Parent"))
            depth += 1
        return None

    def get_font(self, fontname: Name):
        font = self.fonts.get(fontname)
        if font is None:
            font = self.doc.get_pd_font(
                self._find_resource(Name("Font"), fontname))
            self.fonts[fontname] = font
        return font

    def get_xobject(self, xobjname: Name):
        xobj = self.xobjs.get(xobjname)
        if xobj is None:
            xobj = self.doc.get_pd_xobject(
                self._find_resource(Name("XObject"), xobjname))
            self.xobjs[xobjname] = xobj
        return xobj

    def eval_content(self):
        state = new_state()
        eval_content(self.content_objects(), state, self)
        return state

    def extract_text(self) -> str:
        """pdPageExtractText (PDPage.jl:177-181)."""
        return show_text_layout(self.eval_content())
