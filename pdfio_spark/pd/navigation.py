"""Navigation plane: name/number trees, page labels, outlines.

Mirrors the reference's tree queries and metadata operators:
 - lazy number/name-tree lookup with Limits range pruning
   (createTreeNode /root/reference/src/CosObject.jl:486-518,
   find_ntree /root/reference/src/CosDoc.jl:521-543);
 - page labels with D/R/r/A/a styles, prefix and start
   (find_label_for_pageno, CosDoc.jl:648-686);
 - outline walk over First/Next sibling chains
   (PDOutline.jl:90-123,241-260).
"""
from __future__ import annotations

from ..cos.objects import Name

__all__ = ["get_page_label", "get_page_labels", "get_outline",
           "to_roman", "to_alpha"]

_ROMAN = [(1000, "m"), (900, "cm"), (500, "d"), (400, "cd"),
          (100, "c"), (90, "xc"), (50, "l"), (40, "xl"),
          (10, "x"), (9, "ix"), (5, "v"), (4, "iv"), (1, "i")]


def to_roman(n: int, lower: bool = True) -> str:
    out = []
    for v, s in _ROMAN:
        while n >= v:
            out.append(s)
            n -= v
    r = "".join(out)
    return r if lower else r.upper()


def to_alpha(n: int, lower: bool = True) -> str:
    """AlphaNumeral style: A..Z, AA..ZZ, AAA... (1-based). n < 1
    (corrupt /St) yields '' deliberately — negative divmod used to
    produce a WRONG label ('z' for 0 via wraparound) silently."""
    if n < 1:
        return ""
    q, r = divmod(n - 1, 26)
    ch = chr(ord("a") + r)
    s = ch * (q + 1)
    return s if lower else s.upper()


def _collect_number_tree(doc, node, out: list, depth: int = 0) -> None:
    """Flatten a number tree's (key, value) pairs in key order —
    equivalent to the reference's lazy walk for the doc sizes we see
    per row (trees are tiny; pruning buys nothing inside a UDF)."""
    if node is None or depth > 32:
        return
    nums = doc.get(node, Name("Nums"))
    if isinstance(nums, list):
        for i in range(0, len(nums) - 1, 2):
            key = doc.get_object(nums[i])
            out.append((int(key), nums[i + 1]))
    kids = doc.get(node, Name("Kids"))
    if isinstance(kids, list):
        for kid in kids:
            _collect_number_tree(doc, doc.get_object(kid), out, depth + 1)


def _format_label(doc, pl_dict, num: int) -> str:
    # /St is already folded into `num` by the caller (get_page_label)
    s = doc.get(pl_dict, Name("S"))
    p = doc.get(pl_dict, Name("P"))
    pfx = ""
    if p is not None and isinstance(p, (bytes,)):
        from .fonts import pdf_doc_decode
        pfx = pdf_doc_decode(p)
    elif isinstance(p, str) and not isinstance(p, Name):
        pfx = p
    if s is None:
        return pfx
    n = num
    if s == Name("D"):
        return f"{pfx}{n}"
    if s == Name("R"):
        return pfx + to_roman(n, lower=False)
    if s == Name("r"):
        return pfx + to_roman(n, lower=True)
    if s == Name("A"):
        return pfx + to_alpha(n, lower=False)
    if s == Name("a"):
        return pfx + to_alpha(n, lower=True)
    raise ValueError(f"invalid page label style {s}")


def get_page_label(doc, pageno: int) -> str | None:
    """1-based pageno -> label (find_label_for_pageno semantics)."""
    ref = doc.cos.get(doc.catalog, Name("PageLabels"))
    if ref is None:
        return None
    pairs: list = []
    _collect_number_tree(doc.cos, ref, pairs)
    pairs.sort(key=lambda kv: kv[0])
    key = pageno - 1
    # last entry with start <= key
    chosen = None
    for start_page, obj in pairs:
        if start_page <= key:
            chosen = (start_page, obj)
        else:
            break
    if chosen is None:
        return None
    start_page, obj = chosen
    pl = doc.cos.get_object(obj)
    st = doc.cos.get(pl, Name("St"))
    start = int(st) if st is not None else 1
    return _format_label(doc.cos, pl, key - start_page + start)


def get_page_labels(doc) -> list[str | None]:
    return [get_page_label(doc, i + 1) for i in range(doc.page_count())]


def from_roman(s: str) -> int | None:
    vals = {"i": 1, "v": 5, "x": 10, "l": 50, "c": 100, "d": 500, "m": 1000}
    s = s.lower()
    if not s or any(c not in vals for c in s):
        return None
    total = 0
    for i, c in enumerate(s):
        v = vals[c]
        if i + 1 < len(s) and vals[s[i + 1]] > v:
            total -= v
        else:
            total += v
    return total


def from_alpha(s: str) -> int | None:
    if not s:
        return None
    sl = s.lower()
    c = sl[0]
    if not ("a" <= c <= "z") or any(ch != c for ch in sl):
        return None
    return (len(sl) - 1) * 26 + (ord(c) - ord("a") + 1)


def find_page_for_label(doc, label: str) -> tuple[int, int] | None:
    """Inverse lookup: label -> (first_page, n_pages), 1-based
    (find_page_for_label, /root/reference/src/CosDoc.jl:553-615).
    PDF allows the same label on multiple pages, hence a range."""
    ref = doc.cos.get(doc.catalog, Name("PageLabels"))
    if ref is None:
        return None
    pairs: list = []
    _collect_number_tree(doc.cos, ref, pairs)
    pairs.sort(key=lambda kv: kv[0])
    n_pages = doc.page_count()
    for idx, (seg_start, obj) in enumerate(pairs):
        seg_end = (pairs[idx + 1][0] if idx + 1 < len(pairs)
                   else n_pages) - 1
        pl = doc.cos.get_object(obj)
        s = doc.cos.get(pl, Name("S"))
        p = doc.cos.get(pl, Name("P"))
        st = doc.cos.get(pl, Name("St"))
        start = int(st) if st is not None else 1
        pfx = ""
        if isinstance(p, bytes):
            from .fonts import pdf_doc_decode
            pfx = pdf_doc_decode(p)
        if s is None:
            if label == pfx:
                return (seg_start + 1, seg_end - seg_start + 1)
            continue
        if pfx and not label.startswith(pfx):
            continue
        body = label[len(pfx):]
        n = None
        if s == Name("D"):
            n = int(body) if body.isdigit() else None
        elif s in (Name("R"), Name("r")):
            n = from_roman(body)
        elif s in (Name("A"), Name("a")):
            n = from_alpha(body)
        if n is None or n < start:
            continue
        page = seg_start + 1 + (n - start)
        if page <= seg_end + 1:
            return (page, 1)
    return None


def _find_name_tree(doc, node, key: str, depth: int = 0):
    """String-key name-tree search with Limits pruning — find_ntree
    (/root/reference/src/CosDoc.jl:521-543) over /Names nodes."""
    if node is None or depth > 32:
        return None
    limits = doc.get(node, Name("Limits"))
    if isinstance(limits, list) and len(limits) == 2:
        from .fonts import pdf_doc_decode
        lo = pdf_doc_decode(limits[0]) if isinstance(limits[0], bytes) \
            else str(limits[0])
        hi = pdf_doc_decode(limits[1]) if isinstance(limits[1], bytes) \
            else str(limits[1])
        if key < lo or key > hi:
            return None
    names = doc.get(node, Name("Names"))
    if isinstance(names, list):
        from .fonts import pdf_doc_decode
        for i in range(0, len(names) - 1, 2):
            k = names[i]
            ks = pdf_doc_decode(k) if isinstance(k, bytes) else str(k)
            if ks == key:
                return doc.get_object(names[i + 1])
    kids = doc.get(node, Name("Kids"))
    if isinstance(kids, list):
        for kid in kids:
            hit = _find_name_tree(doc, doc.get_object(kid), key, depth + 1)
            if hit is not None:
                return hit
    return None


def _walk_name_tree(doc, node, depth: int = 0):
    """Enumerate (name, value) pairs of a /Names tree in order —
    tree-node walk per the reference's CosTreeNode population
    (CosDoc.jl:545-580), depth-capped like find."""
    if node is None or depth > 32:
        return
    names = doc.get(node, Name("Names"))
    if isinstance(names, list):
        from .fonts import pdf_doc_decode
        for i in range(0, len(names) - 1, 2):
            k = names[i]
            ks = pdf_doc_decode(k) if isinstance(k, bytes) else str(k)
            yield ks, names[i + 1]
    kids = doc.get(node, Name("Kids"))
    if isinstance(kids, list):
        for kid in kids:
            yield from _walk_name_tree(doc, doc.get_object(kid), depth + 1)


def get_attachments(doc) -> list[dict]:
    """Embedded files via /Names/EmbeddedFiles: filespec /EF /F stream
    per ISO 32000 7.11.4 (the reference stops at surfacing the names
    dict, test/runtests.jl:815; extraction is the pipeline-side
    extension a crawl needs). Streams decode/decrypt through the normal
    stream path, so Crypt-filter attachments follow stmf."""
    from ..cos.objects import Stream
    cos = doc.cos
    names = doc.get_names_dict()
    if names is None:
        return []
    ef_root = cos.get(names, Name("EmbeddedFiles"))
    if ef_root is None:
        return []
    out = []
    for name, spec in _walk_name_tree(cos, cos.get_object(ef_root)):
        spec = cos.get_object(spec)
        if not isinstance(spec, dict):
            continue
        ef = cos.get(spec, Name("EF"))
        stream = cos.get(ef, Name("F")) if ef is not None else None
        if isinstance(stream, Stream):
            try:
                data = stream.decoded(cos)
            except Exception:
                data = None
            out.append({"name": name, "data": data,
                        "n_bytes": len(data) if data is not None else -1})
    return out


def _lookup_named_dest(doc, key: str):
    """Named-destination lookup with the reference's precedence
    (PDOutline.jl:159-230): the PDF-1.1 catalog /Dests DICTIONARY
    first, then the /Names/Dests name tree (r4 — the dict form used to
    be skipped entirely). <</D [...]>> wrappers are unwrapped."""
    cos = doc.cos
    d = None
    dests_dict = cos.get(doc.catalog, Name("Dests"))
    if isinstance(dests_dict, dict):
        d = cos.get(dests_dict, Name(key))
    if d is None:
        names = cos.get(doc.catalog, Name("Names"))
        if names is not None:
            d = _find_name_tree(cos, cos.get(names, Name("Dests")), key)
    if isinstance(d, dict):  # <</D [...]>> form
        d = cos.get(d, Name("D"))
    return d


def _resolve_dest_page(doc, dest) -> int | None:
    """PDDestination resolution (PDOutline.jl:32-67,159-230): direct
    [page /Fit...] arrays, or named destinations through the catalog
    /Dests dict or /Names/Dests name tree; 1-based page number."""
    from ..cos.objects import LitStr, HexStr
    cos = doc.cos
    if isinstance(dest, (LitStr, HexStr, bytes)) or (
            isinstance(dest, Name)):
        from .fonts import pdf_doc_decode
        key = str(dest) if isinstance(dest, Name) else pdf_doc_decode(dest)
        dest = _lookup_named_dest(doc, key)
    if isinstance(dest, list) and dest:
        return doc.pageno_of(cos.get_object(dest[0]))
    return None


#: destination layouts and which [left,bottom,right,top] slots they fill
#: (PDOutline.jl:41-67; spec 32000-1 table 151). NOTE: the reference
#: reads FitV's left from v[4] (PDOutline.jl:53) — an off-by-one that
#: throws on a spec-shaped 3-element array; we read v[3] per spec.
_DEST_LAYOUTS = ("XYZ", "Fit", "FitH", "FitV", "FitR", "FitB",
                 "FitBH", "FitBV")


def pd_destination(doc, dest) -> dict | None:
    """Full PDDestination (PDOutline.jl:32-67): resolves named dests,
    returns {page_no, layout, left, bottom, right, top, zoom} with the
    reference's defaulting (unused slots 0.0)."""
    from ..cos.objects import LitStr, HexStr
    cos = doc.cos
    if isinstance(dest, (LitStr, HexStr, bytes, Name)):
        from .fonts import pdf_doc_decode
        key = str(dest) if isinstance(dest, Name) else pdf_doc_decode(dest)
        dest = _lookup_named_dest(doc, key)
    if not isinstance(dest, list) or not dest:
        return None
    page_obj = cos.get_object(dest[0])
    page_no = doc.pageno_of(page_obj)
    v = [cos.get_object(x) for x in dest]
    layout = str(v[1]) if len(v) > 1 and isinstance(v[1], Name) else "Fit"
    if layout not in _DEST_LAYOUTS:
        # unknown layout name (corrupt doc): normalize to Fit (all-zero
        # slots) rather than emit a made-up layout string downstream
        layout = "Fit"

    def num(i: int) -> float:
        import numpy as np
        if i < len(v) and isinstance(v[i], (int, float, np.integer,
                                            np.floating)) \
                and not isinstance(v[i], bool):
            return float(v[i])
        return 0.0

    left = bottom = right = top = zoom = 0.0
    if layout == "XYZ":
        left, top, zoom = num(2), num(3), num(4)
    elif layout in ("FitH", "FitBH"):
        top = num(2)
    elif layout in ("FitV", "FitBV"):
        left = num(2)
    elif layout == "FitR":
        left, bottom, right, top = num(2), num(3), num(4), num(5)
    # Fit / FitB: no values
    return {"page_no": page_no, "layout": layout, "left": left,
            "bottom": bottom, "right": right, "top": top, "zoom": zoom}


def get_outline(doc, max_items: int = 1000) -> list[dict]:
    """Flattened outline: [{title, level, page_no}] via First/Next walk
    with visited-set (the reference validates the doubly-linked chain;
    corrupt chains here just truncate). Destinations resolved from
    /Dest arrays or named destinations (GoTo /A actions likewise)."""
    from .fonts import pdf_doc_decode
    root = doc.cos.get(doc.catalog, Name("Outlines"))
    if root is None:
        return []
    out: list[dict] = []
    seen: set[int] = set()

    def dest_of(item):
        dest = doc.cos.get(item, Name("Dest"))
        if dest is None:
            act = doc.cos.get(item, Name("A"))
            if isinstance(act, dict) and \
                    doc.cos.get(act, Name("S")) == Name("GoTo"):
                dest = doc.cos.get(act, Name("D"))
        if dest is None:
            return None
        try:
            return pd_destination(doc, dest)
        except Exception:
            return None

    def walk(item, level: int) -> None:
        while item is not None and len(out) < max_items:
            if id(item) in seen:
                return
            seen.add(id(item))
            title = doc.cos.get(item, Name("Title"))
            if isinstance(title, bytes):
                d = dest_of(item)
                out.append({"title": pdf_doc_decode(title), "level": level,
                            "page_no": d["page_no"] if d else None,
                            "dest": d})
            first = doc.cos.get(item, Name("First"))
            if first is not None and level < 64:
                # depth cap: a corrupt /First chain of fresh dicts
                # would otherwise recurse past the interpreter limit
                # (RecursionError) instead of truncating (r4)
                walk(first, level + 1)
            item = doc.cos.get(item, Name("Next"))

    first = doc.cos.get(root, Name("First"))
    walk(first, 0)
    return out
