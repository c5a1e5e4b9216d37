"""COS writer: re-serialize a parsed document back to PDF bytes —
optionally encrypted (RC4-128 / AES-128 / AES-256) and/or repacked
into object streams + a cross-reference stream.

Beyond-reference surface (PDFIO.jl is read-only). The motivating use
is generality testing: the sandbox ships only two real third-party
PDFs and no PDF producers, so encrypted / ObjStm-packed variants of
GENUINELY FOREIGN files (pdfTeX object graphs, subset Type1 fonts,
real content streams) are derived by round-tripping them through this
writer — the parse stack then has to handle foreign structure under
every packaging x encryption combination, not just our fixtures'.

Serialization notes:
  - strings are written as hex strings (escape-free, value-identical);
  - stream payloads are written raw (filters preserved, /Length made
    direct);
  - encryption covers strings + streams per ISO 32000 7.6.2; strings
    inside object streams are NOT individually encrypted (the packed
    stream is, 7.5.7);
  - cross-reference streams are never encrypted.
"""
from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

from .doc import CosDoc, PDFError
from .lexer import ParseError
from .objects import HexStr, LitStr, Name, ObjStm, Ref, Stream

__all__ = ["append_update", "rewrite_pdf", "serialize_object"]


def _name_bytes(n: str) -> bytes:
    out = bytearray(b"/")
    for b in n.encode("latin-1"):
        if b <= 0x20 or b > 0x7E or b in b"#()<>[]{}/%":
            out += f"#{b:02X}".encode()
        else:
            out.append(b)
    return bytes(out)


def _fmt_real(v) -> bytes:
    # shortest repr that round-trips through the lexer's np.float32
    s = np.format_float_positional(np.float32(v), unique=True, trim="-")
    return s.encode()


class _NoEncrypt:
    def encrypt(self, num: int, gen: int, data: bytes) -> bytes:
        return data


def serialize_object(v, enc=None, num: int = 0, gen: int = 0) -> bytes:
    """One COS value -> bytes. `enc` (an object with
    encrypt(num, gen, data)) is applied to strings and stream payloads
    of the enclosing indirect object (num, gen)."""
    enc = enc or _NoEncrypt()

    def ser(v) -> bytes:
        if v is None:
            return b"null"
        if v is True:
            return b"true"
        if v is False:
            return b"false"
        if isinstance(v, Ref):
            return f"{v.num} {v.gen} R".encode()
        if isinstance(v, Name):
            return _name_bytes(v)
        if isinstance(v, (HexStr, LitStr, bytes, bytearray)):
            raw = v.binary if isinstance(v, (HexStr, LitStr)) else bytes(v)
            return b"<" + enc.encrypt(num, gen, raw).hex().encode() + b">"
        if isinstance(v, str):  # decoded text that lost its Lit/Hex type
            return b"<" + enc.encrypt(num, gen,
                                      v.encode("latin-1")).hex().encode() \
                + b">"
        if isinstance(v, (int, np.integer)):
            return str(int(v)).encode()
        if isinstance(v, (float, np.floating)):
            return _fmt_real(v)
        if isinstance(v, dict):
            parts = [b"<<"]
            for k, val in v.items():
                parts.append(_name_bytes(k) + b" " + ser(val))
            parts.append(b">>")
            return b" ".join(parts)
        if isinstance(v, (list, tuple)):
            return b"[ " + b" ".join(ser(x) for x in v) + b" ]"
        if isinstance(v, Stream):
            payload = enc.encrypt(num, gen, v.raw)
            d = dict(v.dict)
            d[Name("Length")] = len(payload)  # direct, post-encryption
            return (ser(d) + b"\nstream\n" + payload + b"\nendstream")
        raise TypeError(f"unserializable COS value: {type(v)}")

    return ser(v)


def _fixture_enc_to_cos(v):
    """fixtures.py enc_dict() values (NameN/HexN/plain) -> parsed-COS
    types this serializer handles."""
    from ..fixtures import HexN, NameN
    if isinstance(v, NameN):
        return Name(str(v))
    if isinstance(v, HexN):
        return HexStr(v.hexs.encode("ascii"))
    if isinstance(v, dict):
        return {Name(str(k)): _fixture_enc_to_cos(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_fixture_enc_to_cos(x) for x in v]
    return v


def _make_encryptor(mode: str, id0: bytes, user_pw: bytes,
                    owner_pw: bytes | None):
    """-> (encryptor, /Encrypt dict in parsed-COS types). Reuses the
    fixture encryptors (algorithms 2-5 / 2.B forward direction)."""
    from ..fixtures import _Aes256Encryptor, _Rc4Encryptor
    if mode == "rc4-128":
        e = _Rc4Encryptor(id0, r=3, user_pw=user_pw, owner_pw=owner_pw)
    elif mode == "aes-128":
        e = _Rc4Encryptor(id0, r=4, user_pw=user_pw, owner_pw=owner_pw,
                          aes=True)
    elif mode == "aes-256":
        if user_pw or owner_pw:
            # the fixture R6 derivation is empty-password only —
            # accepting and ignoring a password would emit a file
            # anyone can open while the caller believes it protected
            raise ValueError("aes-256 rewrite supports empty "
                             "passwords only")
        e = _Aes256Encryptor()
    else:
        raise ValueError(f"unknown encryption mode {mode!r}")
    return e, _fixture_enc_to_cos(e.enc_dict())


def _collect_objects(doc: CosDoc) -> list[tuple[int, int, object]]:
    """Live object graph of a parsed doc: every xref entry resolved,
    minus packaging artifacts that the writer re-creates itself
    (ObjStm containers, XRef streams, linearization dicts)."""
    out = []
    for ref in sorted(doc.xref.keys(), key=lambda r: (r.num, r.gen)):
        obj = doc.get_object(ref)
        if obj is None or isinstance(obj, ObjStm):
            continue
        if isinstance(obj, Stream) and \
                obj.dict.get(Name("Type")) in (Name("XRef"),
                                               Name("ObjStm")):
            continue
        if isinstance(obj, dict) and Name("Linearized") in obj:
            continue
        out.append((ref.num, ref.gen, obj))
    return out


def _classic_xref(offsets: dict[int, tuple[int, int]], size: int) -> bytes:
    """offsets: num -> (byte offset, gen). 20-byte records, one full
    section; gaps become free entries."""
    out = bytearray(b"xref\n")
    out += f"0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for n in range(1, size):
        if n in offsets:
            off, gen = offsets[n]
            out += f"{off:010d} {gen:05d} n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    return bytes(out)


def _index_runs(nums: list[int]) -> list[int]:
    """Sorted object numbers -> [start1 count1 start2 count2…] pairs
    (consecutive runs) — the sparse-subsection grouping shared by the
    classic incremental xref section and the xref stream's /Index."""
    runs: list[int] = []
    i = 0
    while i < len(nums):
        j = i
        while j + 1 < len(nums) and nums[j + 1] == nums[j] + 1:
            j += 1
        runs += [nums[i], j - i + 1]
        i = j + 1
    return runs


def _classic_xref_sparse(offsets: dict[int, tuple[int, int]]) -> bytes:
    """Incremental-update xref section: SUBSECTIONS covering only the
    updated object numbers, 20-byte records — the ISO 32000 7.5.4
    sparse form real-world amenders emit (a full section would shadow
    every untouched object)."""
    runs = _index_runs(sorted(offsets))
    out = bytearray(b"xref\n")
    for start, count in zip(runs[0::2], runs[1::2]):
        out += f"{start} {count}\n".encode()
        for n in range(start, start + count):
            off, gen = offsets[n]
            out += f"{off:010d} {gen:05d} n \n".encode()
    return bytes(out)


def append_update(data: bytes, updates: dict,
                  style: str = "classic",
                  doc: "CosDoc | None" = None) -> bytes:
    """Incremental update (ISO 32000 7.5.6): original bytes UNTOUCHED
    + appended replacement/new objects + a new cross-reference section
    whose /Prev points at the original's last xref — the way
    real-world PDF tooling amends documents (prior signatures stay
    verifiable over their ByteRange because the original is a byte
    prefix of the output). This is the WRITE side of S5's precedence
    rule: the reader walks newest-section-first and the first entry
    seen for an object wins, so the appended section shadows the
    original's entries for exactly the updated numbers.

    updates: {Ref or (num, gen): parsed-COS object} — replacements for
    existing objects and/or brand-new numbers past /Size. style:
    "classic" (xref table with sparse subsections + trailer /Prev) |
    "xrefstm" (appended cross-reference stream with /Index runs +
    /Prev). Offsets are written relative to the original header
    position (hoffset), matching how the reader resolves them.
    Encrypted sources are refused (new strings/streams would need the
    document key)."""
    if style not in ("classic", "xrefstm"):
        raise ValueError(f"unknown update style {style!r} "
                         "(classic | xrefstm)")
    try:
        if doc is None:
            # callers that already parsed `data` (append_updates'
            # per-row update_fn did) pass the CosDoc to skip the
            # second header/xref walk
            doc = CosDoc(data)
        if doc.sec_handler is not None:
            raise ValueError("append_update to encrypted input "
                             "not supported")
    except ParseError as e:
        raise PDFError(f"unparseable source: {e}") from e
    trailer = doc.trailer
    root = trailer.get(Name("Root"))
    if root is None:
        raise ValueError("source has no trailer /Root")
    norm: dict[Ref, object] = {}
    for k, v in updates.items():
        ref = k if isinstance(k, Ref) else Ref(int(k[0]), int(k[1]))
        norm[ref] = v
    if not norm:
        raise ValueError("no updates given")
    # offsets (and the xref section) are keyed by object NUMBER — two
    # refs differing only in generation would silently shadow one
    # another's entry (r6 review: the loser's body becomes dead bytes
    # while the caller believes it replaced)
    nums_seen = [r.num for r in norm]
    if len(set(nums_seen)) != len(nums_seen):
        raise ValueError("duplicate object numbers in updates "
                         "(one generation per number per section)")
    prev = int(doc.startxref)
    hoff = doc.hoffset
    # /Size may be an indirect ref in the wild (same tolerance the
    # reader extends to trailer /ID) — deref; junk falls back to the
    # PARSED xref's own ceiling, never 0: the xrefstm style allocates
    # a NEW object number at `size`, and a floor below the live max
    # would write the xref stream as an existing object number,
    # silently shadowing it (r6 review x2)
    xref_ceiling = max((r.num for r in doc.xref), default=0) + 1
    size_obj = doc.get(trailer, Name("Size")) if trailer else 0
    try:
        old_size = int(size_obj or 0)
    except (TypeError, ValueError):
        old_size = 0
    size = max(old_size, xref_ceiling, max(r.num for r in norm) + 1)

    out = bytearray(data)
    if not out.endswith((b"\n", b"\r")):
        out += b"\n"
    offsets: dict[int, tuple[int, int]] = {}
    for ref in sorted(norm, key=lambda r: (r.num, r.gen)):
        offsets[ref.num] = (len(out) - hoff, ref.gen)
        out += f"{ref.num} {ref.gen} obj\n".encode()
        out += serialize_object(norm[ref], None, ref.num, ref.gen)
        out += b"\nendobj\n"

    def carry(tr: dict) -> None:
        # /ID and /Info ride through unchanged (indirect /ID refs
        # serialize as refs — the reader tolerates them, S8)
        if Name("ID") in trailer:
            tr[Name("ID")] = trailer[Name("ID")]
        if trailer.get(Name("Info")) is not None:
            tr[Name("Info")] = trailer[Name("Info")]

    if style == "classic":
        xref_pos = len(out) - hoff
        out += _classic_xref_sparse(offsets)
        tr = {Name("Size"): size, Name("Root"): root,
              Name("Prev"): prev}
        carry(tr)
        out += b"trailer\n" + serialize_object(tr)
        out += f"\nstartxref\n{xref_pos}\n%%EOF\n".encode()
        return bytes(out)
    # style was validated on entry and classic returned above —
    # only xrefstm reaches here
    xref_num = size
    size = xref_num + 1
    entries = {n: (1, off, gen) for n, (off, gen) in offsets.items()}
    xref_pos = len(out) - hoff
    entries[xref_num] = (1, xref_pos, 0)
    nums = sorted(entries)
    rows = bytearray()
    for n in nums:
        rows += struct.pack(">B I H", *entries[n])
    xdata = zlib.compress(bytes(rows))
    xdict = {Name("Type"): Name("XRef"), Name("Size"): size,
             Name("W"): [1, 4, 2], Name("Index"): _index_runs(nums),
             Name("Filter"): Name("FlateDecode"),
             Name("Length"): len(xdata), Name("Root"): root,
             Name("Prev"): prev}
    carry(xdict)
    out += f"{xref_num} 0 obj\n".encode()
    out += serialize_object(xdict) + b"\nstream\n" + xdata \
        + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)


def rewrite_pdf(data: bytes, encrypt: str | None = None,
                user_pw: bytes = b"", owner_pw: bytes | None = None,
                pack: str = "classic") -> bytes:
    """Parse `data` with the engine's own reader and write it back.

    encrypt: None | "rc4-128" | "aes-128" | "aes-256" (empty-password
    AES-256 only — the fixture R6 derivation). pack: "classic" (xref
    table, objects at top level) | "objstm" (gen-0 non-stream objects
    packed into object streams + a cross-reference stream)."""
    try:
        doc = CosDoc(data)
        if doc.sec_handler is not None:
            raise ValueError("rewrite of already-encrypted input "
                             "not supported")
        objects = _collect_objects(doc)
    except ParseError as e:
        # the writer's parse phase presents one failure type: callers
        # see PDFError for any unwritable source (lexer-level errors
        # included)
        raise PDFError(f"unparseable source: {e}") from e
    trailer = doc.trailer
    root = trailer.get(Name("Root"))
    if root is None:
        raise ValueError("source has no trailer /Root")
    info = trailer.get(Name("Info"))
    ids = doc.get_id()
    id0 = hashlib.md5(data).digest()
    if isinstance(ids, list) and ids:  # /ID [] or junk -> md5 fallback
        if isinstance(ids[0], (HexStr, LitStr)):
            id0 = ids[0].binary
        elif isinstance(ids[0], (bytes, bytearray)):
            id0 = bytes(ids[0])
    enc = None
    enc_dict = None
    if encrypt is not None:
        enc, enc_dict = _make_encryptor(encrypt, id0, user_pw, owner_pw)

    max_num = max((n for n, _, _ in objects), default=0)
    minor = doc.version[1]
    if pack == "objstm":
        minor = max(minor, 5)
    if encrypt in ("aes-128",):
        minor = max(minor, 6)
    if encrypt in ("aes-256",):
        minor = max(minor, 7)
    out = bytearray(b"%%PDF-%d.%d\n%%\xb5\xb5\xb5\xb5\n"
                    % (max(doc.version[0], 1), minor))

    if pack == "classic":
        offsets: dict[int, tuple[int, int]] = {}
        for num, gen, obj in objects:
            offsets[num] = (len(out), gen)
            out += f"{num} {gen} obj\n".encode()
            out += serialize_object(obj, enc, num, gen)
            out += b"\nendobj\n"
        xref_pos = len(out)
        size = max_num + 1
        out += _classic_xref(offsets, size)
        tr = {Name("Size"): size, Name("Root"): root,
              Name("ID"): [HexStr(id0.hex().encode())] * 2}
        if info is not None:
            tr[Name("Info")] = info
        if enc_dict is not None:
            tr[Name("Encrypt")] = enc_dict
        out += b"trailer\n" + serialize_object(tr)
        out += f"\nstartxref\n{xref_pos}\n%%EOF\n".encode()
        return bytes(out)

    if pack != "objstm":
        raise ValueError(f"unknown pack mode {pack!r}")

    # ---- object-stream packaging + xref stream ----
    packed = [(n, o) for n, g, o in objects
              if g == 0 and not isinstance(o, Stream)]
    top = [(n, g, o) for n, g, o in objects
           if g != 0 or isinstance(o, Stream)]
    objstm_num = max_num + 1
    xref_num = max_num + 2
    entries: dict[int, tuple] = {}  # num -> (type, a, b)
    for num, gen, obj in top:
        entries[num] = (1, len(out), gen)
        out += f"{num} {gen} obj\n".encode()
        out += serialize_object(obj, enc, num, gen)
        out += b"\nendobj\n"
    # ObjStm payload: "n1 off1 n2 off2 ..." header + plain bodies
    # (inner strings NOT individually encrypted, ISO 32000 7.5.7)
    bodies, header = [], []
    off = 0
    for idx, (num, obj) in enumerate(packed):
        body = serialize_object(obj) + b"\n"
        header.append(f"{num} {off}".encode())
        bodies.append(body)
        off += len(body)
        entries[num] = (2, objstm_num, idx)
    hdr = b" ".join(header) + b"\n"
    payload = zlib.compress(hdr + b"".join(bodies))
    if enc is not None:
        payload = enc.encrypt(objstm_num, 0, payload)
    stm_dict = {Name("Type"): Name("ObjStm"), Name("N"): len(packed),
                Name("First"): len(hdr),
                Name("Filter"): Name("FlateDecode"),
                Name("Length"): len(payload)}
    entries[objstm_num] = (1, len(out), 0)
    out += f"{objstm_num} 0 obj\n".encode()
    out += serialize_object(stm_dict) + b"\nstream\n" + payload \
        + b"\nendstream\nendobj\n"
    # xref stream (never encrypted), /W [1 4 2], one full section
    size = xref_num + 1
    entries[xref_num] = (1, len(out), 0)
    rows = bytearray()
    for n in range(size):
        t, a, b = entries.get(n, (0, 0, 65535))
        rows += struct.pack(">B I H", t, a, b)
    xdata = zlib.compress(bytes(rows))
    xdict = {Name("Type"): Name("XRef"), Name("Size"): size,
             Name("W"): [1, 4, 2], Name("Filter"): Name("FlateDecode"),
             Name("Length"): len(xdata), Name("Root"): root,
             Name("ID"): [HexStr(id0.hex().encode())] * 2}
    if info is not None:
        xdict[Name("Info")] = info
    if enc_dict is not None:
        xdict[Name("Encrypt")] = enc_dict
    xref_pos = len(out)
    out += f"{xref_num} 0 obj\n".encode()
    out += serialize_object(xdict) + b"\nstream\n" + xdata \
        + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)
