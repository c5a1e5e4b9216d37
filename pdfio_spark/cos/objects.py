"""COS object model — the value domain of the PDF parse tree.

Semantics mirror the reference object hierarchy
(/root/reference/src/CosObject.jl:22-37) but the representation is
idiomatic Python: the COS layer lives entirely inside Arrow-batch UDFs,
so we use native Python types wherever possible and tiny wrapper classes
only where type identity matters to the algorithms:

  CosNull           -> None
  CosBoolean        -> bool
  CosInt            -> int
  CosFloat          -> numpy.float32 (32-bit matters for layout math,
                       /root/reference/src/CosObject.jl:101-103)
  CosName           -> Name (str subclass)
  CosLiteralString  -> LitStr (bytes subclass; raw bytes)
  CosXString        -> HexStr (bytes subclass; holds HEX CHARS like the
                       reference, decoded lazily via .binary,
                       /root/reference/src/CosObjectHelpers.jl:36-37)
  CosArray          -> list
  CosDict           -> dict (Name keys)
  CosIndirectObjectRef -> Ref (named tuple-ish)
  CosStream         -> Stream (extent dict + in-memory payload; the
                       reference's temp-file externalization at
                       /root/reference/src/CosReader.jl:249-285 is
                       deliberately NOT reproduced — payloads stay bytes)
  CosObjectStream   -> ObjStm (Stream + parsed oid/oloc index)
  CosComment        -> Comment
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "Name", "LitStr", "HexStr", "Ref", "Stream", "ObjStm", "Comment",
    "IndirectObject", "f32", "cos_get",
]

# Float32 helper — all layout-critical math is numpy float32.
f32 = np.float32


class Name(str):
    """A PDF /Name. Subclass of str so it hashes/compares naturally but
    remains distinguishable from decoded text strings."""
    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return "/" + str(self)


class LitStr(bytes):
    """Literal string ( ... ) — raw bytes after escape processing."""
    __slots__ = ()

    @property
    def binary(self) -> bytes:
        return bytes(self)


class HexStr(bytes):
    """Hex string < ... > — stores the HEX CHARACTERS (like the
    reference CosXString); `.binary` decodes to raw bytes, padding odd
    length with a trailing 0 nibble (the lexer already pads)."""
    __slots__ = ()

    @property
    def binary(self) -> bytes:
        return bytes.fromhex(self.decode("ascii"))


class Comment(bytes):
    """%-comment object; skipped by content collection."""
    __slots__ = ()


class Ref(tuple):
    """Indirect object reference (num, gen)."""
    __slots__ = ()

    def __new__(cls, num: int, gen: int):
        return tuple.__new__(cls, (num, gen))

    @property
    def num(self) -> int:
        return self[0]

    @property
    def gen(self) -> int:
        return self[1]

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"{self[0]} {self[1]} R"


class Stream:
    """A COS stream: extent dictionary + in-memory encoded payload.

    `decoded()` runs the filter chain (cos.filters) and caches; mirrors
    decode() at /root/reference/src/CosStream.jl:86-111 minus the
    temp-file round trip.
    """
    __slots__ = ("dict", "raw", "_decoded")

    def __init__(self, extent: dict, raw: bytes):
        self.dict = extent
        self.raw = raw
        self._decoded: bytes | None = None

    def get(self, key, default=None):
        return self.dict.get(key, default)

    def _decode_keys_resolved(self) -> bool:
        """True when Filter/DecodeParms carry no indirect refs — the
        only case a doc-less decode is well-defined."""
        for k in ("Filter", "DecodeParms", "DP"):
            v = self.dict.get(Name(k))
            if isinstance(v, Ref):
                return False
            if isinstance(v, list) and any(isinstance(x, Ref) for x in v):
                return False
        return True

    def decoded(self, doc=None, until: int = -1) -> bytes:
        if until == -1 and self._decoded is not None:
            return self._decoded
        if doc is None and not self._decode_keys_resolved():
            # refuse rather than mis-decode: an indirect /DecodeParms
            # with doc=None used to skip the predictor silently AND
            # poison the cache for later doc-ful calls (r4 review fix)
            raise ValueError("stream has indirect decode keys; "
                             "decoded() needs the owning doc")
        from .filters import decode_stream
        out = decode_stream(self, doc=doc, until=until)
        if until == -1:
            self._decoded = out
        return out

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Stream({self.dict!r}, {len(self.raw)} bytes)"


class ObjStm:
    """An object stream (/Type /ObjStm) holding N packed objects.

    Mirrors CosObjectStream (/root/reference/src/CosObjStream.jl:78-121):
    header is N pairs `oid offset`, objects parsed at First+offset.
    The oid/oloc index is parsed lazily after (optional) decryption.
    """
    __slots__ = ("stm", "oids", "olocs", "populated")

    def __init__(self, stm: Stream):
        self.stm = stm
        self.oids: list[int] = []
        self.olocs: list[int] = []
        self.populated = False

    @property
    def dict(self) -> dict:
        return self.stm.dict

    def get(self, key, default=None):
        return self.stm.dict.get(key, default)

    def populate(self, doc=None) -> None:
        """Parse the `oid offset` header pairs — read_object_info_from_stm
        (/root/reference/src/CosObjStream.jl:78-92)."""
        if self.populated:
            return
        from .lexer import Buf, ParseError
        n = self.stm.dict.get(Name("N"), 0)
        first = self.stm.dict.get(Name("First"), 0)
        if doc is not None:  # /N //First may be indirect (spec allows)
            n = doc.get_object(n)
            first = doc.get_object(first)
        try:
            n, first = int(n), int(first)
        except (TypeError, ValueError) as e:
            # an unresolvable Ref (no doc) or junk: raise the class the
            # object-level quarantine catches, not a TypeError that
            # would fail the whole document (r5 core review; the r4
            # /Length=None class)
            raise ParseError(f"ObjStm /N//First unusable: {e}")
        buf = Buf(self.stm.decoded(doc))
        oids, olocs = [], []
        for _ in range(n):
            oids.append(int(buf.parse_unsignednumber()))
            olocs.append(int(buf.parse_unsignednumber()) + first)
        self.oids, self.olocs = oids, olocs
        self.populated = True

    def get_object_at(self, loc_idx: int, doc=None):
        """Parse the object at slot `loc_idx` — cosObjectStreamGetObject
        (/root/reference/src/CosObjStream.jl:98-120)."""
        from .lexer import Buf
        self.populate(doc)
        data = self.stm.decoded(doc)
        buf = Buf(data)
        buf.pos = self.olocs[loc_idx]
        return buf.parse_value()


class IndirectObject:
    """num gen obj ... endobj wrapper; mostly transparent — the engine
    resolves to the inner object but keeps identity for caching."""
    __slots__ = ("num", "gen", "obj")

    def __init__(self, num: int, gen: int, obj):
        self.num = num
        self.gen = gen
        self.obj = obj

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"{self.num} {self.gen} obj {self.obj!r}"


def str_bytes(v) -> bytes:
    """COS string -> raw bytes: HexStr decodes its hex chars, LitStr/
    bytes pass through, anything else is b''. THE canonical coercion —
    crypt.py / fonts.py / signature.py used to carry identical private
    copies (r5 core review)."""
    if isinstance(v, HexStr):
        return v.binary
    if isinstance(v, (LitStr, bytes)):
        return bytes(v)
    return b""


def cos_get(obj, key, default=None):
    """Dictionary access that sees through Stream/ObjStm wrappers."""
    if isinstance(obj, dict):
        return obj.get(key, default)
    if isinstance(obj, (Stream, ObjStm)):
        return obj.dict.get(key, default)
    return default
