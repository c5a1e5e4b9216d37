"""Byte-stream lexer / recursive-descent parser for COS syntax.

Re-expresses the reference tokenizer (/root/reference/src/CosReader.jl
and /root/reference/src/BufferParser.jl) over an in-memory bytes buffer
with an index cursor. The same parser serves file objects, content
streams and CMap streams via the `parse_more` plug-in hook
(parse_value's fparse_more, /root/reference/src/CosReader.jl:26-38).

KMP keyword search (BufferParser.jl:52-87) is replaced by C-speed
bytes.find — same semantics (offset within a max window, cursor left at
keyword start on hit, restored on miss).
"""
from __future__ import annotations

import re

import numpy as np

from .objects import Comment, HexStr, LitStr, Name, Ref, f32

__all__ = ["Buf", "ParseError"]

# precompiled scanners for the hot paths (token runs, numbers, strings)
_NAME_RUN = re.compile(rb"[^\x00\t\n\x0c\r ()<>{}\[\]%/]*")
_NUM_RUN = re.compile(rb"[0-9+\-.]*")
_UNUM_RUN = re.compile(rb"[0-9]*")
_SPACE_RUN = re.compile(rb"[\x00\t\n\x0c\r ]*")
_LIT_SPECIAL = re.compile(rb"[\\()]")
_HEX_RUN = re.compile(rb"[0-9a-fA-F\x00\t\n\x0c\r ]*")


class ParseError(Exception):
    pass


# PDF character classes (/root/reference/src/bytes.jl:128-146)
_SPACE = frozenset(b"\x00\t\n\x0c\r ")
_DELIM = frozenset(b"()<>{}[]%/")
_DIGITS = frozenset(b"0123456789")
_ODIGITS = frozenset(b"01234567")
_XDIGITS = frozenset(b"0123456789abcdefABCDEF")

# Literal-string escapes (/root/reference/src/bytes.jl:84-92)
_ESCAPES = {
    ord("("): ord("("), ord(")"): ord(")"), ord("\\"): ord("\\"),
    ord("b"): 0x08, ord("f"): 0x0C, ord("n"): 0x0A,
    ord("r"): 0x0D, ord("t"): 0x09,
}

_TRUE = b"true"
_FALSE = b"false"
_NULL = b"null"


def _default_parse_more(token: bytes):
    return len(token), None


class Buf:
    """bytes + cursor with the reference's lexing primitives."""
    __slots__ = ("data", "pos", "_marks")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self._marks: list[int] = []

    # ---- primitives (BufferParser.jl:10-32) ----
    def eof(self) -> bool:
        return self.pos >= len(self.data)

    def peek(self) -> int:
        if self.pos >= len(self.data):
            raise ParseError("unexpected EOF")
        return self.data[self.pos]

    def advance(self) -> int:
        b = self.peek()
        self.pos += 1
        return b

    def skip(self, n: int = 1) -> None:
        self.pos += n

    def read(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        self.pos += len(out)
        return out

    def mark(self) -> None:
        self._marks.append(self.pos)

    def unmark(self) -> None:
        self._marks.pop()

    def reset(self) -> None:
        self.pos = self._marks.pop()

    def skipv(self, expected: bytes) -> None:
        for c in expected:
            if self.eof() or self.data[self.pos] != c:
                got = "EOF" if self.eof() else chr(self.data[self.pos])
                raise ParseError(
                    f"Found '{got}' expected '{chr(c)}' at {self.pos}")
            self.pos += 1

    def chomp_space(self) -> int:
        data, p = self.data, self.pos
        if p >= len(data) or data[p] not in _SPACE:
            return 0
        # 1-char runs dominate content streams: skip the regex for them
        p1 = p + 1
        if p1 >= len(data) or data[p1] not in _SPACE:
            self.pos = p1
            return 1
        end = _SPACE_RUN.match(data, p1).end()
        self.pos = end
        return end - p

    def chomp_eol(self) -> None:
        data, ln = self.data, len(self.data)
        p = self.pos
        while p < ln and data[p] in b"\r\n":
            p += 1
        self.pos = p

    def locate_keyword(self, keyword: bytes, maxoffset: int | None = None) -> int:
        """bytes.find within a bounded window; on a hit the cursor is
        left AFTER the keyword (mirrors locate_keyword!,
        /root/reference/src/BufferParser.jl:52-87); unchanged on miss.
        Returns the offset from the entry position, or -1."""
        if maxoffset is None:
            maxoffset = len(keyword)
        end = min(len(self.data), self.pos + maxoffset)
        idx = self.data.find(keyword, self.pos, end)
        if idx < 0:
            return -1
        off = idx - self.pos
        self.pos = idx + len(keyword)  # reference leaves cursor past keyword
        return off

    # ---- value parsing (CosReader.jl) ----
    def parse_value(self, parse_more=_default_parse_more):
        """Dispatch on first byte (/root/reference/src/CosReader.jl:26-38)."""
        self.chomp_space()
        b = self.peek()
        if b == 0x28:                       # (
            return self.parse_string()
        if b == 0x3C:                       # <
            return self.parse_xstring()
        if b == 0x25:                       # %
            return self.parse_comment()
        if b == 0x2F:                       # /
            return self.parse_name()
        if b in (0x2D, 0x2B, 0x2E):         # - + .
            return self.parse_number()
        if b in _DIGITS:
            return self.try_parse_indirect_reference()
        if b == 0x5B:                       # [
            return self.parse_array()
        return self.parse_ops_or_const(parse_more)

    def parse_comment(self) -> Comment:
        self.skip(1)
        out = bytearray()
        while not self.eof():  # EOF-tolerant: truncated streams may end
            c = self.advance()  # mid-comment (corrupt-flate fixtures)
            if c in (0x0D, 0x0A):
                break
            out.append(c)
        self.chomp_space()
        return Comment(bytes(out))

    def parse_name(self) -> Name:
        data = self.data
        if self.pos >= len(data) or data[self.pos] != 0x2F:
            raise ParseError(f"expected / at {self.pos}")
        m = _NAME_RUN.match(data, self.pos + 1)
        token = m.group()
        self.pos = m.end()
        if 0x23 in token:  # '#' hex escape (CosReader.jl:61-71)
            out = bytearray()
            i, ln = 0, len(token)
            while i < ln:
                c = token[i]
                if c == 0x23:
                    if i + 2 >= ln or not (token[i + 1] in _XDIGITS
                                           and token[i + 2] in _XDIGITS):
                        raise ParseError(f"bad #-escape in name at {self.pos}")
                    out.append(int(token[i + 1:i + 3], 16))
                    i += 3
                else:
                    out.append(c)
                    i += 1
            token = bytes(out)
        self.chomp_space()
        return Name(token.decode("latin-1"))

    def parse_ops_or_const(self, parse_more=_default_parse_more):
        """Keyword tokenizer with the reference's exact cursor arithmetic
        (/root/reference/src/CosReader.jl:80-112): constants consume
        token+1 space; parse_more may claim fewer bytes than the token."""
        start = self.pos
        m = _NAME_RUN.match(self.data, self.pos)
        token = m.group()
        self.pos = m.end()
        ns = self.chomp_space()
        reset_marker = ns > 0 and not self.eof()
        tb = bytes(token)
        if not tb and ns == 0:
            # corrupt input: no token, no whitespace -> would spin forever
            raise ParseError(f"unparseable byte at {self.pos}")
        nused = len(tb) + 1
        if tb == _TRUE:
            ret = True
        elif tb == _FALSE:
            ret = False
        elif tb == _NULL:
            ret = None  # PDF null
        else:
            nused, ret = parse_more(tb)
            if nused < len(tb):
                reset_marker = True
            else:
                nused += 1
        if reset_marker:
            self.pos = min(start + nused, len(self.data))
        return ret

    def parse_array(self) -> list:
        out = []
        self.skip(1)  # [
        self.chomp_space()
        if self.peek() != 0x5D:
            while True:
                out.append(self.parse_value())
                self.chomp_space()
                if self.peek() == 0x5D:
                    break
        self.skip(1)
        self.chomp_space()
        return out

    def _read_octal_escape(self, c: int) -> int:
        n = c - 0x30
        for _ in range(2):
            if self.eof():
                return n
            b = self.peek()
            if b not in _ODIGITS:
                return n
            n = ((n << 3) + (b - 0x30)) & 0xFF
            self.skip(1)
        return n

    def parse_string(self) -> LitStr:
        # chunk-scan: copy runs between \ ( ) wholesale
        data = self.data
        out = bytearray()
        p = self.pos + 1  # past (
        paren = 0
        while True:
            m = _LIT_SPECIAL.search(data, p)
            if m is None:
                raise ParseError("unterminated literal string")
            out += data[p:m.start()]
            p = m.start()
            c = data[p]
            p += 1
            if c == 0x5C:  # backslash
                if p >= len(data):
                    raise ParseError("unterminated escape")
                c = data[p]
                p += 1
                if c in _ODIGITS:
                    self.pos = p
                    out.append(self._read_octal_escape(c))
                    p = self.pos
                elif c in (0x0D, 0x0A):
                    self.pos = p
                    self.chomp_space()
                    p = self.pos
                else:
                    e = _ESCAPES.get(c, 0)
                    if e == 0:
                        raise ParseError(f"bad escape at {p}")
                    out.append(e)
            elif c == 0x28:
                paren += 1
                out.append(c)
            else:  # 0x29
                if paren > 0:
                    paren -= 1
                    out.append(c)
                else:
                    self.pos = p
                    self.chomp_space()
                    return LitStr(bytes(out))

    def parse_xstring(self):
        data = self.data
        p = self.pos + 1  # past <
        if p < len(data) and data[p] == 0x3C:
            self.pos = p + 1
            return self.parse_dict()
        m = _HEX_RUN.match(data, p)
        end = m.end()
        if end >= len(data) or data[end] != 0x3E:
            raise ParseError(f"unexpected char in hex string at {end}")
        chunk = data[p:end]
        out = chunk.translate(None, b"\x00\t\n\x0c\r ")
        if len(out) % 2 != 0:
            # odd length: append a zero nibble per spec 7.3.4.3.
            # DIVERGENCE: the reference pushes NUL into its hex vector
            # (CosReader.jl:197) which later makes hex2bytes THROW —
            # it rejects the doc; we tolerate per spec.
            out += b"0"
        self.pos = end + 1
        self.chomp_space()
        return HexStr(out)

    def parse_dict(self) -> dict:
        """Cursor must be just past '<<' (CosReader.jl:206-236)."""
        self.chomp_space()
        d: dict = {}
        while True:
            if self.peek() == 0x2F:
                key = self.parse_name()
                self.chomp_space()
                val = self.parse_value()
                if val is not None:  # null values deleted (CosReader.jl:219)
                    d[key] = val
            self.chomp_space()
            c = self.peek()
            if c == 0x2F:
                continue
            self.skip(1)
            if c == 0x3E:
                self.skipv(b">")
                break
        self.chomp_space()
        return d

    # ---- numbers (CosReader.jl:455-509) ----
    def parse_unsignednumber(self) -> int:
        m = _UNUM_RUN.match(self.data, self.pos)
        token = m.group()
        if not token:
            raise ParseError(f"bad number at {self.pos}")
        self.pos = m.end()
        self.chomp_space()
        return int(token)

    def parse_number(self):
        m = _NUM_RUN.match(self.data, self.pos)
        token = m.group()
        self.pos = m.end()
        self.chomp_space()
        if 0x2B in token:
            token = token.replace(b"+", b"")  # '+' ignored (ref)
        if not token:
            raise ParseError(f"bad number at {self.pos}")
        if 0x2E in token:  # '.' -> float32
            try:
                return f32(float(token))
            except ValueError:
                raise ParseError(f"bad float {token!r} at {self.pos}")
        try:
            return int(token)
        except ValueError:
            raise ParseError(f"bad int {token!r} at {self.pos}")

    # ---- indirect refs (CosReader.jl:370-419) ----
    def try_parse_indirect_reference(self):
        nobj = self.parse_number()
        if isinstance(nobj, np.floating):
            return nobj
        self.chomp_space()
        save = self.pos
        if not self.eof() and self.peek() in _DIGITS:
            genn = self.parse_unsignednumber()
            self.chomp_space()
            if not self.eof() and self.peek() == 0x52:  # 'R'
                self.skip(1)
                # must be followed by delimiter/space (guards RG op)
                if self.eof() or self.peek() in _DELIM or self.peek() in _SPACE:
                    self.chomp_space()
                    return Ref(nobj, genn)
            self.pos = save
            self.chomp_space()
            return nobj
        self.chomp_space()
        return nobj

    def parse_indirect_ref(self) -> Ref:
        self.chomp_space()
        objn = self.parse_unsignednumber()
        self.chomp_space()
        genn = self.parse_unsignednumber()
        self.chomp_space()
        self.skipv(b"R")
        if not (self.eof() or self.peek() in _DELIM or self.peek() in _SPACE):
            raise ParseError(f"invalid delimiter after R at {self.pos}")
        self.chomp_space()
        return Ref(objn, genn)
