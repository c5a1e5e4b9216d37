"""Content-stream interpreter: tokenize postfix `operands... op` into a
group tree, then evaluate it against a graphics state.

Mirrors /root/reference/src/PDPageElement.jl: the 73-operator arity
table (:405-483), longest-match-3-byte keyword resolution (:485-497),
operand collection (:110-123), BT/ET and marked-content grouping,
inline images (:249-281), and the evalContent! state machine
(:654-852). All layout math is numpy float32.
"""
from __future__ import annotations

import numpy as np

from ..cos.lexer import Buf, ParseError
from ..cos.objects import Comment, HexStr, LitStr, Name, f32
from .fonts import get_text_box

__all__ = ["load_objects", "eval_content", "GState", "TextLayout",
           "new_state"]

_SPACE = frozenset(b"\x00\t\n\x0c\r ")

# op -> (kind, noperand); kind: e=element, t=textrun, g=begin-group,
# E=end-group, i=inline-image. Group payload: text|marked.
_OPS: dict[bytes, tuple] = {}
for _name, _nop in [
        ("'", 1), ('"', 3), ("Tj", 1), ("TJ", 1)]:
    _OPS[_name.encode()] = ("t", _nop, None)
_OPS[b"BDC"] = ("g", 2, "marked")
_OPS[b"BMC"] = ("g", 1, "marked")
_OPS[b"BT"] = ("g", 0, "text")
_OPS[b"EMC"] = ("E", 0, None)
_OPS[b"ET"] = ("E", 0, None)
_OPS[b"BI"] = ("i", 0, None)
for _name, _nop in [
        ("b", 0), ("b*", 0), ("B", 0), ("B*", 0), ("BX", 0), ("c", 6),
        ("cm", 6), ("cs", 1), ("CS", 1), ("d", 2), ("d0", 2), ("d1", 6),
        ("Do", 1), ("DP", 0), ("EI", 0), ("EX", 0), ("f", 0), ("f*", 0),
        ("F", 0), ("g", 1), ("G", 1), ("gs", 1), ("h", 0), ("i", 1),
        ("ID", 0), ("j", 1), ("J", 1), ("k", 4), ("K", 4), ("l", 2),
        ("m", 2), ("M", 1), ("MP", 0), ("n", 0), ("q", 0), ("Q", 0),
        ("re", 4), ("rg", 3), ("RG", 3), ("ri", 1), ("s", 0), ("S", 0),
        ("sc", -1), ("SC", -1), ("scn", -1), ("SCN", -1), ("sh", 1),
        ("T*", 0), ("Tc", 1), ("Td", 2), ("TD", 2), ("Tf", 2), ("TL", 1),
        ("Tm", 6), ("Tr", 1), ("Ts", 1), ("Tw", 1), ("Tz", 1), ("v", 4),
        ("w", 1), ("W", 0), ("W*", 0), ("y", 4)]:
    _OPS[_name.encode()] = ("e", _nop, None)


def _get_content_op(token: bytes):
    """Longest-match over the first <=3 bytes (PDPageElement.jl:485-497)."""
    s = min(len(token), 3)
    while s > 0:
        hit = _OPS.get(token[:s])
        if hit is not None:
            return s, (hit[0], token[:s].decode(), hit[1], hit[2])
        s -= 1
    raise ParseError(f"no content operator in {token[:3]!r}")


class Element:
    __slots__ = ("op", "noperand", "operands")

    def __init__(self, op: str, noperand: int):
        self.op = op
        self.noperand = noperand
        self.operands: list = []


class TextRun:
    __slots__ = ("ss", "elem")

    def __init__(self, elem: Element):
        self.elem = elem
        self.ss: list = []


class Group:
    __slots__ = ("objs", "is_eog")

    def __init__(self):
        self.objs: list = []
        self.is_eog = False


class TextObject:
    __slots__ = ("group",)

    def __init__(self):
        self.group = Group()


class MarkedContent:
    __slots__ = ("group",)

    def __init__(self):
        self.group = Group()


class InlineImage:
    __slots__ = ("params", "data")

    def __init__(self):
        self.params: dict = {}
        self.data = b""


_NODE_TYPES = (Element, TextRun, TextObject, MarkedContent, InlineImage)


def _populate_element(group: Group, elem: Element) -> None:
    """Pop fixed arity, or pop-while-operand for arity -1 (sc/scn)
    (PDPageElement.jl:110-123)."""
    if elem.noperand >= 0:
        for _ in range(elem.noperand):
            if not group.objs:
                break
            elem.operands.insert(0, group.objs.pop())
    else:
        while group.objs and not isinstance(group.objs[-1], _NODE_TYPES):
            elem.operands.insert(0, group.objs.pop())


def _collect_inline_image(img: InlineImage, buf: Buf) -> None:
    """BI params until ID elem, then raw scan for space-preceded EI
    (PDPageElement.jl:249-281)."""
    while True:
        value = buf.parse_value(_get_content_op)
        if isinstance(value, Name):
            v2 = buf.parse_value(_get_content_op)
            img.params[value] = v2
            continue
        if isinstance(value, tuple) and value[1] == "ID":
            break
        if value is None and buf.eof():
            return
    data = bytearray()
    ln = len(buf.data)
    while buf.pos < ln:
        b1 = buf.data[buf.pos]
        if b1 == 0x45:  # 'E'
            if buf.pos + 1 < ln and buf.data[buf.pos + 1] == 0x49:  # 'I'
                if buf.pos + 2 >= ln or buf.data[buf.pos + 2] in _SPACE:
                    buf.pos += 3 if buf.pos + 2 < ln else 2
                    img.data = bytes(data)
                    return
        data.append(b1)
        buf.pos += 1
    img.data = bytes(data)


def load_objects(group: Group, buf: Buf) -> Group:
    """Token loop building the group tree (PDPageElement.jl:97-130)."""
    while not group.is_eog and not buf.eof():
        buf.chomp_space()
        if buf.eof():
            break
        obj = buf.parse_value(_get_content_op)
        if isinstance(obj, Comment):
            continue
        if not isinstance(obj, tuple):
            group.objs.append(obj)
            continue
        kind, op, nop, gtype = obj
        if kind == "e":
            elem = Element(op, nop)
            _populate_element(group, elem)
            group.objs.append(elem)
        elif kind == "t":
            elem = Element(op, nop)
            _populate_element(group, elem)
            tr = TextRun(elem)
            for operand in elem.operands:
                if isinstance(operand, (LitStr, HexStr)):
                    tr.ss.append(operand)
                elif isinstance(operand, list):
                    tr.ss.extend(operand)
            group.objs.append(tr)
        elif kind == "g":
            elem = Element(op, nop)
            _populate_element(group, elem)
            newobj = TextObject() if gtype == "text" else MarkedContent()
            newobj.group.objs.append(elem)
            load_objects(newobj.group, buf)
            group.objs.append(newobj)
        elif kind == "E":
            elem = Element(op, nop)
            _populate_element(group, elem)
            group.objs.append(elem)
            group.is_eog = True
        elif kind == "i":
            img = InlineImage()
            _collect_inline_image(img, buf)
            group.objs.append(img)
    return group


# --------------------------------------------------------- evaluation

class TextLayout:
    """Span: 4 transformed corners + text + font (PDPageElement.jl:499-516)."""
    __slots__ = ("lbx", "lby", "rbx", "rby", "rtx", "rty", "ltx", "lty",
                 "text", "fontname", "fontflags")

    def __init__(self, lbx, lby, rbx, rby, rtx, rty, ltx, lty,
                 text, fontname, fontflags):
        self.lbx, self.lby = lbx, lby
        self.rbx, self.rby = rbx, rby
        self.rtx, self.rty = rtx, rty
        self.ltx, self.lty = ltx, lty
        self.text = text
        self.fontname = fontname
        self.fontflags = fontflags


def _ident3() -> np.ndarray:
    return np.identity(3, dtype=np.float32)


class GState:
    """Stack of state dicts with copy-on-save (PDPageElement.jl:552-588)."""
    __slots__ = ("stack",)

    def __init__(self):
        d = {
            "text_layout": [],
            "h_profile": {},
            "CTM": _ident3(),
            "Tc": f32(0.0), "Tw": f32(0.0), "Tz": f32(100.0),
            "TL": f32(0.0), "Tr": 0, "Ts": f32(0.0),
        }
        self.stack = [d]

    def __getitem__(self, k):
        return self.stack[-1][k]

    def get(self, k, default=None):
        return self.stack[-1].get(k, default)

    def __setitem__(self, k, v):
        self.stack[-1][k] = v

    def delete(self, k):
        self.stack[-1].pop(k, None)

    def save(self):
        self.stack.append(dict(self.stack[-1]))

    def restore(self):
        if len(self.stack) > 1:
            self.stack.pop()


def new_state() -> GState:
    return GState()


def _mat(a, b, c, d, e, fv) -> np.ndarray:
    return np.array([[a, b, 0.0], [c, d, 0.0], [e, fv, 1.0]],
                    dtype=np.float32)


def _translate(m: np.ndarray, tx, ty) -> np.ndarray:
    """[1 0 0; 0 1 0; tx ty 1] @ m — only row 2 changes; same f32
    3-term sequential arithmetic as the full matmul."""
    out = m.copy()
    out[2] = tx * m[0] + ty * m[1] + m[2]
    return out


def _set_text_pos(tx, ty, state: GState) -> None:
    """(PDPageElement.jl:788-798)."""
    tlm = state.get("Tlm")
    if tlm is None:
        tlm = _ident3()
    tlm = _translate(tlm, tx, ty)
    state["Tm"] = tlm.copy()
    state["Tlm"] = tlm


def _offset_text_pos(tx, ty, state: GState) -> None:
    tm = state.get("Tm")
    if tm is None:
        tm = _ident3()
    state["Tm"] = _translate(tm, tx, ty)


def _offset_text_leading(state: GState) -> None:
    tl = state.get("TL", f32(0.0))
    _set_text_pos(f32(0.0), -tl, state)


def _eval_text_run(tr: TextRun, state: GState, ctx) -> None:
    """(PDPageElement.jl:682-711) — the byte-identical-critical kernel."""
    _eval_element(tr.elem, state, ctx)
    tfs = state.get("fontsize", f32(0.0))
    th = state["Tz"] / f32(100.0)
    tc = state["Tc"]
    tw = state["Tw"]
    tm = state.get("Tm")
    if tm is None:
        tm = _ident3()
    ctm = state["CTM"]
    trm = tm @ ctm

    fontname, font = state.get("font", (Name(""), None))
    heap = state["text_layout"]
    text, w, h = get_text_box(tr.ss, font, tfs, tc, tw, th)

    d = state["h_profile"]
    ih = int(np.rint(h * 10))
    d[ih] = d.get(ih, 0) + len(text)

    tb = np.array([[0.0, 0.0, 1.0], [w, 0.0, 1.0],
                   [w, h, 1.0], [0.0, h, 1.0]], dtype=np.float32) @ trm
    if not state.get("in_artifact", False):
        # span fontname is the Tf resource name (PDPageElement.jl:704-706)
        heap.append(TextLayout(
            tb[0, 0], tb[0, 1], tb[1, 0], tb[1, 1],
            tb[2, 0], tb[2, 1], tb[3, 0], tb[3, 1],
            text, fontname, font.flags if font is not None else 0))
    _offset_text_pos(w, f32(0.0), state)


def _eval_element(elem: Element, state: GState, ctx) -> None:
    op = elem.op
    ops = elem.operands
    if op == "q":
        state.save()
    elif op == "Q":
        state.restore()
    elif op == "cm":
        cm = _mat(*(f32(x) for x in ops[:6]))
        state["CTM"] = cm @ state["CTM"]
    elif op == "Tm":
        tm = _mat(*(f32(x) for x in ops[:6]))
        state["Tm"] = tm
        state["Tlm"] = tm.copy()
    elif op == "Tf":
        if len(ops) >= 2:
            fontname = ops[0]
            font = ctx.get_font(fontname) if ctx is not None else None
            # reference: font === CosNull -> return without touching
            # fontsize (PDPageElement.jl:770-780)
            if font is not None:
                state["font"] = (fontname, font)
                state["fontsize"] = f32(ops[1])
    elif op in ("Tc", "Tw", "Tz", "TL", "Ts"):
        state[op] = f32(ops[0])
    elif op == "Tr":
        state["Tr"] = f32(ops[0])
    elif op == "TD":
        tx, ty = f32(ops[0]), f32(ops[1])
        state["TL"] = -ty
        _set_text_pos(tx, ty, state)
    elif op == "Td":
        _set_text_pos(f32(ops[0]), f32(ops[1]), state)
    elif op == "T*":
        _offset_text_leading(state)
    elif op == "'":
        _offset_text_leading(state)
    elif op == '"':
        state["Tw"] = f32(ops[0])
        state["Tc"] = f32(ops[1])
        _offset_text_leading(state)
    elif op == "Do":
        if ctx is not None:
            xobj = ctx.get_xobject(ops[0])
            if xobj is not None:
                xobj.do(state)
    # all path/color/state ops: parsed for arity, evaluated as no-ops


def eval_content(group: Group, state: GState, ctx=None) -> GState:
    """evalContent! dispatch (PDPageElement.jl:654-736)."""
    for obj in group.objs:
        if isinstance(obj, Element):
            _eval_element(obj, state, ctx)
        elif isinstance(obj, TextRun):
            _eval_text_run(obj, state, ctx)
        elif isinstance(obj, TextObject):
            ident = _ident3()
            state["Tm"] = ident
            state["Tlm"] = ident.copy()
            state["Trm"] = ident.copy()
            eval_content(obj.group, state, ctx)
            state.delete("Tm")
            state.delete("Tlm")
            state.delete("Trm")
        elif isinstance(obj, MarkedContent):
            first = obj.group.objs[0] if obj.group.objs else None
            tag = (first.operands[0] if isinstance(first, Element)
                   and first.operands else None)
            if tag == Name("Artifact"):
                state["in_artifact"] = True
                eval_content(obj.group, state, ctx)
                state.delete("in_artifact")
            else:
                eval_content(obj.group, state, ctx)
        # InlineImage / bare COS objects: no-op
    return state
