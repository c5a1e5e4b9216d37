#!/usr/bin/env python3
"""Generate pdfio_spark/data/*.json from the public Adobe data tables
shipped with the reference (PDF spec Annex D encodings, Adobe base-14
AFM metrics, Adobe Glyph List subsets). Run once; output is committed.

The emitted JSON is data, not code: byte->glyphname maps for the six
standard encodings, glyphname->unicode, PDFDocEncoding, and the std-14
font metrics (widths + kern pairs + flags).
"""
from __future__ import annotations

import json
import os
import re

REF = "/root/reference/data"
OUT = os.path.join(os.path.dirname(__file__), "..", "pdfio_spark", "data")


def read_csv(path: str) -> list[list[str]]:
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            rows.append(line.split(","))
    return rows


def gen_encodings() -> dict:
    # latin charset: glyphname, STD, MAC, WIN, PDF (octal or '-')
    latin = read_csv(f"{REF}/latin-charset-encoding.txt")
    std, mac, win, pdfdoc_glyph = {}, {}, {}, {}
    for row in latin:
        g = row[0].strip()
        for col, d in ((1, std), (2, mac), (3, win), (4, pdfdoc_glyph)):
            v = row[col].strip()
            if v != "-":
                d[int(v, 8)] = g
    # reference special cases (PDFFontTables.jl:24-27)
    win[0xAD] = "sfthyphen"
    win[0xA0] = "colon"
    mac[0xCA] = "colon"

    # pdf-doc-encoding: char, hex, octal, unicode, alias — the CHAR field
    # may itself be a comma, so anchor on the 0xNN hex field
    pdfdoc_unicode = {}
    pat = re.compile(r"0x([0-9a-fA-F]{2}),([0-7]{3,4}),([0-9A-Fa-f]*),")
    with open(f"{REF}/pdf-doc-encoding.txt", encoding="utf-8") as f:
        for line in f:
            m = pat.search(line)
            if not m:
                continue
            e = int(m.group(2), 8)
            u = m.group(3)
            pdfdoc_unicode[e] = int(u, 16) if u else e

    # glyphname -> unicode for latin names via the PDFDoc column
    glyph_unicode: dict[str, list[int]] = {}
    for row in latin:
        g = row[0].strip()
        v = row[4].strip()
        if v != "-":
            b = int(v, 8)
            glyph_unicode[g] = [pdfdoc_unicode.get(b, b)]

    # char-column files: CHAR, NAME, CODE(octal)
    def charfile(fname: str):
        enc, g2u = {}, {}
        for row in read_csv(f"{REF}/{fname}"):
            # the CHAR field may itself contain a comma; NAME/CODE are
            # the last two fields
            name = row[-2].strip()
            code = int(row[-1].strip(), 8)
            ch = ",".join(row[:-2])
            enc[code] = name
            if len(ch) >= 1:
                g2u.setdefault(name, [ord(c) for c in ch][:1] or [0])
        return enc, g2u

    mex, mex_u = charfile("mac-expert.txt")
    sym, sym_u = charfile("symbols-encoding.txt")
    zap, zap_u = charfile("zapfdingbats-encoding.txt")

    # AGL view: latin + symbol + mac-expert names (zapf kept separate,
    # mirroring AGL_ZAP_to_Unicode vs AGL_Glyph_to_Unicode)
    agl = dict(glyph_unicode)
    for g2u in (sym_u, mex_u):
        for k, v in g2u.items():
            agl.setdefault(k, v)
    agl_zap = dict(zap_u)

    # fixups: names whose pdfdoc column is missing but appear in
    # encodings/AFMs — values from the public Adobe Glyph List
    fixups = {
        "sfthyphen": 0x00AD, "nbspace": 0x00A0, "overscore": 0x00AF,
        "middot": 0x00B7, "apple": 0xF8FF, "lozenge": 0x25CA,
        "Euro": 0x20AC, "currency": 0x00A4,
        # Greek (AGL quirks: Delta->2206, Omega->2126, mu->00B5)
        "Alpha": 0x0391, "Beta": 0x0392, "Gamma": 0x0393, "Delta": 0x2206,
        "Epsilon": 0x0395, "Zeta": 0x0396, "Eta": 0x0397, "Theta": 0x0398,
        "Iota": 0x0399, "Kappa": 0x039A, "Lambda": 0x039B, "Mu": 0x039C,
        "Nu": 0x039D, "Xi": 0x039E, "Omicron": 0x039F, "Pi": 0x03A0,
        "Rho": 0x03A1, "Sigma": 0x03A3, "Tau": 0x03A4, "Upsilon": 0x03A5,
        "Phi": 0x03A6, "Chi": 0x03A7, "Psi": 0x03A8, "Omega": 0x2126,
        "alpha": 0x03B1, "beta": 0x03B2, "gamma": 0x03B3, "delta": 0x03B4,
        "epsilon": 0x03B5, "zeta": 0x03B6, "eta": 0x03B7, "theta": 0x03B8,
        "iota": 0x03B9, "kappa": 0x03BA, "lambda": 0x03BB, "mu": 0x00B5,
        "nu": 0x03BD, "xi": 0x03BE, "omicron": 0x03BF, "pi": 0x03C0,
        "rho": 0x03C1, "sigma": 0x03C3, "tau": 0x03C4, "upsilon": 0x03C5,
        "phi": 0x03C6, "chi": 0x03C7, "psi": 0x03C8, "omega": 0x03C9,
        "theta1": 0x03D1, "sigma1": 0x03C2, "phi1": 0x03D5,
        "omega1": 0x03D6, "Upsilon1": 0x03D2,
        # math / symbol set
        "Ifraktur": 0x2111, "Rfraktur": 0x211C, "aleph": 0x2135,
        "weierstrass": 0x2118, "angle": 0x2220, "angleleft": 0x2329,
        "angleright": 0x232A, "approxequal": 0x2248, "arrowboth": 0x2194,
        "arrowdblboth": 0x21D4, "arrowdbldown": 0x21D3,
        "arrowdblleft": 0x21D0, "arrowdblright": 0x21D2,
        "arrowdblup": 0x21D1, "arrowdown": 0x2193, "arrowleft": 0x2190,
        "arrowright": 0x2192, "arrowup": 0x2191, "arrowhorizex": 0xF8E7,
        "arrowvertex": 0xF8E6, "asteriskmath": 0x2217,
        "carriagereturn": 0x21B5, "circlemultiply": 0x2297,
        "circleplus": 0x2295, "club": 0x2663, "congruent": 0x2245,
        "diamond": 0x2666, "dotmath": 0x22C5, "element": 0x2208,
        "emptyset": 0x2205, "equivalence": 0x2261, "existential": 0x2203,
        "gradient": 0x2207, "heart": 0x2665, "infinity": 0x221E,
        "integral": 0x222B, "intersection": 0x2229, "logicaland": 0x2227,
        "logicalor": 0x2228, "minute": 0x2032, "second": 0x2033,
        "minus": 0x2212, "notelement": 0x2209, "notequal": 0x2260,
        "notsubset": 0x2284, "partialdiff": 0x2202,
        "perpendicular": 0x22A5, "product": 0x220F,
        "propersubset": 0x2282, "propersuperset": 0x2283,
        "proportional": 0x221D, "radical": 0x221A, "radicalex": 0xF8E5,
        "reflexsubset": 0x2286, "reflexsuperset": 0x2287,
        "similar": 0x223C, "spade": 0x2660, "suchthat": 0x220B,
        "summation": 0x2211, "therefore": 0x2234, "union": 0x222A,
        "universal": 0x2200, "lessequal": 0x2264, "greaterequal": 0x2265,
        "integraltp": 0x2320, "integralbt": 0x2321, "integralex": 0xF8F5,
        "parenlefttp": 0x239B, "parenleftex": 0x239C,
        "parenleftbt": 0x239D, "parenrighttp": 0x239E,
        "parenrightex": 0x239F, "parenrightbt": 0x23A0,
        "bracketlefttp": 0x23A1, "bracketleftex": 0x23A2,
        "bracketleftbt": 0x23A3, "bracketrighttp": 0x23A4,
        "bracketrightex": 0x23A5, "bracketrightbt": 0x23A6,
        "bracelefttp": 0x23A7, "braceleftmid": 0x23A8,
        "braceleftbt": 0x23A9, "braceex": 0x23AA,
        "bracerighttp": 0x23AB, "bracerightmid": 0x23AC,
        "bracerightbt": 0x23AD, "copyrightserif": 0x00A9,
        "registerserif": 0x00AE, "trademarkserif": 0x2122,
        "commaaccent": 0xF6C3, "dotlessj": 0xF6BE,
    }
    for k, v in fixups.items():
        agl.setdefault(k, [v])

    # systematic Latin Extended glyph names (AGL-consistent, validated
    # against unicodedata): <Letter><suffix>
    import unicodedata
    suffixes = {
        "breve": "BREVE", "macron": "MACRON", "ogonek": "OGONEK",
        "caron": "CARON", "dotaccent": "DOT ABOVE",
        "hungarumlaut": "DOUBLE ACUTE", "acute": "ACUTE",
        "grave": "GRAVE", "circumflex": "CIRCUMFLEX", "tilde": "TILDE",
        "dieresis": "DIAERESIS", "cedilla": "CEDILLA", "slash": "STROKE",
        "ring": "RING ABOVE", "croat": "STROKE",
    }
    # AGL maps *commaaccent to CEDILLA forms for G K L N R, and to
    # COMMA BELOW for S T (U+0218/021A per AGL revisions; the reference's
    # AGL package uses 0218/021A? AGL 2.0 maps Scommaaccent->0218)
    comma_below = {"S": 0x0218, "s": 0x0219, "T": 0x021A, "t": 0x021B}
    for base in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
        kind = "CAPITAL" if base.isupper() else "SMALL"
        for suf, uni_suffix in suffixes.items():
            name = base + suf
            if name in agl:
                continue
            try:
                ch = unicodedata.lookup(
                    f"LATIN {kind} LETTER {base.upper()} WITH {uni_suffix}")
                if len(ch) == 1:
                    agl[name] = [ord(ch)]
            except KeyError:
                pass
        name = base + "commaaccent"
        if name not in agl:
            if base in comma_below:
                agl[name] = [comma_below[base]]
            else:
                try:
                    ch = unicodedata.lookup(
                        f"LATIN {kind} LETTER {base.upper()} WITH CEDILLA")
                    if len(ch) == 1:
                        agl[name] = [ord(ch)]
                except KeyError:
                    pass

    return {
        "STD": {str(k): v for k, v in std.items()},
        "MAC": {str(k): v for k, v in mac.items()},
        "WIN": {str(k): v for k, v in win.items()},
        "MEX": {str(k): v for k, v in mex.items()},
        "SYM": {str(k): v for k, v in sym.items()},
        "ZAP": {str(k): v for k, v in zap.items()},
        "PDFDOC": {str(k): v for k, v in pdfdoc_unicode.items()},
        "AGL": agl,
        "AGL_ZAP": agl_zap,
    }


def parse_afm(path: str) -> dict:
    cid_to_name: dict[str, str] = {}
    name_to_wx: dict[str, float] = {}
    kern: dict[str, float] = {}
    italic = 0.0
    fixed = False
    weight = "Medium"
    fontname = ""
    mode = None
    with open(path, encoding="latin-1") as f:
        for line in f:
            line = line.strip()
            if line.startswith("FontName"):
                fontname = line.split()[1]
            elif line.startswith("ItalicAngle"):
                italic = float(line.split()[1])
            elif line.startswith("IsFixedPitch"):
                fixed = line.split()[1] == "true"
            elif line.startswith("Weight"):
                weight = line.split()[1]
            elif line.startswith("StartCharMetrics"):
                mode = "char"
                continue
            elif line.startswith("EndCharMetrics"):
                mode = None
            elif line.startswith("StartKernPairs"):
                mode = "kern"
                continue
            elif line.startswith("EndKernPairs"):
                mode = None
            elif mode == "char":
                cid, wx, name = -1, 1000, "null"
                for tok in line.split(";"):
                    tok = tok.strip()
                    if not tok:
                        continue
                    parts = tok.split(None, 1)
                    if len(parts) != 2:
                        continue
                    m, val = parts[0], parts[1].strip()
                    if m == "C":
                        cid = int(val)
                    elif m == "CH":
                        cid = int(val.replace("<", "0x").rstrip(">"), 16)
                    elif m == "WX":
                        wx = int(round(float(val)))
                    elif m == "N":
                        name = val
                if cid > -1:
                    cid_to_name[str(cid)] = name
                name_to_wx[name] = float(wx)
            elif mode == "kern":
                toks = line.split()
                if len(toks) >= 4 and toks[0] in ("KP", "KPH", "KPX", "KPY"):
                    key = toks[0]
                    x = float(toks[3]) if key in ("KP", "KPH", "KPX") else 0.0
                    kern[toks[1] + " " + toks[2]] = x
    return {
        "fontname": fontname, "italic": italic, "fixed": fixed,
        "weight": weight, "cid_to_name": cid_to_name,
        "name_to_wx": name_to_wx, "kern": kern,
    }


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    enc = gen_encodings()
    with open(f"{OUT}/encodings.json", "w") as f:
        json.dump(enc, f, separators=(",", ":"))
    afm = {}
    for fn in sorted(os.listdir(f"{REF}/fonts")):
        if fn.endswith(".afm"):
            afm[fn[:-4]] = parse_afm(f"{REF}/fonts/{fn}")
    with open(f"{OUT}/afm.json", "w") as f:
        json.dump(afm, f, separators=(",", ":"))
    print("encodings:", {k: len(v) for k, v in enc.items()})
    print("afm fonts:", list(afm))


if __name__ == "__main__":
    main()
