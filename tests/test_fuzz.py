"""Property-based tests (hypothesis): COS value round-trips, filter
round-trips, and crash-freedom of the extractor under byte mutation.
The reference has no randomized testing (SURVEY §5) — web-crawl input
demands it."""
import numpy as np
from hypothesis import given, settings, strategies as st

from pdfio_spark.cos import Buf, HexStr, LitStr, Name, Ref
from pdfio_spark.cos.filters import (decode_ascii85, decode_asciihex,
                                     decode_flate, decode_lzw, decode_rle)
from pdfio_spark.fixtures import (ascii85_encode, build_fixture, lzw_encode,
                                  rle_encode)
from pdfio_spark.pd.extract import extract_doc

# ---- COS value serializer for round-trip fuzz (strings as hex: always
# lexer-safe regardless of content) ----

_name_chars = st.text(
    alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E,
                           exclude_characters="()<>{}[]%/# "),
    min_size=1, max_size=12)

_scalar = st.one_of(
    st.integers(min_value=-2**31, max_value=2**31),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              width=32).map(np.float32),
    st.booleans(),
    st.none(),
    _name_chars.map(Name),
    st.binary(max_size=32).map(lambda b: HexStr(b.hex().encode())),
)

_value = st.recursive(
    _scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(_name_chars.map(Name), inner, max_size=4)),
    max_leaves=12)


def _ser(v) -> bytes:
    if v is None:
        return b"null"
    if isinstance(v, bool):
        return b"true" if v else b"false"
    if isinstance(v, Name):
        return b"/" + str(v).encode("latin-1")
    if isinstance(v, HexStr):
        return b"<" + bytes(v) + b">"
    if isinstance(v, (int, np.integer)):
        return str(int(v)).encode()
    if isinstance(v, np.floating):
        # PDF numbers have no exponent syntax; shortest positional
        # decimal that round-trips the float32
        return np.format_float_positional(
            np.float32(v), unique=True, trim="0").encode()
    if isinstance(v, list):
        return b"[ " + b" ".join(_ser(x) for x in v) + b" ]"
    if isinstance(v, dict):
        return (b"<< " + b" ".join(b"/" + str(k).encode("latin-1") + b" "
                                   + _ser(x) for k, x in v.items())
                + b" >>")
    raise TypeError(type(v))


def _norm(v):
    """Null dict values are deleted by the parser (reference semantics);
    floats compare via float32."""
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, np.floating):
        return float(np.float32(v))
    if isinstance(v, HexStr):
        return v.binary
    if isinstance(v, LitStr):
        return bytes(v)
    return v


@given(_value)
@settings(max_examples=200, deadline=None)
def test_cos_value_roundtrip(v):
    data = _ser(v) + b" "
    parsed = Buf(data).parse_value()
    assert _norm(parsed) == _norm(v)


@given(st.binary(max_size=4096))
@settings(max_examples=100, deadline=None)
def test_filter_roundtrips(payload):
    import zlib
    assert decode_flate(zlib.compress(payload)) == payload
    assert decode_rle(rle_encode(payload)) == payload
    assert decode_lzw(lzw_encode(payload)) == payload
    assert decode_asciihex(payload.hex().encode()) == payload
    padded = payload + b" " * (-len(payload) % 4)
    assert decode_ascii85(ascii85_encode(padded)) == padded


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_extract_never_crashes_on_mutation(data):
    """Bit-flipped PDFs must produce a status row, never an exception
    (row-level quarantine is the scale contract)."""
    pdf = bytearray(build_fixture("flate_simple", ["fuzz me"]))
    n_flips = data.draw(st.integers(min_value=1, max_value=8))
    for _ in range(n_flips):
        i = data.draw(st.integers(min_value=0, max_value=len(pdf) - 1))
        pdf[i] = data.draw(st.integers(min_value=0, max_value=255))
    r = extract_doc(bytes(pdf))
    assert r["status"] in ("ok", "partial", "error", "empty",
                           "unsupported_encryption")
    assert isinstance(r["text"], str)


@given(st.binary(min_size=0, max_size=2048))
@settings(max_examples=60, deadline=None)
def test_extract_never_crashes_on_garbage(blob):
    r = extract_doc(blob)
    assert r["status"] in ("ok", "partial", "error", "empty")


@given(st.binary(min_size=0, max_size=2048))
@settings(max_examples=60, deadline=None)
def test_warc_parsers_never_crash_under_safe_iter(blob):
    """The WARC/WET member and record generators, drained through
    _safe_iter (the per-shard isolation wrapper), must terminate
    without raising on arbitrary bytes — including bytes that start
    with gzip or WARC magic."""
    from pdfio_spark.pipeline.sources import (_parse_warc_records,
                                              _safe_iter,
                                              _split_gzip_members)
    for prefix in (b"", b"\x1f\x8b\x08", b"WARC/1.0\r\n"):
        data = prefix + blob
        for member in _safe_iter(_split_gzip_members(data)):
            for rec in _safe_iter(_parse_warc_records(member)):
                assert isinstance(rec["type"], str)


def test_wat_deep_nesting_isolated():
    """A WAT record whose JSON nests past the recursion limit must be
    skipped (RecursionError guarded), not kill the task — and its
    well-formed neighbor must still come through (r6)."""
    import json
    from pdfio_spark.pipeline.sources import (_flatten_wat,
                                              _parse_warc_records)
    deep = ("[" * 5000) + ("]" * 5000)

    def rec(url, body):
        return (b"WARC/1.0\r\nWARC-Type: metadata\r\n"
                b"WARC-Target-URI: " + url + b"\r\n"
                b"WARC-Date: 2026-03-01T00:00:00Z\r\n"
                b"Content-Length: " + str(len(body)).encode()
                + b"\r\n\r\n" + body + b"\r\n\r\n")

    data = rec(b"https://ex.org/deep", deep.encode()) + \
        rec(b"https://ex.org/ok", json.dumps({"a": {"b": 1}}).encode())
    out = []
    for r in _parse_warc_records(data):
        try:
            out.append((r["url"], dict(_flatten_wat(
                json.loads(r["body"])))))
        except (ValueError, UnicodeDecodeError, RecursionError):
            continue
    assert out == [("https://ex.org/ok", {"a.b": "1"})]


def test_wat_flatten_escapes_literal_dots():
    """r6 review: {'a': {'b': 1}} and {'a.b': 2} must flatten to
    DISTINCT map keys (literal dots escaped), not silently collide."""
    from pdfio_spark.pipeline.sources import _flatten_wat
    m = dict(_flatten_wat({"a": {"b": 1}, "a.b": 2}))
    assert m == {"a.b": "1", "a\\.b": "2"}


_json_vals = st.recursive(
    st.one_of(st.none(), st.booleans(), st.integers(),
              st.text(max_size=8)),
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.text(max_size=8), children, max_size=3)),
    max_leaves=20)


@given(_json_vals)
@settings(max_examples=100, deadline=None)
def test_wat_flatten_keys_never_collide(obj):
    """Property: the escaped dotted paths are unique for any JSON
    value — dict(_flatten_wat(x)) loses nothing."""
    from pdfio_spark.pipeline.sources import _flatten_wat
    pairs = list(_flatten_wat(obj))
    assert len(pairs) == len(dict(pairs))


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_writer_roundtrip_property(data):
    """cos/writer round-trip property (r5): ANY fixture class x line
    content x packaging x encryption must re-extract byte-identically
    after rewrite_pdf."""
    from pdfio_spark.cos.writer import rewrite_pdf
    from pdfio_spark.fixtures import FIXTURE_CLASSES
    cls = data.draw(st.sampled_from(
        [c for c in FIXTURE_CLASSES
         if not c.startswith("encrypt_")]))  # writer rejects encrypted in
    lines = data.draw(st.lists(
        st.text(alphabet=st.characters(min_codepoint=32,
                                       max_codepoint=126),
                min_size=0, max_size=40),
        min_size=1, max_size=3))
    pack = data.draw(st.sampled_from(["classic", "objstm"]))
    enc = data.draw(st.sampled_from(
        [None, "rc4-128", "aes-128", "aes-256"]))
    src = build_fixture(cls, lines)
    want = extract_doc(src)
    out = rewrite_pdf(src, encrypt=enc, pack=pack)
    got = extract_doc(out)
    assert got["status"] == want["status"]
    assert got["text"] == want["text"]


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_writer_never_crashes_on_mutated_input(data):
    """rewrite_pdf over a bit-flipped (but still parseable) document
    either returns bytes or raises ValueError/PDFError — never an
    uncontrolled exception."""
    from pdfio_spark.cos.doc import PDFError
    from pdfio_spark.cos.writer import rewrite_pdf
    pdf = bytearray(build_fixture("flate_simple", ["writer fuzz"]))
    n_flips = data.draw(st.integers(min_value=1, max_value=6))
    for _ in range(n_flips):
        i = data.draw(st.integers(min_value=0, max_value=len(pdf) - 1))
        pdf[i] = data.draw(st.integers(min_value=0, max_value=255))
    try:
        out = rewrite_pdf(bytes(pdf))
    except (PDFError, ValueError):
        return
    assert isinstance(out, bytes)
    # and the rewritten artifact still quarantines cleanly
    r = extract_doc(out)
    assert r["status"] in ("ok", "partial", "error", "empty",
                           "unsupported_encryption")


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_append_update_never_crashes_on_mutated_input(data):
    """append_update over a bit-flipped source either returns bytes
    (original still a byte prefix, result still quarantine-clean) or
    raises ValueError/PDFError — never an uncontrolled exception
    (r6, mirrors the rewrite_pdf mutation property)."""
    import zlib
    from pdfio_spark.cos.doc import PDFError
    from pdfio_spark.cos.objects import Name, Stream
    from pdfio_spark.cos.writer import append_update
    pdf = bytearray(build_fixture("flate_simple", ["update fuzz"]))
    n_flips = data.draw(st.integers(min_value=1, max_value=6))
    for _ in range(n_flips):
        i = data.draw(st.integers(min_value=0, max_value=len(pdf) - 1))
        pdf[i] = data.draw(st.integers(min_value=0, max_value=255))
    style = data.draw(st.sampled_from(["classic", "xrefstm"]))
    payload = zlib.compress(b"BT (x) Tj ET")
    stm = Stream({Name("Filter"): Name("FlateDecode"),
                  Name("Length"): len(payload)}, payload)
    try:
        out = append_update(bytes(pdf), {(40, 0): stm}, style=style)
    except (PDFError, ValueError):
        return
    assert isinstance(out, bytes)
    assert out[:len(pdf)] == bytes(pdf)
    r = extract_doc(out)
    assert r["status"] in ("ok", "partial", "error", "empty",
                           "unsupported_encryption")


@given(st.data())
@settings(max_examples=30, deadline=None)
def test_signature_validation_never_crashes_on_mutation(data):
    """Bit-flipped signed PDFs: validate_signatures must return status
    dicts (passed=False or an error string), never raise — and a
    mutation inside the signed range must never validate as passed
    unless the flip missed every signed byte (it can hit the hex
    /Contents gap or padding)."""
    from pdfio_spark.fixtures import make_signed_pdf
    from pdfio_spark.pd.pagetree import PDDoc
    from pdfio_spark.pd.signature import validate_signatures
    pdf = bytearray(make_signed_pdf(["fuzz sig"]))
    i = data.draw(st.integers(min_value=0, max_value=len(pdf) - 1))
    old = pdf[i]
    new = data.draw(st.integers(min_value=0, max_value=255))
    pdf[i] = new
    try:
        doc = PDDoc(bytes(pdf))
    except Exception:
        return  # parse-level quarantine is extract_doc's job
    sts = validate_signatures(doc, bytes(pdf))
    for s in sts:
        assert isinstance(s, dict) and "passed" in s
        if s["passed"] and old != new:
            # only acceptable if the flip landed in the unsigned hex gap
            br_ok = False
            sig_pdf = bytes(pdf)
            lt = sig_pdf.find(b"/Contents <")
            if lt != -1:
                gap_start = lt + len(b"/Contents ")
                gap_end = sig_pdf.find(b">", gap_start) + 1
                br_ok = gap_start <= i < gap_end
            assert br_ok, f"tampered byte {i} validated"


@given(st.data())
@settings(max_examples=20, deadline=None)
def test_trust_validation_never_crashes_on_mutation(data):
    """r4 trust path under mutation: bit-flipped chain-class PDFs
    (leaf/untrusted/ec identities) through validate_signatures WITH a
    trust store must always return status dicts, never raise — the
    chain builder sees malformed certs, truncated CMS pools, and
    corrupt signatures here."""
    from pdfio_spark.fixtures import make_signed_pdf, test_trust_pems
    from pdfio_spark.pd.pagetree import PDDoc
    from pdfio_spark.pd.signature import TrustStore, validate_signatures
    ident = data.draw(st.sampled_from(["leaf", "untrusted", "ec"]))
    pdf = bytearray(make_signed_pdf(["fuzz trust"], identity=ident))
    trust = TrustStore.from_pems(test_trust_pems())
    for _ in range(data.draw(st.integers(min_value=1, max_value=4))):
        i = data.draw(st.integers(min_value=0, max_value=len(pdf) - 1))
        pdf[i] = data.draw(st.integers(min_value=0, max_value=255))
    try:
        doc = PDDoc(bytes(pdf))
    except Exception:
        return
    for s in validate_signatures(doc, bytes(pdf), trust=trust):
        assert isinstance(s, dict) and "passed" in s
        assert isinstance(s["passed"], bool)


@given(st.integers(min_value=1, max_value=2048))
@settings(max_examples=30, deadline=None)
def test_shard_route_covers_all_residues(n):
    """_shard_route must terminate with a FULL residue cover for any
    shard count, and every token must land its shard's partition
    under the same murmur3 the HashPartitioner applies — the property
    the one-task-per-shard exchange routing rests on (the bit-for-bit
    F.hash equivalence of _mmh3_int is pinned in the Spark test)."""
    from pdfio_spark.pipeline.job import _mmh3_int, _shard_route
    toks = _shard_route(n)
    assert sorted(toks) == list(range(n))
    for s, t in toks.items():
        assert _mmh3_int(t) % n == s


@given(st.integers(min_value=-2 ** 63, max_value=2 ** 63 - 1))
@settings(max_examples=200, deadline=None)
def test_mmh3_int_stays_int32(i):
    """Murmur3_x86_32 output must stay in signed-int32 range for any
    input (Spark's Murmur3Hash hashes the low 32 bits of an int
    column; _mmh3_int masks the same way)."""
    from pdfio_spark.pipeline.job import _mmh3_int
    h = _mmh3_int(i)
    assert -(1 << 31) <= h < (1 << 31)
