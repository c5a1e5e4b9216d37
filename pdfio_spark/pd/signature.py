"""Digital-signature validation (SURVEY X11; reference
src/PDSignature.jl:101-154 pd_validate_signature + PDCrypt.jl CMS).

Supports the reference's SubFilter matrix:
  adbe.pkcs7.detached / ETSI.CAdES.detached — CMS SignedData over the
      /ByteRange bytes (detached content);
  adbe.pkcs7.sha1 — CMS SignedData whose encapsulated content is the
      SHA-1 of the /ByteRange bytes;
  adbe.x509.rsa_sha1 — PKCS#1 signature in /Contents with the signer
      certificate in /Cert.

CMS parsing is a minimal DER walk (tag-length-value; SignedData layout
per RFC 5652) — no external ASN.1 schema; RSA/ECDSA verification and
X.509 handling via the public `cryptography` package. Validation is
local (signature integrity + signer identity + cert validity window vs
the /M signing time); passing a TrustStore additionally anchors the
signer chain to a caller-supplied root set, mirroring the reference's
CertStore / verify_local_trust (src/PDSignature.jl:13-48).
"""
from __future__ import annotations

import hashlib

from ..cos.objects import HexStr, LitStr, Name

__all__ = ["get_signature_fields", "validate_signatures", "TrustStore",
           "set_trust_roots", "get_default_trust"]

OID_SIGNED_DATA = "1.2.840.113549.1.7.2"
OID_MESSAGE_DIGEST = "1.2.840.113549.1.9.4"
OID_RSA = "1.2.840.113549.1.1.1"
_OID_HASH = {
    "1.2.840.113549.2.5": "md5",
    "1.3.14.3.2.26": "sha1",
    "2.16.840.1.101.3.4.2.1": "sha256",
    "2.16.840.1.101.3.4.2.2": "sha384",
    "2.16.840.1.101.3.4.2.3": "sha512",
}
# signatureAlgorithm OIDs that bind their own digest
_OID_SIGALG_HASH = {
    "1.2.840.113549.1.1.5": "sha1",
    "1.2.840.113549.1.1.11": "sha256",
    "1.2.840.113549.1.1.12": "sha384",
    "1.2.840.113549.1.1.13": "sha512",
    # ECDSA (r4 — the reference gets these free via OpenSSL EVP)
    "1.2.840.10045.4.1": "sha1",
    "1.2.840.10045.4.3.2": "sha256",
    "1.2.840.10045.4.3.3": "sha384",
    "1.2.840.10045.4.3.4": "sha512",
}


# ------------------------------------------------------------- DER walk

def _tlv(data: bytes, off: int) -> tuple[int, bool, bytes, int, int]:
    """-> (tag_byte, constructed, content, content_off, next_off)."""
    if off >= len(data):
        raise ValueError("DER: truncated")
    tag = data[off]
    constructed = bool(tag & 0x20)
    i = off + 1
    ln = data[i]
    i += 1
    if ln & 0x80:
        n = ln & 0x7F
        if n == 0:
            # BER indefinite length (0x80): silently parsing it as
            # length 0 yielded empty content and a misleading
            # 'not SignedData' — fail with the real reason
            # (r5 core review)
            raise ValueError("DER: BER indefinite length unsupported")
        ln = int.from_bytes(data[i:i + n], "big")
        i += n
    return tag, constructed, data[i:i + ln], i, i + ln


def _children(content: bytes) -> list[tuple[int, bytes, bytes]]:
    """-> [(tag, inner_content, full_tlv_bytes)] for a constructed blob."""
    out = []
    off = 0
    while off < len(content):
        tag, _, inner, _, nxt = _tlv(content, off)
        out.append((tag, inner, content[off:nxt]))
        off = nxt
    return out


def _oid_str(content: bytes) -> str:
    if not content:
        return ""
    first = content[0]
    parts = [str(first // 40), str(first % 40)]
    v = 0
    for b in content[1:]:
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            parts.append(str(v))
            v = 0
    return ".".join(parts)


# --------------------------------------------------------- CMS SignedData

def _parse_signed_data(der: bytes) -> dict:
    """ContentInfo -> {econtent, certs_der[], signer_infos[]}; each
    signer_info = {digest, sig_hash, signed_attrs_raw, message_digest,
    signature}."""
    tag, _, ci, _, _ = _tlv(der, 0)
    if tag != 0x30:
        raise ValueError("CMS: not a SEQUENCE")
    kids = _children(ci)
    if not kids or _oid_str(kids[0][1]) != OID_SIGNED_DATA:
        raise ValueError("CMS: not SignedData")
    # [0] EXPLICIT content
    sd_seq = _children(kids[1][1])[0][1]  # SignedData SEQUENCE content
    certs_der: list[bytes] = []
    econtent = None
    signer_infos = []
    elems = _children(sd_seq)
    idx = 0
    # version, digestAlgorithms, encapContentInfo
    idx += 1  # version INTEGER
    idx += 1  # digestAlgorithms SET
    encap = _children(elems[idx][1])
    idx += 1
    if len(encap) > 1:  # [0] EXPLICIT eContent OCTET STRING
        inner = _children(encap[1][1])
        if inner and inner[0][0] == 0x04:
            econtent = inner[0][1]
    while idx < len(elems) and elems[idx][0] in (0xA0, 0xA1):
        if elems[idx][0] == 0xA0:  # certificates IMPLICIT SET
            certs_der = [full for _, _, full in _children(elems[idx][1])]
        idx += 1
    for _, si_content, _ in _children(elems[idx][1]):  # signerInfos SET
        si_elems = _children(si_content)
        j = 0
        j += 1  # version
        j += 1  # sid
        digest_oid = _oid_str(_children(si_elems[j][1])[0][1])
        j += 1
        signed_attrs_raw = None
        message_digest = None
        if si_elems[j][0] == 0xA0:  # [0] IMPLICIT signedAttrs
            signed_attrs_raw = si_elems[j][2]
            for _, attr, _ in _children(si_elems[j][1]):
                a = _children(attr)
                if _oid_str(a[0][1]) == OID_MESSAGE_DIGEST:
                    vals = _children(a[1][1])
                    if vals and vals[0][0] == 0x04:
                        message_digest = vals[0][1]
            j += 1
        sigalg_oid = _oid_str(_children(si_elems[j][1])[0][1])
        j += 1
        signature = si_elems[j][1]
        signer_infos.append({
            "digest": _OID_HASH.get(digest_oid, "sha256"),
            "sig_hash": _OID_SIGALG_HASH.get(sigalg_oid),
            "signed_attrs_raw": signed_attrs_raw,
            "message_digest": message_digest,
            "signature": signature,
        })
    return {"econtent": econtent, "certs_der": certs_der,
            "signer_infos": signer_infos}


def _hash_name_to_obj(name: str):
    from cryptography.hazmat.primitives import hashes
    return {"md5": hashes.MD5, "sha1": hashes.SHA1, "sha256": hashes.SHA256,
            "sha384": hashes.SHA384, "sha512": hashes.SHA512}[name]()


def _key_verify(cert, data: bytes, signature: bytes, hash_name: str) -> bool:
    """Verify `signature` over `data` with the cert's public key:
    RSA PKCS#1 v1.5 or ECDSA (DER r/s), keyed on the key type — the
    reference gets both free via OpenSSL EVP_Verify*."""
    from cryptography.hazmat.primitives.asymmetric import ec, padding, rsa
    try:
        pub = cert.public_key()
        if isinstance(pub, rsa.RSAPublicKey):
            pub.verify(signature, data, padding.PKCS1v15(),
                       _hash_name_to_obj(hash_name))
        elif isinstance(pub, ec.EllipticCurvePublicKey):
            pub.verify(signature, data,
                       ec.ECDSA(_hash_name_to_obj(hash_name)))
        else:
            return False
        return True
    except Exception:
        return False


def _verify_cms(contents: bytes, signed_bytes: bytes,
                embedded_digest: bool = False) -> dict:
    """Verify a CMS SignedData blob against the ByteRange bytes.
    embedded_digest: adbe.pkcs7.sha1 — eContent is sha1(signed_bytes)."""
    from cryptography import x509
    sd = _parse_signed_data(contents)
    certs = []
    for cd in sd["certs_der"]:
        try:
            certs.append(x509.load_der_x509_certificate(cd))
        except Exception:
            pass
    if not certs:
        return {"passed": False, "error": "no signer certificate"}
    if embedded_digest:
        if sd["econtent"] is None:
            return {"passed": False, "error": "missing eContent"}
        if sd["econtent"] != hashlib.sha1(signed_bytes).digest():
            return {"passed": False, "error": "document digest mismatch"}
        content = sd["econtent"]
    else:
        content = signed_bytes
    for si in sd["signer_infos"]:
        h = si["digest"]
        if si["signed_attrs_raw"] is not None:
            # messageDigest attribute must match the content hash
            md = hashlib.new(h, content).digest()
            if si["message_digest"] != md:
                continue
            # signature is over the attrs re-tagged [0] -> SET (0x31)
            attrs = b"\x31" + si["signed_attrs_raw"][1:]
            to_verify = attrs
        else:
            to_verify = content
        vh = si["sig_hash"] or h
        for cert in certs:
            if _key_verify(cert, to_verify, si["signature"], vh):
                try:
                    signer = cert.subject.rfc4514_string()
                except Exception:
                    signer = ""
                return {"passed": True, "signer": signer, "error": None,
                        "_cert": cert, "_pool": certs}
    return {"passed": False, "error": "signature verification failed"}


# ---------------------------------------------------------- trust store

class TrustStore:
    """Trust-anchor set (mirrors the reference's CertStore,
    src/PDSignature.jl:13-28 verify_local_trust / verify!): a signer
    cert is trusted if it is itself in the store, or if an issuer chain
    built through the CMS-included certs and the store terminates at a
    store member. Each chain link must have a verifying signature and a
    validity window covering the signing time."""

    def __init__(self, certs) -> None:
        self._ders = {c.public_bytes(_der_enc()) for c in certs}
        self._certs = list(certs)

    @classmethod
    def from_pems(cls, pems: list[bytes]) -> "TrustStore":
        from cryptography import x509
        certs = []
        for pem in pems:
            certs.extend(x509.load_pem_x509_certificates(pem))
        return cls(certs)

    def find(self, cert) -> bool:
        return cert.public_bytes(_der_enc()) in self._ders

    @property
    def certs(self) -> list:
        return self._certs


def _der_enc():
    from cryptography.hazmat.primitives.serialization import Encoding
    return Encoding.DER


# Production trust-root surface (mirrors set_pki_credentials /
# $PDFIO_SPARK_PKI_ID, cos/crypt.py:297-330): set_trust_roots() beats
# $PDFIO_SPARK_TRUST_PEMS (os.pathsep-separated PEM file paths) beats
# None (local validation only — the pre-r5 default behavior).
_TRUST_CONFIG: "TrustStore | None" = None
_ENV_TRUST_CACHE: "tuple[str, TrustStore | None] | None" = None


def set_trust_roots(trust) -> None:
    """Install process-wide trust anchors used by validate_signatures
    when no explicit store is passed. Accepts a TrustStore, an iterable
    of PEM bytes, or None to clear.

    PROCESS-LOCAL: set on the driver it does not reach Spark executor
    processes — pass `trust` explicitly into UDF closures or ship
    $PDFIO_SPARK_TRUST_PEMS via spark.executorEnv for cluster runs."""
    global _TRUST_CONFIG, _ENV_TRUST_CACHE
    if trust is None or isinstance(trust, TrustStore):
        _TRUST_CONFIG = trust
    else:
        _TRUST_CONFIG = TrustStore.from_pems(list(trust))
    _ENV_TRUST_CACHE = None


def read_pathsep_blobs(spec: str) -> list[bytes]:
    """os.pathsep-separated file paths -> their raw bytes (empty
    segments skipped). The ONE parsing contract shared by the three
    $PDFIO_SPARK_* env loaders below and run.py's --trust-pems/
    --crl-pems/--ocsp-ders flags (r6 review: three hand-maintained
    copies of the same loop had started to accumulate)."""
    import os
    blobs = []
    for path in spec.split(os.pathsep):
        if path:
            with open(path, "rb") as f:
                blobs.append(f.read())
    return blobs


def get_default_trust() -> "TrustStore | None":
    """The configured trust store, or None for local-validation-only.
    The env path is parsed once per process and cached (executors
    re-read only if the variable changes)."""
    global _ENV_TRUST_CACHE
    if _TRUST_CONFIG is not None:
        return _TRUST_CONFIG
    import os
    spec = os.environ.get("PDFIO_SPARK_TRUST_PEMS")
    if not spec:
        return None
    if _ENV_TRUST_CACHE is not None and _ENV_TRUST_CACHE[0] == spec:
        return _ENV_TRUST_CACHE[1]
    pems = read_pathsep_blobs(spec)
    store = TrustStore.from_pems(pems) if pems else None
    _ENV_TRUST_CACHE = (spec, store)
    return store


#: Process-wide CRL set for revocation checks (r6 — BEYOND the
#: reference: PDFIO.jl's OpenSSL store does not consult revocation at
#: all). Same precedence shape as the trust roots: explicit
#: validate_signatures(crls=...) beats set_revocation_crls() beats
#: $PDFIO_SPARK_CRL_PEMS (os.pathsep-separated CRL PEM/DER paths)
#: beats none (no revocation checking — the reference's behavior).
_CRL_CONFIG: "list | None" = None
_ENV_CRL_CACHE: "tuple[str, list] | None" = None


def _load_crls(blobs) -> list:
    from cryptography import x509
    out = []
    for b in blobs:
        if hasattr(b, "issuer"):  # already a loaded CRL object
            out.append(b)
            continue
        try:
            out.append(x509.load_pem_x509_crl(b))
        except ValueError:
            out.append(x509.load_der_x509_crl(b))
    return out


def set_revocation_crls(crls) -> None:
    """Install process-wide certificate revocation lists used by
    validate_signatures when no explicit `crls` is passed. Accepts an
    iterable of CRL objects or PEM/DER bytes, or None to clear.

    PROCESS-LOCAL, like set_trust_roots: a module global set on the
    driver never reaches Spark executor processes (the set_media_codecs
    lesson). For distributed validation either pass `crls` explicitly
    so it snapshots into the UDF closure, or ship
    $PDFIO_SPARK_CRL_PEMS to executors via spark.executorEnv."""
    global _CRL_CONFIG, _ENV_CRL_CACHE
    _CRL_CONFIG = None if crls is None else _load_crls(list(crls))
    _ENV_CRL_CACHE = None


def get_default_crls() -> list:
    """The configured CRL set, or [] for no revocation checking. Env
    paths are parsed once per process and cached (same contract as
    get_default_trust)."""
    global _ENV_CRL_CACHE
    if _CRL_CONFIG is not None:
        return _CRL_CONFIG
    import os
    spec = os.environ.get("PDFIO_SPARK_CRL_PEMS")
    if not spec:
        return []
    if _ENV_CRL_CACHE is not None and _ENV_CRL_CACHE[0] == spec:
        return _ENV_CRL_CACHE[1]
    crls = _load_crls(read_pathsep_blobs(spec))
    _ENV_CRL_CACHE = (spec, crls)
    return crls


#: Process-wide OCSP response set (r6, the offline half of RFC 6960:
#: responses are pre-fetched DER blobs — this sandbox has no network,
#: and a 1000-executor cluster should not hammer a responder per task
#: either; stapling pre-fetched responses is the at-scale shape).
#: Same precedence ladder and PROCESS-LOCAL scope as the CRL set:
#: explicit validate_signatures(ocsp=...) beats set_revocation_ocsp()
#: beats $PDFIO_SPARK_OCSP_DERS (os.pathsep-separated DER paths)
#: beats none.
_OCSP_CONFIG: "list | None" = None
_ENV_OCSP_CACHE: "tuple[str, list] | None" = None


def _load_ocsps(blobs) -> list:
    from cryptography.x509 import ocsp as _ocsp
    out = []
    for b in blobs:
        if isinstance(b, (bytes, bytearray, memoryview)):
            out.append(_ocsp.load_der_ocsp_response(bytes(b)))
        else:
            # already a loaded OCSPResponse. Detect by TYPE, not by
            # probing a data property: tbs_response_bytes RAISES
            # ValueError (not AttributeError) on a loaded
            # non-SUCCESSFUL response, so hasattr-probing crashed on
            # objects the docstring accepts (r6 review)
            out.append(b)
    return out


def set_revocation_ocsp(responses) -> None:
    """Install process-wide pre-fetched OCSP responses consulted by
    validate_signatures when no explicit `ocsp` is passed. Accepts an
    iterable of loaded OCSPResponse objects or DER bytes, or None to
    clear. PROCESS-LOCAL like set_revocation_crls: driver globals
    never reach executors — pass `ocsp` explicitly on the pipeline
    surface or ship $PDFIO_SPARK_OCSP_DERS via spark.executorEnv."""
    global _OCSP_CONFIG, _ENV_OCSP_CACHE
    _OCSP_CONFIG = (None if responses is None
                    else _load_ocsps(list(responses)))
    _ENV_OCSP_CACHE = None


def get_default_ocsps() -> list:
    """The configured OCSP response set, or [] for none. Env paths
    parsed once per process and cached (same contract as
    get_default_crls)."""
    global _ENV_OCSP_CACHE
    if _OCSP_CONFIG is not None:
        return _OCSP_CONFIG
    import os
    spec = os.environ.get("PDFIO_SPARK_OCSP_DERS")
    if not spec:
        return []
    if _ENV_OCSP_CACHE is not None and _ENV_OCSP_CACHE[0] == spec:
        return _ENV_OCSP_CACHE[1]
    rs = _load_ocsps(read_pathsep_blobs(spec))
    _ENV_OCSP_CACHE = (spec, rs)
    return rs


def _crl_sig_valid(crl, cand) -> bool:
    try:
        return crl.is_signature_valid(cand.public_key())
    except Exception:
        return False


def _revocation_error(cert, pool, trust, crls, when) -> str | None:
    """'revoked signer certificate' if an APPLICABLE CRL lists the
    signer's serial. Applicable = the CRL's issuer matches the cert's
    issuer AND its signature verifies against a known certificate
    with that subject (CMS pool or trust store) — an unauthenticated
    CRL can neither revoke nor un-revoke anything. With /M present,
    only revocations effective at or before the signing time count
    (a cert revoked AFTER a signature was made does not invalidate
    it — the CRL analogue of the expiry-vs-/M rule).

    The CRL is authenticated against EVERY candidate whose subject
    matches its issuer, not just the first: the CMS pool rides in
    /Contents, OUTSIDE /ByteRange, so an attacker can prepend a
    same-subject/wrong-key decoy cert — first-match would try the
    decoy, fail the CRL signature, and silently skip the genuine
    revocation. Candidates must also be valid at the signing time
    (same _cert_in_window rule every _trust_error chain link obeys)."""
    candidates = list(pool) + (trust.certs if trust is not None else [])
    for crl in crls:
        if crl.issuer != cert.issuer:
            continue
        if not any(
                c.subject == crl.issuer and _cert_in_window(c, when)
                and _crl_sig_valid(crl, c)
                for c in candidates):
            continue
        entry = crl.get_revoked_certificate_by_serial_number(
            cert.serial_number)
        if entry is None:
            continue
        try:
            rd = entry.revocation_date_utc.replace(tzinfo=None)
        except AttributeError:
            rd = entry.revocation_date
        if when is None or rd <= when:
            return "revoked signer certificate"
    return None


def _ocsp_id_matches(resp, cert, issuer) -> bool:
    """Does the response's CertID (RFC 6960 4.1.1: hash of issuer
    subject DER + hash of issuer public key + serial, in the
    response's own hash algorithm) bind `cert` under `issuer`?
    Computed by building the matching OCSPRequest and comparing its
    fields — correct by construction, no hand-rolled DER hashing."""
    from cryptography.x509 import ocsp as _ocsp
    try:
        req = (_ocsp.OCSPRequestBuilder()
               .add_certificate(cert, issuer, resp.hash_algorithm)
               .build())
        return (req.serial_number == resp.serial_number
                and req.issuer_name_hash == resp.issuer_name_hash
                and req.issuer_key_hash == resp.issuer_key_hash)
    except Exception:
        return False


def _ocsp_sig_valid(resp, cand) -> bool:
    halg = resp.signature_hash_algorithm
    if halg is None:
        return False
    return _key_verify(cand, resp.tbs_response_bytes, resp.signature,
                       halg.name)


def _ocsp_revocation_error(cert, pool, trust, ocsps, when) -> str | None:
    """'revoked signer certificate' if an APPLICABLE pre-fetched OCSP
    response reports the signer REVOKED at or before the /M signing
    time. Applicable = the response's CertID binds the signer under a
    candidate issuer cert (CMS pool or trust store, valid at `when`)
    AND its signature authenticates — signed by that issuer directly,
    or by a delegated responder cert carried IN the response that the
    issuer signed for id-kp-OCSPSigning (RFC 6960 4.2.2.2). Same
    decoy discipline as _revocation_error: every CertID-matching
    issuer candidate is tried, never just the first (the CMS pool
    rides outside /ByteRange). A GOOD response neither un-revokes a
    CRL hit nor blocks later responses — revocation holds if ANY
    authenticated source reports it, matching the CRL semantics."""
    from cryptography import x509
    from cryptography.x509 import ocsp as _ocsp
    from cryptography.x509.oid import ExtendedKeyUsageOID
    candidates = list(pool) + (trust.certs if trust is not None else [])
    issuers = [c for c in candidates
               if c.subject == cert.issuer and _cert_in_window(c, when)]
    if not issuers:
        return None
    for resp in ocsps:
        try:
            if (resp.response_status
                    != _ocsp.OCSPResponseStatus.SUCCESSFUL):
                continue
            matched = [c for c in issuers
                       if _ocsp_id_matches(resp, cert, c)]
            if not matched:
                continue
            authentic = any(_ocsp_sig_valid(resp, c) for c in matched)
            if not authentic:
                for d in resp.certificates:
                    if not _cert_in_window(d, when):
                        continue
                    try:
                        eku = d.extensions.get_extension_for_class(
                            x509.ExtendedKeyUsage).value
                    except x509.ExtensionNotFound:
                        continue
                    if ExtendedKeyUsageOID.OCSP_SIGNING not in eku:
                        continue
                    if (any(_link_verifies(d, c) for c in matched)
                            and _ocsp_sig_valid(resp, d)):
                        authentic = True
                        break
            if not authentic:
                continue
            if (resp.certificate_status
                    != _ocsp.OCSPCertStatus.REVOKED):
                continue
            try:
                rd = resp.revocation_time_utc.replace(tzinfo=None)
            except AttributeError:
                rd = resp.revocation_time
        except Exception:
            # a malformed/multi-single response can't revoke; the
            # authenticity gate above already ran or failed closed
            continue
        if rd is not None and (when is None or rd <= when):
            return "revoked signer certificate"
    return None


def _cert_in_window(cert, when) -> bool:
    if when is None:
        return True
    try:
        nb = cert.not_valid_before_utc.replace(tzinfo=None)
        na = cert.not_valid_after_utc.replace(tzinfo=None)
    except AttributeError:
        nb, na = cert.not_valid_before, cert.not_valid_after
    return nb <= when <= na


def _link_verifies(child, issuer) -> bool:
    """issuer's public key verifies child's certificate signature."""
    halg = child.signature_hash_algorithm
    if halg is None:
        return False
    return _key_verify(issuer, child.tbs_certificate_bytes,
                       child.signature, halg.name)


def _trust_error(cert, pool, trust: TrustStore, when) -> str | None:
    """None if `cert` chains to the trust store; else the error string.
    Mirrors verify_local_trust semantics: a direct store member is
    trusted outright; otherwise build the issuer chain through the CMS
    cert pool + store (the reference's OpenSSL store does the same with
    -attime = the /M signing time)."""
    if trust.find(cert):
        return None
    candidates = list(pool) + trust.certs
    cur = cert
    for _ in range(8):  # depth guard
        if cur.issuer == cur.subject:  # self-signed, not in store
            break
        nxt = None
        for c in candidates:
            if (c.subject == cur.issuer and _link_verifies(cur, c)
                    and _cert_in_window(c, when)):
                nxt = c
                break
        if nxt is None:
            break
        if trust.find(nxt):
            return None
        cur = nxt
    return "untrusted signer certificate"


# ----------------------------------------------------------- PDF plane

def get_signature_fields(doc) -> list[dict]:
    """AcroForm walk -> resolved /FT /Sig field dicts (parity with
    has_signature, PDDocImpl.jl:141-153, but returning the fields)."""
    cos = doc.cos
    acro = cos.get(doc.catalog, Name("AcroForm"))
    if acro is None:
        return []
    out: list[dict] = []
    seen: set[int] = set()

    def walk(flds, depth: int) -> None:
        if not isinstance(flds, list) or depth > 16:
            return
        for fobj in flds:
            fld = cos.get_object(fobj)
            if not isinstance(fld, dict) or id(fld) in seen:
                continue
            seen.add(id(fld))
            if cos.get(fld, Name("FT")) == Name("Sig"):
                out.append(fld)
            kids = cos.get(fld, Name("Kids"))
            if kids is not None:
                walk(kids, depth + 1)

    walk(cos.get(acro, Name("Fields")), 0)
    return out


_SUBFILTERS = ("adbe.x509.rsa_sha1", "adbe.pkcs7.detached",
               "adbe.pkcs7.sha1", "ETSI.CAdES.detached")


from ..cos.objects import str_bytes as _str_bytes  # canonical coercion


def _cert_info(cert) -> dict:
    """subject/issuer/PEM text for a signer cert — the reference's
    :certs entries (get_info + export path, PDDoc.jl:535-559)."""
    from cryptography.hazmat.primitives.serialization import Encoding
    try:
        return {"subject": cert.subject.rfc4514_string(),
                "issuer": cert.issuer.rfc4514_string(),
                "pem": cert.public_bytes(Encoding.PEM).decode("ascii")}
    except Exception:
        return {"subject": "", "issuer": "", "pem": ""}


def validate_signatures(doc, data: bytes,
                        trust: "TrustStore | None" = None,
                        export_certs: bool = False,
                        crls: "list | None" = None,
                        ocsp: "list | None" = None) -> list[dict]:
    """pd_validate_signature (PDSignature.jl:101-154) over every /Sig
    field: returns one status dict per signature with passed/subfilter/
    name/m/signer/error. With a TrustStore, additionally anchors the
    signer chain (verify_local_trust / verify!, PDSignature.jl:13-48):
    a cryptographically valid signature from a cert that neither sits
    in nor chains to the store fails with
    'untrusted signer certificate'. trust=None falls back to the
    process-wide store (set_trust_roots / $PDFIO_SPARK_TRUST_PEMS, r5);
    with neither configured, behavior is the pre-r4 local-validation
    default. `crls` (r6, beyond the reference) adds revocation: an
    authenticated CRL listing the signer's serial — effective at the
    /M signing time — fails the signature with 'revoked signer
    certificate' (explicit arg > set_revocation_crls >
    $PDFIO_SPARK_CRL_PEMS > none). `ocsp` is the pre-fetched-response
    twin (RFC 6960; explicit arg > set_revocation_ocsp >
    $PDFIO_SPARK_OCSP_DERS > none) — CRL and OCSP combine as ANY
    authenticated source reporting revocation-at-/M fails the
    signature."""
    if trust is None:
        trust = get_default_trust()
    if crls is None:
        crls = get_default_crls()
    else:
        crls = _load_crls(list(crls))
    if ocsp is None:
        ocsp = get_default_ocsps()
    else:
        ocsp = _load_ocsps(list(ocsp))
    cos = doc.cos
    out = []
    for fld in get_signature_fields(doc):
        status = {"passed": False, "subfilter": None, "name": None,
                  "m": None, "signer": None, "error": None}
        out.append(status)
        sig = cos.get(fld, Name("V"))
        if not isinstance(sig, dict):
            status["error"] = "no /V"
            continue
        sub = cos.get(sig, Name("SubFilter"))
        status["subfilter"] = str(sub) if sub is not None else None
        nm = cos.get(sig, Name("Name"))
        if nm is not None:
            status["name"] = (_str_bytes(nm).decode("latin-1")
                              if not isinstance(nm, str) else str(nm))
        m = cos.get(sig, Name("M"))
        if m is not None:
            status["m"] = (_str_bytes(m).decode("latin-1")
                           if not isinstance(m, str) else str(m))
        if str(sub) not in _SUBFILTERS:
            status["error"] = f"unsupported subfilter {sub}"
            continue
        brange = cos.get(sig, Name("ByteRange"))
        # Contents must come raw (never through the security handler) —
        # the signature covers the encrypted bytes (ref :118-120)
        contents = _str_bytes(sig.get(Name("Contents")))
        if not isinstance(brange, list) or len(brange) % 2 or not contents:
            status["error"] = "missing ByteRange/Contents"
            continue
        try:
            br = [int(cos.get_object(x)) for x in brange]
            signed = b"".join(data[br[i]:br[i] + br[i + 1]]
                              for i in range(0, len(br), 2))
            if str(sub) == "adbe.x509.rsa_sha1":
                r = _verify_x509_rsa_sha1(cos, sig, contents, signed)
            else:
                r = _verify_cms(contents, signed,
                                embedded_digest=str(sub) == "adbe.pkcs7.sha1")
            cert = r.pop("_cert", None)
            pool = r.pop("_pool", [cert] if cert is not None else [])
            status.update(r)
            if export_certs and pool:
                # the reference writes these to <pdf>.pem
                # (PDDoc.jl:548-559); executors must not write local
                # files, so the PEM text rides in the status row and
                # the caller persists it (e.g. to a certs column/sink)
                status["certs"] = [_cert_info(c) for c in pool]
            if status["passed"] and cert is not None:
                exp = _expiry_error(cert, status["m"])
                if exp is not None:
                    status["passed"] = False
                    status["error"] = exp
            if status["passed"] and cert is not None and trust is not None:
                when = _signing_time(status["m"])
                terr = _trust_error(cert, pool, trust, when)
                if terr is not None:
                    status["passed"] = False
                    status["error"] = terr
            if status["passed"] and cert is not None and crls:
                rerr = _revocation_error(cert, pool, trust, crls,
                                         _signing_time(status["m"]))
                if rerr is not None:
                    status["passed"] = False
                    status["error"] = rerr
            if status["passed"] and cert is not None and ocsp:
                rerr = _ocsp_revocation_error(
                    cert, pool, trust, ocsp,
                    _signing_time(status["m"]))
                if rerr is not None:
                    status["passed"] = False
                    status["error"] = rerr
        except Exception as e:
            status["error"] = f"{type(e).__name__}: {e}"
    return out


def _signing_time(m: str | None):
    """/M (CDDate) -> naive UTC datetime, or None if absent/unparsable
    (the reference sets the store's atepoch from /M the same way,
    PDSignature.jl:33-40)."""
    if not m:
        return None
    from .dates import CDDate
    try:
        return CDDate(m).utc()
    except Exception:
        return None


def _expiry_error(cert, m: str | None) -> str | None:
    """Signer-cert validity window vs the signing time (/M, CDDate):
    the reference's OpenSSL store surfaces expired certs as failures
    (test/runtests.jl:182-235 expired-cert case). Chain/trust
    anchoring is the separate TrustStore/_trust_error pass (r4) —
    this check runs regardless of whether a store was supplied."""
    if not m:
        return None
    from .dates import CDDate
    try:
        when = CDDate(m).utc()
    except Exception:
        return None
    try:  # cryptography >= 42 tz-aware accessors
        nb = cert.not_valid_before_utc.replace(tzinfo=None)
        na = cert.not_valid_after_utc.replace(tzinfo=None)
    except AttributeError:
        nb, na = cert.not_valid_before, cert.not_valid_after
    if when > na:
        return "certificate expired"
    if when < nb:
        return "certificate not yet valid"
    return None


def _verify_x509_rsa_sha1(cos, sig: dict, contents: bytes,
                          signed: bytes) -> dict:
    from cryptography import x509
    cert_obj = cos.get(sig, Name("Cert"))
    if isinstance(cert_obj, list):
        cert_obj = cos.get_object(cert_obj[0]) if cert_obj else None
    cder = _str_bytes(cert_obj)
    if not cder:
        return {"passed": False, "error": "missing /Cert"}
    cert = x509.load_der_x509_certificate(cder)
    # Contents is a DER OCTET STRING wrapping the PKCS#1 signature
    sig_bytes = contents
    if contents[:1] == b"\x04":
        try:
            _, _, sig_bytes, _, _ = _tlv(contents, 0)
        except Exception:
            sig_bytes = contents
    if _key_verify(cert, signed, sig_bytes, "sha1"):
        return {"passed": True, "signer": cert.subject.rfc4514_string(),
                "error": None, "_cert": cert, "_pool": [cert]}
    return {"passed": False, "error": "signature verification failed"}
