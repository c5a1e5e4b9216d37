#!/usr/bin/env python3
"""Generate the round-4 signature-trust test identities (synthetic,
NOT real credentials — like data/pki_test_identity.pem):

- sig_ca_identity.pem        CA root (CA:TRUE), IN the test trust store
- sig_leaf_identity.pem      leaf signed BY the CA (leaf cert + CA cert
                             + leaf key in one PEM); NOT in the store —
                             trusted only via chain building
- sig_untrusted_identity.pem self-signed, NOT in the store — the
                             chain_untrusted negative (mirrors the
                             reference's verify_local_trust error for a
                             self-signed cert absent from the store,
                             src/PDSignature.jl:13-18)
- sig_ec_identity.pem        EC P-256 self-signed, IN the store — the
                             ECDSA signature-algorithm class

Validity windows (2020-01-01 .. 2040-01-01) straddle the fixtures'
signing time /M D:20260101000000Z. Run once; PEMs are committed.
"""
from __future__ import annotations

import datetime
import os

from cryptography import x509
from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import ec, rsa
from cryptography.x509.oid import NameOID

NB = datetime.datetime(2020, 1, 1)
NA = datetime.datetime(2040, 1, 1)
OUT = os.path.join(os.path.dirname(__file__), "..", "pdfio_spark", "data")


def _name(cn: str) -> x509.Name:
    return x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, cn)])


def _build(subject_cn, issuer_cn, pubkey, signing_key, serial, ca=False):
    b = (x509.CertificateBuilder()
         .subject_name(_name(subject_cn)).issuer_name(_name(issuer_cn))
         .public_key(pubkey).serial_number(serial)
         .not_valid_before(NB).not_valid_after(NA)
         .add_extension(x509.BasicConstraints(ca=ca, path_length=None),
                        critical=True))
    return b.sign(signing_key, hashes.SHA256())


def _pem_key(key) -> bytes:
    return key.private_bytes(serialization.Encoding.PEM,
                             serialization.PrivateFormat.PKCS8,
                             serialization.NoEncryption())


def _write(fname: str, blobs: list[bytes]) -> None:
    path = os.path.normpath(os.path.join(OUT, fname))
    with open(path, "wb") as f:
        for b in blobs:
            f.write(b)
    print("wrote", path)


def main() -> None:
    pem = serialization.Encoding.PEM

    ca_key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    ca_cert = _build("pdfio-spark-ca", "pdfio-spark-ca",
                     ca_key.public_key(), ca_key, 10, ca=True)
    _write("sig_ca_identity.pem",
           [ca_cert.public_bytes(pem), _pem_key(ca_key)])

    leaf_key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    leaf_cert = _build("pdfio-spark-leaf", "pdfio-spark-ca",
                       leaf_key.public_key(), ca_key, 11)
    # leaf cert FIRST (the identity), then the CA cert (CMS extra)
    _write("sig_leaf_identity.pem",
           [leaf_cert.public_bytes(pem), ca_cert.public_bytes(pem),
            _pem_key(leaf_key)])

    un_key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    un_cert = _build("pdfio-spark-untrusted", "pdfio-spark-untrusted",
                     un_key.public_key(), un_key, 12)
    _write("sig_untrusted_identity.pem",
           [un_cert.public_bytes(pem), _pem_key(un_key)])

    ec_key = ec.generate_private_key(ec.SECP256R1())
    ec_cert = _build("pdfio-spark-ec", "pdfio-spark-ec",
                     ec_key.public_key(), ec_key, 13)
    _write("sig_ec_identity.pem",
           [ec_cert.public_bytes(pem), _pem_key(ec_key)])


if __name__ == "__main__":
    main()
