#!/usr/bin/env python3
"""Generate data/sig_expired_identity.pem — a synthetic RSA identity
whose certificate validity window (2000-01-01 .. 2001-01-01) lies
entirely BEFORE the fixtures' signing time (/M D:20260101000000Z), for
the expired-certificate signature class. Mirrors the reference's
expired-cert test surface (test/runtests.jl:182-235) without importing
a trust store. Run once; the PEM is committed (synthetic, NOT a real
credential — like data/pki_test_identity.pem)."""
from __future__ import annotations

import datetime
import os

from cryptography import x509
from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import rsa
from cryptography.x509.oid import NameOID


def main() -> None:
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([
        x509.NameAttribute(NameOID.COMMON_NAME, "pdfio-spark-expired")])
    cert = (x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(2)
            .not_valid_before(datetime.datetime(2000, 1, 1))
            .not_valid_after(datetime.datetime(2001, 1, 1))
            .sign(key, hashes.SHA256()))
    pem = (cert.public_bytes(serialization.Encoding.PEM)
           + key.private_bytes(
               serialization.Encoding.PEM,
               serialization.PrivateFormat.PKCS8,
               serialization.NoEncryption()))
    out = os.path.join(os.path.dirname(__file__), "..",
                       "pdfio_spark", "data", "sig_expired_identity.pem")
    with open(out, "wb") as f:
        f.write(pem)
    print(f"wrote {os.path.normpath(out)} "
          f"({cert.subject.rfc4514_string()}, "
          f"{cert.not_valid_before_utc} .. {cert.not_valid_after_utc})")


if __name__ == "__main__":
    main()
