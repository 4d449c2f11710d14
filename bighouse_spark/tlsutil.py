"""TLS plumbing shared by the four wire endpoints.

The reference deploys stock ClickHouse behind Fly's edge (its TLS
terminates off-box), but every protocol we serve has a first-class
TLS story real clients expect:

* HTTP(S)   — CH serves ``https_port`` 8443 next to 8123.
* native TCP — CH serves ``tcp_port_secure`` 9440: the connection is
  TLS from the first byte (no STARTTLS).
* PostgreSQL — the client opens with ``SSLRequest`` (80877103); the
  server answers ``S`` and the TLS handshake runs before the
  StartupMessage (the ``sslmode=require`` path).
* MySQL     — the server advertises ``CLIENT_SSL`` in the handshake
  capabilities; the client replies with a short SSLRequest packet and
  the TLS handshake runs before the real HandshakeResponse.

One server certificate/key pair configures all four (CH's own model:
a single ``openSSL.server`` section in config.xml). Contexts are
built here so the version floor and verification posture live in one
place.
"""

from __future__ import annotations

import ssl

# Deadline for a server-side TLS handshake: a client that connects
# and never sends a ClientHello is dropped instead of pinning its
# handler thread forever. (Post-handshake protocol reads keep each
# wire's own timeout posture.)
HANDSHAKE_TIMEOUT = 30.0


def wrap_server_side(ctx: ssl.SSLContext, sock):
    """Server-side TLS wrap with a bounded handshake."""
    prev = sock.gettimeout()
    sock.settimeout(HANDSHAKE_TIMEOUT)
    wrapped = ctx.wrap_socket(sock, server_side=True)
    wrapped.settimeout(prev)
    return wrapped


def server_context(certfile: str, keyfile: str) -> ssl.SSLContext:
    """Server-side context: TLS 1.2+ with the given cert chain."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.minimum_version = ssl.TLSVersion.TLSv1_2
    ctx.load_cert_chain(certfile, keyfile)
    return ctx


def client_context(
    cafile: str | None = None, verify: bool = True
) -> ssl.SSLContext:
    """Client-side context. ``cafile`` pins a trust root (the typical
    self-signed-server deployment); ``verify=False`` matches
    ``sslmode=require`` — encrypted but unauthenticated, for use
    only when the peer's identity is assured some other way."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.minimum_version = ssl.TLSVersion.TLSv1_2
    if not verify:
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    elif cafile is not None:
        ctx.load_verify_locations(cafile=cafile)
    else:
        ctx.load_default_certs()
    return ctx


# -- tls-server-end-point channel binding (RFC 5929 §4) --------------
#
# The binding data is a hash of the server certificate (DER). The
# hash is the one named by the certificate's signatureAlgorithm,
# except MD5/SHA-1 map to SHA-256. The signatureAlgorithm is the
# second element of the outer Certificate SEQUENCE, so a minimal
# ASN.1 walk (two headers + one OID) finds it without an X.509
# library.

_SIG_OID_HASH = {
    "1.2.840.113549.1.1.5": "sha256",   # sha1WithRSA  → sha256 (RFC 5929)
    "1.2.840.113549.1.1.4": "sha256",   # md5WithRSA   → sha256
    "1.2.840.113549.1.1.11": "sha256",  # sha256WithRSA
    "1.2.840.113549.1.1.12": "sha384",  # sha384WithRSA
    "1.2.840.113549.1.1.13": "sha512",  # sha512WithRSA
    "1.2.840.10045.4.1": "sha256",      # ecdsa-with-SHA1 → sha256
    "1.2.840.10045.4.3.2": "sha256",    # ecdsa-with-SHA256
    "1.2.840.10045.4.3.3": "sha384",    # ecdsa-with-SHA384
    "1.2.840.10045.4.3.4": "sha512",    # ecdsa-with-SHA512
}


def _asn1_header(der: bytes, pos: int) -> tuple[int, int, int]:
    """Return (tag, content_start, content_end) at ``pos``."""
    tag = der[pos]
    length = der[pos + 1]
    pos += 2
    if length & 0x80:
        n = length & 0x7F
        length = int.from_bytes(der[pos:pos + n], "big")
        pos += n
    return tag, pos, pos + length


def _decode_oid(body: bytes) -> str:
    first = body[0]
    parts = [str(first // 40), str(first % 40)]
    val = 0
    for b in body[1:]:
        val = (val << 7) | (b & 0x7F)
        if not b & 0x80:
            parts.append(str(val))
            val = 0
    return ".".join(parts)


def cert_cb_hash(der: bytes) -> bytes:
    """tls-server-end-point binding data for a DER certificate."""
    import hashlib

    tag, start, _end = _asn1_header(der, 0)       # Certificate ::= SEQ
    if tag != 0x30:
        raise ValueError("not a DER certificate")
    _tag, _s, tbs_end = _asn1_header(der, start)  # tbsCertificate
    tag, alg_s, _alg_end = _asn1_header(der, tbs_end)  # AlgorithmIdentifier
    if tag != 0x30:
        raise ValueError("malformed signatureAlgorithm")
    tag, oid_s, oid_end = _asn1_header(der, alg_s)
    if tag != 0x06:
        raise ValueError("malformed signatureAlgorithm OID")
    oid = _decode_oid(der[oid_s:oid_end])
    # Unknown algorithms (e.g. Ed25519) fall back to SHA-256, the
    # interop default real stacks use when the RFC gives no mapping.
    algo = _SIG_OID_HASH.get(oid, "sha256")
    return getattr(hashlib, algo)(der).digest()


def pem_cert_der(certfile: str) -> bytes:
    """First certificate in a PEM file, as DER bytes."""
    with open(certfile, "r", encoding="utf-8") as f:
        pem = f.read()
    begin = pem.index("-----BEGIN CERTIFICATE-----")
    end = pem.index("-----END CERTIFICATE-----", begin)
    body = pem[begin + len("-----BEGIN CERTIFICATE-----"):end]
    import base64

    return base64.b64decode("".join(body.split()))


def parse_tls_flag(value: str | None) -> tuple[str, str] | None:
    """``--tls CERT:KEY`` CLI spelling → (certfile, keyfile)."""
    if value is None:
        return None
    parts = value.split(":", 1)
    if len(parts) != 2 or not parts[0] or not parts[1]:
        raise ValueError("TLS flag must be CERTFILE:KEYFILE")
    return (parts[0], parts[1])
