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


def parse_tls_flag(value: str | None) -> tuple[str, str] | None:
    """``--tls CERT:KEY`` CLI spelling → (certfile, keyfile)."""
    if value is None:
        return None
    parts = value.split(":", 1)
    if len(parts) != 2 or not parts[0] or not parts[1]:
        raise ValueError("TLS flag must be CERTFILE:KEYFILE")
    return (parts[0], parts[1])
