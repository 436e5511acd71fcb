"""Server-side SCRAM-SHA-256 (RFC 5802 / RFC 7677) for the pg wire handshake.

The reference accepts `SCRAM-SHA-256` encrypted passwords in its config
(reference src/server/config.go:102 StringToScramSha256) and surfaces the pg
verifier format in pg_shadow (query_handler_test.go:1466). Everything here is
the public RFC algebra over hashlib/hmac:

    SaltedPassword = Hi(password, salt, i)          # PBKDF2-HMAC-SHA-256
    ClientKey      = HMAC(SaltedPassword, "Client Key")
    StoredKey      = SHA-256(ClientKey)
    ServerKey      = HMAC(SaltedPassword, "Server Key")
    ClientProof    = ClientKey XOR HMAC(StoredKey, AuthMessage)
    ServerSignature= HMAC(ServerKey, AuthMessage)

The server stores only the pg-format verifier
``SCRAM-SHA-256$<i>:<salt>$<StoredKey>:<ServerKey>`` — never the password —
and verification recovers ClientKey from the proof, so a stolen verifier
cannot be replayed as a client credential.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os

MECHANISM = "SCRAM-SHA-256"
DEFAULT_ITERATIONS = 4096


def _b64(raw: bytes) -> str:
    return base64.b64encode(raw).decode()


def hi(password: bytes, salt: bytes, iterations: int) -> bytes:
    return hashlib.pbkdf2_hmac("sha256", password, salt, iterations)


def build_verifier(
    password: str, salt: bytes | None = None, iterations: int = DEFAULT_ITERATIONS
) -> str:
    """pg-format SCRAM verifier (what pg_shadow.passwd / pg_authid show)."""
    salt = salt if salt is not None else os.urandom(16)
    salted = hi(password.encode(), salt, iterations)
    client_key = hmac.digest(salted, b"Client Key", "sha256")
    server_key = hmac.digest(salted, b"Server Key", "sha256")
    stored_key = hashlib.sha256(client_key).digest()
    return (
        f"{MECHANISM}${iterations}:{_b64(salt)}"
        f"${_b64(stored_key)}:{_b64(server_key)}"
    )


def parse_verifier(verifier: str) -> tuple[int, bytes, bytes, bytes]:
    """-> (iterations, salt, stored_key, server_key)"""
    mech, rest = verifier.split("$", 1)
    if mech != MECHANISM:
        raise ValueError(f"not a {MECHANISM} verifier")
    iter_salt, keys = rest.split("$", 1)
    iter_s, salt_b64 = iter_salt.split(":", 1)
    stored_b64, server_b64 = keys.split(":", 1)
    return (
        int(iter_s),
        base64.b64decode(salt_b64),
        base64.b64decode(stored_b64),
        base64.b64decode(server_b64),
    )


def _attrs(message: str) -> dict[str, str]:
    return dict(part.split("=", 1) for part in message.split(",") if "=" in part)


class ScramExchange:
    """One server-side SCRAM exchange over a stored verifier."""

    def __init__(self, verifier: str, server_nonce: str | None = None) -> None:
        (self.iterations, self.salt, self.stored_key, self.server_key) = (
            parse_verifier(verifier)
        )
        self._server_nonce = server_nonce or _b64(os.urandom(18))
        self._client_first_bare = ""
        self._server_first = ""
        self.nonce = ""

    def server_first(self, client_first: str) -> str:
        """Consume client-first-message, emit server-first-message."""
        # gs2 header is 'n,,' / 'y,,' (no channel binding over the pg wire).
        if not (client_first.startswith("n,") or client_first.startswith("y,")):
            raise ValueError("unsupported gs2 channel binding")
        self._client_first_bare = client_first.split(",", 2)[2]
        attrs = _attrs(self._client_first_bare)
        self.nonce = attrs["r"] + self._server_nonce
        self._server_first = (
            f"r={self.nonce},s={_b64(self.salt)},i={self.iterations}"
        )
        return self._server_first

    def verify_final(self, client_final: str) -> str:
        """Verify client-final-message; return server-final ('v=...') or raise."""
        attrs = _attrs(client_final)
        if attrs.get("r") != self.nonce:
            raise ValueError("SCRAM nonce mismatch")
        proof = base64.b64decode(attrs["p"])
        without_proof = client_final.rsplit(",p=", 1)[0]
        auth_message = ",".join(
            [self._client_first_bare, self._server_first, without_proof]
        ).encode()
        client_signature = hmac.digest(self.stored_key, auth_message, "sha256")
        client_key = bytes(a ^ b for a, b in zip(proof, client_signature))
        if hashlib.sha256(client_key).digest() != self.stored_key:
            raise ValueError("SCRAM proof verification failed")
        server_signature = hmac.digest(self.server_key, auth_message, "sha256")
        return f"v={_b64(server_signature)}"


def client_exchange_messages(
    user: str, password: str, server_first_for: "callable", client_nonce: str | None = None
) -> tuple[str, str]:
    """Client side of the exchange, for tests / MiniPgClient.

    ``server_first_for(client_first) -> server_first`` performs the round trip;
    returns (client_final, expected_server_final).
    """
    client_nonce = client_nonce or _b64(os.urandom(18))
    client_first_bare = f"n={user},r={client_nonce}"
    server_first = server_first_for("n,," + client_first_bare)
    attrs = _attrs(server_first)
    nonce, salt, iterations = attrs["r"], base64.b64decode(attrs["s"]), int(attrs["i"])
    if not nonce.startswith(client_nonce):
        raise ValueError("server nonce does not extend client nonce")
    salted = hi(password.encode(), salt, iterations)
    client_key = hmac.digest(salted, b"Client Key", "sha256")
    stored_key = hashlib.sha256(client_key).digest()
    server_key = hmac.digest(salted, b"Server Key", "sha256")
    without_proof = f"c=biws,r={nonce}"
    auth_message = ",".join([client_first_bare, server_first, without_proof]).encode()
    client_signature = hmac.digest(stored_key, auth_message, "sha256")
    proof = bytes(a ^ b for a, b in zip(client_key, client_signature))
    client_final = f"{without_proof},p={_b64(proof)}"
    expected = f"v={_b64(hmac.digest(server_key, auth_message, 'sha256'))}"
    return client_final, expected
