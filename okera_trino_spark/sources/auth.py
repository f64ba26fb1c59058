"""C19 password/token authentication — the documented auth-hook interface.

The reference authenticates Trino sessions by asking its REST server to
validate the credential and return the canonical user
(password/OkeraAuthenticator.java:113-218): Basic auth for passwords,
Bearer for anything that *looks like* a token (dot-separated, > 40
chars, OkeraAuthenticator.java:260-266), a TTL'd positive cache
(default 1 h, OkeraConfig.java:9), and a hard check that the
authenticated identity equals the username the session specified
(OkeraAuthenticator.java:210-216). With authentication disabled, the
reference accepts any session where user == password
(OkeraAuthenticator.java:126-133).

A Spark library has no Trino coordinator or REST sidecar, so the
network call becomes the PLUGGABLE piece: a deployment supplies a
``verifier`` callable (its identity service, an LDAP bind, a JWT
validator) and this class supplies everything around it — the
token-vs-password dispatch, the credential cache, the user-match
enforcement, and the denied-vs-transient error split. The default
(no verifier) reproduces the reference's authentication-disabled mode
exactly, which is what tests and local runs want.

Error contract (mirrors the reference's 401/403-vs-other split,
OkeraAuthenticator.java:162-191): the verifier raises
``AuthenticationError`` for an explicit denial — never cached, never
retried — and any other exception is treated as transient
infrastructure failure and propagates as-is (also uncached, matching
the loading-cache semantics of only storing successful loads).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable

#: A credential only *looks like* a bearer token above this length
#: (OkeraAuthenticator.java MIN_TOKEN_LEN).
MIN_TOKEN_LEN = 40

#: Positive-auth cache TTL default (OkeraConfig.java:9 — 1 hour).
DEFAULT_CACHE_TTL_S = 3600.0


class AuthenticationError(PermissionError):
    """Explicit authentication denial (the reference's AccessDenied)."""


def is_likely_token(secret: str) -> bool:
    """Heuristic Bearer-vs-Basic dispatch (OkeraAuthenticator.java:260-266):
    2 or 3 dot-separated parts (JWT shape) AND longer than MIN_TOKEN_LEN.
    A short password containing dots stays Basic; a real JWT always
    crosses both thresholds.

    Part counting mirrors Java's ``String.split``, which DROPS trailing
    empty strings — Python's keeps them, so ``'a.b…x.'`` (one interior
    dot, trailing dot) must count 2 parts (Basic in the reference), not
    3 (Bearer)."""
    parts = secret.split(".")
    while parts and parts[-1] == "":
        parts.pop()
    if len(parts) not in (2, 3):
        return False
    return len(secret) > MIN_TOKEN_LEN


@dataclass(frozen=True)
class AuthRequest:
    """What a verifier receives. ``mode`` is 'bearer' or 'basic' — the
    dispatch the reference encodes in the Authorization header."""
    user: str
    secret: str
    mode: str


#: Verifier hook: returns the CANONICAL authenticated username, raises
#: AuthenticationError to deny, any other exception for transient
#: failure. Replaces the reference's REST get-user round trip.
Verifier = Callable[[AuthRequest], str]


class PasswordAuthenticator:
    """Credential → principal with the reference's surrounding behavior.

    >>> auth = PasswordAuthenticator()          # disabled mode
    >>> auth.authenticate("alice", "alice")
    'alice'

    With a verifier (enabled mode)::

        def ldap_verify(req: AuthRequest) -> str: ...
        auth = PasswordAuthenticator(verifier=ldap_verify)
        auth.authenticate("alice", jwt_text)    # Bearer dispatch
    """

    def __init__(self, verifier: Verifier | None = None,
                 cache_ttl_s: float = DEFAULT_CACHE_TTL_S,
                 clock: Callable[[], float] = time.monotonic) -> None:
        self.verifier = verifier
        self.cache_ttl_s = cache_ttl_s
        self._clock = clock
        self._cache: dict[tuple[str, str], tuple[float, str]] = {}

    # ------------------------------------------------------------ public
    def authenticate(self, user: str, secret: str) -> str:
        """Return the authenticated principal or raise AuthenticationError.

        Successful results are cached per (user, secret) for the TTL
        (expireAfterWrite semantics); failures are never cached — a
        fixed credential store outage must not lock a user out for an
        hour after recovery, and the reference's loading cache likewise
        only stores successful loads."""
        key = (user, secret)
        hit = self._cache.get(key)
        now = self._clock()
        if hit is not None and now - hit[0] < self.cache_ttl_s:
            return hit[1]
        principal = self._authenticate(user, secret)
        self._cache[key] = (now, principal)
        return principal

    def cache_size(self) -> int:
        return len(self._cache)

    # ----------------------------------------------------------- internal
    def _authenticate(self, user: str, secret: str) -> str:
        if self.verifier is None:
            # Authentication-disabled mode (OkeraAuthenticator.java:126-133):
            # accept iff user == password.
            if user != secret:
                raise AuthenticationError(
                    f"Authentication error for user: {user}")
            return user
        user = user.strip()  # the reference trims before the REST call
        mode = "bearer" if is_likely_token(secret) else "basic"
        authenticated = self.verifier(AuthRequest(user, secret, mode))
        # User-match enforcement (OkeraAuthenticator.java:210-216): a JWT
        # may carry a different subject than the session username; honor
        # the session's claim only if they agree.
        if user != authenticated.strip():
            raise AuthenticationError(
                f"Authentication error for user: {user}. If using token "
                "based authentication, username must match user in token.")
        return authenticated.strip()
