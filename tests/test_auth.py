"""C19 password/token authentication hook (sources/auth.py): the
reference's PasswordAuthenticator behaviors — disabled-mode user==pass,
Bearer-vs-Basic dispatch heuristic, positive-only TTL cache, user-match
enforcement — plus the catalog login() integration."""

from __future__ import annotations

import pytest

from okera_trino_spark.sources.auth import (
    AuthenticationError,
    AuthRequest,
    PasswordAuthenticator,
    is_likely_token,
)


def test_disabled_mode_accepts_user_equals_password():
    auth = PasswordAuthenticator()
    assert auth.authenticate("alice", "alice") == "alice"
    with pytest.raises(AuthenticationError):
        auth.authenticate("alice", "wrong")


def test_token_heuristic():
    # JWT shape: 3 dot parts, > 40 chars
    jwt = "eyJhbGciOiJI.eyJzdWIiOiIxMjM0NTY3ODkwIn0.SflKxwRJSMeKKF2QT4"
    assert is_likely_token(jwt)
    assert not is_likely_token("short.pw")              # short
    assert not is_likely_token("a" * 50)                # no dots
    assert not is_likely_token("a.b.c.d" + "x" * 40)    # 4 parts


def test_dispatch_mode_reaches_verifier():
    seen = []

    def verifier(req: AuthRequest) -> str:
        seen.append(req.mode)
        return req.user

    auth = PasswordAuthenticator(verifier=verifier)
    auth.authenticate("alice", "hunter2")
    auth.authenticate("bob", "eyJhbGciOiJI.eyJzdWIiOiIxMjM0NTY3ODkwIn0.SflKxwRJSMeKKF2QT4")
    assert seen == ["basic", "bearer"]


def test_user_match_enforced():
    auth = PasswordAuthenticator(verifier=lambda req: "subject-in-token")
    with pytest.raises(AuthenticationError, match="must match"):
        auth.authenticate("alice", "x.y." + "z" * 40)


def test_positive_cache_ttl_and_no_negative_caching():
    clock = [0.0]
    calls = []

    def verifier(req: AuthRequest) -> str:
        calls.append(req.user)
        if req.secret == "bad":
            raise AuthenticationError("no")
        return req.user

    auth = PasswordAuthenticator(verifier=verifier, cache_ttl_s=3600.0,
                                 clock=lambda: clock[0])
    assert auth.authenticate("alice", "ok") == "alice"
    assert auth.authenticate("alice", "ok") == "alice"   # cache hit
    assert calls == ["alice"]
    clock[0] = 3601.0                                    # TTL expiry
    auth.authenticate("alice", "ok")
    assert calls == ["alice", "alice"]
    # denials are never cached: each attempt re-verifies
    for _ in range(2):
        with pytest.raises(AuthenticationError):
            auth.authenticate("eve", "bad")
    assert calls.count("eve") == 2


def test_transient_verifier_failure_propagates_uncached():
    state = {"up": False}

    def verifier(req: AuthRequest) -> str:
        if not state["up"]:
            raise ConnectionError("identity service down")
        return req.user

    auth = PasswordAuthenticator(verifier=verifier)
    with pytest.raises(ConnectionError):
        auth.authenticate("alice", "pw")
    state["up"] = True
    assert auth.authenticate("alice", "pw") == "alice"   # recovers immediately


def test_catalog_login_adopts_principal(spark, sf_dir):
    from okera_trino_spark.sources.catalog import GovernedCatalog

    cat = GovernedCatalog(spark, sf_dir,
                          authenticator=PasswordAuthenticator())
    assert cat.props.user == "root"
    assert cat.login("alice", "alice") == "alice"
    assert cat.props.user == "alice"
    with pytest.raises(AuthenticationError):
        cat.login("bob", "nope")
    assert cat.props.user == "alice"                     # unchanged on denial


def test_catalog_login_requires_authenticator(spark, sf_dir):
    from okera_trino_spark.sources.catalog import GovernedCatalog

    with pytest.raises(RuntimeError, match="no authenticator"):
        GovernedCatalog(spark, sf_dir).login("a", "a")


def test_token_heuristic_trailing_dot_matches_java_split():
    """Java's String.split drops trailing empty strings; a >40-char
    secret with ONE interior dot and a trailing dot is 2 parts in the
    reference (Basic-shaped ambiguity resolved the same way here)."""
    from okera_trino_spark.sources.auth import is_likely_token

    base = "a" * 30 + "." + "b" * 30
    assert is_likely_token(base)            # 2 parts, long: token
    assert is_likely_token(base + ".")      # trailing dot dropped: still 2
    assert is_likely_token(base + "...")    # all trailing empties dropped
    assert not is_likely_token("a" * 50)    # 1 part
    assert not is_likely_token("a.b.c.d" + "x" * 40)  # 4 parts
