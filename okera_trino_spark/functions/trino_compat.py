"""Trino-dialect function shims over Spark builtins — SURVEY.md §7.4 risk 1.

The reference's SQL surface is Trino 400; where Trino and Spark SQL
disagree on names or argument order, these shims present the Trino form
and compile to the Spark builtin (JVM-side, codegen-friendly — never a
Python UDF). Each shim documents the divergence it papers over.

The reference's only connector-registered scalar UDF is
current_database() → 'okera' (udfs/CurrentDatabaseUdf.java:10-17,
registered via RecordServicePlugin.java:70-78); see
``register_reference_udfs``.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# Trino datetime unit → Spark interval keyword (shared by date_add/date_diff).
_UNITS = {"second", "minute", "hour", "day", "week", "month", "quarter", "year"}


def _check_unit(unit: str) -> str:
    u = unit.lower()
    if u not in _UNITS:
        raise ValueError(f"unsupported datetime unit: {unit!r}")
    return u


def strpos(col: Column | str, substr: str) -> Column:
    """Trino strpos(string, substring) — 1-based, 0 if absent.

    Spark's locate/instr reverse the argument order; instr(col, substr)
    matches Trino's semantics exactly.
    """
    return F.instr(col, substr)


def date_add(unit: str, n: int | Column, ts: Column | str) -> Column:
    """Trino date_add(unit, value, timestamp).

    Spark's date_add(date, n) is days-only with reversed args; the
    general form is interval arithmetic, which also preserves the
    timestamp type (Spark date_add returns DATE).
    """
    u = _check_unit(unit)
    col = F.col(ts) if isinstance(ts, str) else ts
    n_expr = str(int(n)) if isinstance(n, int) else None
    if n_expr is None:
        raise TypeError("date_add shim requires a literal n")
    return col + F.expr(f"INTERVAL {n_expr} {u.upper()}")


def date_diff(unit: str, start: Column | str, end: Column | str) -> Column:
    """Trino date_diff(unit, start, end) = end - start in whole units.

    Spark datediff(end, start) is days-only with reversed args;
    timestampdiff covers the general case.
    """
    u = _check_unit(unit)
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return F.timestamp_diff(u.upper(), s, e)


def date_trunc(unit: str, ts: Column | str) -> Column:
    """Trino date_trunc(unit, ts). Spark agrees but takes (fmt, ts) with
    fmt as a string in the same position — passthrough with unit check."""
    return F.date_trunc(_check_unit(unit), ts)


def json_extract_scalar(col: Column | str, path: str) -> Column:
    """Trino json_extract_scalar(json, path) → Spark get_json_object."""
    return F.get_json_object(col, path)


def json_extract(col: Column | str, path: str) -> Column:
    """Trino json_extract — Spark's get_json_object returns JSON text for
    non-scalar matches, which covers the oracle-checkable surface."""
    return F.get_json_object(col, path)


def approx_distinct(col: Column | str, e: float = 0.023) -> Column:
    """Trino approx_distinct(x, e) → HLL++ with relative error e."""
    return F.approx_count_distinct(col, rsd=e)


def cardinality(col: Column | str) -> Column:
    """Trino cardinality(array|map) → Spark size."""
    return F.size(col)


def contains(col: Column | str, value) -> Column:
    """Trino contains(array, elem) → Spark array_contains."""
    return F.array_contains(col, value)


def if_(cond: Column, then, otherwise=None) -> Column:
    """Trino if(cond, a[, b])."""
    w = F.when(cond, then)
    return w.otherwise(otherwise) if otherwise is not None else w


def listagg(col: Column | str, sep: str = ",") -> Column:
    """Trino listagg(x, sep) WITHIN GROUP (ORDER BY x) — deterministic
    sorted concatenation (collect_list is partition-order-dependent,
    so sort before joining)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(
        F.transform(F.array_sort(F.collect_list(c)), lambda v: v.cast("string")), sep
    )


def register_reference_udfs(spark: SparkSession, database: str = "okera") -> None:
    """Register the plugin's UDF surface (E37/C17).

    current_database() returns the connector's catalog name
    (udfs/CurrentDatabaseUdf.java:10-17). Spark has its own
    current_database(); the reference semantics are exposed under
    ``okera_current_database`` to avoid shadowing the builtin.
    """
    spark.udf.register("okera_current_database", lambda: database, "string")


def register_unicode_normalize(spark: SparkSession) -> None:
    """Register ``trino_normalize(s, form)`` — Trino's ``normalize()``
    (UAX #15 Unicode normalization, forms NFC/NFD/NFKC/NFKD).

    Spark SQL has no normalizer builtin, so this is the sanctioned
    slow-path shape: an Arrow-batched pandas UDF over ``unicodedata``
    (the C-backed CPython implementation of the same UAX #15 algorithm
    Trino's java.text.Normalizer runs; a Unicode-VERSION skew between
    the two runtimes can diverge on codepoints newer than the older
    table — the only caveat, and a documented one). Built inside the
    function because pandas_udf construction needs an active session.

    Reference: the connector forwards normalize() to the Trino engine
    untouched (RecordServicePageSourceProvider.java:39 pushdown list
    excludes it), so engine semantics are the contract.
    """
    import pandas as pd  # noqa: PLC0415 — lazy, session-scoped
    import unicodedata  # noqa: PLC0415

    def _normalize(s, form):
        return pd.Series(
            [None if v is None else unicodedata.normalize(f, v)
             for v, f in zip(s, form)], dtype=object)

    # Annotations are assigned as real objects (not strings) because
    # this module uses `from __future__ import annotations` and
    # pandas_udf's eval-type inference cannot resolve a stringified
    # 'pd.Series' against a function-local import.
    _normalize.__annotations__ = {
        "s": pd.Series, "form": pd.Series, "return": pd.Series}
    spark.udf.register("trino_normalize", F.pandas_udf(_normalize, "string"))


# ------------------------------------------------------------- XXH64

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def xxh64(data: bytes, seed: int = 0) -> int:
    """Pure-Python XXH64 (Collet's xxHash, public spec). Verified two
    ways in tests/test_trino_sql.py: the canonical empty-input vector
    (0xEF46DB3751D8E999) and bit-equality with SPARK'S OWN xxhash64
    builtin at seed 42 across stripe/tail boundary lengths — the same
    algorithm Trino's io.airlift.slice.XxHash64 runs at seed 0."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _M64

    def rnd(acc: int, lane: int) -> int:
        return (rotl((acc + lane * _XXP2) & _M64, 31) * _XXP1) & _M64

    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i + 32 <= n:
            v1 = rnd(v1, int.from_bytes(data[i:i + 8], "little")); i += 8
            v2 = rnd(v2, int.from_bytes(data[i:i + 8], "little")); i += 8
            v3 = rnd(v3, int.from_bytes(data[i:i + 8], "little")); i += 8
            v4 = rnd(v4, int.from_bytes(data[i:i + 8], "little")); i += 8
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12)
             + rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ rnd(0, v)) * _XXP1 + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h = (rotl(h ^ rnd(0, int.from_bytes(data[i:i + 8], "little")),
                  27) * _XXP1 + _XXP4) & _M64
        i += 8
    if i + 4 <= n:
        h = (rotl(h ^ (int.from_bytes(data[i:i + 4], "little")
                       * _XXP1) & _M64, 23) * _XXP2 + _XXP3) & _M64
        i += 4
    while i < n:
        h = (rotl(h ^ (data[i] * _XXP5) & _M64, 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h


def xxh64_batch(datas: list, seed: int = 0):
    """numpy-vectorized XXH64 (r10): the same algorithm as
    :func:`xxh64`, computed lane-parallel across a whole Arrow batch —
    uint64 arrays with C wraparound replace per-value Python bigint
    loops (~batch-size speedup on the stripe phase). Structure: a
    zero-padded (N × maxlen+8) byte matrix plus per-row offsets; every
    phase computes for ALL rows and masks with ``np.where``, so reads
    at dead offsets land in the zero padding and stay in bounds.
    Verified by bit-equality against the pure-Python reference across
    random inputs and every stripe/tail boundary
    (tests/test_trino_sql.py::test_xxh64_batch_matches_reference).
    Returns a uint64 ndarray aligned with ``datas``."""
    import numpy as np  # noqa: PLC0415 — lazy, executor-side

    p1, p2, p3, p4, p5 = (np.uint64(_XXP1), np.uint64(_XXP2),
                          np.uint64(_XXP3), np.uint64(_XXP4),
                          np.uint64(_XXP5))
    n = len(datas)
    lens = np.fromiter((len(d) for d in datas), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    width = ((maxlen + 8 + 7) // 8) * 8   # 8-aligned rows for u64 views
    # The padded matrix is sized by the batch's LONGEST value — one
    # megabyte outlier in a 10k-row Arrow batch would otherwise
    # allocate rows × maxlen dense zeros (r10 review fix). Bound the
    # matrix at ~64 MiB by recursing on row chunks: each chunk re-pads
    # to ITS OWN maxlen, so short rows never pay for a distant
    # outlier's width.
    if n > 1 and n * width > (64 << 20):
        step = max(1, (64 << 20) // width)
        out = np.empty(n, dtype=np.uint64)
        for i in range(0, n, step):
            out[i:i + step] = xxh64_batch(datas[i:i + step], seed=seed)
        return out
    mat = np.zeros((n, width), dtype=np.uint8)
    for i, d in enumerate(datas):
        if d:
            mat[i, : len(d)] = np.frombuffer(d, dtype=np.uint8)
    # every multi-byte read in the algorithm is ALIGNED: stripe lanes
    # sit at 32s+8j, the 8-byte tail starts at nstripes*32 and steps by
    # 8, the 4-byte read follows at a multiple of 4 — so the byte
    # matrix reinterprets as little-endian word matrices and all
    # gathers become column picks (no per-byte assembly).
    words8 = mat.view("<u8")
    words4 = mat.view("<u4")

    def u64_col(widx):
        w = np.take_along_axis(words8, widx[:, None], axis=1)[:, 0]
        return w.astype(np.uint64, copy=False)

    def rotl(x, r):
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    def rnd(acc, lane):
        return rotl(acc + lane * p2, 31) * p1

    big = lens >= 32
    nstripes = np.where(big, lens // 32, 0)
    # accumulator seeds via Python ints — numpy SCALAR ops warn on
    # wraparound (array ops wrap silently, which the phases rely on)
    v1 = np.full(n, (seed + _XXP1 + _XXP2) & _M64, dtype=np.uint64)
    v2 = np.full(n, (seed + _XXP2) & _M64, dtype=np.uint64)
    v3 = np.full(n, seed & _M64, dtype=np.uint64)
    v4 = np.full(n, (seed - _XXP1) & _M64, dtype=np.uint64)
    for s in range(int(nstripes.max()) if n else 0):
        mask = nstripes > s
        w = words8[:, 4 * s: 4 * s + 4].astype(np.uint64, copy=False)
        v1 = np.where(mask, rnd(v1, w[:, 0]), v1)
        v2 = np.where(mask, rnd(v2, w[:, 1]), v2)
        v3 = np.where(mask, rnd(v3, w[:, 2]), v3)
        v4 = np.where(mask, rnd(v4, w[:, 3]), v4)
    h_big = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
    zero = np.zeros(n, dtype=np.uint64)
    for v in (v1, v2, v3, v4):
        h_big = (h_big ^ rnd(zero, v)) * p1 + p4
    h = np.where(big, h_big, np.uint64((seed + _XXP5) & _M64))
    h = h + lens.astype(np.uint64)

    off = (nstripes * 32).astype(np.int64)
    for _ in range(3):   # < 32 bytes remain → at most 3 8-byte words
        mask = off + 8 <= lens
        h = np.where(mask,
                     rotl(h ^ rnd(zero, u64_col(off // 8)), 27) * p1 + p4,
                     h)
        off = np.where(mask, off + 8, off)
    mask = off + 4 <= lens
    w4 = np.take_along_axis(words4, (off // 4)[:, None],
                            axis=1)[:, 0].astype(np.uint64)
    h = np.where(mask, rotl(h ^ (w4 * p1), 23) * p2 + p3, h)
    off = np.where(mask, off + 4, off)
    for _ in range(3):   # < 4 bytes remain → at most 3 single bytes
        mask = off < lens
        b = np.take_along_axis(mat, off[:, None], axis=1)[:, 0]
        b = b.astype(np.uint64)
        h = np.where(mask, rotl(h ^ (b * p5), 11) * p1, h)
        off = np.where(mask, off + 1, off)

    h ^= h >> np.uint64(33)
    h *= p2
    h ^= h >> np.uint64(29)
    h *= p3
    h ^= h >> np.uint64(32)
    return h


def register_base32(spark: SparkSession) -> None:
    """Register ``trino_to_base32(varbinary) → varchar`` and
    ``trino_from_base32(varchar) → varbinary`` — Trino's base32 pair
    (VarbinaryFunctions.java wraps Guava ``BaseEncoding.base32()``:
    RFC 4648 §6 uppercase alphabet WITH '=' padding). Python's
    ``base64.b32encode/b32decode`` implement the identical RFC;
    bit-verified against the RFC's own published test vectors in
    tests/test_trino_sql.py::test_base32_rfc4648_vectors. Decode is
    strict like Trino: lowercase or non-alphabet input raises."""
    import base64    # noqa: PLC0415 — lazy, session-scoped
    import binascii  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    def _enc(b):
        return pd.Series(
            [None if v is None
             else base64.b32encode(bytes(v)).decode("ascii")
             for v in b], dtype=object)

    def _dec(s):
        out = []
        for v in s:
            if v is None:
                out.append(None)
                continue
            try:
                out.append(base64.b32decode(str(v), casefold=False))
            except (binascii.Error, ValueError) as ex:
                raise ValueError(
                    f"from_base32: invalid base32 input {v!r}") from ex
        return pd.Series(out, dtype=object)

    _enc.__annotations__ = {"b": pd.Series, "return": pd.Series}
    _dec.__annotations__ = {"s": pd.Series, "return": pd.Series}
    spark.udf.register("trino_to_base32", F.pandas_udf(_enc, "string"))
    spark.udf.register("trino_from_base32", F.pandas_udf(_dec, "binary"))


def murmur3_x64_128(data: bytes, seed: int = 0) -> bytes:
    """Pure-Python MurmurHash3 x64_128 (Appleby's public-domain spec —
    the variant Trino's ``murmur3(varbinary)`` runs at seed 0 via
    airlift Murmur3Hash128). Returns the 16-byte result as two
    little-endian u64 halves (h1 then h2 — airlift Slice layout).
    Verified by smhasher's published VERIFICATION procedure (hash keys
    [0..i) at seed 256-i, then hash the concatenated digests at seed
    0; the first 4 LE bytes must be 0x6384BA69) in
    tests/test_trino_sql.py::test_murmur3_smhasher_verification."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _M64

    def fmix(k: int) -> int:
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & _M64
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & _M64
        k ^= k >> 33
        return k

    h1 = h2 = seed & _M64
    n = len(data)
    for i in range(0, n - 15, 16):
        k1 = int.from_bytes(data[i:i + 8], "little")
        k2 = int.from_bytes(data[i + 8:i + 16], "little")
        k1 = (rotl((k1 * c1) & _M64, 31) * c2) & _M64
        h1 = ((rotl(h1 ^ k1, 27) + h2) * 5 + 0x52DCE729) & _M64
        k2 = (rotl((k2 * c2) & _M64, 33) * c1) & _M64
        h2 = ((rotl(h2 ^ k2, 31) + h1) * 5 + 0x38495AB5) & _M64
    tail = data[(n // 16) * 16:]
    k1 = int.from_bytes(tail[:8], "little")
    k2 = int.from_bytes(tail[8:], "little")
    if len(tail) > 8:
        h2 ^= (rotl((k2 * c2) & _M64, 33) * c1) & _M64
    if tail:
        h1 ^= (rotl((k1 * c1) & _M64, 31) * c2) & _M64
    h1 = (h1 ^ n) & _M64
    h2 = (h2 ^ n) & _M64
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1.to_bytes(8, "little") + h2.to_bytes(8, "little")


def register_murmur3(spark: SparkSession) -> None:
    """Register ``trino_murmur3(varbinary) → varbinary`` — Trino's
    128-bit MurmurHash3 (x64_128, seed 0). Arrow-batched pandas UDF
    over :func:`murmur3_x64_128` (dialect-parity path — use Spark's
    native hash/xxhash64 for internal fingerprints)."""
    import pandas as pd  # noqa: PLC0415 — lazy, session-scoped

    def _mm3(b):
        return pd.Series(
            [None if v is None else murmur3_x64_128(bytes(v))
             for v in b], dtype=object)

    _mm3.__annotations__ = {"b": pd.Series, "return": pd.Series}
    spark.udf.register("trino_murmur3", F.pandas_udf(_mm3, "binary"))


_SPOOKY_CONST = 0xDEADBEEFDEADBEEF


def _spooky_rot(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _spooky_short_mix(a: int, b: int, c: int, d: int):
    # Jenkins's ShortMix rotation schedule (spookyhash-V2 public spec).
    c = _spooky_rot(c, 50); c = (c + d) & _M64; a ^= c
    d = _spooky_rot(d, 52); d = (d + a) & _M64; b ^= d
    a = _spooky_rot(a, 30); a = (a + b) & _M64; c ^= a
    b = _spooky_rot(b, 41); b = (b + c) & _M64; d ^= b
    c = _spooky_rot(c, 54); c = (c + d) & _M64; a ^= c
    d = _spooky_rot(d, 48); d = (d + a) & _M64; b ^= d
    a = _spooky_rot(a, 38); a = (a + b) & _M64; c ^= a
    b = _spooky_rot(b, 37); b = (b + c) & _M64; d ^= b
    c = _spooky_rot(c, 62); c = (c + d) & _M64; a ^= c
    d = _spooky_rot(d, 34); d = (d + a) & _M64; b ^= d
    a = _spooky_rot(a, 5);  a = (a + b) & _M64; c ^= a
    b = _spooky_rot(b, 36); b = (b + c) & _M64; d ^= b
    return a, b, c, d


def _spooky_short_end(h0: int, h1: int, h2: int, h3: int):
    for src, rot in ((2, 15), (3, 52), (0, 26), (1, 51), (2, 28),
                     (3, 9), (0, 47), (1, 54), (2, 32), (3, 25), (0, 63)):
        dst = (src + 1) % 4
        h = [h0, h1, h2, h3]
        h[dst] ^= h[src]
        h[src] = _spooky_rot(h[src], rot)
        h[dst] = (h[dst] + h[src]) & _M64
        h0, h1, h2, h3 = h
    return h0, h1, h2, h3


def _spooky_short(data: bytes, h1: int, h2: int):
    """SpookyHashV2::Short — inputs under 192 bytes (sc_bufSize)."""
    n = len(data)
    a, b, c, d = h1 & _M64, h2 & _M64, _SPOOKY_CONST, _SPOOKY_CONST
    remainder = n % 32
    pos = 0
    if n > 15:
        for pos in range(0, n - 31, 32):
            c = (c + int.from_bytes(data[pos:pos + 8], "little")) & _M64
            d = (d + int.from_bytes(data[pos + 8:pos + 16], "little")) & _M64
            a, b, c, d = _spooky_short_mix(a, b, c, d)
            a = (a + int.from_bytes(data[pos + 16:pos + 24], "little")) & _M64
            b = (b + int.from_bytes(data[pos + 24:pos + 32], "little")) & _M64
        pos = (n // 32) * 32
        if remainder >= 16:
            c = (c + int.from_bytes(data[pos:pos + 8], "little")) & _M64
            d = (d + int.from_bytes(data[pos + 8:pos + 16], "little")) & _M64
            a, b, c, d = _spooky_short_mix(a, b, c, d)
            pos += 16
            remainder -= 16
    d = (d + ((n << 56) & _M64)) & _M64
    tail = data[pos:]
    if remainder == 0:
        c = (c + _SPOOKY_CONST) & _M64
        d = (d + _SPOOKY_CONST) & _M64
    elif remainder >= 8:
        # The byte-wise switch in the spec is equivalent to LE loads of
        # the sub-8-byte tails (cases 9-15 build d, 1-7 build c, 8/12
        # are whole u64/u32 loads).
        c = (c + int.from_bytes(tail[:8], "little")) & _M64
        if remainder > 8:
            d = (d + int.from_bytes(tail[8:remainder], "little")) & _M64
    else:
        c = (c + int.from_bytes(tail[:remainder], "little")) & _M64
    a, b, c, d = _spooky_short_end(a, b, c, d)
    return a, b


#: Mix / EndPartial rotation schedules (spookyhash-V2 public spec). Both
#: loops are the spec's unrolled 12-line bodies re-expressed as the
#: index pattern they follow.
_SPOOKY_MIX_ROTS = (11, 32, 43, 31, 17, 28, 39, 57, 55, 54, 22, 46)
_SPOOKY_END_ROTS = (44, 15, 34, 21, 38, 33, 10, 13, 38, 53, 42, 54)


def _spooky_end_partial(h: list) -> list:
    for j in range(12):
        h[(j + 11) % 12] = (h[(j + 11) % 12] + h[(j + 1) % 12]) & _M64
        h[(j + 2) % 12] ^= h[(j + 11) % 12]
        h[(j + 1) % 12] = _spooky_rot(h[(j + 1) % 12], _SPOOKY_END_ROTS[j])
    return h


def _spooky_long(data: bytes, h1: int, h2: int):
    """SpookyHashV2 long path — 96-byte Mix blocks, padded final block
    carrying the remainder length in its last byte, then End (block add
    + 3x EndPartial)."""
    n = len(data)
    h = [h1 & _M64, h2 & _M64, _SPOOKY_CONST] * 4
    nblocks = n // 96
    for i in range(nblocks):
        base = i * 96
        for j in range(12):
            h[j] = (h[j] + int.from_bytes(
                data[base + 8 * j:base + 8 * j + 8], "little")) & _M64
            h[(j + 2) % 12] ^= h[(j + 10) % 12]
            h[(j + 11) % 12] ^= h[j]
            h[j] = _spooky_rot(h[j], _SPOOKY_MIX_ROTS[j])
            h[(j + 11) % 12] = (h[(j + 11) % 12] + h[(j + 1) % 12]) & _M64
    remainder = n - nblocks * 96
    buf = data[nblocks * 96:] + bytes(96 - remainder)
    buf = buf[:95] + bytes([remainder])
    for j in range(12):
        h[j] = (h[j] + int.from_bytes(buf[8 * j:8 * j + 8], "little")) & _M64
    for _ in range(3):
        h = _spooky_end_partial(h)
    return h[0], h[1]


def spooky_v2_128(data: bytes, seed1: int = 0, seed2: int = 0):
    """SpookyHash V2 (Bob Jenkins, public domain) 128-bit hash — the
    function behind Trino's ``spooky_hash_v2_32/64`` (airlift
    SpookyHashV2, seed 0). Short path under 192 bytes, Mix-block long
    path at or above. Verified against the PUBLISHED smhasher
    verification constant for Spooky64 (0x972C4BDC — keys [0..i) at
    seed 256-i, LE digests concatenated, rehashed at seed 0) in
    tests/test_trino_sql.py::test_spooky_smhasher_verification; that
    procedure exercises every length 0..255, covering both paths and
    the 192-byte boundary."""
    if len(data) < 192:
        return _spooky_short(data, seed1, seed2)
    return _spooky_long(data, seed1, seed2)


def spooky_v2_64(data: bytes, seed: int = 0) -> int:
    return spooky_v2_128(data, seed, seed)[0]


def spooky_v2_32(data: bytes, seed: int = 0) -> int:
    # Public header: Hash32 = (uint32)Hash128(seed, seed).hash1.
    return spooky_v2_64(data, seed & 0xFFFFFFFF) & 0xFFFFFFFF


def register_spooky(spark: SparkSession) -> None:
    """Register ``trino_spooky32/64(varbinary) → varbinary`` — Trino's
    ``spooky_hash_v2_32/64`` (VarbinaryFunctions: big-endian bytes of
    the seed-0 hash value). Arrow-batched pandas UDFs (dialect-parity
    path — internal fingerprints should use Spark's native xxhash64)."""
    import pandas as pd  # noqa: PLC0415 — lazy, session-scoped

    def _s32(b):
        return pd.Series(
            [None if v is None
             else spooky_v2_32(bytes(v)).to_bytes(4, "big")
             for v in b], dtype=object)

    def _s64(b):
        return pd.Series(
            [None if v is None
             else spooky_v2_64(bytes(v)).to_bytes(8, "big")
             for v in b], dtype=object)

    for fn, name in ((_s32, "trino_spooky32"), (_s64, "trino_spooky64")):
        fn.__annotations__ = {"b": pd.Series, "return": pd.Series}
        spark.udf.register(name, F.pandas_udf(fn, "binary"))


def register_binary_codecs(spark: SparkSession) -> None:
    """Register the binary-codec UDF family (r10, formerly bare
    unresolved-routines):

    - ``trino_hmac_{md5,sha1,sha256,sha512}(data, key) → varbinary`` —
      RFC 2104 HMAC (Trino wraps Guava's Hashing.hmac*); Python's
      ``hmac`` module implements the identical RFC, bit-verified
      against RFC 4231/2202's published test vectors in
      tests/test_trino_sql.py::test_hmac_rfc_vectors.
    - ``trino_to_ieee754_{64,32} / trino_from_ieee754_{64,32}`` —
      IEEE 754 big-endian bit layout (struct '>d'/'>f'), the exact
      Java Double.doubleToLongBits/Float.floatToIntBits round-trip
      Trino performs. 32-bit encode goes through float32 rounding.
    """
    import hmac as _hmac    # noqa: PLC0415 — lazy, session-scoped
    import struct           # noqa: PLC0415

    import pandas as pd     # noqa: PLC0415

    def _hmac_fn(alg):
        def f(data, key):
            return pd.Series(
                [None if (d is None or k is None)
                 else _hmac.new(bytes(k), bytes(d), alg).digest()
                 for d, k in zip(data, key)], dtype=object)
        f.__annotations__ = {"data": pd.Series, "key": pd.Series,
                             "return": pd.Series}
        return f

    for alg in ("md5", "sha1", "sha256", "sha512"):
        spark.udf.register(f"trino_hmac_{alg}",
                           F.pandas_udf(_hmac_fn(alg), "binary"))

    def _pack(fmt):
        def f(x):
            return pd.Series(
                [None if v is None else struct.pack(fmt, v)
                 for v in x], dtype=object)
        f.__annotations__ = {"x": pd.Series, "return": pd.Series}
        return f

    def _unpack(fmt, nbytes):
        def f(b):
            out = []
            for v in b:
                if v is None:
                    out.append(None)
                    continue
                raw = bytes(v)
                if len(raw) != nbytes:
                    raise ValueError(
                        f"from_ieee754: input must be exactly {nbytes} "
                        f"bytes, got {len(raw)}")
                out.append(struct.unpack(fmt, raw)[0])
            return pd.Series(out, dtype="float64")
        f.__annotations__ = {"b": pd.Series, "return": pd.Series}
        return f

    spark.udf.register("trino_to_ieee754_64",
                       F.pandas_udf(_pack(">d"), "binary"))
    spark.udf.register("trino_to_ieee754_32",
                       F.pandas_udf(_pack(">f"), "binary"))
    spark.udf.register("trino_from_ieee754_64",
                       F.pandas_udf(_unpack(">d", 8), "double"))
    spark.udf.register("trino_from_ieee754_32",
                       F.pandas_udf(_unpack(">f", 4), "float"))


def _regularized_beta(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) via the standard Lentz
    continued-fraction evaluation (the textbook algorithm Trino's
    commons-math dependency also uses), symmetric-split for
    convergence. Double precision (~1e-15)."""
    import math  # noqa: PLC0415

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
                + a * math.log(x) + b * math.log1p(-x))
    if x > (a + 1.0) / (a + b + 2.0):
        # I_x(a,b) = 1 - I_{1-x}(b,a) converges faster on the far side
        return 1.0 - _regularized_beta(b, a, 1.0 - x)
    tiny = 1e-300
    c, d = 1.0, 1.0 - (a + b) * x / (a + 1.0)
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        num = m * (b - m) * x / ((a + m2 - 1.0) * (a + m2))
        d = 1.0 + num * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + num / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        num = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1.0))
        d = 1.0 + num * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + num / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-16:
            break
    return math.exp(ln_front) * h / a


def _inverse_normal_cdf01(p: float) -> float:
    """Standard-normal quantile: Acklam's rational approximation
    refined with one Halley step on erfc — ~1e-15, the precision
    Trino's solver also reaches."""
    import math  # noqa: PLC0415

    # Acklam coefficients (published, public domain)
    a = (-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00)
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        x = ((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
              * q + c[5])
             / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
    elif p <= phigh:
        q = p - 0.5
        r = q * q
        x = ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
              * r + a[5]) * q
             / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4])
                * r + 1))
    else:
        q = math.sqrt(-2 * math.log1p(-p))
        x = -((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
               * q + c[5])
              / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
    # one Halley refinement against the exact erfc-based CDF — skipped
    # in the extreme tails where exp(x²/2) would overflow (subnormal
    # p, |x| ≳ 37.6): Acklam's estimate alone is already ~1e-9 there
    # (r10 review fix: inverse_normal_cdf(0, 1, 5e-324) raised
    # OverflowError instead of returning the ~-38.5 quantile).
    if x * x / 2 > 700:
        return x
    e = 0.5 * math.erfc(-x / math.sqrt(2)) - p
    u = e * math.sqrt(2 * math.pi) * math.exp(x * x / 2)
    return x - u / (1 + x * u / 2)


def register_stat_fns(spark: SparkSession) -> None:
    """Register the statistical-CDF UDF family (r10, formerly bare
    unresolved-routines): ``trino_normal_cdf(mean, sd, v)``,
    ``trino_inverse_normal_cdf(mean, sd, p)``,
    ``trino_beta_cdf(a, b, v)``, ``trino_inverse_beta_cdf(a, b, p)``.
    Argument-domain errors replay Trino's (sd > 0; a, b > 0;
    probabilities in their legal ranges). Verified by closed-form
    polynomial identities, literature quantiles, and exact round-trips
    in tests/test_trino_sql.py::test_stat_cdf_functions."""
    import math      # noqa: PLC0415 — lazy, session-scoped

    import pandas as pd  # noqa: PLC0415

    def _rowwise(fn):
        # Arrow delivers SQL NULL doubles as NaN (None checks are
        # dead), and ArrowEvalPython computes the UDF for EVERY row
        # even under a CASE guard — so NaN args must short-circuit to
        # NaN here instead of tripping the domain checks (the SQL-side
        # IS NULL CASE in the lowering then maps NULL rows' outputs
        # back to NULL; genuine NaN inputs stay NaN, IEEE-style).
        def f(x1, x2, x3):
            nan = float("nan")
            return pd.Series(
                [nan if (a is None or b is None or v is None
                         or a != a or b != b or v != v)
                 else fn(float(a), float(b), float(v))
                 for a, b, v in zip(x1, x2, x3)], dtype="float64")
        f.__annotations__ = {"x1": pd.Series, "x2": pd.Series,
                             "x3": pd.Series, "return": pd.Series}
        return f

    def _normal_cdf(mean, sd, v):
        if not sd > 0:
            raise ValueError("normal_cdf: standardDeviation must be > 0")
        return 0.5 * math.erfc(-(v - mean) / (sd * math.sqrt(2)))

    def _inv_normal(mean, sd, p):
        if not sd > 0:
            raise ValueError(
                "inverse_normal_cdf: standardDeviation must be > 0")
        if not 0 < p < 1:
            raise ValueError(
                "inverse_normal_cdf: p must be 0 < p < 1")
        return mean + sd * _inverse_normal_cdf01(p)

    def _beta_cdf(a, b, v):
        if not (a > 0 and b > 0):
            raise ValueError("beta_cdf: a, b must be > 0")
        if not 0 <= v <= 1:
            raise ValueError("beta_cdf: value must be in [0, 1]")
        return _regularized_beta(a, b, v)

    def _inv_beta(a, b, p):
        if not (a > 0 and b > 0):
            raise ValueError("inverse_beta_cdf: a, b must be > 0")
        if not 0 <= p <= 1:
            raise ValueError("inverse_beta_cdf: p must be in [0, 1]")
        if p == 0.0:
            return 0.0
        if p == 1.0:
            return 1.0
        lo, hi = 0.0, 1.0
        for _ in range(200):   # bisection to ~1e-16 — bulletproof
            mid = (lo + hi) / 2
            if _regularized_beta(a, b, mid) < p:
                lo = mid
            else:
                hi = mid
            if hi - lo < 1e-16:
                break
        return (lo + hi) / 2

    spark.udf.register("trino_normal_cdf",
                       F.pandas_udf(_rowwise(_normal_cdf), "double"))
    spark.udf.register("trino_inverse_normal_cdf",
                       F.pandas_udf(_rowwise(_inv_normal), "double"))
    spark.udf.register("trino_beta_cdf",
                       F.pandas_udf(_rowwise(_beta_cdf), "double"))
    spark.udf.register("trino_inverse_beta_cdf",
                       F.pandas_udf(_rowwise(_inv_beta), "double"))


def register_xxhash64(spark: SparkSession) -> None:
    """Register ``trino_xxhash64(b)`` — Trino's ``xxhash64(varbinary)
    → varbinary`` (VarbinaryFunctions.java in trino-main): seed-0
    XXH64 of the raw bytes, the 64-bit result written as Slice bytes
    (little-endian — airlift Slice.setLong). Spark's builtin xxhash64
    can't express it: it seeds with 42 and returns BIGINT. Arrow-
    batched pandas UDF over the numpy-vectorized :func:`xxh64_batch`
    (r10 — the r9 version computed a pure-Python bigint loop per
    value; lane arithmetic over uint64 arrays makes the dialect
    surface usable on real scans, while :func:`xxh64` stays as the
    bit-verified test reference)."""
    import pandas as pd  # noqa: PLC0415 — lazy, session-scoped

    def _xxh(b):
        vals = [bytes(v) if v is not None else None for v in b]
        hashed = xxh64_batch([v if v is not None else b"" for v in vals])
        blob = hashed.astype("<u8").tobytes()
        return pd.Series(
            [None if v is None else blob[8 * i: 8 * i + 8]
             for i, v in enumerate(vals)], dtype=object)

    _xxh.__annotations__ = {"b": pd.Series, "return": pd.Series}
    spark.udf.register("trino_xxhash64", F.pandas_udf(_xxh, "binary"))
