"""Deduplication family over documents/embeddings — SURVEY.md §2.4 L1–L2.

Five dedup strategies, each in its scalable Spark shape:

- exact          hash-groupBy on normalized text (one shuffle on the hash)
- n-gram Jaccard inverted shingle index + pair aggregation (no O(n²) scan)
- MinHash + LSH  signature → banding → bucket join (the 100-TB near-dup
                 path; candidate pairs only, then exact verify)
- SimHash        per-doc bit-vote fingerprint (map + one agg; pairs by
                 fingerprint distance)
- embedding      cosine near-dup via a blocked pair join (brute force at
                 test scale; IVF/LSH variant in llm/similarity.py)

Oracle notes: every strategy is hash-checked cross-engine — exact/
ngram/simhash/embedding use engine-neutral arithmetic, and MinHash uses
the md5-prefix permutation family (r6), so DuckDB replays signatures,
banding and the exact verify bit-for-bit (minhash_pairs_sql).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.operators._util import r4, t
from okera_trino_spark.registry import query

# ------------------------------------------------------------------ helpers

def _words(col) -> Column:
    return F.split(F.trim(col), " +")


def _shingles_of_words(words: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of an already-materialized words array:
    slice at every start position (higher-order functions; JVM-side, no
    UDF). ``words`` MUST be a bound column (not a nested split(...)
    expression): this expression references it ~|words| times, and
    whole-stage codegen does not common-subexpression-eliminate across
    higher-order-function lambda boundaries — an inline split() here
    re-ran the regex once per slice, a measured 5× slowdown on the
    shingle pipeline.

    Docs with fewer than k words yield an EMPTY shingle set (matching the
    DuckDB oracle) — without the guard, ``sequence(1, n-(k-1))`` would
    descend (stop < start) and ``slice(..., 0, k)`` throws
    INVALID_PARAMETER_VALUE.START on any 1–2-word doc."""
    n = F.size(words)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.array_join(F.slice(words, i, k), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _shingles(col, k: int = 3) -> Column:
    """k-word shingles straight off a text column — convenience form for
    single-use contexts (tests); hot paths go through shingle_index,
    which materializes the words array once per row first."""
    return _shingles_of_words(_words(col), k)


def shingle_index(docs: DataFrame, k: int = 3,
                  extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Inverted index: (doc_id, shingle) exploded — the join key for
    set-similarity without pairwise comparison. Projects the split words
    array into a real column first so the k slice references resolve to
    one attribute read, not k regex splits (see _shingles_of_words)."""
    # NOTE: deliberately NO pre-explode repartition here (unlike the
    # trigram-LM pipeline): the word-shingle explode is ~6x smaller and
    # O(1) per row, and every consumer immediately re-shuffles on the
    # shingle key anyway — the extra round-robin shuffle was measured
    # ~1.3x SLOWER end-to-end on the pair pipeline at sf0.1.
    words = docs.select("doc_id", *extra_cols,
                        _words(F.col("text")).alias("_w"))
    return words.select(
        "doc_id", *extra_cols,
        F.explode(_shingles_of_words(F.col("_w"), k)).alias("shingle"),
    )


# ------------------------------------------------------------------ L1 exact
@query(
    "q_llm_dedup_exact",
    oracle="""
    SELECT min(doc_id) AS canonical_doc_id,
           count(*) AS n_copies,
           md5(lower(trim(text))) AS text_hash
    FROM documents
    GROUP BY md5(lower(trim(text)))
    """,
    tags=("llm", "dedup"),
)
def q_llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 exact dedup: group on the md5 of the normalized text, keep
    the lowest doc_id as canonical. The group key IS the digest (r14 —
    the docstring had promised this form since r1 while the code still
    grouped on the full normalized text: the partial-agg shuffle
    carried ENTIRE DOCUMENTS as the grouping key, the exact
    wide-key-at-volume shape the substring sf10 probe caught collapsing
    the allocator; with the digest key the shuffle carries 32-char
    hashes regardless of document size, and both engines group
    identically — a 128-bit collision would need ~2^64 distinct docs)."""
    d = t(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return (
        d.groupBy(F.md5(norm).alias("text_hash"))
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("n_copies"))
        .select("canonical_doc_id", "n_copies", "text_hash")
    )


# --------------------------------------------------------- L2 n-gram Jaccard
NGRAM_THRESHOLD = 0.5
#: Shingle document-frequency cap: a shingle appearing in d docs emits
#: d²/2 rows on ONE shuffle key in the inverted-index self-join, so an
#: uncapped corpus-common ("boilerplate") shingle is a straight hot-key
#: OOM at 100 TB. Shingles with DF > cap carry no near-dup signal at
#: Jaccard ≥ 0.5 anyway — they are shared by construction — so both
#: engines drop them BEFORE computing |A|, |B| and |∩| (the metric is
#: defined over the capped shingle universe; Spark and DuckDB apply the
#: identical cutoff, see ngram_pairs_sql). The cap is an ABSOLUTE count
#: so the worst single-key fan-out is bounded at cap²/2 ≈ 500k rows
#: regardless of corpus size. Driver-fixture max DF is 25 (measured,
#: sf0.001-0.1), so at test scale the cap provably drops nothing.
#: CAVEAT (r12, measured): a corpus whose WHOLE df distribution
#: inflates under the cap — the generated scale tiers saturate the
#: shingle space, df 138 at sf1.0 / 353 at sf3.0 — makes the
#: candidate-pair volume SUM(df²) grow quadratically while no single
#: shingle trips the cap (SCALE.md r12). The exact inverted-index join
#: is for modest corpora / audits; the 100-TB edge source is the
#: banded-LSH path (minhash_verified_pairs), whose cost does not
#: depend on df at all.
NGRAM_MAX_DF = 1000


def ngram_pairs_sql(threshold: float = NGRAM_THRESHOLD,
                    max_df: int = NGRAM_MAX_DF) -> str:
    """Canonical DuckDB CTE fragment for the 3-shingle Jaccard pair set
    (defines ``pairs(doc_a, doc_b, jaccard)``). Single source of truth
    shared by the q_llm_dedup_ngram oracle and the q_llm_dup_clusters
    oracle — the SQL and the Spark helper below must never drift."""
    return f"""
    sh0 AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(str_split_regex(trim(text), ' +')) - 1, 1)),
                   i -> array_to_string((str_split_regex(trim(text), ' +'))[i:i+2], ' ')))) AS shingle
        FROM documents
    ),
    sh AS (
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   count(*) OVER (PARTITION BY shingle) AS df
            FROM sh0
        ) WHERE df <= {max_df}
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    hits AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT h.doc_a, h.doc_b,
               round(h.common * 1.0 / (ca.n + cb.n - h.common), 4) AS jaccard
        FROM hits h
        JOIN cnt ca ON h.doc_a = ca.doc_id
        JOIN cnt cb ON h.doc_b = cb.doc_id
        WHERE h.common * 1.0 / (ca.n + cb.n - h.common) >= {threshold}
    )"""


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3,
                        threshold: float = NGRAM_THRESHOLD,
                        max_df: int = NGRAM_MAX_DF) -> DataFrame:
    """Near-dup pairs (doc_a, doc_b, jaccard) via the inverted shingle
    index — the Spark twin of ngram_pairs_sql; shared by the registered
    ngram key and the dup-cluster edge source.

    The DF cap is a count window PARTITIONED BY shingle — the same
    hash-partitioning the self-join below shuffles on. The capped index
    is then materialized ONCE (localCheckpoint) because three consumers
    read it (the per-doc counts and both self-join sides): without the
    checkpoint each consumer re-runs the regex split + explode + window,
    tripling the most expensive map stage (measured 2.2× end-to-end at
    sf0.1, and the same multiple of scan work at 100 TB)."""
    from pyspark.sql import Window

    sh = shingle_index(docs, k)
    sh = (
        sh.withColumn("_df", F.count("*").over(Window.partitionBy("shingle")))
        .filter(F.col("_df") <= max_df)
        .localCheckpoint()
    )
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # A df=1 shingle joins only with itself (doc_a < doc_b excludes it),
    # so it can contribute NOTHING to the pair join — but it still counts
    # toward |A|/|B| above. On a real corpus singleton shingles are the
    # long tail of the index; pruning them from the join sides (free —
    # _df is already materialized for the cap) shrinks the self-join
    # input without changing a single output row.
    joinable = sh.filter(F.col("_df") >= 2).drop("_df")
    a = joinable.alias("a")
    b = joinable.alias("b")
    hits = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    jac = F.col("common") / (F.col("ca.n") + F.col("cb.n") - F.col("common"))
    return (
        hits.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", r4(jac).alias("jaccard"))
    )


@query(
    "q_llm_dedup_ngram",
    oracle=f"WITH {ngram_pairs_sql()}\n    SELECT doc_a, doc_b, jaccard FROM pairs",
    tags=("llm", "dedup"),
)
def q_llm_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 n-gram (3-word shingle) Jaccard near-dup via inverted index:
    explode shingles, self-join on shingle, count common per pair,
    Jaccard = |∩| / (|A| + |B| - |∩|), threshold 0.5.

    Scale: the self-join shuffles on the shingle — pairs never
    materialize unless they share a shingle, and shingles with document
    frequency > NGRAM_MAX_DF are dropped before the join (both engines),
    bounding any single key's fan-out at cap²/2. This exact-index form
    is the verifier behind the MinHash candidates below.
    """
    return ngram_jaccard_pairs(t(spark, sf_dir, "documents"))


# ---------------------------------------------------------- L2 MinHash + LSH
N_HASHES = 32
N_BANDS = 8  # 8 bands x 4 rows: P(candidate) ≈ 1-(1-j^4)^8 — steep at j≈0.6

#: Engine-neutral MinHash permutation family: h_i(s) = (A_i·H(s) + B_i)
#: mod P over the 32-bit md5-prefix base H(s) — md5 is bit-identical
#: across engines (unlike xxhash64's Spark-internal seeding), and the
#: bounds keep every intermediate < 2^52: A < 2^20, H < 2^32, so A·H+B
#: fits both int64 and DuckDB's overflow-checked BIGINT exactly.
MINHASH_P = 4294967291  # largest 32-bit prime


def _minhash_params(n_hashes: int = N_HASHES,
                    seed: int = 7) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    return [(int(rng.integers(1, 1 << 20)), int(rng.integers(0, MINHASH_P)))
            for _ in range(n_hashes)]


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES,
                       sh: DataFrame | None = None) -> DataFrame:
    """Per-doc MinHash signature: min over shingles of the linear
    permutation (A_i·H + B_i) mod P on the md5-prefix base H — explode
    + one 32-agg groupBy (shuffle payload: 32 longs per doc; H is
    computed ONCE per shingle row and shared by all 32 aggregates).
    Pass a pre-built (doc_id, shingle) index via ``sh`` to share one
    materialization with other consumers (q_llm_dedup_near reads the
    index four times otherwise).

    Since r6 the base hash is md5 (engine-bit-identical), so the whole
    pipeline restates exactly in the DuckDB oracle — upgrading the key
    from the rows-only check to a hard hash signal.

    Deliberately NOT the "obvious" zero-shuffle form
    (``array_min(transform(_sh, s -> hash(s)))`` x 32 over a
    materialized shingles column): Catalyst's CollapseProject inlines
    the bound ``_sh`` expression into every one of the 32 signature
    expressions and codegen does not CSE across lambda boundaries, so
    the whole shingle pipeline (slice/array_join per position) re-runs
    32x per row — measured 5x SLOWER than this exploded form at sf0.1
    (8.7s vs 1.7s for the near-dup key). The explode materializes each
    shingle exactly once; the groupBy shuffle it costs is tiny next to
    that."""
    if sh is None:
        sh = shingle_index(docs, 3)
    base = F.conv(F.substring(F.md5(F.encode("shingle", "UTF-8")), 1, 8),
                  16, 10).cast("long")
    hashed = sh.withColumn("_H", base)
    # one parsed expression per permutation, not 6 nested Column calls
    # each (r15, the _kmeans_assign py4j-chatter lesson); _H is BIGINT
    # so the arithmetic promotes identically
    mins = [
        F.expr(f"min(({a} * _H + {b}L) % {MINHASH_P}L) AS h{i}")
        for i, (a, b) in enumerate(_minhash_params(n_hashes))
    ]
    return hashed.groupBy("doc_id").agg(*mins)


def _band_fold(cols: list) -> str:
    """Engine-neutral numeric band bucket: a base-31 polynomial fold of
    the band's signature values, each reduced mod 2^16 first so the
    fold stays < 2^36 (exact in int64 AND float64 — DuckDB-safe). The
    16-bit reduction adds bucket collisions only, and a colliding
    bucket merely ADDS candidate pairs — the exact Jaccard verify
    filters them, so correctness is unaffected while the join key stays
    one long instead of a string (measured ~20% on the near-dup key).
    ``cols`` are column NAMES; returns a SQL fragment — the whole band
    array below is one server-side parse (r15, the _kmeans_assign
    py4j-chatter lesson)."""
    acc = None
    for c in cols:
        red = f"({c} % 65536)"
        acc = red if acc is None else f"(({acc}) * 31 + {red})"
    return acc


def lsh_candidate_pairs(sigs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """Band the signature and bucket-join: docs sharing any band bucket
    become candidate pairs. The bucket key is an engine-neutral numeric
    fold of the band's signature values (see _band_fold); the join key
    is (band_id, bucket) — a single shuffle; no pairwise scan ever
    happens.

    The banded relation is checkpointed (r16, guide §1.2 "don't compute
    things you throw away"): the self-join's two sides otherwise each
    re-derive the FULL MinHash aggregation from the shingle index —
    Catalyst plans two structurally identical subtrees and no exchange
    reuse fires (verified: ReusedExchange count 0, the md5 + 32
    permutation min-aggs appeared on both the probe and build side) —
    a whole duplicated corpus pass at scale. The checkpoint is |docs| x
    n_bands rows of three integers (~tiny at any scale next to the
    index). Lazy like the spine's other checkpoints; isolated
    interleaved A/B on the candidate materialization at sf0.1: min
    1.56 -> 1.28 s, median 1.73 -> 1.68 s."""
    rows_per_band = N_HASHES // n_bands
    bands = F.expr("array(" + ",".join(
        f"named_struct('band', {b}, 'bucket', "
        + _band_fold([f"h{b * rows_per_band + r}"
                      for r in range(rows_per_band)]) + ")"
        for b in range(n_bands)) + ")")
    banded = sigs.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    ).localCheckpoint(eager=False)
    x = banded.alias("x")
    y = banded.alias("y")
    return (
        x.join(y, (F.col("x.band") == F.col("y.band"))
               & (F.col("x.bucket") == F.col("y.bucket"))
               & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_pairs_sql() -> str:
    """DuckDB replay of the FULL MinHash+LSH pipeline as a WITH-body
    ending in a ``pairs(doc_a, doc_b, jaccard)`` CTE — possible since
    the r6 switch to the md5-prefix permutation family (bit-identical
    across engines; integer arithmetic stays < 2^52 so DuckDB's
    overflow-checked BIGINT and Spark's long agree exactly). The A/B
    permutation constants are injected as a VALUES table from the same
    seeded generator the Spark side uses. Shared by the near-dup key's
    oracle and the LSH-edge cluster oracle (r12) so they can never
    drift."""
    rows_per_band = N_HASHES // N_BANDS
    perms = ", ".join(f"({i}, {a}, {b})"
                      for i, (a, b) in enumerate(_minhash_params()))
    return f"""
    shn AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(w) - 1, 1)),
                   i -> array_to_string(w[i:i+2], ' ')))) AS shingle
        FROM (SELECT doc_id, str_split_regex(trim(text), ' +') AS w
              FROM documents)
    ),
    hashes AS (
        SELECT doc_id, shingle,
               ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS H
        FROM shn
    ),
    perms(i, a, b) AS (VALUES {perms}),
    sigs AS (
        SELECT h.doc_id, p.i,
               min((p.a * h.H + p.b) % {MINHASH_P}) AS hv
        FROM hashes h CROSS JOIN perms p GROUP BY 1, 2
    ),
    bands AS (
        -- base-31 polynomial fold of the band's (mod 2^16) signature
        -- values, in i order — identical to the Spark _band_fold
        SELECT doc_id, i // {rows_per_band} AS band,
               CAST(sum((hv % 65536) *
                        CAST(31 ** ({rows_per_band} - 1 - (i % {rows_per_band}))
                             AS BIGINT)) AS BIGINT) AS bucket
        FROM sigs GROUP BY doc_id, i // {rows_per_band}
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.bucket = y.bucket
         AND x.doc_id < y.doc_id
    ),
    cntn AS (SELECT doc_id, count(*) AS n FROM shn GROUP BY doc_id),
    com AS (
        SELECT c.doc_a, c.doc_b, count(*) AS common
        FROM cand c
        JOIN shn a ON c.doc_a = a.doc_id
        JOIN shn b ON c.doc_b = b.doc_id AND a.shingle = b.shingle
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT c.doc_a, c.doc_b,
               round(c.common * 1.0 / (ca.n + cb.n - c.common), 4) AS jaccard
        FROM com c
        JOIN cntn ca ON c.doc_a = ca.doc_id
        JOIN cntn cb ON c.doc_b = cb.doc_id
        WHERE c.common * 1.0 / (ca.n + cb.n - c.common) >= 0.5
    )"""


def _prune_index_to_candidates(sh: DataFrame,
                               cand_docs: DataFrame) -> DataFrame:
    """Semi-join the shingle index down to candidate documents — the
    verify-prune (r12). Deliberately NO broadcast hint: AQE broadcasts
    the candidate set at runtime when its measured size is small, and
    degrades to a shuffle semi-join when a high-duplication corpus
    (30-70% near-dup is normal for web crawls) makes it corpus-sized —
    a forced hint there is a driver OOM. tests/test_llm.py plan-asserts
    the no-hint shape and runs the full pipeline broadcast-disabled on
    a >=50%-near-dup corpus."""
    return sh.join(cand_docs, "doc_id", "leftsemi")


def minhash_verified_pairs(d: DataFrame) -> DataFrame:
    """Exact-verified MinHash+LSH near-dup pairs (doc_a, doc_b,
    jaccard ≥ 0.5) — the Spark twin of minhash_pairs_sql, shared by the
    q_llm_dedup_near key and the LSH-edge cluster resolver (r12).

    The shingle index feeds FOUR consumers (MinHash aggregation, the
    per-doc counts, and both exact-verify join sides), so it is
    materialized once — otherwise the regex-split + explode map stage,
    the dominant scan cost at any scale, runs four times.

    Scale: candidate generation is the banded bucket join — cost scales
    with docs x bands, NOT with per-shingle document frequency, so a
    df-inflated (boilerplate-heavy) corpus that sends the exact
    inverted-index join quadratic leaves this path linear (measured:
    the r12 probes — candidate pairs 2.6k/8.1k/29k at sf1/3/10, a
    clean 1.1x-per-x line).

    The exact-verify stage is pruned BEFORE it joins (r12, caught by
    the sf1.0→sf10 probe): verification only concerns documents that
    appear in some candidate pair, but the unpruned form shuffled the
    ENTIRE shingle index through both verify joins — linear algorithm,
    corpus-sized constant, measured 18.5x wall for 10x data because
    the index shuffle dominated. The index is pruned by a semi-join on
    the candidate DOC set with NO broadcast hint (r13, per the r12
    verdict): on typical corpora the candidate set is orders of
    magnitude smaller than the corpus and AQE converts the semi-join
    to a runtime broadcast from its MEASURED size — but real web
    corpora run 30-70% near-duplicate (the CCNet/RefinedWeb regime),
    where a FORCED broadcast of billions of doc ids is a driver OOM,
    not a slowdown. Un-hinted, the worst case degrades to a shuffle
    semi-join (linear, correct), the common case still broadcasts —
    exactly the discipline the trigram model join follows
    (llm/text.py, r8 ADVICE). tests/test_llm.py pins the contract:
    the pipeline completes on a >=50%-near-dup corpus with broadcast
    disabled and the plan carries no broadcast hint.
    Measured (SCALE_PROBE_r12.json third
    tier): sf10 wall 132.8 s pre-fix -> 86.0 s eager-checkpoint /
    102.6 s as shipped (lazy checkpoints — eager costs 2-3x on the
    whole key at sf0.1, and the eager-vs-lazy sf10 delta is inside the
    tier's session noise); ratio for 10x data 18.46 -> ~11-12
    (~linear; the fixture's candidate docs are a dense 10% of the
    corpus, so verify work IS ~10% of a corpus scan by
    construction)."""
    # ALL checkpoints lazy (r12 for cands/shc, r15 for sh): eager
    # materialization adds a standalone job per checkpoint — measured
    # 2-3x wall on the whole key at sf0.1 for the two downstream ones
    # (r12) and ~0.3-0.8 s for the index itself (r15 interleaved A/B:
    # dedup_near 2.43-2.90 -> 2.04 s min, dup_clusters_lsh 2.82-3.49
    # -> 2.64 s) — while lazy gives the same reuse (sh: 4 consumers,
    # cands: 2, pruned index: 3) at one materialization on the first
    # action that computes each block.
    sh = shingle_index(d, 3).localCheckpoint(eager=False)
    cands = lsh_candidate_pairs(minhash_signatures(d, sh=sh)) \
        .localCheckpoint(eager=False)
    cand_docs = (cands.select(F.col("doc_a").alias("doc_id"))
                 .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
                 .distinct())
    shc = _prune_index_to_candidates(sh, cand_docs) \
        .localCheckpoint(eager=False)
    cnt = shc.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = shc.alias("a")
    b = shc.alias("b")
    common = (
        cands.join(a, F.col("doc_a") == F.col("a.doc_id"))
        .join(b, (F.col("doc_b") == F.col("b.doc_id"))
              & (F.col("a.shingle") == F.col("b.shingle")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    jac = F.col("common") / (F.col("ca.n") + F.col("cb.n") - F.col("common"))
    return (
        common.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", r4(jac).alias("jaccard"))
    )


@query("q_llm_dedup_near",
       oracle=f"WITH {minhash_pairs_sql()}\n    SELECT doc_a, doc_b, jaccard FROM pairs",
       tags=("llm", "dedup"))
def q_llm_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 MinHash+LSH near-dup, exact-verified: LSH candidates, then
    true Jaccard over the shingle index, threshold 0.5.

    HARD oracle since r6: the md5-prefix permutation family is
    engine-bit-identical, so the DuckDB oracle replays signatures,
    banding, the candidate join, AND the exact verify — the full
    pipeline, not a rows-only count. Measured price of neutrality:
    +~0.5 s at sf0.1 (md5 vs the xxhash64 it replaced) — accepted as
    the cost of converting this key from the weak rows-only check to a
    hard cross-engine signal; the hash is one call per shingle ROW,
    shared by all 32 aggregates, so the overhead stays a constant
    factor of the scan, not of the signature width. tests/test_llm.py additionally
    asserts the verified pair set equals the exact q_llm_dedup_ngram
    pair set (LSH recall check) and that signatures are deterministic
    across runs. Pipeline shared with the LSH-edge cluster resolver —
    see minhash_verified_pairs for the plan-shape/scale notes.
    """
    return minhash_verified_pairs(t(spark, sf_dir, "documents"))


# ------------------------------------------------- L2 exact-substring spans
#: Window width for exact-substring duplicate detection, in words.
#: Lee et al. use 50 BPE tokens on web-scale corpora; the fixture docs
#: are short word streams, so 15 words keeps multi-window spans
#: exercised at every SF. The window is hashed IMMEDIATELY (md5 of the
#: joined words) so the shuffle carries a 32-char digest, not K words
#: of text — at 100 TB the overlapping-window blowup is the method's
#: cost, and hashing first divides it by ~K/2.
SUBSTR_K = 15


@query(
    "q_llm_substring_spans",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, str_split_regex(trim(text), ' +') AS wl
        FROM documents
    ),
    wins AS (
        SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.h
        FROM w, UNNEST(list_transform(
            range(1, greatest(len(wl) - {SUBSTR_K - 2}, 1)),
            i -> struct_pack(pos := i,
                             h := md5(array_to_string(wl[i:i+{SUBSTR_K - 1}], ' '))))) AS t(s)
    ),
    flagged AS (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY h
                                      ORDER BY doc_id, pos) AS rn,
                   count(*) OVER (PARTITION BY h) AS cnt
            FROM wins)
        WHERE cnt > 1 AND rn > 1
    ),
    isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos > coalesce(
                        max(pos + {SUBSTR_K - 1}) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) + 1,
                        -1)
                    THEN 1 ELSE 0 END AS brk
        FROM flagged
    ),
    isl2 AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM isl
    )
    SELECT doc_id,
           min(pos) AS span_start,
           CAST(max(pos) + {SUBSTR_K - 1} AS BIGINT) AS span_end,
           CAST(max(pos) + {SUBSTR_K - 1} - min(pos) + 1 AS BIGINT)
               AS n_words,
           CAST(count(*) AS BIGINT) AS n_windows
    FROM isl2
    GROUP BY doc_id, island
    """,
    tags=("llm", "dedup", "substring"),
)
def q_llm_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 exact-substring duplicate SPANS — the overlapping-window form
    of Lee et al. 2022's ExactSubstr dedup (public method): any
    SUBSTR_K-word window whose exact text occurs anywhere else in the
    corpus marks its occurrence for removal, keeping only the globally
    FIRST occurrence by (doc_id, pos); overlapping flagged windows
    merge into maximal word spans per document (the text a curation
    pass actually cuts). Catches duplicated passages at ANY alignment
    — q_llm_para_dedup's fixed 10-word chunking misses a copy shifted
    by one word; this does not.

    Scale shape: windows are hashed INSIDE the explode transform
    (codegen md5 — the shuffle carries digests, never K-word strings),
    and the digest is immediately SPLIT INTO TWO 60-BIT LONGS
    (conv(substr(md5, …), 16, 10) twice — full 120-bit strength) so
    the materialized window set and both digest-keyed exchanges carry
    16-byte numeric keys instead of 32-char strings. That split is the
    r14 sf10 catch: row counts are exactly linear across tiers
    (2.0M → 6.0M → 20.1M windows, measured), but the string-keyed
    pipeline read 19× wall for 10× data — ~2 GB of md5 STRINGS
    pinned in the checkpoint plus string hashing/compares in the
    groupBy and join pushed the fixed 32-thread JVM into GC collapse
    (second same-session run 1.8× slower again with row counts
    unchanged — allocator pressure, not work). Long keys cut the
    keyed bytes ~3.5×. The DuckDB oracle is UNAFFECTED: it groups on
    the md5 string, and grouping by the split-long pair partitions
    windows identically (no 120-bit collisions at any tested scale).
    The explode input goes through ``spread_if_narrow`` (the
    single-file fixture scans plan 2 partitions at sf1.0 / 14 at sf10
    — the md5-heavy amplified map stage is exactly the DSIR/winnow
    class the helper exists for; production many-split layouts
    no-op). First-occurrence is a combinable
    ``groupBy(h1, h2).agg(min(struct(doc_id, pos)), count)`` so a
    boilerplate window duplicated 10⁶ times collapses map-side; the
    flag join fans dup windows back out on the digest key (AQE skew
    split applies — the hot-hash fan-out is the method's output, not
    waste); span merging is a per-DOCUMENT window (bounded by doc
    length, never partition-less). Window start positions are 1-based
    word indexes; both engines compute identical digests, the same
    first-occurrence rule, and the same gaps-and-islands merge, so the
    key is hash-checked end to end."""
    from pyspark.sql import Window

    from okera_trino_spark.operators._util import spread_if_narrow

    kk = SUBSTR_K
    d = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    words = d.select("doc_id", _words(F.col("text")).alias("_w"))
    wins = (words.select(
        "doc_id",
        F.posexplode(F.expr(
            f"CASE WHEN size(_w) >= {kk} THEN "
            f"transform(sequence(1, size(_w) - {kk - 1}), "
            f"i -> md5(array_join(slice(_w, i, {kk}), ' '))) "
            "ELSE CAST(array() AS array<string>) END")).alias("p0", "h"))
        .select("doc_id", (F.col("p0") + 1).cast("long").alias("pos"),
                F.expr("CAST(conv(substr(h, 1, 15), 16, 10) AS BIGINT)")
                .alias("h1"),
                F.expr("CAST(conv(substr(h, 16, 15), 16, 10) AS BIGINT)")
                .alias("h2"))
        .localCheckpoint())
    first = (wins.groupBy("h1", "h2")
             .agg(F.min(F.struct("doc_id", "pos")).alias("_f"),
                  F.count("*").alias("_cnt"))
             .filter(F.col("_cnt") > 1)
             .select("h1", "h2", "_f"))
    flagged = (
        wins.join(first, ["h1", "h2"])
        .filter(~((F.col("doc_id") == F.col("_f.doc_id"))
                  & (F.col("pos") == F.col("_f.pos"))))
        .select("doc_id", "pos"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + (kk - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(F.col("pos") > F.coalesce(prev_end + 1, F.lit(-1)), 1) \
        .otherwise(0)
    spans = (
        flagged.withColumn("_island", F.sum(brk).over(w))
        .groupBy("doc_id", "_island")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") + (kk - 1)).cast("long").alias("span_end"),
             F.count("*").cast("long").alias("n_windows")))
    return spans.select(
        "doc_id", "span_start", "span_end",
        (F.col("span_end") - F.col("span_start") + 1).cast("long")
        .alias("n_words"),
        "n_windows")


# --------------------------------------------------------------- L2 SimHash
SIMHASH_BITS = 16


def _word_hash16() -> Column:
    """Engine-neutral 16-bit word hash (modular arithmetic only)."""
    return (
        F.length("word") * 2654435761 + F.ascii(F.substring("word", 1, 1)) * 97
    ) % 65536


def simhash_sql() -> str:
    """Canonical DuckDB SELECT producing (doc_id, simhash) — shared by
    the fingerprint oracle and the Hamming-pairing oracle below so the
    two can never drift."""
    return f"""
    SELECT doc_id,
           CAST(sum(CASE WHEN bit_votes > 0 THEN power_of_two ELSE 0 END) AS BIGINT) AS simhash
    FROM (
        SELECT doc_id, b.b AS bit_pos, CAST(2 ** b.b AS BIGINT) AS power_of_two,
               sum(CASE WHEN (h // CAST(2 ** b.b AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS bit_votes
        FROM (
            SELECT doc_id,
                   (length(word) * 2654435761 + ascii(substr(word, 1, 1)) * 97) % 65536 AS h
            FROM (
                SELECT doc_id, unnest(str_split_regex(trim(text), ' +')) AS word
                FROM documents
            )
        ) hashed CROSS JOIN (SELECT unnest(range(0, {SIMHASH_BITS})) AS b) b
        GROUP BY doc_id, b.b
    )
    GROUP BY doc_id
    """


@query(
    "q_llm_dedup_simhash",
    oracle=simhash_sql(),
    tags=("llm", "dedup"),
)
def q_llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 SimHash fingerprint: per bit, words vote +1/-1 by their hash
    bit; the fingerprint packs the vote signs. Near-dups then differ in
    few bits (Hamming ≤ k pairing happens on the fingerprint, constant
    width — no shingle join at all). Hash is engine-neutral arithmetic
    so DuckDB reproduces it bit-for-bit.

    Plan shape: explode words → one partial+final agg of 16 vote sums →
    map to fingerprint; shuffle carries 16 longs per doc.
    """
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_words(F.col("text"))).alias("word"))
    hashed = toks.select("doc_id", _word_hash16().alias("h"))
    votes = [
        F.sum(
            F.when((F.col("h").bitwiseAND(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    per_doc = hashed.groupBy("doc_id").agg(*votes)
    fingerprint = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return per_doc.select("doc_id", fingerprint.cast("bigint").alias("simhash"))


#: Max Hamming distance for a SimHash near-dup pair, and the band split
#: that finds them: SIMHASH_PAIR_BANDS > SIMHASH_K chunks ⇒ by
#: pigeonhole any pair within distance K matches EXACTLY on at least one
#: chunk — banding has perfect recall, so the banded equi-join + exact
#: distance filter returns the IDENTICAL set an all-pairs scan would.
SIMHASH_K = 3
SIMHASH_PAIR_BANDS = 4
_CHUNK_BITS = SIMHASH_BITS // SIMHASH_PAIR_BANDS


@query(
    "q_llm_dedup_simhash_pairs",
    oracle=f"""
    WITH fp AS ({simhash_sql()})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_K}
    """,
    tags=("llm", "dedup"),
)
def q_llm_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 SimHash near-dup PAIRING: candidate pairs at Hamming distance
    ≤ SIMHASH_K between fingerprints, found without an all-pairs scan —
    the step the fingerprint key above feeds (the reference surface is
    the full near-dup family; SimHash pairing closes it).

    The banding trick used for MinHash and embeddings, a third time: the
    16-bit fingerprint splits into 4 chunks of 4 bits; a pair within
    Hamming 3 must agree exactly on ≥ 1 chunk (pigeonhole), so
    candidates come from a (band, chunk) EQUI-join — one shuffle on the
    chunk value, never O(n²) — then the exact popcount(xor) filter
    keeps true pairs. Equality with the all-pairs definition is exact
    (perfect recall by construction), which is precisely what the
    all-pairs oracle checks. Fingerprints are constant-width, so the
    join payload is 2 longs per row at any corpus size.
    """
    fp = q_llm_dedup_simhash(spark, sf_dir)
    chunks = F.array(*[
        F.struct(
            F.lit(c).alias("band"),
            F.shiftright("simhash", c * _CHUNK_BITS)
             .bitwiseAND(F.lit((1 << _CHUNK_BITS) - 1)).alias("chunk"),
        )
        for c in range(SIMHASH_PAIR_BANDS)
    ])
    # Checkpointed like the MinHash/embedding banded relations (r16,
    # guide §1.2): the self-join's two sides otherwise EACH re-run the
    # whole fingerprint pipeline (shingle hash + 64 bit-vote
    # aggregation over the corpus) — no exchange reuse fires on the
    # duplicated subtrees. 4 rows of 4 integers per doc.
    banded = fp.select(
        "doc_id", "simhash", F.explode(chunks).alias("bc")
    ).select("doc_id", "simhash",
             F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk")
             ).localCheckpoint(eager=False)
    x = banded.alias("x")
    y = banded.alias("y")
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        x.join(y, (F.col("x.band") == F.col("y.band"))
               & (F.col("x.chunk") == F.col("y.chunk"))
               & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"),
                F.col("x.simhash").alias("sim_a"), F.col("y.simhash").alias("sim_b"))
        # Exact popcount filter BEFORE the dedup (r8): the filter is a
        # per-row integer op, the distinct a full shuffle — filter
        # first so the shuffle carries only surviving pairs (7.0 →
        # 5.2 s at sf0.1; modest here because 16-bit fingerprints over
        # short docs make most candidates TRUE pairs, but at a corpus
        # scale with discriminative fingerprints the pre-filter is the
        # difference between shuffling candidates and shuffling
        # answers). Identical result: the filter is row-deterministic,
        # so filter∘distinct ≡ distinct∘filter.
        .filter(hamming <= SIMHASH_K)
        .distinct()  # a pair may collide in several chunks
        .select("doc_a", "doc_b", hamming.cast("bigint").alias("hamming"))
    )


# ------------------------------------------------- L2 embedding-cosine dedup
#
# Banded random-hyperplane LSH: EMBED_BANDS independent bucket codes of
# EMBED_ROWS sign bits each; a pair is a candidate if it collides in ANY
# band. Candidates come from an equi-join on (band, bucket) — never an
# all-pairs scan — then exact cosine re-scores them. The DuckDB oracle is
# generated below from the SAME literal hyperplanes, so the driver checks
# the exact semantics the Spark plan computes (the brute-force threshold
# join remains in tests/test_llm.py as the precision/recall baseline).
EMBED_BANDS = 8
EMBED_ROWS = 4
_EMBED_PLANES: list[list[float]] = []  # filled lazily (numpy import cost)


def _embed_planes() -> list[list[float]]:
    if not _EMBED_PLANES:
        from okera_trino_spark.llm.similarity import DIM, hyperplanes
        # seed chosen by offline sweep for (a) 100% recall vs the
        # brute-force pair set at sf0.001/0.01/0.1 and (b) the largest
        # minimum |dot(v, plane)| sign margin (3.8e-5, ~40x DuckDB's
        # float32 dot error) — both asserted in tests/test_llm.py.
        _EMBED_PLANES.extend(hyperplanes(EMBED_BANDS * EMBED_ROWS, DIM, seed=177))
    return _EMBED_PLANES


def embed_band_buckets(col: str = "embedding") -> Column:
    """Array of (band, bucket) structs — bucket i is the sign-bit code of
    this band's EMBED_ROWS hyperplanes (constant work per row; the
    explode below is the bucketBy/shuffle key at scale). ``col`` is the
    embedding column NAME: the EMBED_BANDS x EMBED_ROWS x DIM literal
    tree (2,048 floats) is ONE server-side parse instead of ~5,000 py4j
    calls (r15, the _kmeans_assign lesson — this build alone cost
    ~0.5 s of driver time per invocation)."""
    from okera_trino_spark.llm.similarity import _dot_sql
    planes = _embed_planes()
    parts = []
    for bidx in range(EMBED_BANDS):
        bits = " + ".join(
            f"(CASE WHEN {_dot_sql(col, planes[bidx * EMBED_ROWS + j])} > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(EMBED_ROWS))
        parts.append(f"named_struct('band', {bidx}, 'bucket', 0 + {bits})")
    return F.expr("array(" + ",".join(parts) + ")")


def embed_near_dups(e: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Banded-LSH embedding near-dup over any (vec_id, embedding) frame:
    candidates from a (band, bucket) equi-join, exact cosine re-score.

    Scale: each vector emits EMBED_BANDS rows; the self-join shuffles on
    (band, bucket) — expected candidates ≈ n²·P(band collision), tuned by
    EMBED_ROWS. At a production near-dup threshold (≥0.9) recall is
    1-(1-p^r)^b ≈ 0.999; see tests/test_llm.py planted-near-dup check.
    """
    # Checkpointed for the same reason as lsh_candidate_pairs's banded
    # relation (r16, guide §1.2): the self-join's two sides otherwise
    # EACH evaluate the EMBED_BANDS x EMBED_ROWS sign-bit codes (32
    # literal-hyperplane dot products per row) — Catalyst plans two
    # identical subtrees and no exchange reuse fires. The checkpoint is
    # |vectors| x EMBED_BANDS rows of three integers. Interleaved A/B
    # on q_llm_semdedup at sf0.1: min 0.76 -> 0.55 s, med 1.12 -> 0.89.
    banded = e.select(
        "vec_id", F.explode(embed_band_buckets("embedding")).alias("bb")
    ).select(
        "vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    ).localCheckpoint(eager=False)
    x = banded.alias("x")
    y = banded.alias("y")
    cands = (
        x.join(y, (F.col("x.band") == F.col("y.band"))
               & (F.col("x.bucket") == F.col("y.bucket"))
               & (F.col("x.vec_id") < F.col("y.vec_id")))
        .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
        .distinct()
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    from okera_trino_spark.llm.similarity import cosine_vec
    # Candidate volume at a 0.5 threshold is large by design (weak
    # band pruning buys recall), so the rescore is the Arrow-batched
    # BLAS cosine, not the per-row interpreted fold (r8, ~4×).
    return (
        cands.join(a, "vec_a").join(b, "vec_b")
        .withColumn("cos_sim_raw", cosine_vec(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cos_sim_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_sim_raw", 4).alias("cos_sim"))
    )


def embed_all_pairs(e: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Brute-force exact threshold join — the O(n²) baseline kept ONLY as
    the precision/recall reference for tests; not a registered key."""
    from okera_trino_spark.llm.similarity import cosine
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim_raw", cosine(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cos_sim_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_sim_raw", 4).alias("cos_sim"))
    )


def _embed_pairs_cte() -> str:
    """Shared WITH-body: the banded-LSH candidate/pair pipeline with the
    hyperplanes injected as float literals, so bucket codes (and
    therefore the candidate set) match Spark's exactly. Sign margins are
    guarded by tests/test_llm.py (min |dot| ≫ float32 rounding)."""
    band_selects = []
    planes = _embed_planes()
    for bidx in range(EMBED_BANDS):
        bits = []
        for j in range(EMBED_ROWS):
            plane = planes[bidx * EMBED_ROWS + j]
            lit = "[" + ", ".join(repr(float(v)) for v in plane) + "]"
            bits.append(
                f"(CASE WHEN list_dot_product(embedding, {lit}) > 0 "
                f"THEN {1 << j} ELSE 0 END)"
            )
        band_selects.append(
            f"SELECT vec_id, {bidx} AS band, {' + '.join(bits)} AS bucket FROM embeddings"
        )
    bands_sql = " UNION ALL ".join(band_selects)
    return f"""bands AS ({bands_sql}),
    cand AS (
        SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
        FROM bands x
        JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
                    AND x.vec_id < y.vec_id
    ),
    epairs AS (
        SELECT c.vec_a, c.vec_b,
               round(CAST(list_cosine_similarity(a.embedding, b.embedding)
                          AS DOUBLE), 4) AS cos_sim
        FROM cand c
        JOIN embeddings a ON c.vec_a = a.vec_id
        JOIN embeddings b ON c.vec_b = b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
    )"""


def _embed_oracle() -> str:
    return (f"WITH {_embed_pairs_cte()}\n"
            "    SELECT vec_a, vec_b, cos_sim FROM epairs")


@query("q_llm_dedup_embed", oracle=_embed_oracle(), tags=("llm", "dedup"))
def q_llm_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 embedding near-dup: banded-LSH candidates + exact cosine
    re-score at threshold 0.5 — the 100-TB shape, not the O(n²) pair
    join (which survives only as the test baseline, embed_all_pairs).

    The oracle replicates the full pipeline (same literal hyperplanes)
    so the driver verifies the bucketed semantics exactly. Plan shape:
    explode(8 bands) → one shuffle on (band, bucket) → distinct pairs →
    two equi-joins back to embeddings; no BroadcastNestedLoopJoin
    (asserted in tests/test_plans.py). Dot products are zip_with/
    aggregate higher-order functions — JVM, no UDF.
    """
    return embed_near_dups(t(spark, sf_dir, "embeddings"), threshold=0.5)


@query(
    "q_llm_para_dedup",
    oracle="""
    WITH p AS (
        SELECT doc_id, pos, passage,
               count(*) OVER (PARTITION BY doc_id) AS n_total,
               row_number() OVER (PARTITION BY passage
                                  ORDER BY doc_id, pos) AS rn
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(0, CAST(ceil(len(str_split_regex(trim(text), ' +'))
                                          / 10.0) AS INT)),
                       i -> array_to_string(list_slice(
                            str_split_regex(trim(text), ' +'),
                            i * 10 + 1, i * 10 + 10), ' '))) AS passage,
                   generate_subscripts(list_transform(
                       range(0, CAST(ceil(len(str_split_regex(trim(text), ' +'))
                                          / 10.0) AS INT)), i -> i), 1) AS pos
            FROM documents
        )
    )
    SELECT doc_id,
           CAST(any_value(n_total) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_kept,
           string_agg(passage, ' ' ORDER BY pos) AS new_text
    FROM p WHERE rn = 1
    GROUP BY doc_id
    """,
    tags=("llm", "dedup", "passage"),
)
def q_llm_para_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 passage-level deduplication (the RefinedWeb/CCNet paragraph
    dedup, on fixed 10-word passages since the fixtures are unbroken
    word streams): every passage that already occurred anywhere in the
    corpus — keeping the FIRST occurrence by (doc_id, position) — is
    dropped, and each document is reassembled from its surviving
    passages in order. Exact-match semantics: at 100 TB the passage
    key would be a digest (exact-dedup precedent) but the plan is
    identical.

    Scale shape: the word array is projected ONCE (lambda-hoisting
    lesson), chunked by a higher-order slice transform (codegen, no
    UDF), posexploded and materialized ONCE (localCheckpoint — three
    consumers). First-occurrence is a COMBINABLE
    ``groupBy("passage").agg(min(struct(doc_id, pos)))`` followed by a
    LEFT SEMI join back on the full (passage, doc_id, pos) triple —
    the hot key this operator HUNTS (boilerplate duplicated 10⁶–10⁸
    times) collapses map-side in the agg, and the semi-join's
    three-column key spreads those duplicates across partitions, so no
    task ever buffers a hot passage (the r6 row_number window did —
    WindowExec on the passage key, unsplittable by AQE). Per-doc
    totals are a combinable groupBy count joined on doc_id; reassembly
    is sort_array over collect_list(struct(pos, passage)) —
    deterministic, order-exact.
    """
    d = t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.split(F.trim(F.col("text")), " +").alias("_w"))
    chunked = words.select(
        "doc_id",
        F.posexplode(F.expr(
            "transform(sequence(0, CAST(ceil(size(_w) / 10.0) AS INT) - 1), "
            "i -> array_join(slice(_w, i * 10 + 1, 10), ' '))"
        )).alias("pos", "passage")).localCheckpoint(eager=False)
    first = (chunked.groupBy("passage")
             .agg(F.min(F.struct("doc_id", "pos")).alias("_f"))
             .select("passage", F.col("_f.doc_id").alias("doc_id"),
                     F.col("_f.pos").alias("pos")))
    totals = chunked.groupBy("doc_id").agg(F.count("*").alias("n_total"))
    kept = chunked.join(first, ["passage", "doc_id", "pos"], "left_semi")
    return (
        kept.groupBy("doc_id")
        .agg(F.count("*").alias("n_kept"),
             F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("pos", "passage"))),
                     lambda x: x["passage"]),
                 " ").alias("new_text"))
        .join(totals, "doc_id")
        .select("doc_id", "n_total", "n_kept", "new_text")
    )


@query(
    "q_llm_semdedup",
    oracle=f"""
    WITH {_embed_pairs_cte()},
    dup AS (
        SELECT vec_b, CAST(count(*) AS BIGINT) AS n_dups
        FROM epairs GROUP BY vec_b
    )
    SELECT e.vec_id, e.label,
           (dup.vec_b IS NULL) AS kept,
           coalesce(dup.n_dups, 0) AS n_dups
    FROM embeddings e LEFT JOIN dup ON e.vec_id = dup.vec_b
    """,
    tags=("llm", "dedup", "semantic"),
)
def q_llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 semantic deduplication (the SemDeDup corpus-pruning step):
    a vector is DROPPED when any LOWER-id vector is a semantic near-dup
    (cosine ≥ threshold among LSH candidates) — the deterministic
    keep-first rule over the same banded-LSH pair pipeline the embed
    near-dup key verifies. Output is the full keep/drop decision per
    vector plus its lower-id near-dup count — exactly what a curation
    pipeline joins against the corpus to prune.

    Scale: pair generation is the proven banded shape (explode bands →
    one (band, bucket) shuffle → candidates → exact re-score); the
    decision adds one groupBy on the b-side id and a left join back to
    the corpus — both keyed shuffles. HARD oracle: the shared literal-
    hyperplane CTE replays the identical pipeline in DuckDB.
    """
    e = t(spark, sf_dir, "embeddings")
    pairs = embed_near_dups(e, threshold=0.5)
    dup = (pairs.groupBy("vec_b")
           .agg(F.count("*").alias("n_dups")))
    return (
        e.select("vec_id", "label")
        .join(dup, e.vec_id == dup.vec_b, "left")
        .select("vec_id", "label",
                F.col("vec_b").isNull().alias("kept"),
                F.coalesce(F.col("n_dups"), F.lit(0)).alias("n_dups"))
    )


# ------------------------------------------- SemDeDup via k-means cells
SEMDEDUP_KM_THRESHOLD = 0.35
#: Target k-means cell size: k = max(KMEANS_K, n // this), so cells
#: stay bounded and the within-cell pair join is linear in the corpus
#: (the paper's k-grows-with-n design). 250 keeps the driver fixtures
#: (n = 500) at the oracle's k = 4 while the probe tiers scale k
#: 8 (sf0.1) -> 80 (sf1.0) -> 240 (sf3.0) -> 800 (sf10).
SEMDEDUP_CELL_TARGET = 250


def semdedup_k(n: int) -> int:
    """Corpus-scaled cell count for q_llm_semdedup_kmeans: the paper's
    k ∝ n with a floor at the oracle's KMEANS_K. The DuckDB oracle is
    a fixed k = KMEANS_K Lloyd replay, so hash parity requires
    ``semdedup_k(n) == KMEANS_K`` — true exactly while
    n < (KMEANS_K + 1) * SEMDEDUP_CELL_TARGET (1250 at the shipped
    constants; driver fixtures are n = 50 / 500). The coupling is
    pinned by tests/test_llm.py::test_semdedup_k_oracle_coupling."""
    from okera_trino_spark.llm.similarity import KMEANS_K

    return max(KMEANS_K, n // SEMDEDUP_CELL_TARGET)


def _semdedup_kmeans_oracle() -> str:
    """Full replay: the 2-round Lloyd CTEs (shared with q_llm_kmeans),
    within-cell candidate pairs, pair cosines as float64 folds over the
    already-exploded ``ev`` CTE (DuckDB's list_cosine_similarity runs
    in float32 on FLOAT lists — a ~1e-7 skew the 6dp compare grid could
    see; the explicit double fold matches Spark's float64 path to
    ~1e-15), and the keep-lowest-id rule."""
    from okera_trino_spark.llm.similarity import _kmeans_oracle

    return f"""
    WITH {_kmeans_oracle()},
    cand AS (
        SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
        FROM a3 x JOIN a3 y ON x.c = y.c AND x.vec_id < y.vec_id
    ),
    pc AS (
        SELECT c.vec_a, c.vec_b,
               round(sum(ea.x * eb.x) /
                     (sqrt(sum(ea.x * ea.x)) * sqrt(sum(eb.x * eb.x))),
                     6) AS cos6
        FROM cand c
        JOIN ev ea ON ea.vec_id = c.vec_a
        JOIN ev eb ON eb.vec_id = c.vec_b AND eb.i = ea.i
        GROUP BY c.vec_a, c.vec_b
    ),
    dup AS (
        SELECT vec_b, CAST(count(*) AS BIGINT) AS n_dups
        FROM pc WHERE cos6 >= {SEMDEDUP_KM_THRESHOLD}
        GROUP BY vec_b
    )
    SELECT a3.vec_id, e.label, a3.c AS cluster_id,
           (dup.vec_b IS NULL) AS kept,
           coalesce(dup.n_dups, 0) AS n_dups
    FROM a3
    JOIN embeddings e ON e.vec_id = a3.vec_id
    LEFT JOIN dup ON a3.vec_id = dup.vec_b
    """


@query(
    "q_llm_semdedup_kmeans",
    oracle=_semdedup_kmeans_oracle(),
    tags=("llm", "dedup", "semantic", "clustering", "iterative"),
)
def q_llm_semdedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2/L3 SemDeDup AS PUBLISHED (Abbas et al. 2023, "SemDeDup: Data-
    efficient learning at web-scale through semantic deduplication"):
    cluster the embedding corpus with k-means, then compare pairs ONLY
    WITHIN each cell and drop every vector with a lower-id near-dup
    (cosine >= SEMDEDUP_KM_THRESHOLD = 0.35) in its cell. The r12 q_llm_semdedup key is the
    LSH-candidate variant of the same decision; this one is the
    paper's k-means-cell candidate generator, built on the r13
    deterministic Lloyd loop — the two bound the candidate-recall
    trade a curation pipeline actually tunes.

    Scale shape: k SCALES WITH THE CORPUS — k = max(4, n /
    SEMDEDUP_CELL_TARGET) — which is the paper's actual design (they
    use ~11k cells for LAION) and the reason the quadratic
    sum-over-cells C(|cell|, 2) pair term never sees the corpus size:
    cells stay ~SEMDEDUP_CELL_TARGET rows, so pair volume is
    ~n * cell/2, LINEAR in n (the r14 scale probe measures exactly
    this — fixed k would have been quadratic at the very first
    decade). On the driver-checked fixtures (n = 500) the formula
    yields the oracle's k = 4, so the DuckDB Lloyd replay is
    unchanged; at probe scale the Lloyd loop switches to the
    Arrow/BLAS assignment path (similarity.KMEANS_FOLD_MAX).
    Assignment carries the embedding through the SAME projection
    (kmeans_assignments extra_cols — no corpus self-join on vec_id),
    materialized ONCE (localCheckpoint, three consumers). CALLER
    CONTRACT (r15): the checkpoint pins the corpus WITH its embedding
    arrays per invocation; a long-lived session invoking this key
    repeatedly must release finished invocations' blocks
    (getPersistentRDDs + unpersist — bench.py's _release_persisted)
    or the accumulation drives allocator-pressure GC stalls that
    degrade every later multi-job query (the r14 bench median
    collapse, bisected and fixed in r15); candidates
    are an equi-join on cluster_id; a hot cell at 100 TB is AQE
    skew-join territory plus the paper's own cell-size cap. Pair
    scoring is the Arrow/BLAS pandas_udf (cosine_vec — the embed-dedup
    high-volume precedent), rounded to 6dp BEFORE the threshold so
    both engines compare on the same grid.

    HARD oracle: the full Lloyd replay (shared CTEs with q_llm_kmeans)
    + within-cell pairs + float64 cosine folds in DuckDB.
    """
    from okera_trino_spark.llm.similarity import (
        KMEANS_K,
        cosine_vec,
        kmeans_assignments,
    )

    e = t(spark, sf_dir, "embeddings")
    # Footer-only on parquet (metadata count, no data scan — Spark
    # answers count() from row-group stats); k MUST be data-dependent
    # by design (the paper's k ∝ n), so the extra job is one metadata
    # read per invocation, not a corpus pass.
    n = e.count()
    k = semdedup_k(n)
    if k != KMEANS_K:
        # r15 ADVICE guard: the DuckDB oracle replays Lloyd at exactly
        # k = KMEANS_K (its init CTE is ``vec_id < KMEANS_K``), so hash
        # parity holds ONLY while the corpus-scaled formula still
        # yields KMEANS_K — i.e. n < (KMEANS_K + 1) *
        # SEMDEDUP_CELL_TARGET (1250 at the shipped constants; the
        # driver fixtures are n=500 at sf0.01). Larger corpora (bench
        # sf0.1 n=2000 -> k=8, scale probes) run fine but are NOT
        # oracle-replayable — say so loudly instead of letting a
        # driver-fixture-size change go hash-red with no code bug.
        import logging

        logging.getLogger(__name__).warning(
            "q_llm_semdedup_kmeans: corpus n=%d yields k=%d != %d; the "
            "DuckDB oracle (k=%d Lloyd replay) is NOT valid at this "
            "fixture size — hash comparison would fail structurally",
            n, k, KMEANS_K, KMEANS_K)
    v = kmeans_assignments(
        e, k=k,
        extra_cols=("embedding", "label")).localCheckpoint(eager=False)
    a = v.select(F.col("cluster_id"), F.col("vec_id").alias("vec_a"),
                 F.col("embedding").alias("emb_a"))
    b = v.select(F.col("cluster_id"), F.col("vec_id").alias("vec_b"),
                 F.col("embedding").alias("emb_b"))
    pairs = (
        a.join(b, "cluster_id")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos6", F.round(
            cosine_vec(F.col("emb_a"), F.col("emb_b")), 6))
        .filter(F.col("cos6") >= SEMDEDUP_KM_THRESHOLD)
    )
    dup = pairs.groupBy("vec_b").agg(F.count("*").alias("n_dups"))
    return (
        v.select("vec_id", "label", "cluster_id")
        .join(dup, v.vec_id == dup.vec_b, "left")
        .select("vec_id", "label", "cluster_id",
                F.col("vec_b").isNull().alias("kept"),
                F.coalesce(F.col("n_dups"), F.lit(0)).alias("n_dups"))
    )
