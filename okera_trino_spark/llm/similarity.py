"""Similarity search over the embeddings table — SURVEY.md §2.4 L3.

Two paths:
- brute-force top-k cosine (exact; the baseline and the oracle-checked
  form), and
- random-hyperplane LSH bucketing (the scale path: candidates come from
  one bucket join instead of an all-pairs scan; same scoring code).

All vector math is higher-order zip_with/aggregate — JVM-evaluated, no
Python in the scoring loop. At 100 TB the embeddings table would be
bucketed by LSH key on disk (bucketBy) so probe queries touch one
bucket's files only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.operators._util import t
from okera_trino_spark.registry import query

DIM = 64
N_PLANES = 8


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_vec(a: Column, b: Column) -> Column:
    """Arrow-batched cosine for HIGH-VOLUME candidate rescoring (r8):
    one BLAS pass per batch instead of an interpreted 3×dim
    higher-order fold per row — the JL-projection lesson applied to
    pair scoring (measured ~2× end-to-end on the 800k-pair embed-dedup
    key at sf0.1; the candidate shuffle is the other half). Element
    casts match the fold (float64 before multiply); numpy's pairwise
    summation differs from the left-to-right fold by ~1e-16 relative,
    absorbed by the 4dp output rounding and far from any threshold
    boundary. Small top-k probes stay on the JVM fold (`cosine`) — no
    Python worker for constant-size candidate sets. (The udf object is
    built per call: pandas_udf registration needs an active session,
    which a module-level decorator cannot assume.)"""
    @F.pandas_udf("double")
    def _cos(va, vb):
        import numpy as np
        import pandas as pd

        xa = np.stack(va.to_numpy()).astype(np.float64)
        xb = np.stack(vb.to_numpy()).astype(np.float64)
        num = (xa * xb).sum(axis=1)
        na = np.sqrt((xa * xa).sum(axis=1))
        nb = np.sqrt((xb * xb).sum(axis=1))
        return pd.Series(num / (na * nb))

    return _cos(a, b)


@query(
    "q_llm_similarity",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           round(CAST(list_cosine_similarity(e.embedding, q.qv) AS DOUBLE), 4) AS cos_sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> 0
    ORDER BY round(CAST(list_cosine_similarity(e.embedding, q.qv) AS DOUBLE), 4) DESC, e.vec_id
    LIMIT 10
    """,
    tags=("llm", "similarity"),
)
def q_llm_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 brute-force top-k: score every vector against the query
    (vec_id 0), keep the 10 best. The single-row query side is
    broadcast; scoring is map-only; TakeOrderedAndProject keeps k per
    partition. Ordering ties broken by vec_id, and ranked on the
    6dp-rounded score so engine-level FP noise can't flip ranks."""
    e = t(spark, sf_dir, "embeddings")
    qv = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(qv)
        .withColumn("cos_raw", cosine(F.col("embedding"), F.col("qv")))
    )
    return (
        scored.orderBy(F.round("cos_raw", 4).desc(), F.col("vec_id"))
        .select("vec_id", "label", F.round("cos_raw", 4).alias("cos_sim"))
        .limit(10)
    )


def hyperplanes(n_planes: int = N_PLANES, dim: int = DIM, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed → same buckets on
    every run and every cluster)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _dlit(vec: list[float]) -> str:
    """A float64 vector as a SQL array literal. repr round-trips every
    finite double bit-exactly through the parser (probed r15, incl.
    subnormals); the D suffix pins DOUBLE — a bare decimal literal
    would parse as DECIMAL and change the arithmetic type."""
    return "array(" + ",".join(repr(float(x)) + "D" for x in vec) + ")"


def _dot_sql(col: str, vec: list[float]) -> str:
    """``dot(col, lit(vec))`` as a SQL fragment — the same
    zip_with/aggregate float64 left-fold as ``dot`` above, parsed
    server-side instead of built through ~2x dim py4j calls (r15; see
    _kmeans_assign for the measured driver-cost rationale)."""
    return (f"aggregate(zip_with({col}, {_dlit(vec)}, (x, y) -> "
            f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
            f"(acc, v) -> acc + v)")


def lsh_bucket(col: str, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit i = (v · plane_i) > 0. Constant work per
    row; the bucket id is the shuffle/bucketBy key at scale. ``col`` is
    the embedding column NAME — the whole n_planes x dim literal tree
    is one server-side parse (r15, the _kmeans_assign lesson)."""
    bits = [f"(CASE WHEN {_dot_sql(col, plane)} > 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i, plane in enumerate(planes)]
    return F.expr("0 + " + " + ".join(bits))


def ivf_centroids(e: DataFrame, k: int = 8, iters: int = 2) -> list[list[float]]:
    """Deterministic IVF codebook: seed centroids are the k
    lowest-vec_id vectors, refined with ``iters`` Lloyd steps computed
    AS DATAFRAME AGGREGATES — the per-point assignment and the
    per-centroid mean are both distributed; only the k×dim codebook
    (constant size) ever reaches the driver. That is the k-means‖
    shape: at 100 TB each iteration is one map (argmin over k literals)
    plus one k-group aggregation.

    Every NEW centroid is rounded to 4dp (r8): avg() sums in
    partition order, so the raw mean carries ~1e-12 engine-order
    noise; rounding pins the codebook to decimal literals any engine
    reproduces exactly, which is what lets the DuckDB oracle replay
    the whole training loop (see _ann_ivf_oracle). An empty cell
    keeps its previous centroid UNROUNDED (seed values are exact
    float32 data on both sides)."""
    cents = [row["embedding"] for row in
             e.orderBy("vec_id").limit(k).select("embedding").collect()]
    mean_aggs = [F.expr(f"avg(embedding[{i}]) AS d{i}")
                 for i in range(len(cents[0]))]
    for _ in range(iters):
        assigned = e.withColumn("c", _nearest_centroid("embedding", cents))
        means = (
            assigned.groupBy("c")
            .agg(*mean_aggs)
            .collect()
        )
        by_c = {row["c"]: [row[f"d{i}"] for i in range(len(cents[0]))] for row in means}
        cents = [([round(float(x), 4) for x in by_c[i]] if i in by_c
                  else cents[i]) for i in range(k)]
    return [[float(x) for x in c] for c in cents]


def _nearest_centroid(col: str, cents: list[list[float]]) -> Column:
    """argmin over the codebook, as a pure column expression: distance to
    each centroid is a zip_with/aggregate (JVM), and the argmin folds
    over k when-chains — constant work per row, no UDF. Distances
    compare at 6dp rounding with lowest-index tie-break (r8) — the
    round-then-order precedent of q_llm_ann_ivf_static, making the
    argmin engine-exact (the fold is left-to-right in both engines;
    rounding absorbs nothing today but fences the boundary case).
    ``col`` is the embedding column NAME; the k x dim literal tree is
    one server-side parse (r15, the _kmeans_assign lesson).

    The k distances live in ONE array, bound once as a lambda
    variable; argmin = first position of the min (lowest-index
    tie-break). The previous when-chain fold referenced each
    rounded distance inside every later comparison, and expression
    duplication re-evaluated the interpreted zip_with folds
    repeatedly per row (the q_llm_winnow lesson; measured 8× on
    this key). Same arithmetic term-for-term — the oracle replay is
    untouched."""
    def sqdist(c: list[float]) -> str:
        return (f"aggregate(zip_with({col}, {_dlit(c)}, (x, y) -> "
                f"(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
                f"0.0D, (acc, v) -> acc + v)")

    ds = "array(" + ",".join(f"round({sqdist(c)}, 6)" for c in cents) + ")"
    return F.expr(
        f"CAST(element_at(transform(array({ds}), "
        f"d -> array_position(d, array_min(d))), 1) - 1 AS INT)")


def _ann_ivf_oracle(k: int = 8, dim: int = DIM, iters: int = 2) -> str:
    """DuckDB replay of the WHOLE Lloyd-trained IVF pipeline (r8) —
    graduating q_llm_ann_ivf from the rows-only check the way the
    static key graduated in r6, but with the TRAINING LOOP unrolled
    into SQL instead of a literal codebook: seeds are the k lowest
    vec_ids, then per iteration (assignment = argmin over rounded-6dp
    squared distance with cid tie-break; new centroid = per-dimension
    avg rounded to 4dp, empty cells keep the previous centroid),
    then the final assignment, nprobe=2 probe-cell selection, and
    exact-cosine re-score. Engine-exactness rests on two invariants
    proven by q_llm_ann_ivf_static's hash-green history: (1) the
    left-to-right float64 fold of list_sum matches Spark's
    F.aggregate bit-for-bit on identical inputs, and (2) rounding
    distances to 6dp / centroids to 4dp pins every cross-engine
    comparison to decimal values both engines parse identically."""
    sq = (f"round(list_sum(list_transform(range(1, {dim + 1}), "
          "i -> (CAST(e.embedding[i] AS DOUBLE) - c.cv[i])"
          " * (CAST(e.embedding[i] AS DOUBLE) - c.cv[i]))), 6)")
    mean_list = ", ".join(
        f"round(avg(CAST(embedding[{i}] AS DOUBLE)), 4)"
        for i in range(1, dim + 1))
    parts = [
        f"c0 AS (SELECT vec_id AS cid, "
        f"list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv "
        f"FROM embeddings WHERE vec_id < {k})"]
    prev = "c0"
    for it in range(1, iters + 1):
        parts.append(
            f"a{it} AS (SELECT e.vec_id, e.embedding, c.cid, "
            f"row_number() OVER (PARTITION BY e.vec_id "
            f"ORDER BY {sq}, c.cid) AS rn "
            f"FROM embeddings e CROSS JOIN {prev} c)")
        parts.append(
            f"m{it} AS (SELECT cid, list_value({mean_list}) AS cv "
            f"FROM a{it} WHERE rn = 1 GROUP BY cid)")
        parts.append(
            f"c{it} AS (SELECT p.cid, COALESCE(m.cv, p.cv) AS cv "
            f"FROM {prev} p LEFT JOIN m{it} m ON m.cid = p.cid)")
        prev = f"c{it}"
    parts.append(
        f"af AS (SELECT e.vec_id, e.label, e.embedding, c.cid, "
        f"row_number() OVER (PARTITION BY e.vec_id "
        f"ORDER BY {sq}, c.cid) AS rn "
        f"FROM embeddings e CROSS JOIN {prev} c)")
    parts.append("pc AS (SELECT cid FROM af WHERE vec_id = 0 AND rn <= 2)")
    parts.append("pv AS (SELECT embedding AS qv FROM embeddings "
                 "WHERE vec_id = 0)")
    parts.append("cand AS (SELECT a.vec_id, a.label, a.embedding "
                 "FROM af a JOIN pc ON a.cid = pc.cid "
                 "WHERE a.rn = 1 AND a.vec_id <> 0)")
    return ("WITH " + ",\n".join(parts) + """
    SELECT vec_id, label,
           round(CAST(list_cosine_similarity(cand.embedding, pv.qv)
                      AS DOUBLE), 4) AS cos_sim
    FROM cand CROSS JOIN pv
    ORDER BY round(CAST(list_cosine_similarity(cand.embedding, pv.qv)
                        AS DOUBLE), 6) DESC, vec_id
    LIMIT 10""")


@query("q_llm_ann_ivf", oracle=_ann_ivf_oracle(), tags=("llm", "similarity"))
def q_llm_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 approximate top-k: IVF (inverted-file) index. Vectors are
    assigned to their nearest codebook centroid (Lloyd-trained, 2
    iterations from the k lowest-vec_id seeds); a probe searches only
    the nprobe=2 nearest centroid lists with exact cosine.

    Scale: the centroid id is a partitioning/bucketBy key on disk, so a
    probe reads ~nprobe/k of the corpus (vs all buckets for brute
    force). Codebook is constant-size driver state — the one sanctioned
    collect() in this package (k×dim floats, not data rows).

    HARD oracle since r8: training is deterministic (4dp-rounded
    means, 6dp-rounded distance argmin with index tie-break), so the
    DuckDB oracle replays the full loop — see _ann_ivf_oracle.
    tests/test_llm.py additionally checks recall overlap vs brute
    force."""
    e = t(spark, sf_dir, "embeddings")
    cents = ivf_centroids(e, k=8, iters=2)
    assigned = e.withColumn("c", _nearest_centroid("embedding", cents))
    # The probe fetch reads the RAW embedding — fetching it from
    # `assigned` re-evaluated the whole argmin pass just to discard it
    # (r8; one of 4 assignment evaluations, now 3: two training
    # iterations + the final pipeline).
    probe_row = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    qv = probe_row["embedding"]
    # nprobe=2: the probe's own cell plus its next-nearest centroid.
    # Sequential Python sum = the same left-to-right fold as the
    # engines; rounded 6dp with stable argsort = the oracle's
    # (round(d, 6), cid) ordering.
    dists = [round(sum((float(ci) - float(qi)) ** 2
                       for ci, qi in zip(c, qv)), 6) for c in cents]
    nprobe_cells = [i for i, _ in sorted(enumerate(dists),
                                         key=lambda p: (p[1], p[0]))[:2]]
    qv_col = F.array(*[F.lit(float(x)) for x in qv])
    cands = assigned.filter(F.col("c").isin(nprobe_cells) & (F.col("vec_id") != 0))
    scored = cands.withColumn("cos_raw", cosine(F.col("embedding"), qv_col))
    return (
        scored.orderBy(F.round("cos_raw", 6).desc(), F.col("vec_id"))
        .select("vec_id", "label", F.round("cos_raw", 4).alias("cos_sim"))
        .limit(10)
    )


def _ann_lsh_oracle() -> str:
    """DuckDB replay of the LSH top-k with the SAME literal hyperplanes
    (the embed-dedup oracle technique) — upgrading this key from the
    rows-only check to a hard hash oracle. Sign agreement is exact:
    both engines fold the same float64 dot product left-to-right, and
    random-plane margins sit far from 0."""
    planes = hyperplanes()
    bits = []
    for i, plane in enumerate(planes):
        lit = "[" + ", ".join(f"{x!r}" for x in plane) + "]"
        bits.append(
            f"(CASE WHEN list_dot_product(embedding, {lit}) > 0 "
            f"THEN {1 << i} ELSE 0 END)")
    bucket = " + ".join(bits)
    return f"""
    WITH b AS (
        SELECT vec_id, label, embedding, {bucket} AS bucket
        FROM embeddings
    ),
    probe AS (SELECT bucket AS qbucket, embedding AS qv FROM b WHERE vec_id = 0)
    SELECT vec_id, label,
           round(CAST(list_cosine_similarity(b.embedding, probe.qv) AS DOUBLE), 4)
               AS cos_sim
    FROM b CROSS JOIN probe
    WHERE b.bucket = probe.qbucket AND b.vec_id <> 0
    ORDER BY round(CAST(list_cosine_similarity(b.embedding, probe.qv)
                        AS DOUBLE), 6) DESC, b.vec_id
    LIMIT 10
    """


@query("q_llm_ann_lsh", oracle=_ann_lsh_oracle(), tags=("llm", "similarity"))
def q_llm_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 approximate top-k: random-hyperplane LSH. Candidates = vectors
    sharing the query's bucket; exact cosine re-scores candidates only.

    Scale: the bucket equi-join replaces the all-pairs cross join —
    ~n/2^bits candidates per probe. Recall tuning = fewer bits or
    multi-probe (flip one bit); tests/test_llm.py checks candidate
    scores agree with brute force on the overlap. HARD oracle since r6:
    the generated hyperplanes are embedded as literals into the DuckDB
    replay (the embed-dedup technique), so bucket ids and the re-scored
    top-k verify exactly.
    """
    e = t(spark, sf_dir, "embeddings")
    planes = hyperplanes()
    bucketed = e.withColumn("bucket", lsh_bucket("embedding", planes))
    probe = F.broadcast(
        bucketed.filter(F.col("vec_id") == 0)
        .select(F.col("bucket").alias("qbucket"), F.col("embedding").alias("qv"))
    )
    cands = bucketed.join(probe, F.col("bucket") == F.col("qbucket")).filter(
        F.col("vec_id") != 0
    )
    scored = cands.withColumn("cos_raw", cosine(F.col("embedding"), F.col("qv")))
    return (
        scored.orderBy(F.round("cos_raw", 6).desc(), F.col("vec_id"))
        .select("vec_id", "label", F.round("cos_raw", 4).alias("cos_sim"))
        .limit(10)
    )


#: JL projection: output dimensionality and the seeded Gaussian matrix
#: (deterministic — same matrix on every run, every engine; the
#: hyperplane-literal oracle technique). k=32 halves the vector while
#: keeping cosine structure usable (measured at the fixture dim=64:
#: pairwise-cosine corr ≈ 0.54, mean |Δcos| ≈ 0.14; k=16 degraded to
#: 0.42 / 0.21 — the JL ε ~ sqrt(ln n / k) tradeoff).
JL_DIM = 32


def jl_matrix(k: int = JL_DIM, dim: int = DIM, seed: int = 7) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    # 1/sqrt(k) scaling gives expected distance preservation
    # (Johnson-Lindenstrauss); deterministic given the seed.
    return (rng.standard_normal((k, dim)) / np.sqrt(k)).tolist()


def _jl_oracle() -> str:
    """DuckDB replay of the projection with the SAME literal matrix:
    each output dim is a list_sum(list_transform(...)) fold — the form
    proven bit-identical to Spark's F.aggregate left-to-right fold by
    the static-IVF oracle — then L2-normalized and rounded 4dp."""
    mat = jl_matrix()
    dots = []
    for i, row in enumerate(mat):
        lit = "[" + ", ".join(f"{x!r}" for x in row) + "]"
        dots.append(
            f"list_sum(list_transform(range(1, {DIM + 1}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit})[i])) AS d{i}")
    sq = " + ".join(f"d{i} * d{i}" for i in range(len(mat)))
    # fixed-point int codes (value * 10^4, rounded): doubles stringify
    # differently across engines (Spark uses scientific notation below
    # 1e-3), integers never do — the quantize-key precedent.
    cols = ", ".join(f"CAST(round(d{i} / nrm * 10000) AS INT)"
                     for i in range(len(mat)))
    return f"""
    WITH proj AS (
        SELECT vec_id, {', '.join(dots)} FROM embeddings
    ), n AS (
        SELECT vec_id, *, sqrt({sq}) AS nrm FROM proj
    )
    SELECT vec_id,
           array_to_string([{cols}], ',') AS pv
    FROM n WHERE nrm > 0
    """


@query("q_llm_project", oracle=_jl_oracle(), tags=("llm", "similarity"))
def q_llm_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding dimensionality reduction (r8): a seeded
    Johnson-Lindenstrauss random projection 64 → 32 dims, L2-normalized
    — the standard cheap pre-step before clustering / ANN over a
    100 TB embedding corpus (4× smaller vectors, pairwise distances
    preserved within the JL bound, no training pass at all, unlike
    PCA). The matrix is deterministic (fixed seed), so the DuckDB
    oracle replays the projection with the SAME literals — the
    hyperplane technique of q_llm_ann_lsh, with exact values instead
    of sign bits (list_sum fold ≡ F.aggregate fold, the static-IVF
    precedent).

    Plan: Arrow-batched ``mapInPandas`` — one BLAS matmul per batch
    (the canonical Spark shape for wide matrix ops) — map-only, zero
    shuffles; the projected column inherits the scan's partitioning
    for whatever consumes it next. Measured 9× faster than the
    32-fold whole-stage-codegen expression it replaces (0.28 s vs
    2.46 s warm at sf0.1 on local[32]): a 32×64 dot bank is exactly
    what vectorized kernels beat scalar codegen at, and the gap WIDENS
    with rows. Components are emitted as fixed-point INT codes
    (value·10⁴, half-away-from-zero like Spark/DuckDB ``round`` — NOT
    numpy's half-even ``rint`` — the quantize-key precedent) joined to
    a comma string: doubles stringify differently across engines,
    integers never do; the matmul's summation order differs from the
    oracle's left-to-right fold by ≲1e-15 relative, far inside the
    1e-4 rounding grid.
    """
    import pandas as pd

    e = t(spark, sf_dir, "embeddings")
    mat = np.asarray(jl_matrix())

    def project(batches):
        for pdf in batches:
            emb = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            d = emb @ mat.T
            nrm = np.sqrt((d * d).sum(axis=1))
            keep = nrm > 0
            scaled = d[keep] / nrm[keep, None] * 10000.0
            codes = np.trunc(scaled + np.copysign(0.5, scaled)).astype(
                np.int64)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy()[keep],
                "pv": [",".join(map(str, r)) for r in codes],
            })

    return e.select("vec_id", "embedding").mapInPandas(
        project, "vec_id bigint, pv string")


N_PROBES = 5
KNN_K = 3


@query(
    "q_llm_knn_join",
    oracle=f"""
    WITH probes AS (
        SELECT vec_id AS probe_id, embedding AS qv
        FROM embeddings WHERE vec_id < {N_PROBES}
    ),
    scored AS (
        SELECT p.probe_id, e.vec_id, e.label,
               round(CAST(list_cosine_similarity(e.embedding, p.qv) AS DOUBLE), 4) AS cos_sim
        FROM embeddings e CROSS JOIN probes p
        WHERE e.vec_id >= {N_PROBES}
    )
    SELECT probe_id, vec_id, label, cos_sim FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    ) WHERE rn <= {KNN_K}
    """,
    tags=("llm", "similarity"),
)
def q_llm_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 k-NN JOIN: exact top-k neighbors for EVERY probe in a probe
    set (not one query vector) — the batch retrieval shape behind
    RAG-corpus linking and embedding-dedup candidate scoring.

    Plan: the probe set broadcasts (probes ≪ corpus); scoring is a
    map-side cross product over the broadcast (corpus scanned ONCE for
    all probes); per-probe top-k is a window row_number over probe_id —
    one shuffle of (corpus × probes) scored rows keyed by probe_id.
    Ranks order on the 4dp-rounded score (ties by vec_id) so FP noise
    can't flip ranks between engines. At 100 TB with a large probe set,
    the same plan holds with the LSH bucket key added to the join (see
    q_llm_ann_lsh) so each probe scores one bucket instead of the
    corpus.
    """
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings")
    probes = F.broadcast(
        e.filter(F.col("vec_id") < N_PROBES)
        .select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("qv"))
    )
    scored = (
        e.filter(F.col("vec_id") >= N_PROBES)
        .crossJoin(probes)
        .select("probe_id", "vec_id", "label",
                F.round(cosine(F.col("embedding"), F.col("qv")), 4).alias("cos_sim"))
    )
    rn = F.row_number().over(
        Window.partitionBy("probe_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id")))
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") <= KNN_K)
        .select("probe_id", "vec_id", "label", "cos_sim")
    )


# ------------------------------------------------ embedding quantization
@query(
    "q_llm_quantize",
    oracle="""
    WITH scaled AS (
        SELECT vec_id,
               list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        FROM embeddings
    )
    SELECT e.vec_id,
           round(s.scale, 4) AS scale_r4,
           array_to_string(
               CASE WHEN s.scale > 0
                    THEN list_transform(e.embedding,
                         x -> CAST(floor(CAST(x AS DOUBLE) / s.scale + 0.5) AS INT))
                    ELSE list_transform(e.embedding, x -> 0) END,
               ',') AS q
    FROM embeddings e JOIN scaled s ON s.vec_id = e.vec_id
    """,
    tags=("llm", "similarity", "quantize"),
)
def q_llm_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization: per-vector scale =
    max|x|/127, elements mapped by floor(x/scale + 0.5) — the storage/
    bandwidth-compression step an ANN index over 100 TB of embeddings
    runs before bucketing (4x smaller vectors, distance error bounded by
    scale/2 per element).

    Engine-exactness: both engines read float32 and promote to float64
    (exact), max is order-independent, and the SAME floor(+0.5) formula
    runs on both sides — so the int codes match bit-for-bit and the
    oracle checks them exactly. Map-only; no shuffle; whole-stage
    codegen (aggregate/transform higher-order functions, no UDF).

    The code vector is serialized to a comma-joined string on BOTH
    sides (``concat_ws`` / ``array_to_string``) because the driver
    canonicalizer hashes via ``pandas.sort_values``, which cannot hash
    list-typed cells (r5 red row). Serialization is lossless for int
    codes, so the check stays bit-exact.
    """
    e = t(spark, sf_dir, "embeddings")
    maxabs = F.aggregate(
        F.col("embedding"), F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))))
    w = e.select("vec_id", "embedding", (maxabs / 127.0).alias("scale"))
    q = F.when(
        F.col("scale") > 0,
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") / F.col("scale") + 0.5).cast("int")),
    ).otherwise(F.transform(F.col("embedding"), lambda x: F.lit(0)))
    return w.select(
        "vec_id", F.round("scale", 4).alias("scale_r4"),
        F.concat_ws(",", q.cast("array<string>")).alias("q"))


@query(
    "q_llm_ann_ivf_static",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
    ),
    dists AS (
        SELECT e.vec_id, e.label, e.embedding, c.cid,
               list_sum(list_transform(range(1, 65),
                   i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
                      * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))))
                   AS d
        FROM embeddings e CROSS JOIN cents c
    ),
    assigned AS (
        SELECT vec_id, label, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY round(d, 6), cid) AS rn
        FROM dists
    ),
    probe_cells AS (
        SELECT cid FROM assigned WHERE vec_id = 0 AND rn <= 2
    ),
    probe_vec AS (
        SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
    ),
    cands AS (
        SELECT a.vec_id, a.label, a.embedding
        FROM assigned a JOIN probe_cells p ON a.cid = p.cid
        WHERE a.rn = 1 AND a.vec_id <> 0
    )
    SELECT vec_id, label,
           round(CAST(list_cosine_similarity(c.embedding, probe_vec.qv)
                      AS DOUBLE), 4) AS cos_sim
    FROM cands c CROSS JOIN probe_vec
    ORDER BY round(CAST(list_cosine_similarity(c.embedding, probe_vec.qv)
                        AS DOUBLE), 6) DESC, vec_id
    LIMIT 10
    """,
    tags=("llm", "similarity", "ivf"),
)
def q_llm_ann_ivf_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 IVF ANN with a RELATIONAL static codebook — the hard-oracle
    twin of q_llm_ann_ivf: cells are the 8 lowest-vec_id vectors taken
    AS A RELATION (broadcast 8-row join + per-vector argmin window), so
    no driver state exists at all and DuckDB replays cell assignment,
    the nprobe=2 probe-cell selection, and the candidate re-score
    exactly (distances ordered at 6dp rounding with cid tie-break —
    the round-then-order precedent). The Lloyd-refined variant stays
    the rows-only training demo; THIS key verifies the IVF query
    mechanics — cell partitioning, probe pruning, candidate re-score —
    end to end.

    Scale: the codebook side is a constant 8-row broadcast; assignment
    is map-only per vector; the probe's two cells prune the corpus to
    ~nprobe/k before any cosine runs. At 100 TB cid becomes the
    partitioning/bucketBy key and a probe reads two cells' files.
    """
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings")
    cents = F.broadcast(
        e.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")))
    sqd = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("cv"),
                   lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, v: acc + v)
    rn = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(F.round(F.col("d"), 6), "cid"))
    assigned = (
        e.crossJoin(cents).withColumn("d", sqd)
        .withColumn("rn", rn)
    )
    probe_cells = F.broadcast(
        assigned.filter((F.col("vec_id") == 0) & (F.col("rn") <= 2))
        .select(F.col("cid").alias("pcid")))
    probe_vec = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv")))
    cands = (
        assigned.filter((F.col("rn") == 1) & (F.col("vec_id") != 0))
        .join(probe_cells, F.col("cid") == F.col("pcid"))
        .crossJoin(probe_vec)
        .withColumn("cos_raw", cosine(F.col("embedding"), F.col("qv")))
    )
    return (
        cands.orderBy(F.round("cos_raw", 6).desc(), F.col("vec_id"))
        .select("vec_id", "label", F.round("cos_raw", 4).alias("cos_sim"))
        .limit(10)
    )


# ------------------------------------------------ product quantization
PQ_M = 8       # subspaces
PQ_SUB = DIM // PQ_M   # dims per subspace
PQ_K = 4       # codewords per subspace


def _pq_oracle(m: int = PQ_M, sub: int = PQ_SUB, k: int = PQ_K) -> str:
    """DuckDB replay of the full PQ-ADC pipeline from the same
    relations: codewords = subvectors of the k lowest-vec_id
    embeddings, per-subspace argmin encoding (6dp-rounded squared
    distance, cid tie-break — the static-IVF ordering), probe distance
    table from vec_id 0, ADC = the sum of per-subspace table entries.
    Exactness rests on the proven invariants: list_sum's left-to-right
    float64 fold ≡ F.aggregate's, and the Python driver's sequential
    sum over the collected probe ≡ both (the q_llm_ann_ivf nprobe
    precedent); every cross-engine comparison is pinned to 6dp."""
    parts = [
        f"cw AS (SELECT vec_id AS cid, embedding AS cv "
        f"FROM embeddings WHERE vec_id < {k})",
        "probe AS (SELECT embedding AS qv FROM embeddings "
        "WHERE vec_id = 0)"]
    dcols = []
    for j in range(m):
        off = j * sub
        sq = (f"round(list_sum(list_transform(range(1, {sub + 1}), "
              f"i -> (CAST(e.embedding[{off} + i] AS DOUBLE) "
              f"- CAST(c.cv[{off} + i] AS DOUBLE)) "
              f"* (CAST(e.embedding[{off} + i] AS DOUBLE) "
              f"- CAST(c.cv[{off} + i] AS DOUBLE)))), 6)")
        parts.append(
            f"enc{j} AS (SELECT e.vec_id, e.label, c.cid, "
            f"row_number() OVER (PARTITION BY e.vec_id "
            f"ORDER BY {sq}, c.cid) AS rn "
            f"FROM embeddings e CROSS JOIN cw c)")
        qd = (f"round(list_sum(list_transform(range(1, {sub + 1}), "
              f"i -> (CAST(p.qv[{off} + i] AS DOUBLE) "
              f"- CAST(c.cv[{off} + i] AS DOUBLE)) "
              f"* (CAST(p.qv[{off} + i] AS DOUBLE) "
              f"- CAST(c.cv[{off} + i] AS DOUBLE)))), 6)")
        parts.append(
            f"dt{j} AS (SELECT c.cid, {qd} AS d "
            f"FROM cw c CROSS JOIN probe p)")
        dcols.append(f"d{j}")
    joins = " ".join(
        f"JOIN enc{j} ON enc{j}.vec_id = e.vec_id AND enc{j}.rn = 1 "
        f"JOIN dt{j} ON dt{j}.cid = enc{j}.cid"
        for j in range(m))
    adc = " + ".join(f"dt{j}.d" for j in range(m))
    return ("WITH " + ",\n".join(parts) + f"""
    SELECT e.vec_id, e.label, round({adc}, 4) AS adc_dist
    FROM embeddings e {joins}
    WHERE e.vec_id <> 0
    ORDER BY round({adc}, 6), e.vec_id
    LIMIT 10""")


@query("q_llm_ann_pq", oracle=_pq_oracle(), tags=("llm", "similarity", "pq"))
def q_llm_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 approximate top-k via PRODUCT QUANTIZATION with asymmetric
    distance computation (ADC) — the memory-bound ANN shape (Jégou et
    al., PAMI 2011) the IVF family composes with at billion-vector
    scale: vectors compress to M=8 one-byte codes (one argmin per
    8-dim subspace against a K=4 codebook), and a probe scores the
    WHOLE corpus with M table lookups per vector instead of a
    64-dim fold.

    Codebook: the per-subspace codewords are subvectors of the K
    lowest-vec_id embeddings (the static-IVF seeding rule) — collected
    once as constant driver state (K×DIM floats, the sanctioned
    codebook pattern). The probe's per-subspace distance table (M×K
    doubles) is computed driver-side with the same sequential float64
    sum the engines use and embedded as literals, so encoding AND
    scoring are pure map-side codegen: zero shuffles, zero Python in
    the row loop, TakeOrderedAndProject for the top-k.

    Scale: encoding is one pass over the corpus (map-only — at 100 TB
    the M byte codes persist as a 64x-smaller sidecar table and probes
    never touch raw vectors); ADC is M element_at lookups per row.
    Distances compare at 6dp with cid tie-break; the per-subspace
    distance arrays are bound ONCE via the array/array_position argmin
    (the let-binding rule) — no expression re-inlining.

    Reference: the engine's connector exposes Trino ANN-over-parquet
    only through full scans; this key is part of the LLM-pipeline
    extension surface (SURVEY.md §2.4 L3).
    """
    e = t(spark, sf_dir, "embeddings")
    rows = (e.orderBy("vec_id").limit(PQ_K)
            .select("vec_id", "embedding").collect())
    codebook = [[float(x) for x in r["embedding"]] for r in rows]
    qv = [float(x) for x in
          e.filter(F.col("vec_id") == 0).select("embedding")
          .collect()[0]["embedding"]]

    # Per-subspace probe distance tables (driver constants; sequential
    # L2R float64 sum = the engines' fold, rounded 6dp like every
    # cross-engine distance comparison).
    dtab = [[round(sum((qv[j * PQ_SUB + i] - cw[j * PQ_SUB + i]) ** 2
                       for i in range(PQ_SUB)), 6)
             for cw in codebook] for j in range(PQ_M)]

    # One server-side parse for the whole M x K ADC tree (r15, the
    # _kmeans_assign py4j-chatter lesson): identical expression —
    # per-subspace rounded-6dp distance array bound once, 1-based
    # argmin codeword with lowest-index ties, LUT element_at.
    def sub_sqdist(j: int, cw: list[float]) -> str:
        off = j * PQ_SUB
        sub = _dlit([cw[off + i] for i in range(PQ_SUB)])
        return (f"aggregate(zip_with(slice(embedding, {off + 1}, {PQ_SUB}),"
                f" {sub}, (x, y) -> (CAST(x AS DOUBLE) - y) "
                f"* (CAST(x AS DOUBLE) - y)), 0.0D, (acc, v) -> acc + v)")

    terms = []
    for j in range(PQ_M):
        ds = ("array(" + ",".join(f"round({sub_sqdist(j, cw)}, 6)"
                                  for cw in codebook) + ")")
        code = (f"CAST(element_at(transform(array({ds}), "
                f"d -> array_position(d, array_min(d))), 1) AS INT)")
        terms.append(f"element_at({_dlit(dtab[j])}, {code})")
    adc = F.expr("0.0D + " + " + ".join(terms))
    scored = (e.filter(F.col("vec_id") != 0)
              .select("vec_id", "label", adc.alias("adc_raw")))
    return (scored.orderBy(F.round("adc_raw", 6), F.col("vec_id"))
            .select("vec_id", "label",
                    F.round("adc_raw", 4).alias("adc_dist"))
            .limit(10))


# --------------------------------------------------------- L3: k-means
KMEANS_K = 4
KMEANS_ITERS = 2


def _kmeans_assign(e: DataFrame, cent: dict[int, list[float]]):
    """Assignment expression for one Lloyd step: squared-L2 distance to
    each centroid as a JVM-side zip_with/aggregate fold (no Python in
    the hot path), argmin via array_min over (dist, id) structs — ties
    break to the LOWEST centroid id on both engines. Centroids are
    LITERALS (constant k x dim), so the step is one map-only projection
    over the scan.

    Distances are rounded to 6dp BEFORE the argmin (matching the
    centroid-mean rounding) so the tie-break domain is identical across
    engines: Spark's left-fold sum and DuckDB's unordered SUM can
    differ in the last ulp, and the lowest-id rule only fires on exact
    equality — a ~1e-15 near-tie could otherwise assign different
    clusters per engine (r13 ADVICE). The oracle rounds at the same
    point (``_kmeans_oracle``'s dist CTEs).

    Built as ONE server-side-parsed SQL expression, not k x dim nested
    Column calls (r15, guide §5 "the driver should do almost no work"):
    the Column form issued ~1,500 py4j round trips per build — ~0.3 s
    of driver time PER ASSIGNMENT BUILD (three builds per key), the
    dominant per-iteration cost at the bench tier. The parsed tree is
    the same expression (float literals repr-round-trip bit-exactly
    through the parser — probed incl. subnormals/extremes; the D
    suffix keeps them DOUBLE, never DECIMAL), verified value-equal."""
    parts = []
    for cid, vec in sorted(cent.items()):
        lit = "array(" + ",".join(repr(float(v)) + "D" for v in vec) + ")"
        d2 = (f"aggregate(zip_with(embedding, {lit}, (x, y) -> "
              f"(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
              f"0.0D, (acc, z) -> acc + z)")
        parts.append(f"struct(round({d2}, 6) AS d2, "
                     f"CAST({int(cid)} AS BIGINT) AS c)")
    return F.expr("array_min(array(" + ",".join(parts) + "))")


#: Above this k the codegen-fold assignment (k literal structs, each an
#: O(dim) fold — an O(k*dim) expression tree) stops being the right
#: shape and assignment switches to the Arrow/BLAS pandas_udf below.
#: The driver-checked fixtures stay at k = KMEANS_K = 4, so the
#: cross-engine-replayable fold path is what the DuckDB oracle sees.
#: Set at exactly that boundary: the r14 probe measured the k=8 fold
#: SLOWER than the whole BLAS pass one tier up (4.4 s at sf0.1 vs
#: 2.7 s at sf1.0) — whole-stage codegen COMPILE of the k x dim
#: expression tree dominates before row volume ever does.
KMEANS_FOLD_MAX = 4


def _kmeans_assign_vec(cent: dict[int, list[float]]):
    """Large-k assignment: one BLAS pass per Arrow batch against the
    broadcast k x dim centroid matrix (|x|^2 + |c|^2 - 2 x.c — the
    matmul form; at unit-scale embeddings it matches the fold's
    sum-of-squares to ~1e-13, far inside the shared 6dp rounding
    grid), then argmin over the 6dp-rounded row — np.argmin's
    first-occurrence rule on ascending-sorted centroid ids IS the
    lowest-id tie rule. Same (d2, c) struct contract as
    _kmeans_assign; returns a Column. Used when k > KMEANS_FOLD_MAX
    (corpus-scaled k, e.g. SemDeDup cells) — the driver-checked k=4
    path stays on the fold, so oracle replays are unaffected."""
    import pandas as pd

    cids = np.array(sorted(cent), dtype=np.int64)
    C = np.stack([np.asarray(cent[c], dtype=np.float64) for c in cids])
    c_sq = (C * C).sum(axis=1)

    # no type hints: PySpark 4's hint inference rejects the
    # Series -> DataFrame (struct-scalar) signature; the plain form
    # dispatches on returnType
    @F.pandas_udf("d2 double, c long")
    def _assign(emb):
        X = np.stack(emb.to_numpy()).astype(np.float64)
        d2 = ((X * X).sum(axis=1)[:, None] + c_sq[None, :]
              - 2.0 * (X @ C.T))
        # clamp the matmul form's possible -1e-15 cancellation residue,
        # then round HALF-UP like Spark/DuckDB round — np.round is
        # banker's half-to-even, a DIFFERENT grid at exact .5
        # boundaries than the fold path / oracle use (r14 review)
        d2 = np.floor(np.maximum(d2, 0.0) * 1e6 + 0.5) / 1e6
        j = d2.argmin(axis=1)
        return pd.DataFrame({"d2": d2[np.arange(len(j)), j],
                             "c": cids[j]})

    return _assign(F.col("embedding"))


def _kmeans_oracle() -> str:
    """The full 2-iteration Lloyd replay as DuckDB CTEs: everything in
    EXPLODED (vec_id, dim-index, value) form so distances and per-dim
    means are plain joins + grouped sums; argmin by row_number ordered
    (d2, c) — the same lowest-id tie rule as the Spark struct min."""
    def dist_assign(cent, dtag, atag):
        # round(..., 6) on the summed distance BEFORE the argmin —
        # same rounding point as _kmeans_assign's struct, so the
        # lowest-id tie rule sees the same domain on both engines.
        return f"""
    {dtag} AS (
        SELECT ev.vec_id, {cent}.c,
               round(sum((ev.x - {cent}.x) ^ 2), 6) AS d2
        FROM ev JOIN {cent} USING (i) GROUP BY ev.vec_id, {cent}.c
    ),
    {atag} AS (
        SELECT vec_id, c, d2 FROM (
            SELECT vec_id, c, d2, row_number() OVER (
                PARTITION BY vec_id ORDER BY d2, c) AS rn
            FROM {dtag}) WHERE rn = 1
    )"""

    def update(atag, ctag):
        return f"""
    {ctag} AS (
        SELECT {atag}.c, ev.i, round(avg(ev.x), 6) AS x
        FROM ev JOIN {atag} USING (vec_id) GROUP BY {atag}.c, ev.i
    )"""

    return f"""
    ev AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    c0 AS (SELECT vec_id AS c, x, i FROM ev WHERE vec_id < {KMEANS_K}),
    {dist_assign('c0', 'd1', 'a1')},
    {update('a1', 'c1')},
    {dist_assign('c1', 'd2_', 'a2')},
    {update('a2', 'c2')},
    {dist_assign('c2', 'd3', 'a3')}"""


@query(
    "q_llm_kmeans",
    oracle=f"""
    WITH {_kmeans_oracle()}
    SELECT vec_id, c AS cluster_id, round(d2, 4) AS dist2
    FROM a3
    """,
    tags=("llm", "similarity", "clustering", "iterative"),
)
def q_llm_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 k-means clustering (Lloyd) over the embedding corpus — the
    clustering step behind SemDeDup-style semantic dedup (Abbas et al.
    2023 cluster within k-means cells), cluster-balanced sampling, and
    domain-mixture analysis. Deterministic and fully DuckDB-replayable:
    init = the embeddings of the {KMEANS_K} lowest vec_ids, cluster id
    = the init vector's vec_id, {KMEANS_ITERS} update rounds, final
    assignment emitted as (vec_id, cluster_id, dist2 rounded 4dp).

    The distributed shape is canonical Lloyd: per iteration ONE corpus
    scan with the centroids baked as broadcast literals (assignment is
    a map-only zip_with/aggregate fold — argmin over (dist, id) structs,
    ties to the lowest id) and ONE groupBy(cluster) shuffle of k x dim
    partial means with map-side combine. Driver state is the k x dim
    centroid matrix per round — the sanctioned constant-size collect
    (same class as the IVF/PQ codebooks above). At 100 TB: iterations
    are corpus scans by definition; nothing else grows with the corpus.

    Cross-engine determinism: centroid means AND assignment distances
    are rounded to 6dp each round (both engines, at the same point —
    before the argmin), so the next round's literals are identical
    despite float summation-order noise (~1e-15, far inside the
    rounding margin) and the lowest-centroid-id tie rule fires on the
    same domain (a raw-value argmin could flip a ~1e-15 near-tie
    between engines — r13 ADVICE); distances use float64 end-to-end
    (the float32 embeddings widen exactly). Empty clusters drop out on
    both sides (standard Lloyd).
    """
    a = kmeans_assignments(t(spark, sf_dir, "embeddings"))
    return a.select("vec_id", "cluster_id",
                    F.round("dist2", 4).alias("dist2"))


def kmeans_assignments(e: DataFrame, k: int = KMEANS_K,
                       iters: int = KMEANS_ITERS,
                       extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Reusable Lloyd loop (see q_llm_kmeans for the plan-shape and
    determinism contract): returns (vec_id, cluster_id, dist2[,
    *extra_cols]) — dist2 at the 6dp assignment grid (the argmin
    domain). ``extra_cols`` carries input columns (e.g. the embedding
    itself) through the final assignment so a consumer that needs
    vectors AND cells — SemDeDup's within-cell pair scoring — gets
    them in the SAME map-only projection instead of re-joining the
    corpus on vec_id. Driver state per round is the k x dim centroid
    matrix — constant-size.

    Input contract (r13 review, ENFORCED since r14): embeddings must
    be exactly DIM wide (the update step aggregates
    embedding[0..DIM-1] — wider input silently truncates, narrower
    yields NULL means), and vec_ids 0..k-1 must exist (init filter is
    ``vec_id < k``; sparse low ids initialize fewer than k centroids).
    Both are checked at the init collect — driver-side, k rows, free —
    and raise instead of silently mis-clustering."""
    cent = {int(r.vec_id): [float(x) for x in r.embedding]
            for r in e.filter(F.col("vec_id") < k).collect()}
    if len(cent) != k:
        raise ValueError(
            f"kmeans_assignments: init expects vec_ids 0..{k - 1} "
            f"present; found {len(cent)} of {k} init rows")
    bad_width = sorted(c for c, v in cent.items() if len(v) != DIM)
    if bad_width:
        raise ValueError(
            f"kmeans_assignments: embeddings must be exactly {DIM} "
            f"wide (update step aggregates embedding[0..{DIM - 1}]); "
            f"init vec_ids {bad_width} are not")
    # fold (codegen, oracle-replayable) for small k; Arrow/BLAS
    # pandas_udf once the O(k*dim) expression tree stops scaling.
    # PINNED from the INITIAL k (r15 ADVICE): empty clusters can shrink
    # ``cent`` below KMEANS_FOLD_MAX mid-loop, and the two paths'
    # 6dp-rounded distances are only bounded within one grid step of
    # each other — a half-boundary near-tie could assign differently
    # across an engine flip, so one call always uses ONE implementation.
    use_fold = len(cent) <= KMEANS_FOLD_MAX

    def assign(c):
        if use_fold:
            return _kmeans_assign(e, c)
        return _kmeans_assign_vec(c)

    # one parsed expression per mean column, not 5 nested Column calls
    # each — the same py4j-chatter cut as _kmeans_assign (r15)
    mean_aggs = [F.expr(f"round(avg(CAST(embedding[{i}] AS DOUBLE)), 6) "
                        f"AS m{i}") for i in range(DIM)]
    for _ in range(iters):
        best = assign(cent)
        rows = (e.withColumn("_c", best["c"])
                .groupBy("_c")
                .agg(*mean_aggs)
                .collect())
        cent = {int(r["_c"]): [float(r[f"m{i}"]) for i in range(DIM)]
                for r in rows}
    # project the (d2, c) struct ONCE, then expand fields — two field
    # references on the raw UDF column could evaluate the pandas_udf
    # twice on the large-k path
    return (
        e.withColumn("_a", assign(cent))
        .select("vec_id",
                F.col("_a.c").alias("cluster_id"),
                F.col("_a.d2").alias("dist2"),
                *extra_cols)
    )


SAMPLE_PER_CLUSTER = 30


@query(
    "q_llm_cluster_sample",
    oracle=f"""
    WITH {_kmeans_oracle()},
    ranked AS (
        SELECT vec_id, c AS cluster_id, d2,
               row_number() OVER (
                   PARTITION BY c ORDER BY round(d2, 6), vec_id) AS rnk
        FROM a3
    )
    SELECT vec_id, cluster_id, round(d2, 4) AS dist2,
           CAST(rnk AS BIGINT) AS rank_in_cluster
    FROM ranked WHERE rnk <= {SAMPLE_PER_CLUSTER}
    """,
    tags=("llm", "similarity", "clustering", "sampling"),
)
def q_llm_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3/L4 cluster-balanced sampling — the curation step k-means
    feeds: keep the {SAMPLE_PER_CLUSTER} most-central members of every
    k-means cell (closest to centroid, ties to lowest vec_id), giving a
    diversity-preserving subset where uniform sampling would
    over-represent dense regions (the standard k-means-based selection
    of DoReMi/SemDeDup-style pipelines).

    Per-cluster top-n WITHOUT a hot-key window: k is small (4), so a
    ``row_number() OVER (PARTITION BY cluster_id ...)`` would funnel
    corpus/k rows through ONE reducer at 100 TB — exactly the
    partition-less-window anti-pattern the suite's plan gates ban.
    Ranks come from ``grouped_sort_positions`` instead (range shuffle
    on (cluster, dist, id) + per-(range, cluster) row_number +
    constant-size offset map — operators/sorts_sets.py), whose caller
    contract (bounded groups) k satisfies by construction. Ordering is
    (round(d2, 6), vec_id) so float summation-order noise (~1e-15)
    cannot flip neighbors across engines."""
    from okera_trino_spark.operators.sorts_sets import (
        grouped_sort_positions,
    )

    assigned = kmeans_assignments(t(spark, sf_dir, "embeddings"))
    ranked = grouped_sort_positions(
        assigned.select("vec_id", "cluster_id",
                        F.col("dist2").alias("d2")),
        "cluster_id", F.round(F.col("d2"), 6).asc(),
        F.col("vec_id").asc(), pos_col="rank_in_cluster")
    return (
        ranked.filter(F.col("rank_in_cluster") <= SAMPLE_PER_CLUSTER)
        .select("vec_id", "cluster_id",
                F.round("d2", 4).alias("dist2"), "rank_in_cluster")
    )
