"""Duplicate-cluster resolution — connected components over the
near-dup pair graph (SURVEY.md §2.4 training-data hygiene).

Pairwise dedup (llm/dedup.py) emits EDGES: (doc_a, doc_b, jaccard).
Curation needs CLUSTERS: if A~B and B~C, all three are one duplicate
group with one canonical survivor, even when A~C was never scored.
That's connected components — an inherently iterative computation (no
single SQL join expresses transitive closure), implemented here as
distributed min-label propagation, the standard Spark shape for
large-graph components (each iteration is one join + one aggregate;
O(diameter) rounds).

The oracle IS SQL-expressible via DuckDB's recursive CTE, so this
iterative operator still gets a full driver value-check — the recursion
happens oracle-side, the Spark side converges by fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.llm.dedup import (
    NGRAM_THRESHOLD,
    minhash_pairs_sql,
    minhash_verified_pairs,
    ngram_jaccard_pairs,
    ngram_pairs_sql,
)
from okera_trino_spark.operators._util import t
from okera_trino_spark.registry import query


def ngram_pairs(spark: SparkSession, sf_dir: str,
                threshold: float = NGRAM_THRESHOLD) -> DataFrame:
    """Near-dup edges: the EXACT q_llm_dedup_ngram pair computation
    (shared helper in llm/dedup.py — one source of truth for shingle
    width, split regex, and threshold), projected to graph edges."""
    return ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"), threshold=threshold
    ).select("doc_a", "doc_b")


def connected_components(nodes: DataFrame, edges: DataFrame,
                         max_iter: int = 20,
                         include_isolated: bool = True) -> DataFrame:
    """Distributed min-label propagation: every node starts as its own
    label; each round a node takes the min of its own and its neighbors'
    labels; fixpoint = components. Returns (doc_id, cluster_id).
    The FIRST round is fused into initialization (r8): with identity
    labels, round 1's neighbor-min is just min(src) per dst — one
    aggregate replaces a join + aggregate + convergence join, cutting
    a full sequential round's shuffles (~30% of the key's wall at
    sf0.1, since duplicate clusters converge in a handful of rounds).

    The loop iterates over TOUCHED nodes only — nodes incident to at
    least one edge. An isolated node's label can never change (it has no
    neighbors), so carrying it through every round is pure waste; at
    100 TB the near-dup graph is a small fraction of the corpus, so this
    bounds the per-round state by |V(edges)|, not |corpus|. With
    ``include_isolated`` the isolated nodes are unioned back with
    identity labels afterwards — a LAZY anti-join + union, no extra
    action; pass False when the consumer only cares about multi-node
    components (q_llm_dup_clusters filters size > 1 anyway) and the
    whole-corpus scan drops out of the plan.

    Scale: each round is one shuffle join (edges ⋈ labels on node id)
    plus one aggregate — no driver-side graph state; the convergence
    check is a single count per round (an O(rounds) action cost,
    sanctioned like IVF's constant-size codebook collects). Rounds are
    bounded by component DIAMETER, and duplicate clusters are
    near-cliques (diameter ≤ ~3), so the loop terminates in a handful of
    rounds regardless of corpus size. ``localCheckpoint`` truncates the
    lineage each round so the plan doesn't grow exponentially.

    Negative result (measured, do not retry): advancing TWO propagation
    steps per materialized round (convergence-check on the inner step,
    halving action count) is ~1.6× SLOWER at sf0.1 — the
    un-checkpointed mid-step labels are referenced twice in the
    double-step plan (neighbor-join input AND join base) and Catalyst
    does not reuse the exchange across those references, so the first
    step's join+agg runs twice per round, outweighing the saved job.
    """
    sym = edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")) \
        .union(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))) \
        .localCheckpoint()
    # Fused first round (r8): with identity initial labels, the first
    # propagation's neighbor-min is simply min(src) per dst — one
    # aggregate instead of a join + aggregate + join, saving a full
    # round's shuffle pair. sym holds both directions, so dst alone
    # enumerates every touched node and least(dst, min(src)) is
    # exactly round 1's label.
    labels = (
        sym.groupBy("dst").agg(F.min("src").alias("_nbr"))
        .select(F.col("dst").alias("doc_id"),
                F.least(F.col("dst"), F.col("_nbr")).alias("cluster_id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym.src == labels.doc_id)
            .groupBy(F.col("dst").alias("n_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # Min-propagation only ever DECREASES a label, so "changed" is
        # simply new < old — computed inline during the propagation join
        # (the old form re-joined new labels against old ones, a whole
        # extra shuffle join per round just for the convergence check).
        new_min = F.least(F.col("cluster_id"),
                          F.coalesce(F.col("nbr_min"), F.col("cluster_id")))
        new_labels = (
            labels.join(nbr, labels.doc_id == nbr.n_id, "left")
            .select(
                "doc_id",
                new_min.alias("new_cluster_id"),
                (new_min < F.col("cluster_id")).alias("_changed"),
            )
            .withColumnRenamed("new_cluster_id", "cluster_id")
            # LAZY checkpoint: the count() below is the action that
            # materializes it, so each round schedules ONE Spark job
            # (eager=True would run a materialization job and then a
            # count job — 2× the per-round scheduling overhead, which
            # dominates when the label state is small).
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter("_changed").count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    if not converged:
        # Unconverged labels are silently-wrong clusters (a diameter-K
        # chain needs K rounds); fail loudly rather than report bogus
        # components.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "component diameter exceeds max_iter; raise it for chain-shaped graphs")
    if include_isolated:
        isolated = (
            nodes.select("doc_id")
            .join(labels.select("doc_id"), "doc_id", "left_anti")
            .withColumn("cluster_id", F.col("doc_id"))
        )
        labels = labels.unionByName(isolated)
    return labels


@query(
    "q_llm_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {ngram_pairs_sql()},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lbl FROM edges e JOIN reach r ON e.src = r.node
    ),
    comp AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node)
    SELECT cluster_id,
           count(*) AS cluster_size,
           min(doc_id) AS canonical_doc_id
    FROM comp
    GROUP BY cluster_id
    HAVING count(*) > 1
    """,
    tags=("llm", "dedup", "iterative"),
)
def q_llm_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components over the ngram-Jaccard
    near-dup graph, reporting every multi-document cluster with its size
    and canonical (minimum) doc_id — the survivor the curation pipeline
    keeps. Transitive closure means A~B~C clusters together even when
    A~C was never scored.

    Spark side converges by iterative min-label propagation
    (``connected_components``); the oracle computes the same closure
    with a recursive CTE — an iterative operator with a full value
    oracle, not a rows-only check.
    """
    d = t(spark, sf_dir, "documents")
    # include_isolated=False: singletons can never reach size > 1, so
    # the whole-corpus label union never enters the plan — the agg runs
    # over the touched-node labels only.
    comp = connected_components(d.select("doc_id"),
                                ngram_pairs(spark, sf_dir),
                                include_isolated=False)
    return (
        comp.groupBy("cluster_id")
        .agg(F.count("*").alias("cluster_size"),
             F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("cluster_size") > 1)
    )


@query(
    "q_llm_dup_clusters_lsh",
    oracle=f"""
    WITH RECURSIVE {minhash_pairs_sql()},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lbl FROM edges e JOIN reach r ON e.src = r.node
    ),
    comp AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node)
    SELECT cluster_id,
           count(*) AS cluster_size,
           min(doc_id) AS canonical_doc_id
    FROM comp
    GROUP BY cluster_id
    HAVING count(*) > 1
    """,
    tags=("llm", "dedup", "iterative"),
)
def q_llm_dup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters over the MinHash+LSH verified edge set — the
    100-TB edge source (r12). Same component resolution as
    q_llm_dup_clusters, different edge generator: banded-LSH candidate
    pairs + exact Jaccard verify (llm/dedup.py minhash_verified_pairs)
    instead of the exact inverted-index self-join.

    Why it exists (measured, SCALE.md r12 second decade): the exact
    join's candidate volume is SUM over shingles of df², so a corpus
    whose per-shingle document frequency grows with corpus size — dense
    boilerplate, or the saturated shingle space of the generated scale
    tiers — sends it quadratic (5.72x wall for 3x data) while every df
    stays under the hot-key cap. LSH banding's candidate volume scales
    with docs x bands regardless of df: same probe measured 2.49x for
    3x data. At Jaccard ≥ 0.5 the band scheme's recall makes the
    verified edge set equal the exact pair set (asserted against
    q_llm_dup_clusters in tests/test_llm.py), so the clusters are
    identical — only the cost curve changes. The oracle replays the
    full LSH pipeline + recursive closure in DuckDB."""
    d = t(spark, sf_dir, "documents")
    edges = minhash_verified_pairs(d).select("doc_a", "doc_b")
    comp = connected_components(d.select("doc_id"), edges,
                                include_isolated=False)
    return (
        comp.groupBy("cluster_id")
        .agg(F.count("*").alias("cluster_size"),
             F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("cluster_size") > 1)
    )


@query(
    "q_llm_dedup_apply",
    oracle=f"""
    WITH RECURSIVE {ngram_pairs_sql()},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lbl FROM edges e JOIN reach r ON e.src = r.node
    ),
    comp AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
    sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
    SELECT c.doc_id, d.lang, d.source, s.cluster_size
    FROM comp c
    JOIN sizes s USING (cluster_id)
    JOIN documents d ON d.doc_id = c.doc_id
    WHERE c.doc_id = c.cluster_id
    """,
    tags=("llm", "dedup", "iterative"),
)
def q_llm_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup APPLICATION — the kept-set materialization: every document
    that survives near-dup clustering (the canonical minimum-id member
    of its component; singletons survive as their own head), annotated
    with its cluster size. q_llm_dup_clusters reports the duplicate
    groups; this key emits the corpus a training run actually consumes
    after dropping the non-canonical members.

    Scale: components via the same O(diameter)-round label propagation,
    restricted to edge-touched nodes. Touched survivors come from two
    small key-partitioned joins (sizes on cluster_id, attributes on
    doc_id); the untouched corpus survives by definition and joins via
    one anti-join against the (small) touched-node set — broadcastable,
    so the 100-TB fact table never shuffles for the singleton path.
    Edge-source note (r12): this key keeps the exact inverted-index
    edges so its oracle stays the shared ngram_pairs_sql replay; at
    df-inflated corpus scale swap in minhash_verified_pairs — the
    identical edge set at Jaccard ≥ 0.5 (see q_llm_dup_clusters_lsh),
    without the Σdf² candidate volume — and the apply mechanics below
    are unchanged.
    """
    d = t(spark, sf_dir, "documents")
    return _dedup_apply(d, ngram_pairs(spark, sf_dir))


def _dedup_apply(d: DataFrame, edges: DataFrame) -> DataFrame:
    """Kept-set materialization over an arbitrary near-dup edge set —
    shared by the exact-edge and LSH-edge apply keys (r12)."""
    comp = connected_components(d.select("doc_id"), edges,
                                include_isolated=False)
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    attrs = d.select("doc_id", "lang", "source")
    kept_touched = (
        comp.filter(F.col("doc_id") == F.col("cluster_id"))
        .join(sizes, "cluster_id")
        .join(attrs, "doc_id")
        .select("doc_id", "lang", "source", "cluster_size")
    )
    singles = (
        attrs.join(comp.select("doc_id"), "doc_id", "left_anti")
        .withColumn("cluster_size", F.lit(1).cast("long"))
    )
    return kept_touched.unionByName(singles)


_APPLY_ORACLE_TAIL = """
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lbl FROM edges e JOIN reach r ON e.src = r.node
    ),
    comp AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
    sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
    SELECT c.doc_id, d.lang, d.source, s.cluster_size
    FROM comp c
    JOIN sizes s USING (cluster_id)
    JOIN documents d ON d.doc_id = c.doc_id
    WHERE c.doc_id = c.cluster_id
"""


@query(
    "q_llm_dedup_apply_lsh",
    oracle=f"WITH RECURSIVE {minhash_pairs_sql()},{_APPLY_ORACLE_TAIL}",
    tags=("llm", "dedup", "iterative"),
)
def q_llm_dedup_apply_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kept-set materialization over the MinHash+LSH verified edge
    set — q_llm_dedup_apply's scalable twin (r12), completing the pair
    with q_llm_dup_clusters_lsh: at Jaccard ≥ 0.5 the verified LSH
    edges equal the exact pair set (tests/test_llm.py asserts the
    kept sets identical), so a migrating pipeline swaps edge sources
    without changing a single surviving document — only the cost
    curve (SCALE.md round-12: exact edges quadratic on df-inflated
    corpora; banded LSH sub-linear across two measured decades). Apply
    mechanics shared via _dedup_apply; the oracle replays the full
    LSH pipeline + recursive closure + kept-set selection."""
    d = t(spark, sf_dir, "documents")
    return _dedup_apply(d, minhash_verified_pairs(d)
                        .select("doc_a", "doc_b"))


# ------------------------------------------- alternating-star resolver
def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star pass (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC 2014 — public algorithm): for every
    node u, connect each STRICTLY LARGER neighbor v > u to
    m = min(N(u) ∪ {u}). One groupBy + one join; emits (node, parent)
    with parent < node (self-loops dropped)."""
    nbr = sym.groupBy("u").agg(F.min("v").alias("_m"))
    m = F.least(F.col("u"), F.col("_m"))
    return (
        sym.join(nbr, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star pass: orient every edge larger→smaller, then for
    each node u connect ALL smaller neighbors (and u itself) to
    m = min(N(u)): the local star collapses onto its minimum. Output is
    canonical — distinct (u, v) with v < u — which is what makes the
    fixpoint test a plain set comparison."""
    o = (e.select(F.greatest("u", "v").alias("u"),
                  F.least("u", "v").alias("v"))
         .filter(F.col("u") != F.col("v"))
         .distinct())
    nbr = o.groupBy("u").agg(F.min("v").alias("_m"))
    return (
        o.join(nbr, "u")
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .union(nbr.select("u", F.col("_m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def star_components(edges: DataFrame, max_iter: int = 50,
                    stats: dict | None = None) -> DataFrame:
    """Connected components by ALTERNATING large-star/small-star — the
    O(log n)-round algorithm (Kiveris et al. 2014, public). Returns
    (doc_id, cluster_id) for every node incident to an edge, labels =
    component minimum — same contract as ``connected_components``
    (include_isolated=False form).

    Why a second resolver: min-label propagation needs O(DIAMETER)
    rounds — perfect for near-clique duplicate clusters (diameter ≤ ~3)
    but pathological for CHAIN-shaped duplicate graphs (A overlaps B
    overlaps C…, the shape substring/paragraph overlap dedup produces:
    a 1000-link chain is 1000 sequential shuffle rounds). Each star
    round at least halves the distance-to-root, so convergence is
    logarithmic in component size regardless of shape —
    tests/test_llm.py pins a 512-link chain resolving in ≤ 11 rounds
    where propagation would need 512. Per round: two groupBy-min
    aggregates + two joins over the EDGE set only (never the corpus),
    exactly the label-propagation round cost, so on low-diameter
    graphs the two resolvers tie and on high-diameter graphs this one
    wins by the diameter/log ratio.

    Fixpoint detection is deterministic AND one action per round
    (r13 verdict: the count() + exceptAll().count() pair doubled the
    job count): small-star output is already canonical (distinct,
    larger→smaller), so both rounds' edge sets are keyed sets and
    |new Δ old| == 0 iff unchanged — computed as ONE full-outer join
    on the edge key with a null-marker filter, one edge-bounded job,
    no checksum-collision risk. At the fixpoint every edge is
    (node, component-min) — a star — so labels read directly off the
    edge list plus (root, root) rows.

    ``stats``, when given, records {"rounds": N} — measurement hook for
    the convergence tests; not used by query keys."""
    e = (edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
         .filter(F.col("u") != F.col("v"))
         .distinct()
         .localCheckpoint(eager=False))
    converged = False
    rounds = 0
    for _ in range(max_iter):
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        ss = _small_star(_large_star(sym)).localCheckpoint(eager=False)
        rounds += 1
        sym_diff = (
            ss.withColumn("_new", F.lit(True))
            .join(e.withColumn("_old", F.lit(True)), ["u", "v"],
                  "full_outer")
            .filter(F.col("_new").isNull() | F.col("_old").isNull())
            .count())
        e = ss
        if sym_diff == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        # Measured convergence is ~log2(diameter)+2 rounds (512-link
        # chain = 11), so 50 rounds covers components beyond any real
        # corpus — but the proven worst case is O(log^2 n) (Kiveris et
        # al.), so an unconverged run on an extreme graph is a
        # raise-the-bound situation, not necessarily a bug. Fail loudly
        # either way: unconverged labels are silently-wrong clusters.
        raise RuntimeError(
            f"star_components did not converge in {max_iter} rounds — "
            "raise max_iter (rounds grow ~log with component size; "
            "worst case O(log^2 n))")
    return (
        e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
        .unionByName(
            e.select(F.col("v").alias("doc_id"),
                     F.col("v").alias("cluster_id")).distinct())
    )


@query(
    "q_llm_dup_clusters_star",
    oracle=f"""
    WITH RECURSIVE {minhash_pairs_sql()},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lbl FROM edges e JOIN reach r ON e.src = r.node
    ),
    comp AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node)
    SELECT cluster_id,
           count(*) AS cluster_size,
           min(doc_id) AS canonical_doc_id
    FROM comp
    GROUP BY cluster_id
    HAVING count(*) > 1
    """,
    tags=("llm", "dedup", "iterative"),
)
def q_llm_dup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters over the LSH-verified edge set, resolved by
    ALTERNATING STARS instead of min-label propagation (r13). Same
    edges, same clusters (the oracle is the identical recursive
    closure; tests/test_llm.py asserts equality with both existing
    resolvers) — different round complexity: O(log n) rounds in
    component size vs O(diameter). The variant a 100-TB pipeline needs
    when the duplicate graph is CHAIN-shaped (overlap/substring dedup:
    doc A overlaps B overlaps C…), where propagation's round count is
    the chain length. See star_components for the plan shape."""
    d = t(spark, sf_dir, "documents")
    edges = minhash_verified_pairs(d).select("doc_a", "doc_b")
    comp = star_components(edges)
    return (
        comp.groupBy("cluster_id")
        .agg(F.count("*").alias("cluster_size"),
             F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("cluster_size") > 1)
    )
