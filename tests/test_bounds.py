"""Statistical assertions for the two rows-only driver keys — "no SQL
oracle" must not mean "no assertion":

- q_agg_approx_distinct: HLL++ sketch values are engine-specific, but
  the estimate must sit within the sketch's own error bound of the
  exact distinct count.
- q_sample: which rows a seeded Bernoulli sample keeps is
  engine-specific, but the sampled row COUNT must sit inside binomial
  bounds of fraction·N.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from okera_trino_spark.registry import load_all_queries
from okera_trino_spark.sources.catalog import load_table

SPECS = load_all_queries()


def test_approx_distinct_within_sketch_error(spark, sf_dir):
    exact = {
        r.o_orderstatus: r.n
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {r.o_orderstatus: r.approx_customers
              for r in SPECS["q_agg_approx_distinct"].fn(spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    rsd = 0.01  # matches the query's rsd parameter
    for status, ex in exact.items():
        # 3σ of the sketch's relative standard deviation, floor of 3 for
        # tiny groups where HLL is exact-or-off-by-rounding.
        tol = max(3.0, 3 * rsd * ex)
        assert abs(approx[status] - ex) <= tol, (status, approx[status], ex)


def test_sample_count_within_binomial_bounds(spark, sf_dir):
    """Fraction-mode sampled catalog (the okera_sampled_* Bernoulli
    approximation; the q_sample KEY now exercises the byte-exact prefix
    mode with a hard oracle, so the fraction mode is bounds-checked
    here directly)."""
    from okera_trino_spark.sources.catalog import (
        GovernedCatalog, _uncompressed_bytes)

    n = load_table(spark, sf_dir, "lineitem").count()
    total = _uncompressed_bytes(sf_dir, "lineitem")
    cap = total // 10
    cat = GovernedCatalog(spark, sf_dir, sample_bytes=cap)
    got = cat.read("lineitem").count()
    p = cap / total
    sigma = math.sqrt(n * p * (1 - p))
    assert abs(got - n * p) <= 5 * sigma, (got, n * p, sigma)


def test_sample_prefix_exact_row_count(spark, sf_dir):
    """The q_sample prefix-mode byte cap is derived to land on exactly
    1000 rows — the determinism the hash oracle relies on."""
    assert SPECS["q_sample"].fn(spark, sf_dir).count() == 1000


def test_approx_percentile_within_rank_bounds(spark, sf_dir):
    """Each sketch estimate must land between the exact quantiles one
    rank-error band to either side (accuracy 10000 → band 1e-4, widened
    10x for safety)."""
    exact = {
        r.o_orderstatus: (r.p45, r.p55, r.p90, r.p99)
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.expr("percentile(o_totalprice, 0.45)").alias("p45"),
             F.expr("percentile(o_totalprice, 0.55)").alias("p55"),
             F.expr("percentile(o_totalprice, 0.90)").alias("p90"),
             F.expr("percentile(o_totalprice, 0.99)").alias("p99"))
        .collect()
    }
    approx = {r.o_orderstatus: (r.p50, r.p95)
              for r in SPECS["q_agg_approx_percentile"].fn(spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    for status, (p45, p55, p90, p99) in exact.items():
        p50, p95 = approx[status]
        assert p45 <= p50 <= p55, (status, p50, p45, p55)
        assert p90 <= p95 <= p99, (status, p95, p90, p99)


def test_stratified_sample_within_binomial_bounds(spark, sf_dir):
    from okera_trino_spark.llm.text import STRATA_FRACTIONS

    totals = {r.lang: r.n for r in
              load_table(spark, sf_dir, "documents")
              .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r.lang: r.n for r in
            SPECS["q_llm_stratified"].fn(spark, sf_dir)
            .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in totals.items():
        p = STRATA_FRACTIONS[lang]
        expect = n * p
        sigma = math.sqrt(n * p * (1 - p))
        assert abs(kept.get(lang, 0) - expect) <= max(5 * sigma, 1), (
            lang, kept.get(lang, 0), expect)


def test_mix_corpus_rates_within_binomial_bounds(spark, sf_dir):
    """mix_corpus emits ~weight(source) · |source| rows — full copies
    are deterministic, only the fractional tail is a Bernoulli gate, so
    the variance comes from the fractional part alone (parity already
    pins the exact kept multiset; this guards hash-bucket uniformity
    and the upsampling arithmetic)."""
    from okera_trino_spark.llm.text import MIX_WEIGHTS, mix_corpus

    docs = load_table(spark, sf_dir, "documents")
    totals = {r.source: r.n for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept = {r.source: r.n for r in
            mix_corpus(docs, MIX_WEIGHTS)
            .groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in totals.items():
        w = MIX_WEIGHTS[src]
        frac = w - math.floor(w)
        expect = n * w
        sigma = math.sqrt(n * frac * (1 - frac))
        assert abs(kept.get(src, 0) - expect) <= max(5 * sigma, 1), (
            src, kept.get(src, 0), expect)
    # determinism: a second evaluation produces the identical multiset
    rows = lambda: sorted((r.doc_id, r.mix_copy) for r in
                          mix_corpus(docs, MIX_WEIGHTS)
                          .select("doc_id", "mix_copy").collect())
    assert rows() == rows()
    # an upsampled source (w > 1) actually contains repeated docs
    up = [s for s, w in MIX_WEIGHTS.items() if w > 1][0]
    copies = mix_corpus(docs, MIX_WEIGHTS).filter(F.col("source") == up)
    n_rows = copies.count()
    n_distinct = copies.select("doc_id").distinct().count()
    assert n_rows > n_distinct


def test_deterministic_hll_within_sketch_error(spark, sf_dir):
    """The r8 deterministic HLL (m=512) must land within 3σ of its
    theoretical relative error ~1.04/sqrt(m) against exact counts, on
    top of its exact cross-engine oracle (tests/test_oracle_parity)."""
    import math

    exact = {
        r.o_orderstatus: r.n
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {r.o_orderstatus: r.approx_customers
              for r in SPECS["q_agg_approx_distinct_det"].fn(spark, sf_dir)
              .collect()}
    assert set(approx) == set(exact)
    rsd = 1.04 / math.sqrt(512)
    for status, ex in exact.items():
        tol = max(3.0, 3 * rsd * ex)
        assert abs(approx[status] - ex) <= tol, (status, approx[status], ex)


def test_deterministic_percentile_within_rank_bounds(spark, sf_dir):
    """The r8 deterministic-sample percentile must land within the
    sampling rank error (3σ of sqrt(p(1-p)/n) rank noise) of the exact
    percentile, on top of its exact cross-engine oracle."""
    import math

    o = load_table(spark, sf_dir, "orders")
    for status, p, col in [("O", 0.5, "p50"), ("F", 0.9, "p90")]:
        vals = sorted(r.o_totalprice for r in
                      o.filter(F.col("o_orderstatus") == status)
                      .select("o_totalprice").collect())
        row = (SPECS["q_agg_approx_percentile_det"].fn(spark, sf_dir)
               .filter(F.col("o_orderstatus") == status).collect()[0])
        approx = row[col]
        n_samp = row.n_sampled
        # translate 3σ rank noise into a value tolerance via the
        # neighboring exact quantiles
        dr = 3 * math.sqrt(p * (1 - p) / n_samp)
        lo = vals[max(0, int((p - dr) * (len(vals) - 1)))]
        hi = vals[min(len(vals) - 1, int(math.ceil((p + dr) * (len(vals) - 1))))]
        assert lo <= approx <= hi, (status, p, approx, lo, hi)


def test_cms_estimates_within_overcount_envelope(spark, sf_dir):
    """Count-min estimates are exact-or-over (collisions only ADD) and
    the over-count is bounded by ~e*N/w with high confidence — checked
    for the reported top-10 against exact counts, on top of the exact
    cross-engine oracle."""
    import math

    d = load_table(spark, sf_dir, "documents")
    exact = {r.w: r.n for r in
             d.selectExpr("explode(split(text, ' ')) AS w")
             .filter(F.col("w") != "")
             .groupBy("w").agg(F.count("*").alias("n")).collect()}
    total = sum(exact.values())
    got = SPECS["q_llm_heavy_hitters"].fn(spark, sf_dir).collect()
    assert len(got) == 10
    w = 1024
    for r in got:
        ex = exact[r.word]
        assert r.est_count >= ex, (r.word, r.est_count, ex)
        assert r.est_count - ex <= math.e * total / w + 1, (
            r.word, r.est_count, ex, total)


def test_qdigest_quantile_within_rank_error(spark, sf_dir):
    """value_at_quantile on a HIGH-cardinality column (where approx is
    NOT exact — the q_trino_sql_qdigest key deliberately avoids this)
    must still sit between the exact quantile values at p ± the
    sketch's rank error (accuracy 10000 → rank error ≤ n/10000,
    padded to 3 ranks for discreteness)."""
    from okera_trino_spark.functions.trino_sql import execute_trino

    vals = sorted(r.l_extendedprice for r in
                  load_table(spark, sf_dir, "lineitem")
                  .select("l_extendedprice").collect())
    n = len(vals)
    for p in (0.1, 0.5, 0.95):
        row = execute_trino(
            spark,
            f"SELECT value_at_quantile(qdigest_agg(l_extendedprice), "
            f"{p}e0) AS v FROM lineitem", sf_dir).collect()[0]
        dr = max(3, n // 10000 + 1)
        lo = vals[max(0, int(p * (n - 1)) - dr)]
        hi = vals[min(n - 1, int(p * (n - 1)) + dr)]
        assert lo <= row.v <= hi, (p, row.v, lo, hi)


def test_weighted_sample_first_pick_is_exactly_weight_proportional():
    """q_llm_weighted_sample's method (r14): the Efraimidis-Spirakis
    theorem says the TOP-1 row by u^(1/w) — equivalently by ln(u)/w —
    is selected with probability EXACTLY w_i / sum(w). Monte-Carlo over
    the same md5-seeded u construction the key uses (seed varied, pure
    numpy/hashlib — this validates the METHOD and the exact key
    formula; the Spark implementation is hash-checked against DuckDB
    separately): observed first-pick frequencies must sit within 5
    binomial sigmas of w_i / sum(w)."""
    import hashlib
    import math as m

    weights = [1, 2, 5, 10, 20, 50, 100, 200]
    tot = sum(weights)
    trials = 4000
    wins = [0] * len(weights)
    for s in range(trials):
        best, best_key = None, None
        for i, w in enumerate(weights):
            h = hashlib.md5(f"{i}:wres:{s}".encode()).hexdigest()
            u = (int(h[:8], 16) + 1) / 4294967296.0
            key = round(m.log(u) / w, 8)
            if best_key is None or (key, -i) > (best_key, -best):
                best, best_key = i, key
        wins[best] += 1
    for i, w in enumerate(weights):
        p = w / tot
        sigma = m.sqrt(trials * p * (1 - p))
        assert abs(wins[i] - trials * p) <= 5 * sigma + 1, (
            i, w, wins[i], trials * p, sigma)
