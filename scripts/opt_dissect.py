#!/usr/bin/env python
"""Phase-level timing for the iterative/multi-job headline keys (r15).

bench.py tells us WHAT a key costs; opt_profile.py tells us how many
jobs it schedules; this tool times the phases INSIDE the expensive keys
(driver collects, checkpoint materializations, final action) so the
optimization targets the phase that actually dominates.

    python scripts/opt_dissect.py kmeans bpe dsir

Each dissection mirrors the key's implementation exactly (same
functions, same constants) with timers between phases; it never changes
what is computed.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_t0 = 0.0


def tick(label: str = "") -> None:
    global _t0
    now = time.perf_counter()
    if label:
        print(f"    {label:44s} {now - _t0:7.3f}s", flush=True)
    _t0 = now


def dissect_kmeans(spark):
    # r16: mirrors the CURRENT implementation (r15 parsed-expr mean
    # aggs + _kmeans_assign) — the previous version rebuilt the r14
    # per-dim Column aggregates and overstated the key ~2x.
    from pyspark.sql import functions as F

    from okera_trino_spark.llm.similarity import (
        DIM, KMEANS_ITERS, KMEANS_K, _kmeans_assign,
    )
    from okera_trino_spark.operators._util import t

    e = t(spark, SF_DIR, "embeddings")
    tick()
    cent = {int(r.vec_id): [float(x) for x in r.embedding]
            for r in e.filter(F.col("vec_id") < KMEANS_K).collect()}
    tick("init collect")
    mean_aggs = [F.expr(f"round(avg(CAST(embedding[{i}] AS DOUBLE)), 6) "
                        f"AS m{i}") for i in range(DIM)]
    for it in range(KMEANS_ITERS):
        best = _kmeans_assign(e, cent)
        tick(f"iter{it}: build assign expr")
        rows = (e.withColumn("_c", best["c"])
                .groupBy("_c").agg(*mean_aggs).collect())
        tick(f"iter{it}: agg+collect")
        cent = {int(r["_c"]): [float(r[f"m{i}"]) for i in range(DIM)]
                for r in rows}
    out = (e.withColumn("_a", _kmeans_assign(e, cent))
           .select("vec_id", F.col("_a.c").alias("cluster_id"),
                   F.col("_a.d2").alias("dist2")))
    out = out.select("vec_id", "cluster_id", F.round("dist2", 4))
    tick("final: build")
    out.count()
    tick("final: count")


def dissect_bpe(spark):
    # r16: the real key (q_llm_bpe_apply) takes the driver fast path at
    # fixture vocabulary sizes — bpe_learn_tok's probe collect + python
    # loop + bpe_apply(tok_vocab=...). Dissect THAT first; the
    # distributed learn loop below is kept for the above-budget path.
    from pyspark.sql import functions as F

    from okera_trino_spark.llm.text import (_apply_merge, _words,
                                            bpe_apply, bpe_learn_tok)
    from okera_trino_spark.operators._util import t

    docs = t(spark, SF_DIR, "documents")
    tick()
    learned, tok_vocab = bpe_learn_tok(docs, n_merges=10)
    tick("fast path: bpe_learn_tok (probe collect + py loop)")
    out = bpe_apply(docs, [(l, r) for _, l, r, _ in learned],
                    tok_vocab=tok_vocab)
    tick("fast path: apply build")
    out.count()
    tick("fast path: apply count (join + stitch)")

    # distributed-loop shape (the > BPE_DRIVER_VOCAB_MAX path)
    vocab = (
        docs.select(F.explode(_words(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("freq"))
        .select("word", F.split("word", "").alias("seq"), "freq")
        .localCheckpoint()
    )
    tick("distributed learn: vocab checkpoint (eager)")
    merges = []
    for step in range(1, 11):
        pairs = vocab.select(
            "freq",
            F.explode(F.expr(
                "CASE WHEN size(seq) >= 2 THEN "
                "transform(sequence(1, size(seq) - 1), "
                "i -> struct(seq[i - 1] AS l, seq[i] AS r)) "
                "ELSE CAST(array() AS array<struct<l string, r string>>) "
                "END")).alias("p"))
        top = (
            pairs.groupBy("p").agg(F.sum("freq").alias("w"))
            .orderBy(F.col("w").desc(), F.col("p.l"), F.col("p.r"))
            .limit(1).collect()
        )
        left, right = top[0]["p"]["l"], top[0]["p"]["r"]
        merges.append((left, right))
        vocab = vocab.select(
            _apply_merge(F.col("seq"), left, right).alias("seq"),
            "freq").localCheckpoint(eager=False)
        tick(f"learn: round {step} (explode+agg+top1)")
    out = bpe_apply(docs, merges)
    tick("apply: build")
    out.count()
    tick("apply: count (vocab fold + join + stitch)")


def dissect_dsir(spark):
    from okera_trino_spark.registry import load_all_queries

    specs = load_all_queries()
    tick()
    df = specs["q_llm_dsir"].fn(spark, SF_DIR)
    tick("build")
    df.count()
    tick("count")


def dissect_near(spark):
    from pyspark.sql import functions as F

    from okera_trino_spark.llm.dedup import (
        _prune_index_to_candidates, lsh_candidate_pairs,
        minhash_signatures, shingle_index,
    )
    from okera_trino_spark.operators._util import t

    d = t(spark, SF_DIR, "documents")
    tick()
    sh = shingle_index(d, 3).localCheckpoint()
    tick("shingle index checkpoint (eager)")
    cands = lsh_candidate_pairs(minhash_signatures(d, sh=sh)) \
        .localCheckpoint(eager=False)
    cand_docs = (cands.select(F.col("doc_a").alias("doc_id"))
                 .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
                 .distinct())
    shc = _prune_index_to_candidates(sh, cand_docs) \
        .localCheckpoint(eager=False)
    cnt = shc.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = shc.alias("a"), shc.alias("b")
    common = (
        cands.join(a, F.col("doc_a") == F.col("a.doc_id"))
        .join(b, (F.col("doc_b") == F.col("b.doc_id"))
              & (F.col("a.shingle") == F.col("b.shingle")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common")))
    ca, cb = cnt.alias("ca"), cnt.alias("cb")
    jac = F.col("common") / (F.col("ca.n") + F.col("cb.n") - F.col("common"))
    out = (common.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
           .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
           .filter(jac >= 0.5)
           .select("doc_a", "doc_b"))
    tick("build rest")
    out.count()
    tick("count (cands+prune+verify)")


def dissect_semdedup_kmeans(spark):
    from okera_trino_spark.registry import load_all_queries

    specs = load_all_queries()
    tick()
    df = specs["q_llm_semdedup_kmeans"].fn(spark, SF_DIR)
    tick("build (count + init collect + 2 Lloyd collects)")
    df.count()
    tick("count (checkpoint + pairs + join)")


DISSECTIONS = {
    "kmeans": dissect_kmeans,
    "bpe": dissect_bpe,
    "dsir": dissect_dsir,
    "near": dissect_near,
    "semdedup_kmeans": dissect_semdedup_kmeans,
}


def main() -> None:
    from bench import _release_persisted
    from okera_trino_spark.session import get_spark

    names = sys.argv[1:] or list(DISSECTIONS)
    spark = get_spark("okera-trino-spark-opt-dissect")
    for name in names:
        fn = DISSECTIONS[name]
        for rnd in range(3):  # round 0 = warm-up (JIT/footers)
            print(f"[{name}] pass {rnd}{' (warm-up)' if rnd == 0 else ''}:",
                  flush=True)
            tick()
            fn(spark)
            _release_persisted(spark)


if __name__ == "__main__":
    main()
