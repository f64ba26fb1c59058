"""Benchmark decontamination — SURVEY.md §2.4 training-data hygiene.

A training corpus must not contain benchmark/eval text: before
training, every train document is checked for long-n-gram overlap with
the benchmark set, and flagged docs are dropped or audited. This is the
standard decontamination pass of large-scale pipeline curation (n-gram
collision against held-out sets), expressed Spark-first.

The fixture has no separate benchmark table, so the op treats one
``source`` partition of ``documents`` as the benchmark set and the rest
as the training corpus — the real deployment swaps in an actual eval
table on the benchmark side; the plan is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.llm.dedup import shingle_index
from okera_trino_spark.operators._util import r4, t
from okera_trino_spark.registry import query

#: Fixture stand-in for the benchmark/eval set.
BENCH_SOURCE = "src0"
#: Shingle width: 5-word n-grams — long enough that shared shingles mean
#: copied text, short enough to survive small edits between copies.
NGRAM_K = 5
#: Flag a train doc when it shares at least this many distinct 5-grams
#: with one benchmark doc.
MIN_COMMON = 10


@query(
    "q_llm_decontaminate",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, source,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(str_split_regex(trim(text), ' +')) - {NGRAM_K - 2}, 1)),
                   i -> array_to_string((str_split_regex(trim(text), ' +'))[i:i+{NGRAM_K - 1}], ' ')))) AS shingle
        FROM documents
    ),
    cnt AS (
        SELECT doc_id, count(*) AS n FROM sh WHERE source <> '{BENCH_SOURCE}' GROUP BY doc_id
    ),
    hits AS (
        SELECT tr.doc_id AS train_doc_id, be.doc_id AS bench_doc_id,
               count(*) AS n_common
        FROM sh tr
        JOIN sh be ON tr.shingle = be.shingle
        WHERE tr.source <> '{BENCH_SOURCE}' AND be.source = '{BENCH_SOURCE}'
        GROUP BY 1, 2
    )
    SELECT h.train_doc_id, h.bench_doc_id, h.n_common,
           round(h.n_common * 1.0 / c.n, 4) AS containment
    FROM hits h JOIN cnt c ON h.train_doc_id = c.doc_id
    WHERE h.n_common >= {MIN_COMMON}
    """,
    tags=("llm", "curation", "dedup"),
)
def q_llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing ≥MIN_COMMON
    distinct 5-word n-grams with any benchmark doc, with the containment
    ratio (|∩| / |train shingles|) for triage.

    Scale: the benchmark side is orders of magnitude smaller than the
    corpus (evals are KBs–MBs; the corpus is the 100 TB), so its shingle
    index BROADCASTS — the train side is then a map-side hash probe with
    NO shuffle of corpus data at all; only the surviving (train, bench)
    hit pairs aggregate. Compare: shuffling the corpus's shingle index
    would move ~|words| rows per doc. The per-doc shingle counts reuse
    the same single corpus pass (Catalyst reuses the scan; both branches
    are scan-local explodes).
    """
    d = t(spark, sf_dir, "documents")
    # Three consumers (per-doc counts, the probe side, the broadcast
    # side) read the shingle index — materialize the regex-split +
    # explode once instead of re-running it per consumer (the same
    # share-the-scan rule as ngram_jaccard_pairs / q_llm_dedup_near).
    sh = shingle_index(d, NGRAM_K, extra_cols=("source",)).localCheckpoint()
    train = sh.filter(F.col("source") != BENCH_SOURCE)
    bench = (sh.filter(F.col("source") == BENCH_SOURCE)
             .select(F.col("doc_id").alias("bench_doc_id"), "shingle"))
    cnt = train.groupBy("doc_id").agg(F.count("*").alias("n"))
    hits = (
        train.join(F.broadcast(bench), "shingle")
        .groupBy(F.col("doc_id").alias("train_doc_id"), "bench_doc_id")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= MIN_COMMON)
    )
    return (
        hits.join(cnt, hits.train_doc_id == cnt.doc_id)
        .select("train_doc_id", "bench_doc_id", "n_common",
                r4(F.col("n_common") / F.col("n")).alias("containment"))
    )


# ------------------------------------------------------------- PII scrubbing
#: Ordered redaction patterns (email first: digit runs inside an email
#: must redact as part of the email, not as bare numbers).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("number", r"[0-9]+", "[NUM]"),
]


@query(
    "q_llm_pii_scrub",
    oracle=r"""
    SELECT event_id,
           regexp_replace(
               regexp_replace(props,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '[0-9]+', '[NUM]', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(props,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(regexp_replace(props,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '[0-9]+')) AS INT) AS n_numbers
    FROM events
    WHERE event_id < 5000
    """,
    tags=("llm", "curation", "governance"),
)
def q_llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus PII scrubbing: ordered regex redaction (emails,
    then numeric runs) with per-class counts for the audit trail — the
    standard pre-training scrub pass, and the text-side twin of the
    catalog's column masks (TablePolicy.column_masks).

    Map-only: every redaction is a scan-local regexp_replace chain, no
    shuffle, whole-stage codegen end to end. Order matters and is fixed:
    digits inside an email must be consumed by the email pattern, so
    counts are computed on the progressively-scrubbed text.
    """
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    email_re = PII_PATTERNS[0][1]
    num_re = PII_PATTERNS[1][1]
    # Column-API regex only — embedding the pattern in an F.expr SQL
    # string would eat the '\.' escape (SQL literal unescaping) and
    # silently corrupt the pattern.
    after_email = F.regexp_replace("props", email_re, "[EMAIL]")
    stage = ev.select(
        "event_id", "props", after_email.alias("_after_email"))
    return stage.select(
        "event_id",
        F.regexp_replace("_after_email", num_re, "[NUM]").alias("scrubbed"),
        F.size(F.regexp_extract_all("props", F.lit(email_re), F.lit(0)))
         .cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all("_after_email", F.lit(num_re), F.lit(0)))
         .cast("int").alias("n_numbers"),
    )
