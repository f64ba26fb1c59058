"""Multimodal column plumbing — SURVEY.md §2.4 L5.

Convention: media travels as an opaque ``binary`` payload column plus a
typed metadata struct (modality, codec, dims…). Decode / feature
extraction runs as Arrow-batched ``mapInPandas`` — the only sane shape
for Python codecs on Spark: batches stream through the Python worker
with bounded memory, partitioning is preserved, and the JVM plan above
and below stays columnar.

The actual image/audio codecs are NOT in this container, so
``decode_media`` dispatches: ``codec="raw-fake"`` is a real,
deterministic decoder used by tests; anything else raises
NotImplementedError at the exact spot a PIL/ffmpeg call would go. The
Spark-side plumbing (schemas, batch iteration, partition behavior) is
fully real and tested either way.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from okera_trino_spark.operators._util import t
from okera_trino_spark.registry import query

#: Output schema of the decode stage (stable across codecs).
DECODE_SCHEMA = (
    "doc_id BIGINT, modality STRING, width INT, height INT, "
    "n_bytes INT, mean_intensity DOUBLE"
)


def make_media_frame(docs: DataFrame) -> DataFrame:
    """Synthesize the multimodal layout from the documents fixture:
    payload = utf-8 bytes of the text standing in for encoded media,
    metadata = typed struct. At 100 TB the payload column stays opaque
    binary in parquet — scans that don't decode never read it (column
    pruning), which is the entire point of the layout."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("raw-fake").alias("codec"),
            F.length(F.col("text")).alias("n_bytes"),
        ).alias("media_meta"),
    )


def _decode_one(payload: bytes, codec: str) -> tuple[int, int, float]:
    """Decode one payload → (width, height, mean_intensity).

    raw-fake: deterministic stand-in — width = floor(sqrt(n)), height =
    n // width, intensity = mean byte value. Real codecs go where the
    NotImplementedError is raised.
    """
    if codec == "raw-fake":
        n = len(payload)
        width = max(int(n ** 0.5), 1)
        height = max(n // width, 1)
        mean = (sum(payload) / n) if n else 0.0
        return width, height, mean
    # Real decode would be: PIL.Image.open(io.BytesIO(payload)) etc.
    raise NotImplementedError(f"codec {codec!r}: media codecs unavailable in this environment")


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas streams pandas batches through
    the Python worker; output rows stay 1:1 with input (no shuffle)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, m = [], [], []
            for payload, meta in zip(pdf["payload"], pdf["media_meta"]):
                width, height, mean = _decode_one(bytes(payload), meta["codec"])
                w.append(width)
                h.append(height)
                m.append(mean)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "modality": [meta["modality"] for meta in pdf["media_meta"]],
                "width": pd.array(w, dtype="int32"),
                "height": pd.array(h, dtype="int32"),
                "n_bytes": pd.array([len(bytes(p)) for p in pdf["payload"]], dtype="int32"),
                "mean_intensity": m,
            })

    return media.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


@query(
    "q_llm_multimodal",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS payload_bytes,
           md5(text) AS payload_md5,
           'image' AS modality
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def q_llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 multimodal layout plumbing, oracle-checked on the parts both
    engines can compute (payload byte length + checksum + metadata
    field). The mapInPandas decode stage is exercised by
    tests/test_llm.py (deterministic fake codec)."""
    media = make_media_frame(t(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        F.length(F.col("payload")).alias("payload_bytes"),
        F.md5(F.col("payload")).alias("payload_md5"),
        F.col("media_meta.modality").alias("modality"),
    )


# ------------------------------------------------- frame sampling / resize
FRAME_BYTES = 64      #: fake-video convention: 1 frame = 64 payload chars
                      #  (chars, not bytes: DuckDB substring is varchar-only,
                      #  and char slicing agrees across engines for any UTF-8)
SAMPLE_EVERY = 4      #: keep every 4th frame


@query(
    "q_llm_frame_sample",
    oracle=f"""
    WITH media AS (
        SELECT doc_id, text, length(text) // {FRAME_BYTES} AS n_frames
        FROM documents
    )
    SELECT m.doc_id, f.frame_idx,
           md5(substring(m.text, f.frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES}))
             AS frame_md5
    FROM media m
    -- spine cap: 1000 frames = {FRAME_BYTES}k chars/doc, ~100x the
    -- fixture max (9 frames); regenerate if docs ever grow past it
    JOIN (SELECT unnest(range(0, 1000, {SAMPLE_EVERY})) AS frame_idx) f
      ON f.frame_idx < m.n_frames
    """,
    tags=("llm", "multimodal"),
)
def q_llm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 frame sampling: treat the payload as fixed-size frames and
    keep every SAMPLE_EVERY-th one — the video keyframe-extraction shape
    (one output row per sampled frame). Entirely JVM expressions:
    sequence + explode for indices, substring on binary for the slice —
    NO Python worker in the loop (a codec-backed variant would swap the
    substring for mapInPandas like decode_media; the row shape and
    partition behavior are identical).

    Scale: one scan-local expand per doc, |frames|/4 rows out, no
    shuffle; column pruning means only sampled payloads are sliced.
    """
    d = t(spark, sf_dir, "documents")
    n_frames = (F.char_length("text") / FRAME_BYTES).cast("int")
    idx = F.explode(
        F.when(n_frames > 0,
               F.sequence(F.lit(0), n_frames - 1, F.lit(SAMPLE_EVERY)))
        .otherwise(F.array().cast("array<int>"))
    ).alias("frame_idx")
    frames = d.select("doc_id", "text", idx)
    frame = F.expr(f"substring(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})")
    return frames.select("doc_id", "frame_idx",
                         F.md5(F.encode(frame, "UTF-8")).alias("frame_md5"))


RESIZE_SCHEMA = "doc_id BIGINT, width INT, height INT, payload BINARY"


def resize_media(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Arrow-batched resize: mapInPandas, 1:1 rows, bounded memory.
    raw-fake codec resizes by deterministic byte striding to exactly
    target_w*target_h bytes (repeating the payload if too short); a real
    image codec (PIL thumbnail) drops in at the marked line."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = target_w * target_h
        for pdf in batches:
            out = []
            for payload, meta in zip(pdf["payload"], pdf["media_meta"]):
                raw = bytes(payload)
                if meta["codec"] != "raw-fake":
                    # Real resize would be: PIL.Image.open(...).resize(...)
                    raise NotImplementedError(
                        f"codec {meta['codec']!r}: media codecs unavailable")
                reps = (n // max(len(raw), 1)) + 1
                out.append((raw * reps)[:n])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": pd.array([target_w] * len(pdf), dtype="int32"),
                "height": pd.array([target_h] * len(pdf), dtype="int32"),
                "payload": out,
            })

    return media.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)


# ----------------------------------------------------- feature extraction
FEATURE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, mean_byte DOUBLE, std_byte DOUBLE, "
    "printable_ratio DOUBLE"
)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Feature extraction over opaque payloads — the L5 step between
    decode and model input: per-payload byte statistics computed with
    VECTORIZED numpy over Arrow batches (mapInPandas). This is the
    reference shape for real featurizers (CLIP embeddings, mel
    spectrograms): payload bytes → fixed-width numeric features, 1:1
    rows, no shuffle, bounded batch memory. The numpy path is the
    point — per-element Python loops over payload bytes would be
    100×+ slower at real payload sizes.
    """
    import numpy as np

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n, mean, std, printable = [], [], [], []
            for payload in pdf["payload"]:
                a = np.frombuffer(bytes(payload), dtype=np.uint8)
                k = a.size
                n.append(k)
                mean.append(float(a.mean()) if k else 0.0)
                std.append(float(a.std()) if k else 0.0)
                printable.append(
                    float(((a >= 32) & (a < 127)).mean()) if k else 0.0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pd.array(n, dtype="int64"),
                "mean_byte": mean,
                "std_byte": std,
                "printable_ratio": printable,
            })

    return media.mapInPandas(feature_batches, schema=FEATURE_SCHEMA)


@query(
    "q_llm_media_features",
    oracle="""
    WITH chars AS (
        SELECT doc_id, ascii(c) AS b
        FROM (SELECT doc_id, unnest(str_split(text, '')) AS c FROM documents)
    )
    SELECT doc_id,
           count(*) AS n_bytes,
           round(avg(b), 4) AS mean_byte,
           round(stddev_pop(b), 4) AS std_byte,
           round(avg(CASE WHEN b >= 32 AND b < 127 THEN 1.0 ELSE 0.0 END), 4)
               AS printable_ratio
    FROM chars GROUP BY doc_id
    """,
    tags=("llm", "multimodal", "features"),
)
def q_llm_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 feature extraction, value-checked: byte statistics of every
    payload through the Arrow-batched featurizer, compared against a
    char-level DuckDB oracle (payloads are UTF-8 of the ASCII fixture
    text, so byte values == char codes — asserted in tests). Rounded to
    4dp on both sides for float stability."""
    media = make_media_frame(t(spark, sf_dir, "documents"))
    feats = extract_media_features(media)
    return feats.select(
        "doc_id", "n_bytes",
        F.round("mean_byte", 4).alias("mean_byte"),
        F.round("std_byte", 4).alias("std_byte"),
        F.round("printable_ratio", 4).alias("printable_ratio"),
    )
