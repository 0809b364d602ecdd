"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed via Arrow-batched mapInPandas.

The real decoders (PIL/ffmpeg/soundfile) are not in this container, so
the decode step is STUBBED: ``decode=deterministic`` computes fake but
deterministic metadata from the bytes (so the Spark-side plumbing —
schema, batching, UDF signature — is fully real and oracle-testable);
``decode=real`` raises NotImplementedError at the exact point a
production deployment would plug in the codec.

Scale design: mapInPandas streams Arrow batches through Python with no
driver collect; payload columns stay opaque until the last stage, so
Catalyst prunes them away from every query that only needs metadata.
Partitioning: repartition by a content-hash prefix before decode to
spread hot shards.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sayn_spark.functions.registry import T, register

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
    ]
)


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a BINARY payload column (utf-8 bytes of the text column —
    the testdata has no real media, so bytes stand in for image data)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8").cast(BinaryType()))


def decode_image_metadata(df: DataFrame, decode: str = "deterministic") -> DataFrame:
    """Arrow-batched decode: BINARY payload -> typed image metadata.

    ``decode='real'`` is the production hook (PIL.Image.open over
    io.BytesIO per row) — unavailable here, raises NotImplementedError.
    ``decode='deterministic'`` derives metadata purely from the bytes:
      width = n_bytes % 640, height = (n_bytes * 7) % 480, channels = 3
    so results are oracle-checkable.
    """
    if decode == "real":
        raise NotImplementedError(
            "real image decode requires PIL/libjpeg, not present in this container; "
            "plug PIL.Image.open into _decode_batch and drop the stub"
        )

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "content_md5": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "width": n_bytes % 640,
                    "height": (n_bytes * 7) % 480,
                    "channels": 3,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_decode_batch, IMAGE_META_SCHEMA)


@register(
    "q_multimodal_image_meta",
    oracle="""
SELECT doc_id,
       n_chars AS n_bytes,
       md5(text) AS content_md5,
       n_chars % 640 AS width,
       (n_chars * 7) % 480 AS height,
       3 AS channels
FROM documents
""",
)
def q_multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: text -> utf-8 payload -> mapInPandas
    'decode' -> typed metadata.  The oracle recomputes the deterministic
    stub in SQL (n_chars == utf-8 byte length for this ascii corpus), so
    the whole Arrow round-trip is value-checked.
    """
    d = T(spark, sf_dir, "documents")
    return decode_image_metadata(with_payload(d))


@register(
    "q_multimodal_frame_sample",
    oracle="""
WITH d AS (
  SELECT doc_id, octet_length(encode(text)) // 100 AS n_frames, md5(text) AS ph
  FROM documents
)
SELECT doc_id,
       unnest(generate_series(0, n_frames - 1, 10)) AS frame_idx,
       md5(ph || '|' || CAST(unnest(generate_series(0, n_frames - 1, 10)) AS VARCHAR))
           AS frame_md5
FROM d
WHERE n_frames > 0
""",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: treat each payload as a 'video' whose
    frame count = n_bytes div 100; emit one row per sampled frame (every
    10th), with deterministic frame hashes md5(md5(payload)|frame_idx) —
    string-keyed so the DuckDB oracle can recompute them (DuckDB md5
    takes VARCHAR only).  Demonstrates 1->N mapInPandas expansion with a
    stable schema."""
    d = with_payload(T(spark, sf_dir, "documents"))

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame_md5", StringType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // 100
                payload_hash = hashlib.md5(bytes(payload)).hexdigest()
                for idx in range(0, n_frames, 10):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_md5"].append(
                        hashlib.md5(f"{payload_hash}|{idx}".encode()).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return d.select("doc_id", "payload").mapInPandas(_sample, schema)


@register(
    "q_multimodal_features",
    oracle="""
SELECT doc_id, dim,
       (('0x' || substr(md5(md5(text) || '|' || CAST(dim AS VARCHAR)), 1, 8))::BIGINT % 1000)
           / 1000.0 AS feature
FROM documents, (SELECT unnest(generate_series(0, 7)) AS dim)
WHERE doc_id < 100
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: an
    8-dim deterministic 'embedding' derived from the content hash (the
    stub for a real image/audio encoder — same Arrow plumbing, schema
    and batch shape; swap the hash for a model forward pass).
    """
    import numpy as np
    from pyspark.sql.types import DoubleType

    d = with_payload(T(spark, sf_dir, "documents").where(F.col("doc_id") < 100))

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("dim", LongType()),
            StructField("feature", DoubleType()),
        ]
    )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "dim": [], "feature": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                content = hashlib.md5(bytes(payload)).hexdigest()
                for dim in range(8):
                    h = hashlib.md5(f"{content}|{dim}".encode()).hexdigest()
                    rows["doc_id"].append(doc_id)
                    rows["dim"].append(dim)
                    rows["feature"].append((int(h[:8], 16) % 1000) / 1000.0)
            yield pd.DataFrame(rows)

    return d.select("doc_id", "payload").mapInPandas(_featurize, schema)


def resize_images(df: DataFrame, width: int, height: int, decode: str = "deterministic") -> DataFrame:
    """Resize stub: production would decode+resample per row (PIL) inside
    the same Arrow batching; here the deterministic path re-emits the
    payload with updated metadata so the 1:1 mapInPandas shape is real."""
    if decode == "real":
        raise NotImplementedError(
            "real resize requires PIL; plug Image.open(...).resize((w,h)) into _resize"
        )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"],
                    "width": width,
                    "height": height,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_resize, schema)


_AUDIO_W = 200  # samples per analysis window
_AUDIO_H = 100  # hop (50% overlap)


@register(
    "q_multimodal_audio_energy",
    oracle=f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS n FROM documents WHERE doc_id % 20 = 0
),
wins AS (
  SELECT doc_id, text,
         unnest(generate_series(0, (n - {_AUDIO_W}) // {_AUDIO_H})) AS window_idx
  FROM d WHERE n >= {_AUDIO_W}
)
SELECT doc_id, window_idx,
       CAST(list_sum(list_transform(generate_series(1, {_AUDIO_W}),
         i -> (ord(substr(text, window_idx * {_AUDIO_H} + i, 1)) - 100)
            * (ord(substr(text, window_idx * {_AUDIO_H} + i, 1)) - 100))) AS BIGINT)
         AS energy
FROM wins
""",
)
def q_multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style windowed energy: treat each payload as a PCM sample
    stream (1 byte = 1 sample here; s16le in production is one dtype
    change) and compute per-window integer energy sum((s-100)^2) over
    200-sample windows with 50% overlap — the framing every audio
    featurizer (VAD, loudness filter, spectral pipeline) starts with.

    Spark side is the production pattern: numpy over Arrow batches in
    mapInPandas (np.frombuffer + stride windows — vectorised, no
    per-sample Python), one task per input split, output fan-out
    ~n_windows per clip.  Energies are exact integers, so the char-math
    SQL oracle hash-matches bit-for-bit.  The decode boundary for real
    codecs stays behind resize_images' documented stub.
    """
    import numpy as np

    d = (
        T(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 20 == 0)
        .select("doc_id", "text")
    )

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "window_idx": [], "energy": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                s = np.frombuffer(text.encode("ascii"), dtype=np.uint8).astype(np.int64)
                n = len(s)
                if n < _AUDIO_W:
                    continue
                dev = (s - 100) ** 2
                csum = np.concatenate(([0], np.cumsum(dev)))
                n_wins = (n - _AUDIO_W) // _AUDIO_H + 1
                starts = np.arange(n_wins) * _AUDIO_H
                energies = csum[starts + _AUDIO_W] - csum[starts]
                rows["doc_id"].extend([doc_id] * n_wins)
                rows["window_idx"].extend(range(n_wins))
                rows["energy"].extend(int(e) for e in energies)
            yield pd.DataFrame(rows, columns=["doc_id", "window_idx", "energy"])

    return d.mapInPandas(_energy, schema="doc_id long, window_idx long, energy long")
