"""Multimodal-column operators: opaque binary payloads + Pandas-UDF decode.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns with typed metadata. The Spark-side plumbing here is
real — binary column, ``mapInPandas`` over Arrow batches, explicit output
schema, 1->N frame fan-out — while the codec itself is stubbed: the
container has no image/audio libs, so ``_decode_real`` raises
NotImplementedError and the pipeline falls back to a deterministic fake
feature extractor (documented, oracle-matched). Swapping in a real decoder
changes ONE function, not the plan.

The ``media`` frame derives from ``documents``: payload = utf-8 bytes of
``text`` standing in for encoded media; media_type cycles
image/audio/video by doc_id.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .. import tables as T
from .catalog import query

_HEX = "0123456789abcdef"

DECODE_SCHEMA = (
    "doc_id bigint, media_type string, byte_len bigint, content_md5 string,"
    " width bigint, height bigint, n_frames bigint"
)
FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_md5 string"


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, media_type, media_bytes binary).

    The binary column is the contract: downstream operators must treat it
    as opaque (no string ops), exactly how parquet would carry real jpeg/
    wav/mp4 payloads. Partitioning note: at scale, media rows are wide —
    keep ``spark.sql.files.maxPartitionBytes`` sized so one Arrow batch of
    payloads fits executor memory.
    """
    d = T.load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("media_bytes"),
    )


def _decode_real(payload: bytes, media_type: str) -> dict:
    """The real codec hook. Container has no PIL/librosa/av — callers fall
    back to ``_decode_fake``. Replace this body to plug in real decoding."""
    try:
        import PIL.Image  # noqa: F401  (not installed in this container)
    except ImportError as exc:
        raise NotImplementedError("no media codecs in container") from exc
    raise NotImplementedError("real decode not wired")


def _decode_fake(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode (oracle-matched): features derived purely
    from byte length and md5, so DuckDB can verify the plumbing."""
    md5 = hashlib.md5(payload).hexdigest()
    n = len(payload)
    return {
        "byte_len": n,
        "content_md5": md5,
        "width": 16 + n % 64,
        "height": 16 + _HEX.index(md5[0]) * 4,
        "n_frames": 1 + n % 4 if media_type == "video" else 1,
    }


def decode_meta(media: DataFrame) -> DataFrame:
    """mapInPandas decode: one output row per media row.

    Arrow-batched (not row-at-a-time): each partition arrives as a stream
    of pandas DataFrames; features are computed columnar-ish per batch and
    yielded with the declared schema. This is the pattern every real
    decode/resize/feature-extract op at scale follows.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _safe_decode(b, t)
                for b, t in zip(pdf["media_bytes"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(fn, schema=DECODE_SCHEMA)


def _safe_decode(payload: bytes, media_type: str) -> dict:
    try:
        return _decode_real(bytes(payload), media_type)
    except NotImplementedError:
        return _decode_fake(bytes(payload), media_type)


def sample_frames(media: DataFrame) -> DataFrame:
    """mapInPandas frame sampler: 1->N fan-out (video frame extraction
    shape). Demonstrates variable-length batch output — the yielded frame
    count per input row is data-dependent."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mt in zip(
                pdf["doc_id"], pdf["media_bytes"], pdf["media_type"]
            ):
                meta = _safe_decode(bytes(payload), mt)
                for i in range(meta["n_frames"]):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": i,
                            "frame_md5": hashlib.md5(
                                f"{meta['content_md5']}#{i}".encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_md5"])

    return media.mapInPandas(fn, schema=FRAME_SCHEMA)


_META_SQL = f"""
m AS (
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
           END AS media_type,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS content_md5
    FROM documents
), meta AS (
    SELECT doc_id, media_type, byte_len, content_md5,
           16 + byte_len % 64 AS width,
           16 + (strpos('{_HEX}', substr(content_md5, 1, 1)) - 1) * 4 AS height,
           CASE WHEN media_type = 'video' THEN 1 + byte_len % 4 ELSE 1 END
               AS n_frames
    FROM m
)"""


@query(
    "llm_multimodal_decode",
    oracle=f"""
WITH {_META_SQL}
SELECT doc_id, media_type, byte_len, content_md5, width, height, n_frames
FROM meta
""",
    tags=("llm-multimodal",),
)
def llm_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media decode via mapInPandas (stubbed codec, real plumbing)."""
    return decode_meta(media_frame(spark, sf_dir))


@query(
    "llm_multimodal_frame_sample",
    oracle=f"""
WITH {_META_SQL},
fr AS (
    SELECT doc_id, content_md5, unnest(range(0, n_frames)) AS frame_idx
    FROM meta
)
SELECT doc_id, frame_idx,
       md5(content_md5 || '#' || CAST(frame_idx AS VARCHAR)) AS frame_md5
FROM fr
""",
    tags=("llm-multimodal",),
)
def llm_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: data-dependent 1->N fan-out inside mapInPandas."""
    return sample_frames(media_frame(spark, sf_dir))
