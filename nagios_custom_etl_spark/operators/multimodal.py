"""Multimodal columns (SURVEY §2.12 X5): image/audio/video as opaque
``binary`` payloads with typed metadata, processed by Arrow-batched
``mapInPandas`` operators.

The Spark-side plumbing — declared schemas, partition-preserving batch
iterators, bounded batch sizes — is real and tested. The codec itself is
STUBBED: this container has no image/audio libraries, so ``codec="fake"``
derives deterministic pseudo-features from the bytes (testable end to
end) and ``codec="real"`` raises NotImplementedError where PIL/ffmpeg
would be called.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("source", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("magic_hex", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), True),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: treat each document's bytes as an opaque media payload with
    typed metadata — the schema contract real media tables would carry."""
    payload = F.encode("text", "UTF-8")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.when(F.col("n_chars") % 2 == 0, "image/png")
            .otherwise("audio/wav")
            .alias("mime"),
            F.col("source").alias("source"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decode: pseudo width/height and
    a checksum derived from the bytes."""
    if payload is None:
        return (0, 0, 0)
    checksum = 0
    for b in payload[:256]:
        checksum = (checksum * 131 + b) % (1 << 31)
    width = 64 + checksum % 1920
    height = 64 + (checksum // 7) % 1080
    return (width, height, checksum)


def extract_features(media: DataFrame, codec: str = "fake", batch_size: int = 1024) -> DataFrame:
    """Decode/feature-extract over Arrow batches (mapInPandas).

    The iterator shape keeps memory bounded: one pandas batch in flight
    per task regardless of partition size. ``codec="real"`` is the hook
    where PIL / torchaudio / ffmpeg decode would run per batch.
    """
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec {codec!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "real media decode requires image/audio libraries not in "
                    "this environment; use codec='fake' or install a codec"
                )
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] if m is not None else None for m in pdf["meta"]],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "magic_hex": [
                        p[:4].hex() if p is not None else None for p in pdf["payload"]
                    ],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "checksum": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing: one output row per sampled offset —
    demonstrates the 1→N explode shape of video frame extraction with
    bounded fan-out, as pure built-ins (no UDF needed for the slicing)."""
    n = F.least(
        F.floor(F.col("meta.n_bytes") / every_n_bytes).cast("int") + 1, F.lit(max_frames)
    )
    idx = F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_no")
    return media.select("media_id", idx, F.col("meta.n_bytes").alias("n_bytes")).select(
        "media_id",
        "frame_no",
        (F.col("frame_no") * every_n_bytes).alias("byte_offset"),
    )


def checksum_arrow(media: DataFrame, batch_size: int = 1024) -> DataFrame:
    """The same batch-iterator contract on ``mapInArrow`` — RecordBatches
    with zero pandas materialization. For binary-heavy columns this skips
    the Arrow->pandas->Arrow copy mapInPandas pays (object-dtype boxing of
    every payload), which is the dominant cost when the per-row compute is
    trivial; use it when the kernel can stay on Arrow buffers.
    """
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            payloads = batch.column(batch.schema.get_field_index("payload"))
            sums = [
                (sum(buf.as_py() or b"") & 0x7FFFFFFF) if buf.is_valid else None
                for buf in payloads
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("media_id")),
                    pa.array(sums, type=pa.int64()),
                ],
                names=["media_id", "byte_sum"],
            )

    return media.mapInArrow(run, "media_id long, byte_sum long")
