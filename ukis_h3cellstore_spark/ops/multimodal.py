"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride in ``binary`` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages (the scale-correct shape: one
Python worker per partition, zero driver involvement, columnar
transfer both ways).

The actual codecs (Pillow/libsndfile/ffmpeg) are NOT available in this
environment, so the decode step is a clearly-marked deterministic
STUB: it derives metadata purely from the payload bytes. The Spark
plumbing — schemas, batch iteration, partitioning — is real and
tested; swapping ``_stub_decode_image`` for a real decoder is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Testing helper: wrap a text column as an opaque binary payload
    (UTF-8 bytes), as a stand-in for real image/audio blobs."""
    return df.select(
        F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def _stub_decode_image(payload: bytes) -> tuple[int, int, int, int, float]:
    """Deterministic fake decode (REAL DECODERS NOT AVAILABLE HERE).

    Derives (n_bytes, width, height, channels, mean_intensity) purely
    from the bytes so tests and oracles are reproducible. Replace with
    e.g. PIL.Image.open for a real deployment.
    """
    n = len(payload)
    width = (n % 640) + 1
    height = (n % 480) + 1
    channels = 3
    mean_intensity = float((n * 2654435761) % 256)
    return n, width, height, channels, mean_intensity


def decode_image_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode stage: binary payload → typed image metadata.

    Arrow-batched; each batch is decoded in one Python call per
    partition chunk. Output schema is fixed (IMAGE_META_SCHEMA)."""

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                n, w, h, c, mi = _stub_decode_image(payload)
                rows.append((int(doc_id), n, w, h, c, mi))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "width",
                    "height",
                    "channels",
                    "mean_intensity",
                ],
            )

    return df.mapInPandas(decode_batches, IMAGE_META_SCHEMA)


def sample_frames_stub(
    df: DataFrame, every_n_bytes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sampling plumbing stub: emit one "frame" row per
    ``every_n_bytes`` slice of the payload — the partitioning/schema
    shape of real video frame extraction (frame payloads stay binary).
    """
    n = F.length(F.col("payload"))
    idx = F.sequence(
        F.lit(0), F.greatest((n - 1) / every_n_bytes, F.lit(0)).cast("int")
    )
    return (
        df.select(F.col(id_col), F.col("payload"), F.explode(idx).alias("frame_no"))
        .withColumn(
            "frame_payload",
            F.col("payload").substr(
                F.col("frame_no") * every_n_bytes + 1, F.lit(every_n_bytes)
            ),
        )
        .select(id_col, "frame_no", "frame_payload")
    )
