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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def resize_image_stub(
    df: DataFrame,
    target_width: int = 32,
    target_height: int = 32,
    channels: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize plumbing stub (REAL CODECS NOT AVAILABLE HERE): emit a
    payload of exactly ``target_width × target_height × channels``
    bytes per document by deterministic stride-sampling of the source
    bytes (cycling when the source is shorter) — the schema/batch
    shape of a real thumbnailing stage. Arrow-batched ``mapInPandas``;
    swapping the body for PIL's ``Image.resize`` is a one-function
    change."""
    size = target_width * target_height * channels

    def resize_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                src = bytes(payload) if payload else b"\x00"
                out = bytes(src[(i * len(src)) // size] for i in range(size))
                rows.append(
                    (int(doc_id), out, target_width, target_height, channels)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "payload", "width", "height", "channels"],
            )

    return df.mapInPandas(resize_batches, RESIZED_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dim_no", T.IntegerType()),
        T.StructField("feat", T.LongType()),
    ]
)


def extract_features_stub(
    df: DataFrame, dim: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Feature-extraction plumbing stub: one integer feature per
    (document, dimension) — ``int(md5(payload || '|' || dim)[:8], 16)
    mod 1e6`` — the batch shape of a real embedding model scoring
    binary payloads (exploded rows rather than an array column so the
    oracle hash-compares exactly; integers end-to-end). Arrow-batched
    ``mapInPandas``; a real deployment replaces the md5 with an ONNX/
    torch forward pass over the batch."""

    def feat_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                src = bytes(payload) if payload is not None else b""
                for j in range(dim):
                    h = hashlib.md5(src + b"|" + str(j).encode()).hexdigest()
                    rows.append((int(doc_id), j, int(h[:8], 16) % 1_000_000))
            yield pd.DataFrame(rows, columns=["doc_id", "dim_no", "feat"])

    return df.mapInPandas(feat_batches, FEATURE_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def perceptual_hash_stub(
    df: DataFrame, id_col: str = "doc_id", gram: int = 4
) -> DataFrame:
    """Perceptual-hash stage for binary payloads: (id, 60-bit phash).

    REAL DECODERS NOT AVAILABLE HERE, so instead of a DCT over decoded
    pixels this computes a SimHash over the payload's byte ``gram``-
    grams (md5-derived 60-bit feature hashes, sign-summed per bit).
    That preserves the property every perceptual hash exists for —
    similar payloads get NEARBY hashes (near-duplicate media share
    most byte grams → most sign sums agree → small hamming distance) —
    while staying bit-reproducible by the SQL oracle through the same
    md5 idiom the MinHash family uses. Payloads shorter than ``gram``
    bytes emit a NULL phash — they carry no gram signal, and a shared
    sentinel (the old 0) would pair every short payload with every
    other at hamming 0; :func:`phash_dup_pairs` filters NULLs before
    the hamming join, matching the oracle's ``len(text) >= gram``
    predicate on all inputs, not just corpora that happen to lack
    short docs. (Grams are BYTE grams — on non-ASCII payloads they
    differ from char grams by design: media payloads are bytes.)
    Arrow-batched ``mapInPandas`` with a per-partition gram-hash
    cache; swapping in a real DCT pHash is a one-function change."""
    if not 1 <= gram <= 8:
        # validate on the driver: the packed-int gram path needs the
        # gram to fit a u64, and failing here beats a late worker
        # traceback (or no failure at all on short-payload partitions)
        raise ValueError(
            f"perceptual_hash_stub supports 1 <= gram <= 8 bytes, got {gram}"
        )

    def hash_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import numpy as np
        import pandas as pd

        # gram-value -> 60-bit md5 hash, keyed on the gram's packed
        # little-endian integer (x86 byte order == payload byte order,
        # so reconstructing the bytes for hashlib is exact)
        cache: dict[int, int] = {}
        nbytes = gram  # packed-int width in bytes

        def hashes_for(uniq: "np.ndarray") -> "np.ndarray":
            out = np.empty(len(uniq), dtype=np.int64)
            for i, v in enumerate(uniq):
                iv = int(v)
                h = cache.get(iv)
                if h is None:
                    g = iv.to_bytes(nbytes, "little")
                    h = int(hashlib.md5(g).hexdigest()[:15], 16)  # 60 bits
                    cache[iv] = h
                out[i] = h
            return out

        shifts = np.arange(60)
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                m = len(payload) - gram + 1
                if m <= 0:
                    out.append((int(doc_id), None))
                    continue
                # vectorized gram extraction: every length-`gram`
                # window packed into one integer (md5 runs once per
                # UNIQUE gram per partition, not once per occurrence —
                # the old per-slice Python loop paid ~10M hashlib/dict
                # calls per 5k docs)
                a = np.frombuffer(payload, dtype=np.uint8)
                w = np.lib.stride_tricks.sliding_window_view(a, gram)
                packed = (
                    w.astype(np.uint64)
                    << (np.arange(gram, dtype=np.uint64) * 8)
                ).sum(axis=1)
                uniq, counts = np.unique(packed, return_counts=True)
                hs = hashes_for(uniq)
                # per-bit signed sums over occurrences: for each bit j,
                # sum over unique grams of count * (2*bit - 1)
                bits = (hs[:, None] >> shifts) & 1
                acc = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
                ph = 0
                for j in np.nonzero(acc > 0)[0]:
                    ph |= 1 << int(j)
                out.append((int(doc_id), ph))
            pdf_out = pd.DataFrame(out, columns=["doc_id", "phash"])
            # nullable Int64 so the short-payload NULLs survive the
            # Arrow conversion (a plain object/float column would
            # NaN-poison the long target type)
            pdf_out["phash"] = pd.array(pdf_out["phash"], dtype="Int64")
            yield pdf_out

    return df.mapInPandas(hash_batches, PHASH_SCHEMA)


def phash_dup_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    id_col: str = "doc_id",
    pair_budget: int | str | None = None,
    density_policy: str = "tighten",
) -> DataFrame:
    """Near-duplicate media detection: perceptual hashes + the generic
    banded-XOR hamming join — (id_a, id_b, hamming ≤ max_hamming).
    Payloads too short to carry a gram signal come back with NULL
    phashes and are excluded here (they cannot be meaningfully
    compared — see :func:`perceptual_hash_stub`). The hash table is
    checkpointed once; the join is keyed on (band, strip value),
    never corpus².

    ``pair_budget`` arms the DENSITY PRE-FLIGHT (``ops.dedup.
    hamming_density_probe``): a sampled inter-print hamming
    distribution predicts the true pair volume, and ``max_hamming``
    is tightened to the largest threshold whose prediction fits the
    budget (``"auto"`` = the probe's own ``max(50·n, 1e7)`` default;
    ``density_policy='fail'`` raises instead of tightening). This is
    the in-engine answer to the 1M dense-print smoke where an
    unpriced threshold quarantined 58% of the corpus (docs/
    SCALE.md): the guard costs one bounded O(sample²) probe, not a
    quadratic join. Default None keeps the historical unguarded
    behavior (what the fixed-threshold gates pin)."""
    from ukis_h3cellstore_spark.ops.dedup import guided_max_hamming, hamming_pairs

    ph = (
        perceptual_hash_stub(df, id_col)
        .filter(F.col("phash").isNotNull())
        .localCheckpoint(eager=False)
    )
    if pair_budget is not None:
        max_hamming = guided_max_hamming(
            ph,
            "phash",
            id_col="doc_id",
            requested=max_hamming,
            pair_budget=None if pair_budget == "auto" else pair_budget,
            policy=density_policy,
        )
    return hamming_pairs(
        ph, fp_col="phash", id_col="doc_id", bits=64, max_hamming=max_hamming
    )
