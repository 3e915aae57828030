"""Corpus snapshot versioning operators.

Training corpora are rebuilt continuously (new crawls, re-filters,
takedown requests); the first question after every rebuild is "what
changed?".  ``snapshot_diff`` answers it with a plan that never
shuffles document payloads: each side is reduced to ``(key, 64-bit
content hash)`` *before* the join, so the full-outer join that
classifies rows moves 16 bytes per document instead of the documents
themselves — at 100 TB the diff costs two narrow column scans plus a
key-sized shuffle.

Statuses follow the conventional snapshot-diff contract:

- ``added``     — key present only in the new snapshot
- ``removed``   — key present only in the old snapshot
- ``changed``   — key in both, content hash differs
- ``unchanged`` — key in both, content hash equal

Hash collisions would mark a changed row ``unchanged`` with
probability ~2^-64 per pair; callers that need certainty can pass the
content column itself as ``hash_col`` (full-width shuffle, exact).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    content_cols: Sequence[str] = ("text",),
    hash_col: Column | None = None,
) -> DataFrame:
    """Classify every key across two corpus snapshots.

    Returns ``(key, status string, old_hash long, new_hash long)``
    with one row per key in either snapshot; ``old_hash``/``new_hash``
    are null on the side where the key is absent.
    """
    h = (
        hash_col
        if hash_col is not None
        else F.xxhash64(*[F.col(c) for c in content_cols])
    )
    o = old.select(F.col(key), h.alias("old_hash"))
    n = new.select(F.col(key), h.alias("new_hash"))
    joined = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col(key), status.alias("status"), "old_hash", "new_hash"
    )
