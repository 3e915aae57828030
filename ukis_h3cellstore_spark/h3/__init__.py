"""Pure-Python + Spark-native H3 index operations.

Implemented from the public H3 index bit layout specification
(https://h3geo.org/docs/core-library/h3Indexing) — no external ``h3``
library is required. The hierarchy operations (resolution, parent,
base cell, children, compact, uncompact) are exact integer bit
arithmetic; the geographic operations live in
:mod:`ukis_h3cellstore_spark.h3.geo`.
"""

from ukis_h3cellstore_spark.h3.cells import (
    MAX_RESOLUTION,
    PENTAGON_BASE_CELLS,
    cell_to_children,
    cell_to_children_count,
    cell_to_parent,
    change_resolution,
    compact_cells,
    get_base_cell,
    get_resolution,
    is_pentagon,
    is_valid_cell,
    uncompact_cells,
)

__all__ = [
    "MAX_RESOLUTION",
    "PENTAGON_BASE_CELLS",
    "cell_to_children",
    "cell_to_children_count",
    "cell_to_parent",
    "change_resolution",
    "compact_cells",
    "get_base_cell",
    "get_resolution",
    "is_pentagon",
    "is_valid_cell",
    "uncompact_cells",
]
