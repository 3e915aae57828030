"""TableSet — the discovered physical pyramid of one tableset.

Mirrors the reference ``TableSet`` (``crates/ukis_h3cellstore/src/
clickhouse/compacted_tables/tableset.rs``): name, base tables keyed by
resolution, compacted tables keyed by resolution, and the
table-selection logic for queries
(``tables_to_satisfy_query_at_resolution``, tableset.rs:153-170): a
query at resolution r reads the base table at r plus every compacted
table at resolution ≤ r.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ukis_h3cellstore_spark.schema import ResolutionMetadata, parse_table_name


@dataclass
class TableSet:
    name: str
    base_resolutions: list[int] = field(default_factory=list)
    compacted_resolutions: list[int] = field(default_factory=list)

    @property
    def max_resolution(self) -> int:
        return max(self.base_resolutions)

    def table_name(self, resolution: int, compacted: bool) -> str:
        return ResolutionMetadata(resolution, compacted).table_name(self.name)

    def all_tables(self) -> list[str]:
        return [self.table_name(r, False) for r in sorted(self.base_resolutions)] + [
            self.table_name(r, True) for r in sorted(self.compacted_resolutions)
        ]

    def tables_to_satisfy_query_at_resolution(
        self, h3_resolution: int
    ) -> list[ResolutionMetadata]:
        """Base table at the query resolution + all compacted ancestors
        (reference tableset.rs:153-170 / SURVEY O6)."""
        if h3_resolution not in self.base_resolutions:
            raise ValueError(
                f"tableset {self.name} has no base resolution {h3_resolution} "
                f"(available: {sorted(self.base_resolutions)})"
            )
        out = [ResolutionMetadata(h3_resolution, False)]
        out.extend(
            ResolutionMetadata(r, True)
            for r in sorted(self.compacted_resolutions)
            if r <= h3_resolution
        )
        return sorted(out)


def group_tables_into_tablesets(table_names: list[str]) -> dict[str, TableSet]:
    """Catalog discovery from raw table names (reference
    ``find_tablesets``, tableset.rs:219-244): parse ``{name}_{res}_
    {base|compacted}``, group by name. Non-matching names are ignored
    (system tables etc.)."""
    out: dict[str, TableSet] = {}
    for t in table_names:
        parsed = parse_table_name(t)
        if parsed is None:
            continue
        name, meta = parsed
        ts = out.setdefault(name, TableSet(name=name))
        if meta.is_compacted:
            ts.compacted_resolutions.append(meta.resolution)
        else:
            ts.base_resolutions.append(meta.resolution)
    # a tableset without any base table is not a tableset
    return {
        n: TableSet(
            n, sorted(set(ts.base_resolutions)), sorted(set(ts.compacted_resolutions))
        )
        for n, ts in out.items()
        if ts.base_resolutions
    }
