CREATE TABLE IF NOT EXISTS sums_03_base (  h3index UInt64 CODEC(ZSTD(6)),
 tag Nullable(String) CODEC(ZSTD(6)),
 v UInt32 CODEC(ZSTD(6)) ) ENGINE SummingMergeTree(v) PARTITION BY (h3GetBaseCell(h3index)) ORDER BY (h3index);