CREATE TABLE IF NOT EXISTS okavango_delta_04_base (  elephant_density Float32 CODEC(ZSTD(6)),
 h3index UInt64 CODEC(ZSTD(6)),
 is_valid UInt8 CODEC(ZSTD(6)) ) ENGINE ReplacingMergeTree PARTITION BY (h3GetBaseCell(h3index)) ORDER BY (h3index);