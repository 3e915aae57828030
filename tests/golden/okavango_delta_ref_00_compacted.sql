CREATE TABLE IF NOT EXISTS okavango_delta_00_compacted (  elephant_density Float32 CODEC(Delta(1)),
 h3index UInt64 CODEC(ZSTD(6)),
 observed_on DateTime CODEC(ZSTD(6)) ) ENGINE ReplacingMergeTree PARTITION BY (h3GetBaseCell(h3index), toString(ceil(((toYear(observed_on) * 100) + (100 * (toMonth(observed_on) - 1) / 12)) / 1))) ORDER BY (h3index, observed_on);