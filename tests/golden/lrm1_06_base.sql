CREATE TABLE IF NOT EXISTS lrm1_06_base (  h3index UInt64 CODEC(ZSTD(6)),
 hits UInt64 CODEC(Delta(4)),
 observed_on DateTime CODEC(ZSTD(6)) ) ENGINE ReplacingMergeTree PARTITION BY (h3ToParent(h3index, cast(max2(h3GetResolution(h3index) - 1, 0) as UInt8)), toString(ceil(((toYear(observed_on) * 100) + (100 * (toMonth(observed_on) - 1) / 12)) / 1))) ORDER BY (h3index);