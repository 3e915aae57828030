CREATE TABLE IF NOT EXISTS lrm2_02_compacted (  h3index UInt64 CODEC(ZSTD(6)),
 observed_on DateTime CODEC(DoubleDelta),
 val Float64 CODEC(ZSTD(6)) ) ENGINE ReplacingMergeTree PARTITION BY (h3ToParent(h3index, cast(max2(h3GetResolution(h3index) - 5, 0) as UInt8)), toString(ceil(((toYear(observed_on) * 100) + (100 * (toMonth(observed_on) - 1) / 12)) / 6))) ORDER BY (h3index);