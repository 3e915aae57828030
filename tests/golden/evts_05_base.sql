CREATE TABLE IF NOT EXISTS evts_05_base (  h3index UInt64 CODEC(ZSTD(6)),
 observed_on DateTime CODEC(ZSTD(6)),
 v Float64 CODEC(ZSTD(6)) ) ENGINE ReplacingMergeTree PARTITION BY (h3ToParent(h3index, cast(max2(h3GetResolution(h3index) - 3, 0) as UInt8)), toString(floor(toYear(observed_on)/2)*2)) ORDER BY (h3index);