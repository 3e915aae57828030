CREATE TABLE IF NOT EXISTS lry1_04_base (  cnt UInt32 CODEC(ZSTD(6)),
 h3index UInt64 CODEC(ZSTD(6)),
 observed_on DateTime CODEC(ZSTD(6)),
 temp Float32 CODEC(Gorilla) ) ENGINE SummingMergeTree(cnt) PARTITION BY (h3ToParent(h3index, cast(max2(h3GetResolution(h3index) - 2, 0) as UInt8)), toString(toYear(observed_on))) ORDER BY (h3index);