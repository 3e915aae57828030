CREATE TABLE IF NOT EXISTS lry2_07_base (  h3index UInt64 CODEC(LZ4HC(9)),
 observed_on DateTime CODEC(LZ4HC(9)),
 reading UInt32 CODEC(T64) ) ENGINE ReplacingMergeTree PARTITION BY (h3ToParent(h3index, cast(max2(h3GetResolution(h3index) - 4, 0) as UInt8)), toString(floor(toYear(observed_on)/5)*5)) ORDER BY (h3index);