CREATE TABLE IF NOT EXISTS aggs_04_base (  h3index UInt64 CODEC(ZSTD(6)),
 state Float64 CODEC(Gorilla) ) ENGINE AggregatingMergeTree PARTITION BY (h3GetBaseCell(h3index)) ORDER BY (h3index);