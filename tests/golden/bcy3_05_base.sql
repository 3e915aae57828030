CREATE TABLE IF NOT EXISTS bcy3_05_base (  h3index UInt64 CODEC(ZSTD(6)),
 observed_on DateTime CODEC(ZSTD(6)),
 sensor UInt16 CODEC(ZSTD(6)) ) ENGINE AggregatingMergeTree PARTITION BY (h3GetBaseCell(h3index), sensor, toString(floor(toYear(observed_on)/3)*3)) ORDER BY (h3index, observed_on);