CREATE TABLE IF NOT EXISTS bcm12_03_base (  h3index UInt64 CODEC(ZSTD(6)),
 note Nullable(String) CODEC(ZSTD(22)),
 observed_on DateTime CODEC(ZSTD(6)) ) ENGINE ReplacingMergeTree PARTITION BY (h3GetBaseCell(h3index), toString(ceil(((toYear(observed_on) * 100) + (100 * (toMonth(observed_on) - 1) / 12)) / 12))) ORDER BY (h3index);