package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of queries plus their DuckDB oracle SQL.
  *
  * Contract (driver's correctness gate): for every key in `queries` with a
  * matching key in `oracles`, the Spark result and the DuckDB result of the
  * oracle SQL over the same parquet tables must agree on sorted-by-name
  * columns and hashed values. Keys without an oracle get a weaker
  * rows-only check.
  *
  * Determinism rules used throughout (BASELINE.md caveats):
  *   - money sums go through DECIMAL(18,2) in BOTH engines (double summation
  *     order differs across 32 partitions; decimal addition is exact);
  *   - double sums are only used where every addend is integral (exact in
  *     IEEE754 regardless of order);
  *   - ratios are written as a single textually-identical division so both
  *     engines execute the same IEEE operation sequence;
  *   - timestamps are never emitted raw (testdata `events.ts` is
  *     nanosecond-precision parquet; Spark truncates to micros) — only
  *     second-level derivations (epoch buckets, formatted strings).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
