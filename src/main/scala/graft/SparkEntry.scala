package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[graft.ops.QueryModule]]: each entry is one operator
  * from SURVEY.md §2 (or a training-data-pipeline extension), runnable as a
  * pure batch DataFrame over `/root/testdata/sf*` and — where the semantics
  * are SQL-expressible — hash-checked against a DuckDB oracle.
  */
object SparkEntry {

  val modules: Seq[QueryModule] =
    Seq(Relational, TextOps, VectorOps, WindowOps, MultimodalOps, DwsOps,
      OrderWide, RetrievalOps, CatalogOps, graft.ads.AdsQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    OrderWide.skuOrderWindow(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_.oracles).reduce(_ ++ _)
}
