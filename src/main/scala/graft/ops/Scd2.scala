package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic SCD Type-2 builders over a keyed changelog: the one-shot
  * window rebuild and the INCREMENTAL batch fold (the lakehouse
  * MERGE-class operation — close open intervals touched by the batch,
  * append the batch's own chains). `OrderWide.scd2Incremental` registers
  * the fold under `q_scd2_history`'s oracle VERBATIM, so the hash gate
  * proves fold ≡ rebuild cross-engine; Scd2Spec proves the same for
  * arbitrary random logs and split points.
  *
  * Contract: per key, every `seq` value in a later batch is STRICTLY
  * GREATER than every seq already in the history (monotone ingest —
  * exactly what a changelog source delivers). Equality is NOT enough:
  * a batch row whose seq ties the history head would be interleaved
  * BEFORE same-seq history rows by the rebuild's tie-break order, while
  * the fold always closes the open interval and appends after — the two
  * diverge (Scd2Spec pins this divergence on an equal-seq split). Rows
  * sharing a (key, seq) pair must therefore arrive in ONE batch, where
  * `order` extends (seq ASC) to a total order among them.
  *
  * Scale: the rebuild is one hash exchange on the key + per-key sorts of
  * chain length. The fold's cost is BATCH-sized, not history-sized: the
  * batch's first-seq-per-key table (≤ batch keys) joins the history on
  * the key — with the history stored key-partitioned (the same layout
  * its window build produced), the close-out touches only matching key
  * partitions and the append is a partition-local union. This is how a
  * 100 TB history stays maintainable: each ingest pays for its batch,
  * never for a rebuild. */
object Scd2 {

  /** One-shot rebuild: every log row becomes a history row with
    * `version_seq`, `effective_from` (its own seq) and `effective_to`
    * (the next version's seq; NULL ⇒ current). */
  def fromLog(log: DataFrame, key: String, seq: String,
      order: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(seq).asc +: order: _*)
    log
      .withColumn("version_seq", row_number().over(w).cast("long"))
      .withColumn("effective_from", col(seq))
      .withColumn("effective_to", lead(col(seq), 1).over(w))
  }

  /** Incremental fold: close the history's open intervals for keys the
    * batch touches (effective_to ← the key's first new seq), then append
    * the batch's own chains with version_seq continuing each key's
    * count. `applyBatch(fromLog(b1), b2) ≡ fromLog(b1 ∪ b2)` under the
    * monotone-ingest contract. */
  def applyBatch(hist: DataFrame, batch: DataFrame, key: String,
      seq: String, order: Seq[Column] = Nil): DataFrame = {
    val firstNew = batch.groupBy(col(key))
      .agg(min(col(seq)).as("__first_new"))
    val closed = hist.join(firstNew, Seq(key), "left")
      .withColumn("effective_to",
        when(col("effective_to").isNull && col("__first_new").isNotNull,
          col("__first_new")).otherwise(col("effective_to")))
      .drop("__first_new")
    val base = hist.groupBy(col(key))
      .agg(max(col("version_seq")).as("__base"))
    val appended = fromLog(batch, key, seq, order)
      .join(base, Seq(key), "left")
      .withColumn("version_seq",
        col("version_seq") + coalesce(col("__base"), lit(0L)))
      .drop("__base")
    closed.unionByName(appended)
  }
}
