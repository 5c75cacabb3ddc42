package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for fact⋈fact joins: salt the skewed (fact) side's key
  * with a random-but-deterministic shard, replicate the other side across
  * all shards, join on (key, salt). AQE's skew-join split handles
  * sort-merge cases at runtime; explicit salting remains the tool when the
  * skew is known a priori (a celebrity key, a null-heavy FK) or the join
  * isn't SMJ — at 1000 executors one hot key otherwise serializes the
  * stage.
  */
object Salting {

  /** Join `facts ⋈ other` on `key` with `shards`-way salting.
    * The salt only steers shuffle placement — every fact row meets the full
    * `other` row-set for its key, so the JOIN RESULT is salt-invariant
    * (replay-safe) even though the salt itself is partition-dependent.
    *
    * Salt-invariance holds only for join types that preserve the FACT
    * side's rows: right/full-outer would emit each unmatched `other` row
    * once PER SHARD (it was replicated `shards`×), so those modes are
    * rejected — salt the other side instead if its rows must survive. */
  def saltedEquiJoin(facts: DataFrame, other: DataFrame, key: String,
                     shards: Int, joinType: String = "inner"): DataFrame = {
    val safe = Set("inner", "cross", "left", "leftouter",
      "leftsemi", "leftanti")
    require(safe.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedEquiJoin: joinType '$joinType' would duplicate unmatched " +
        "replicated-side rows once per shard; use inner/left/semi/anti")
    val salted = facts.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(shards)))
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0), lit(shards - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
