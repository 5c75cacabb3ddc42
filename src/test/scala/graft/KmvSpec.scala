package graft

import graft.functions.Aggregators
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the mergeable KMV (bottom-k) distinct sketch, and its
  * equivalence to the declarative window form the registered
  * `q_kmv_distinct` query ships. The claims under test are the ones the
  * hash-exact oracle leans on:
  *   1. the Aggregator's buffer IS the sorted bottom-k of the distinct
  *      hash set, under EVERY partition/merge topology Spark could pick
  *      (split-invariance — the mergeability claim);
  *   2. re-delivered values never change the buffer (idempotence — the
  *      at-least-once-replay safety claim);
  *   3. on the real sf0.001 events table, the Aggregator's k-th order
  *      statistic equals the one the declarative `row_number() <= k`
  *      window derives — the two execution shapes (typed state-store
  *      sketch vs Catalyst WindowGroupLimit) are bit-identical;
  *   4. the (k-1)·M/h_(k) estimator lands within the textbook error bound
  *      on random universes (statistical, fixed seed).
  */
class KmvSpec extends AnyFunSuite {

  private def runSketch(stream: Seq[Long], k: Int,
      rnd: scala.util.Random): List[Long] = {
    val ag = Aggregators.kmv(k)
    val nParts = 1 + rnd.nextInt(8)
    val parts = stream.groupBy(_ => rnd.nextInt(nParts)).values.toSeq
    val buffers = rnd.shuffle(parts.map(_.foldLeft(ag.zero)(ag.reduce)))
    buffers.foldLeft(ag.zero)(ag.merge)
  }

  test("KMV buffer == sorted bottom-k distinct, any split/merge order") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 20) {
      val k = 2 + rnd.nextInt(30)
      // duplicates on purpose: distinct-set semantics are part of the claim
      val stream = (1 to 200 + rnd.nextInt(800))
        .map(_ => rnd.nextInt(300).toLong)
      val expected = stream.distinct.sorted.take(k)
      val got = runSketch(stream, k, rnd)
      assert(got == expected, s"trial $trial (k=$k)")
    }
  }

  test("KMV is idempotent under replay") {
    val ag = Aggregators.kmv(8)
    val base = (1L to 50L).foldLeft(ag.zero)(ag.reduce)
    val replayed = (1L to 50L).foldLeft(base)(ag.reduce)
    assert(replayed == base)
    assert(ag.merge(base, base) == base)
  }

  test("Aggregator kth order statistic == declarative window form on sf0.001") {
    val spark = TestSession.spark
    import spark.implicits._
    val k = 16 // small enough that sf0.001's 15 distinct users straddle it
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val hashes = Tables.events(spark, TestSession.sf)
      .select(col("event_type"), h.as("h")).distinct()

    val declarative = hashes
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .groupBy(col("event_type"))
      .agg(collect_list(col("h")).as("bk"))
      .as[(String, Seq[Long])].collect()
      .map { case (t, bk) => t -> bk.sorted }.toMap

    val typed = hashes.as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(Aggregators.kmv(k).toColumn.name("bk"))
      .collect().map { case (t, bk) => t -> bk.toList }.toMap

    assert(typed.keySet == declarative.keySet)
    for ((t, bk) <- typed)
      assert(bk == declarative(t), s"key $t: typed $bk != window ${declarative(t)}")
  }

  test("KMV runs as STREAMING state: per-batch merges equal the batch sketch") {
    val spark = TestSession.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    // Complete-mode typed agg: the Aggregator's merge is what carries the
    // sketch across micro-batches — the state-store form of the same
    // bottom-k the declarative window derives in batch.
    val q = in.toDS().groupByKey(_._1).mapValues(_._2)
      .agg(Aggregators.kmv(4).toColumn.name("bk"))
      .toDF("key", "bk")
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .start()
    in.addData(("a", 50L), ("a", 10L), ("b", 7L))
    q.processAllAvailable()
    in.addData(("a", 30L), ("a", 10L), ("a", 20L), ("a", 40L), ("b", 3L))
    q.processAllAvailable()
    val got = spark.table("kmv_stream").as[(String, Seq[Long])]
      .collect().map { case (k, bk) => k -> bk.toList }.toMap
    q.stop()
    assert(got("a") == List(10L, 20L, 30L, 40L)) // 50 evicted, dup 10 once
    assert(got("b") == List(3L, 7L))
  }

  test("estimator error within 4/sqrt(k) on random universes") {
    val rnd = new scala.util.Random(37)
    val M = math.pow(2, 60)
    for (trial <- 1 to 10) {
      val k = 64
      val n = 2000 + rnd.nextInt(8000)
      // hash stand-in: uniform draws over the 60-bit domain
      val hashes = Seq.fill(n)((rnd.nextLong() >>> 4).abs).distinct
      val sketch = runSketch(hashes, k, rnd)
      val est =
        if (sketch.size < k) sketch.size.toDouble
        else (k - 1).toDouble * M / sketch.last.toDouble
      val err = math.abs(est - hashes.size) / hashes.size
      assert(err <= 4.0 / math.sqrt(k.toDouble),
        s"trial $trial: err $err (n=${hashes.size}, est=$est)")
    }
  }
}
