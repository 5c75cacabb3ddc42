package graft

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Delta near-dup at the firehose: the SAME flag core that q_delta_neardup
  * runs in batch probes each streaming micro-batch against the static
  * index (the decontamination stream-static pattern). Flagging is per-doc
  * independent, so the union of per-batch flags must equal the one-shot
  * whole-batch flags regardless of how ingestion is batched — proven here
  * over a 3-way random split, including a micro-batch with no dups at
  * all. */
class DeltaStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("per-micro-batch near-dup flags union to the whole-batch answer") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
    val index = docs.filter(col("doc_id") % 5 =!= 0).localCheckpoint()
    val incoming = docs.filter(col("doc_id") % 5 === 0)
      .unionAll(index.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + (1L << 62)).as("doc_id"), col("text"),
          col("source")))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toSeq

    val wholeBatch = TextOps.nearDupFlags(spark,
        incoming.toDF("doc_id", "text"), index)
      .collect().map(_.getLong(0)).toSet
    assert(wholeBatch.nonEmpty)

    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[Long]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        got.synchronized {
          got ++= TextOps.nearDupFlags(spark, batch, index)
            .collect().map(_.getLong(0))
        }: Unit
      }
      .start()
    val rnd = new scala.util.Random(11)
    val shuffled = rnd.shuffle(incoming)
    val third = shuffled.size / 3
    Seq(shuffled.take(third), shuffled.slice(third, 2 * third),
        shuffled.drop(2 * third)).foreach { part =>
      in.addData(part)
      q.processAllAvailable()
    }
    q.stop()
    assert(got.toSet === wholeBatch)
  }
}
