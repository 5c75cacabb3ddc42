package graft

import graft.ops.{PostingStore, RetrievalOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The posting-store merge driven through the REAL store under
  * `foreachBatch` — the r7/r8 open ask: RetrievalSpec proves
  * `mergePostings` ≡ rebuild at the DataFrame level; this spec proves the
  * operational loop — documents arrive in micro-batches, each batch
  * read→merge→overwrites [[PostingStore]]'s actual parquet dirs
  * ([[PostingStore.refresh]]), and the on-disk index must equal the fresh
  * whole-corpus build. Batch boundaries are deliberately uneven (a 1-row
  * batch, a large batch) and ONE BATCH IS REPLAYED verbatim mid-stream —
  * the at-least-once delivery case the `max(tf)` merge's idempotence
  * claim is about. Runs on the session-wide RocksDB state store like
  * every streaming spec. */
case class PostingDoc(doc_id: Long, text: String)

class PostingStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("foreachBatch read->merge->overwrite of the posting store equals " +
      "the fresh build, replay included") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, TestSession.sf)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(200)
      .as[PostingDoc].collect().toSeq

    val base = java.nio.file.Files.createTempDirectory("postidx").toString
    val in = MemoryStream[PostingDoc]
    val q = in.toDS().toDF().writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        PostingStore.refresh(spark, base, batch)
      }
      .start()
    val replayed = docs.slice(7, 8) ++ docs.slice(8, 60)
    Seq(docs.slice(0, 7), docs.slice(7, 8), docs.slice(8, 60),
        replayed, // at-least-once: a full batch re-delivered verbatim
        docs.slice(60, 200)).foreach { chunk =>
      in.addData(chunk); q.processAllAvailable()
    }
    q.stop()

    def sorted(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq

    val all = docs.toDF()
    assert(sorted(spark.read.parquet(s"$base/postings")) ===
      sorted(RetrievalOps.postingsOf(all)),
      "maintained posting lists diverged from the fresh build")
    assert(sorted(spark.read.parquet(s"$base/doclen")) ===
      sorted(all.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"))),
      "maintained doclen table diverged from the fresh build")
  }
}
