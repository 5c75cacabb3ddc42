package graft

import graft.ops.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PQ/IVFADC index grown by STREAM ingest — codebooks (subspace +
  * coarse) train once on the initial corpus, then vectors arrive in
  * uneven micro-batches and each batch is encoded/assigned against the
  * STORED codebooks and appended ([[VectorOps.pqIndexIngest]]). The
  * maintained codes and inverted-list tables must equal the one-shot
  * whole-corpus encoding — encoding is per-vector independent given a
  * fixed quantizer, which is exactly the property that makes vector-index
  * ingest embarrassingly parallel at scale. Runs on the session-wide
  * RocksDB state store like every streaming spec. */
case class PqVec(vec_id: Long, embedding: Array[Float])

class PqStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("streamed encode-and-append against stored codebooks equals the " +
      "one-shot whole-corpus encoding") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.embeddings(spark, TestSession.sf)
      .select(col("vec_id"), col("embedding"))
    val base = java.nio.file.Files.createTempDirectory("pqidx").toString
    VectorOps.pqIndexInit(spark, base, corpus)

    val rows = corpus.orderBy(col("vec_id")).as[PqVec].collect().toSeq
    val in = MemoryStream[PqVec]
    val q = in.toDS().toDF().writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        VectorOps.pqIndexIngest(spark, base, batch)
      }
      .start()
    Seq(rows.slice(0, 13), rows.slice(13, 14), rows.slice(14, 200),
        rows.slice(200, rows.size)).foreach { chunk =>
      in.addData(chunk); q.processAllAvailable()
    }
    q.stop()

    def sorted(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    // one-shot arm: identical (deterministic) training in a second dir,
    // whole corpus encoded in one call
    val oneShot = java.nio.file.Files.createTempDirectory("pqidx1").toString
    VectorOps.pqIndexInit(spark, oneShot, corpus)
    VectorOps.pqIndexIngest(spark, oneShot, corpus)
    assert(sorted(spark.read.parquet(s"$base/codes")) ===
      sorted(spark.read.parquet(s"$oneShot/codes")),
      "streamed PQ codes diverged from the one-shot encoding")
    assert(sorted(spark.read.parquet(s"$base/lists")) ===
      sorted(spark.read.parquet(s"$oneShot/lists")),
      "streamed list assignments diverged from the one-shot encoding")
    // and the codebooks the two arms encoded against are themselves equal
    // (training determinism — the property the oracles already hash-prove)
    assert(sorted(spark.read.parquet(s"$base/codebook")) ===
      sorted(spark.read.parquet(s"$oneShot/codebook")))
    assert(sorted(spark.read.parquet(s"$base/coarse")) ===
      sorted(spark.read.parquet(s"$oneShot/coarse")))
  }
}
