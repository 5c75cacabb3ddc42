package graft

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The count–min sketch fold driven as a STREAM — the linear-sketch
  * property under micro-batching: because merge is cell-wise addition,
  * the maintained store must equal the one-shot sketch BIT-FOR-BIT for
  * ANY batch slicing (uneven, key-skewed — no contract beyond "each
  * token counted once"). This is the property that makes CMS the
  * streaming frequency structure: a day of folds over 100 TB of tokens
  * ends in the exact sketch a monolithic rebuild would produce, at
  * batch-scan cost per fold. Complements TextSpec's accuracy-arm
  * liveness (batch face) the way Scd2StreamSpec complements Scd2Spec. */
class CmsStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("foreachBatch cmsRefresh over uneven token slices equals the " +
      "one-shot sketch cell-for-cell") {
    val toks = Tables.documents(spark, TestSession.sf)
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .localCheckpoint()
    val srcDir = java.nio.file.Files.createTempDirectory("cmssrc").toString
    val storeDir = java.nio.file.Files
      .createTempDirectory("cmsstore").toString + "/cells"

    val stream = spark.readStream.schema(toks.schema).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        TextOps.cmsRefresh(spark, storeDir, batch)
      }
      .start()
    // deliberately skewed slices: a tiny sliver, the bulk, a mid slice
    Seq(toks.filter(col("doc_id") % 100 === 0),
        toks.filter(col("doc_id") % 100 =!= 0 && col("doc_id") % 3 === 0),
        toks.filter(col("doc_id") % 100 =!= 0 && col("doc_id") % 3 =!= 0))
      .foreach { slice =>
        slice.coalesce(1).write.mode("append").parquet(srcDir)
        q.processAllAvailable()
      }
    q.stop()

    def cells(df: DataFrame): Seq[(Long, Long, Long)] =
      df.select(col("j"), col("b"), col("n")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
    val maintained = cells(spark.read.parquet(storeDir))
    val oneShot = cells(TextOps.cmsCellsOf(toks.select(col("tok"))))
    assert(maintained === oneShot,
      "maintained CMS store diverged from the one-shot sketch")
    // non-degenerate: every hash row carries cells (empty BUCKETS are
    // expected — (15/16)^vocab of them per row) and total mass is
    // exactly depth × token count (each token lands in one cell per row)
    assert(maintained.map(_._1).distinct.size === TextOps.CmsDepth)
    assert(maintained.size <= TextOps.CmsDepth * TextOps.CmsWidth)
    assert(maintained.map(_._3).sum ===
      TextOps.CmsDepth.toLong * toks.count())
  }
}
