package graft

import graft.streaming.LogSplitter
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The BaseLogApp-shaped pipeline over a REAL file source with REAL
  * checkpoint wiring — closes the gap between MemoryStream specs and the
  * production trigger/offset-log path: a stopped query restarted on the
  * same checkpointLocation must resume from the recorded offsets and
  * process only files that arrived while it was down (no reprocessing,
  * no loss). */
class FileStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      String.join("\n", lines: _*).getBytes("UTF-8"))

  private def line(mid: String, ts: Long): String =
    s"""{"common":{"mid":"$mid"},"page":{"page_id":"home"},"ts":$ts}"""

  test("file source + checkpointLocation: restart resumes, exactly one " +
      "output row per input line") {
    val src = Files.createTempDirectory("logsrc").toString
    val out = Files.createTempDirectory("logout").toString
    val ckpt = Files.createTempDirectory("logckpt").toString

    def start() = spark.readStream.text(src)
      .select(col("value").as("line"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        LogSplitter.splitAll(batch).foreach { case (name, df) =>
          df.write.mode("append").json(s"$out/$name")
        }
      }
      .start()

    writeLines(src, "batch1.txt",
      Seq(line("m1", 1000), line("m2", 2000), "garbage"))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()

    // arrives while the query is DOWN — only the restart sees it
    writeLines(src, "batch2.txt", Seq(line("m3", 3000), line("m1", 4000)))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val pages = spark.read.json(s"$out/page")
    assert(pages.count() === 4) // m1,m2 from batch1; m3,m1 from batch2 — no dupes
    assert(spark.read.json(s"$out/dirty").count() === 1)
    // per-mid multiplicity proves batch1 was not reprocessed after restart
    val byMid = pages.groupBy(col("common.mid")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMid === Map("m1" -> 2, "m2" -> 1, "m3" -> 1))
  }

  test("stateful restart: the dedup seen-set SURVIVES a stop/restart — " +
      "a duplicate arriving after recovery is still suppressed") {
    import graft.streaming.StatefulOps
    import spark.implicits._
    val src = Files.createTempDirectory("dedupsrc").toString
    val out = Files.createTempDirectory("dedupout").toString
    val ckpt = Files.createTempDirectory("dedupckpt").toString

    def doc(fp: String, id: Long, ts: Long): String =
      s"""{"fp":"$fp","docId":$id,"ts":$ts}"""
    def start() = {
      val in = spark.readStream
        .schema("fp STRING, docId LONG, ts LONG").json(src)
        .as[StatefulOps.IngestDoc]
      StatefulOps.ingestDedup(in).toDF()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").json(out)
        }
        .start()
    }

    writeLines(src, "b1.json",
      Seq(doc("A", 1, 10), doc("A", 2, 11), doc("B", 3, 12)))
    val q1 = start(); q1.processAllAvailable(); q1.stop()

    // fp A re-arrives only AFTER the restart: suppressing it requires the
    // state-store checkpoint (offset replay alone cannot know A was seen)
    writeLines(src, "b2.json", Seq(doc("A", 4, 20), doc("C", 5, 21)))
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    val got = spark.read.schema("fp STRING, docId LONG, ts LONG").json(out)
      .as[StatefulOps.IngestDoc].collect().map(d => d.fp -> d.docId).toMap
    assert(got === Map("A" -> 1, "B" -> 3, "C" -> 5),
      s"recovered state failed to suppress the cross-restart duplicate: $got")
  }
}
