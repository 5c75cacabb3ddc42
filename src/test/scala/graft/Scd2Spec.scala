package graft

import graft.ops.Scd2
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Scd2.applyBatch]]'s contract is fold ≡ rebuild:
  * `applyBatch(fromLog(b1), b2) == fromLog(b1 ∪ b2)` for ANY split of a
  * changelog into seq-monotone batches. The hash gate proves it for the
  * concrete order changelog (`q_scd2_incremental` shares
  * `q_scd2_history`'s oracle); this spec proves it for random logs,
  * random chain lengths, random split points, and multi-way folds. */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def randomLog(seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = for {
      k <- 1 to 25
      nv = 1 + rnd.nextInt(6)
      v <- 1 to nv
    } yield (k.toLong, v.toLong * 10, s"payload_${k}_${v}_${rnd.nextInt(100)}")
    rows.toDF("k", "seq", "payload")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("k"), col("seq"), col("payload"), col("version_seq"),
        col("effective_from"), col("effective_to"))
      .collect().map(_.toString).sorted.toSeq

  test("two-way fold equals the one-shot rebuild at every split point") {
    val log = randomLog(7L).localCheckpoint()
    val want = sortedRows(Scd2.fromLog(log, "k", "seq"))
    Seq(10L, 30L, 50L).foreach { cut =>
      val h1 = Scd2.fromLog(log.filter(col("seq") <= cut), "k", "seq")
      val got = sortedRows(
        Scd2.applyBatch(h1, log.filter(col("seq") > cut), "k", "seq"))
      assert(got === want, s"fold at cut=$cut diverged from rebuild")
    }
  }

  test("multi-way fold (one batch per seq wave) equals the rebuild, and " +
      "every key ends with exactly one open interval") {
    val log = randomLog(11L).localCheckpoint()
    val waves = log.select(col("seq")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(waves.length >= 4, "degenerate: too few waves to fold")
    val folded = waves.drop(1).foldLeft(
        Scd2.fromLog(log.filter(col("seq") === waves.head), "k", "seq")) {
      case (h, w) =>
        Scd2.applyBatch(h, log.filter(col("seq") === w), "k", "seq")
          .localCheckpoint()
    }
    assert(sortedRows(folded) === sortedRows(Scd2.fromLog(log, "k", "seq")))
    val open = folded.filter(col("effective_to").isNull)
      .groupBy(col("k")).count().filter(col("count") =!= 1)
    assert(open.isEmpty, "a key without exactly one current version")
  }

  test("equal-seq split DIVERGES from the rebuild — the contract's '>' " +
      "is strict, not '>='") {
    // Two rows share (k=1, seq=10). Rebuilt in one log, the tie-break
    // order ("a" before "b") interleaves them; split across batches,
    // applyBatch closes the open interval and appends AFTER — proving
    // same-(key,seq) rows must arrive in one batch. If this assertion
    // ever starts failing (fold == rebuild), the scaladoc contract in
    // Scd2.scala can be relaxed back to '>='.
    import spark.implicits._
    val b1 = Seq((1L, 10L, "b")).toDF("k", "seq", "payload")
    val b2 = Seq((1L, 10L, "a"), (1L, 20L, "c")).toDF("k", "seq", "payload")
    val ord = Seq(col("payload").asc)
    val rebuild = sortedRows(Scd2.fromLog(b1.unionByName(b2), "k", "seq", ord))
    val fold = sortedRows(
      Scd2.applyBatch(Scd2.fromLog(b1, "k", "seq", ord), b2, "k", "seq", ord))
    assert(fold !== rebuild,
      "equal-seq split unexpectedly matched the rebuild — contract drifted")
    // Sanity on the divergence shape: the fold's head row "b" is closed
    // by the batch's min seq (10) and keeps version 1, while the rebuild
    // orders "a" first.
    assert(fold.exists(r => r.contains("b") && r.contains("1,10,10")),
      s"fold shape changed: $fold")
  }

  test("snapshot diff: all four classes fire (plants keep added/removed " +
      "live on the birth-only changelog) and counts reconcile") {
    val rows = graft.ops.OrderWide.scd2Diff(spark, TestSession.sf).collect()
    val byClass = rows.groupBy(_.getAs[String]("class"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    assert(byClass.keySet === Set("added", "removed", "changed",
      "unchanged"))
    byClass.values.foreach(n => assert(n > 0L))
    // class contracts on the transition columns
    rows.foreach { r =>
      (r.getAs[String]("class"), r.getAs[String]("from_status"),
          r.getAs[String]("to_status")) match {
        case ("added", f, _)     => assert(f === "-")
        case ("removed", _, t)   => assert(t === "-")
        // changed may keep f == t when only the amount moved — no
        // constraint beyond both sides being real statuses
        case ("changed", f, t)   => assert(f != "-" && t != "-")
        case ("unchanged", f, t) => assert(f === t)
        case other               => fail(s"unexpected row $other")
      }
    }
  }
}
