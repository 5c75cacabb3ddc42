package graft

import org.apache.spark.sql.functions._

/** Stage profiler for the prefix-filtered n-gram Jaccard family (VERDICT
  * r9 #6, r10 #5): times the shingle roll, df count, prefix build,
  * candidate join (plain AND ppjoin-positional) and verify stages with
  * barriers between them. Every stage calls the SHIPPED pipeline code
  * ([[ops.TextOps.dfreqOf]] / [[ops.TextOps.prefixOf]] /
  * [[ops.TextOps.candidatesOf]] / [[ops.TextOps.candidatesPpjoinOf]] /
  * [[ops.TextOps.verifyJaccardForProfile]]) — ADVICE r10: a profiler
  * that re-derives the formulas silently measures a different pipeline
  * the moment the shipped one changes. Not part of the driver contract;
  * run via `sbt "runMain graft.ProfileNgb /root/testdata/sf0.1"`. */
object ProfileNgb {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get()
    val d = args(0)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime - t0) / 1e9}%8.2f s")
      r
    }
    // end-to-end, twice (second run has the JVM + checkpoint warm)
    (1 to 2).foreach { i =>
      t(s"full blocked run $i") {
        ops.TextOps.ngramJaccardBlocked(s, d).collect().length
      }
    }
    (1 to 2).foreach { i =>
      t(s"full ppjoin run $i") {
        ops.TextOps.ngramJaccardPpjoin(s, d).collect().length
      }
    }
    // staged re-run with barriers between stages — shipped code only
    val docs = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
    val byDoc = t("shingleSetsOf (checkpoint)") {
      ops.TextOps.shingleSetsOf(docs)
    }
    val sh = byDoc.select(col("doc_id"), col("n"),
      explode(col("shs")).as("sh"))
    val dfreq = t("dfreqOf count") {
      val x = ops.TextOps.dfreqOf(sh).localCheckpoint()
      println(s"[prof]   distinct shingles: ${x.count()}")
      x
    }
    val prefix = t("prefixOf (checkpoint)") {
      ops.TextOps.prefixOf(sh, dfreq).localCheckpoint()
    }
    println(s"[prof]   prefix rows: ${prefix.count()}")
    val cand = t("candidatesOf + distinct") {
      val c = ops.TextOps.candidatesOf(prefix).localCheckpoint()
      println(s"[prof]   candidates (plain): ${c.count()}")
      c
    }
    val candPp = t("candidatesPpjoinOf") {
      val c = ops.TextOps.candidatesPpjoinOf(prefix).localCheckpoint()
      println(s"[prof]   candidates (ppjoin): ${c.count()}")
      c
    }
    t("candidatesPpjoinBucketedOf") {
      val c = ops.TextOps.candidatesPpjoinBucketedOf(prefix)
        .localCheckpoint()
      println(s"[prof]   candidates (ppjoin+lenbucket): ${c.count()}")
      c
    }
    t("verify plain candidates") {
      val n = ops.TextOps.verifyJaccardForProfile(cand, byDoc)
      println(s"[prof]   final pairs: $n")
    }
    t("verify ppjoin candidates") {
      val n = ops.TextOps.verifyJaccardForProfile(candPp, byDoc)
      println(s"[prof]   final pairs: $n")
    }
    s.stop()
  }
}
