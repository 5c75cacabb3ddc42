package graft

import org.apache.spark.sql.functions._

/** One-off stage profiler for q_ngram_jaccard_blocked (VERDICT r9 #6):
  * times the shingle roll, prefix build, candidate join, and verify
  * stages separately at the given sfDir. Not part of the driver contract;
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
      t(s"full run $i") {
        ops.TextOps.ngramJaccardBlocked(s, d).collect().length
      }
    }
    // staged re-run with barriers between stages
    val docs = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
    val byDoc = t("shingleSetsOf (checkpoint)") {
      ops.TextOps.shingleSetsOf(docs)
    }
    val sh = byDoc.select(col("doc_id"), col("n"),
      explode(col("shs")).as("sh"))
    val dfreq = t("dfreq count") {
      val x = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .localCheckpoint()
      println(s"[prof]   distinct shingles: ${x.count()}")
      x
    }
    val prefix = t("prefix build (checkpoint)") {
      sh.join(dfreq, "sh")
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(struct(col("df"), col("sh"))))
          .as("arr"), max(col("n")).as("n"))
        .select(col("doc_id"), col("n"),
          explode(slice(col("arr"), lit(1),
            (col("n") - floor((col("n") * 3 + lit(4)) / lit(5)) + 1)
              .cast("int"))).as("p"))
        .select(col("doc_id"), col("p.sh").as("sh"), col("n"))
        .localCheckpoint()
    }
    println(s"[prof]   prefix rows: ${prefix.count()}")
    val cand = t("candidate join + distinct") {
      val c = prefix.as("a").join(prefix.as("b"),
          col("a.sh") === col("b.sh") &&
            col("a.doc_id") < col("b.doc_id") &&
            col("a.n") * 5 >= col("b.n") * 3 &&
            col("b.n") * 5 >= col("a.n") * 3)
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
        .localCheckpoint()
      println(s"[prof]   candidates: ${c.count()}")
      c
    }
    t("verify (sharedCounts + filter)") {
      val n = ops.TextOps.verifyJaccardForProfile(cand, byDoc)
      println(s"[prof]   final pairs: $n")
    }
    s.stop()
  }
}
