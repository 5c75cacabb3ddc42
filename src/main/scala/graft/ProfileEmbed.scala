package graft

import graft.ops.{EmbedStore, PostingStore}
import org.apache.spark.sql.functions._

/** Scratch profiler for the dense-arm store probe (not registered). */
object ProfileEmbed {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[prof] $name run$i n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    t("postings_scan")(PostingStore.postings(spark, d).count())
    t("embed_store_scan")(EmbedStore.vectors(spark, d).count())
    t("embed_fresh_build") {
      EmbedStore.vectorsOf(Tables.documents(spark, d)
        .repartition(spark.sparkContext.defaultParallelism)).count()
    }
    t("lex_spine") {
      graft.ops.RetrievalOps.queries("q_inverted_search")(spark, d).count()
    }
    t("bm25_full") {
      graft.ops.RetrievalOps.queries("q_bm25_rank")(spark, d).count()
    }
    t("rrf2") {
      graft.ops.RetrievalOps.queries("q_hybrid_rrf")(spark, d).count()
    }
    t("rrf3_dense") {
      graft.ops.RetrievalOps.queries("q_hybrid_rrf_dense")(spark, d).count()
    }
    spark.stop()
  }
}
