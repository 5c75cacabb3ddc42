package graft

/** Plan-inspection helper: `runMain graft.Explain [query ...]` prints the
  * formatted physical plan of each named query (default: a scale-critical
  * subset) for pushdown / broadcast / codegen review. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_star_dim_chain", "q_rev_by_priority", "q_topk_brands",
      "q_filter_project", "q_minhash_lsh_pairs", "q_ann_bruteforce",
      "q_tumbling_window", "q_dws_sku_order", "q_corpus_filter",
      "q_ann_multiprobe", "q_asof_join", "q_neardup_components",
      "q_tfidf_topterms", "q_value_quantiles", "q_skew_profile",
      "q_mm_dedup", "q_inverted_search", "q_bm25_rank", "q_rag_pipeline",
      "q_column_stats", "q_event_pagerank", "q_ann_sq", "q_gdpr_purge",
      "q_mm_scenecut")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
