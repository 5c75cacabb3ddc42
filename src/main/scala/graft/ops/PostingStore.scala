package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized inverted-index artifacts — the retrieval layer's
  * "built once at ingest" store, executed rather than described (the
  * [[TextIndexStore]] pattern applied to [[RetrievalOps]]).
  *
  * A search system never rebuilds its index per query: posting lists are
  * written when documents enter the corpus and every query PROBES the
  * stored index. Here the store is parquet written once per (JVM, sfDir)
  * via the [[StoreDirs]] memo (PID-scoped, removed on exit, rebuilt on
  * first access); in production it is a term-bucketed lakehouse table
  * maintained incrementally by [[RetrievalOps.mergePostings]] (merge ≡
  * rebuild proven in RetrievalSpec). All three retrieval queries
  * (`q_inverted_search`, `q_bm25_rank`, `q_rag_pack`) keep their oracle
  * SQL — which recomputes the index from raw text — verbatim, so the
  * hash gate proves store-probing ≡ fresh-build for free. The memo is
  * keyed on [[StoreDirs.freshKey]] (path + input-file fingerprint), so a
  * mid-round regeneration of the input parquet rebuilds the store instead
  * of probing stale postings against fresh oracles.
  *
  *   - `postings` — (term, doc_id, tf): the index proper.
  *   - `doclen`   — (doc_id, dl): per-document token counts (BM25's
  *                  length normalization + the packer's budget costs).
  */
object PostingStore {

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensure(s: SparkSession, d: String): String =
    built.computeIfAbsent(StoreDirs.freshKey(d), k => {
      val base = StoreDirs.dirFor("postings", k)
      val docs = graft.Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
      RetrievalOps.postingsOf(docs)
        .write.mode("overwrite").parquet(s"$base/postings")
      docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("dl"))
        .write.mode("overwrite").parquet(s"$base/doclen")
      base
    })

  /** The materialized (term, doc_id, tf) posting lists. */
  def postings(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${ensure(s, d)}/postings")

  /** The materialized (doc_id, dl) document lengths. */
  def doclen(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${ensure(s, d)}/doclen")
}
