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
    built.computeIfAbsent(StoreDirs.freshKey(d), k =>
      StoreDirs.ensureBuilt("postings", k) { base =>
        val docs = graft.Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
        RetrievalOps.postingsOf(docs)
          .write.mode("overwrite").parquet(s"$base/postings")
        docs.select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("dl"))
          .write.mode("overwrite").parquet(s"$base/doclen")
      })

  /** The materialized (term, doc_id, tf) posting lists. */
  def postings(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${ensure(s, d)}/postings")

  /** The materialized (doc_id, dl) document lengths. */
  def doclen(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${ensure(s, d)}/doclen")

  /** The STREAMING face of the store: merge one ingest batch of
    * (doc_id, text) rows into the index rooted at `base` — the
    * `foreachBatch` read → merge → overwrite refresh
    * ([[RetrievalOps.mergePostings]] applied to the store's actual
    * parquet dirs, the IncrAggSpec pattern). Both artifacts refresh:
    * posting lists via the `max(tf)` merge (idempotent under
    * at-least-once replay — a re-delivered document re-derives identical
    * (term, doc_id, tf) rows) and doclen via the same max-collapse on
    * (doc_id, dl). The merged frame is localCheckpointed before the
    * overwrite because the store is both input and output of the merge.
    *
    * Scale: the merge SHUFFLES only store ∪ batch partials keyed by
    * (term, doc_id); here the overwrite then rewrites the whole store
    * because plain parquet has no MERGE — in production the store is a
    * term-bucketed lakehouse table and only buckets containing the
    * batch's touched terms rewrite, so per-batch cost ∝ touched terms,
    * never corpus size (the [[CdcOps]] touched-buckets device).
    * PostingStreamSpec proves the maintained on-disk store ≡ the fresh
    * whole-corpus build under uneven batch boundaries + a replayed
    * batch. */
  def refresh(s: SparkSession, base: String, batch: DataFrame): Unit = {
    val pDir = s"$base/postings"
    val dDir = s"$base/doclen"
    val freshP = RetrievalOps.postingsOf(batch)
    val freshD = batch.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val mergedP =
      if (StoreDirs.recoverThenExists(pDir))
        RetrievalOps.mergePostings(s.read.parquet(pDir), freshP)
          .localCheckpoint()
      else freshP.localCheckpoint()
    val mergedD =
      if (StoreDirs.recoverThenExists(dDir))
        s.read.parquet(dDir).unionByName(freshD)
          .groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
          .localCheckpoint()
      else freshD.localCheckpoint()
    // staged swap, not in-place overwrite: a crash mid-write must leave
    // a complete store copy on disk ([[StoreDirs.durableOverwrite]])
    StoreDirs.durableOverwrite(mergedP, pDir)
    StoreDirs.durableOverwrite(mergedD, dDir)
    // the checkpoints are consumed by the writes above — release their
    // blocks instead of pinning one store copy per micro-batch
    Relational.unpersistCheckpoint(mergedP)
    Relational.unpersistCheckpoint(mergedD)
  }
}
