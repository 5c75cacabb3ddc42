package graft.ops

import graft.functions.TextFunctions.fingerprint
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Materialized corpus-filter survivor manifest — the cleaned-corpus id
  * set the three pipeline flagships share, computed ONCE instead of once
  * per query.
  *
  * `TextOps.filteredCorpus` (quality/language gates → exact dedup →
  * MinHash-LSH near-dup removal) is the most expensive composition in the
  * catalog, and THREE queries consume its output: `q_corpus_filter` (the
  * per-source rollup), `q_embed_pipeline` (filter-before-index ANN) and
  * `q_rag_pipeline` (filter-before-index retrieval). Recomputing the
  * whole gate chain inside each consumer is exactly the anti-pattern a
  * 100 TB pipeline cannot afford — a production run materializes the
  * cleaned-corpus MANIFEST (doc ids + the per-doc stats the report needs)
  * as the filter stage's output table, and every downstream stage reads
  * the manifest. This store is that table: one parquet write of
  * (doc_id, source, n_tok, char_sum) — ids and three longs, ~28 bytes per
  * surviving doc, metadata-sized next to the text it describes.
  *
  * Memo discipline: same as [[PostingStore]] — keyed on
  * [[StoreDirs.freshKey]] (path + input fingerprint) so a mid-round input
  * regeneration rebuilds the manifest; directory PID-scoped and removed on
  * exit. The consumers' DuckDB oracles recompute the survivor set from raw
  * text ([[TextOps.corpusSurvivorCtes]]), so the hash gate proves
  * store ≡ rebuild on every Verify run — store-invariance for free.
  */
object CorpusStore {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensure(s: SparkSession, d: String): String =
    built.computeIfAbsent(StoreDirs.freshKey(d), k =>
      StoreDirs.ensureBuilt("corpussurv", k) { base =>
        TextOps.filteredCorpusCompute(s, d)
          .write.mode("overwrite").parquet(s"$base/surv")
      })

  /** The materialized survivor manifest (doc_id, source, n_tok, char_sum). */
  def survivors(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${ensure(s, d)}/surv")

  /** The STREAMING face of the corpus filter — fold one ingest batch of
    * (doc_id, text, source) rows into the manifest rooted at `base` (the
    * [[TextIndexStore]] delta pattern applied to the whole gate chain,
    * under `foreachBatch`). State layout, all APPEND-only:
    *
    *   - `dedup` — (doc_id, source, n_tok, char_sum, fp) for every
    *     gate-passing, exact-dedup-surviving doc. This is the near-dup
    *     INDEX: a doc later dropped as a near-dup STAYS here, because the
    *     batch semantics drop any d2 paired with a smaller-id deduped doc
    *     whether or not that d1 itself survived — the index must keep it
    *     or a later re-statement of the same content would sneak through.
    *   - `sig` — MinHash signatures of dedup docs (the LSH probe surface,
    *     8 longs/doc — [[TextIndexStore.sig]]'s shape).
    *   - `shset` — shingle sets of dedup docs (the verification surface;
    *     production stores hashed shingles, same plan shape).
    *   - `surv` — the manifest itself, appended per batch.
    *
    * Per batch: gates ([[TextOps.corpusGate]], shared verbatim with the
    * rebuild) → intra-batch keep-first on the content fingerprint → fp
    * anti-join against the stored index (exact dedup; also what makes a
    * REPLAYED batch a no-op — at-least-once idempotence) → LSH band
    * candidates against stored signatures ∪ intra-batch smaller ids →
    * exact Jaccard verification ([[TextOps.verifySimPairs]], shared
    * verbatim) → append state + non-dropped survivors.
    *
    * Contract: batches arrive in ascending doc_id order (monotone ingest,
    * the [[Scd2]] discipline) — keep-first then means "first batch wins",
    * exactly the rebuild's min-id winner. CorpusStreamSpec proves
    * union-of-batches ≡ the whole-corpus rebuild under uneven boundaries
    * + a replayed batch.
    *
    * TRANSACTIONAL fold protocol (foreachBatch retry semantics): each
    * fold writes its four outputs into BATCH-SCOPED directories
    * (`<dir>/batch=<id>`, mode overwrite) and records a commit marker
    * (`commits/<id>`) only AFTER the survivor append — the last write.
    * State reads union COMMITTED batch dirs only. So a crash anywhere
    * mid-fold leaves partial dirs that are (a) invisible to every
    * subsequent read and (b) cleanly overwritten when the batch replays —
    * the half-committed-index data loss of plain appends (a replayed
    * batch anti-joining out against its own partial dedup append and
    * vanishing from the manifest) cannot occur. A replay of a COMMITTED
    * id is skipped outright; content-level redelivery under a NEW id is
    * still absorbed by the fp anti-join. CorpusStreamSpec exercises both
    * the replay and the crash-mid-fold path.
    *
    * Scale: per batch the index contributes ONE scan of its fp column
    * (anti-join, hash-keyed) and one scan of its signature store (band
    * probe, batch bands broadcast) — raw text never re-reads, the index
    * never self-joins; verification touches candidate ids only. Cost ∝
    * batch + collisions, independent of corpus × batch pairing. */
  def refreshBatch(s: SparkSession, base: String, batchId: Long,
      batch: DataFrame): Unit = {
    val marker = new java.io.File(s"$base/commits", batchId.toString)
    if (marker.exists()) return // committed fold replayed: a no-op
    val dedupDir = s"$base/dedup"; val sigDir = s"$base/sig"
    val shDir = s"$base/shset"; val survDir = s"$base/surv"
    def existing(p: String): Option[DataFrame] = committedDirs(base, p)
      match {
        case Seq() => None
        case dirs => Some(s.read.parquet(dirs: _*))
      }

    val withFp = TextOps.corpusGate(batch)
      .withColumn("fp", fingerprint(col("text")))
    val intra = withFp
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn")
    val fresh = (existing(dedupDir) match {
      case Some(st) => intra.join(st.select(col("fp")), Seq("fp"), "left_anti")
      case None => intra
    }).localCheckpoint()
    val sigNew = TextOps.minhashSignaturesOf(s, fresh).localCheckpoint()
    val bandsNew = TextOps.bandKeys(sigNew)
    val intraCand = bandsNew.as("x").join(bandsNew.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
    val cand = (existing(sigDir) match {
      case Some(st) =>
        TextOps.bandKeys(st).as("x")
          .join(broadcast(bandsNew.as("y")),
            col("x.band") === col("y.band") &&
              col("x.bkey") === col("y.bkey") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .unionByName(intraCand)
      case None => intraCand
    }).distinct().localCheckpoint()
    val candIds = cand.select(col("d1").as("doc_id"))
      .union(cand.select(col("d2").as("doc_id"))).distinct()
    val shNew = fresh.select(col("doc_id"), TextOps.shsetCol.as("shset"))
    val shAll = (existing(shDir) match {
      case Some(st) => st.unionByName(shNew)
      case None => shNew
    }).join(broadcast(candIds), Seq("doc_id"), "left_semi")
    val drops = TextOps.verifySimPairs(cand, shAll)
      .select(col("d2").as("doc_id")).distinct().localCheckpoint()

    // all state reads are materialized (checkpoints) before any write;
    // batch-scoped overwrites, commit marker LAST (see the protocol note)
    fresh.select(col("doc_id"), col("source"), col("n_tok"),
        col("char_sum"), col("fp"))
      .write.mode("overwrite").parquet(s"$dedupDir/batch=$batchId")
    sigNew.write.mode("overwrite").parquet(s"$sigDir/batch=$batchId")
    shNew.write.mode("overwrite").parquet(s"$shDir/batch=$batchId")
    fresh.join(drops, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("n_tok"), col("char_sum"))
      .write.mode("overwrite").parquet(s"$survDir/batch=$batchId")
    marker.getParentFile.mkdirs()
    java.nio.file.Files.writeString(marker.toPath, "ok"): Unit
    Seq(fresh, sigNew, cand, drops).foreach(Relational.unpersistCheckpoint)
  }

  /** The COMMITTED batch dirs of one state surface (uncommitted partial
    * folds are invisible by construction). */
  private def committedDirs(base: String, dir: String): Seq[String] = {
    val dirs = Option(new java.io.File(s"$base/commits").list())
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(id => s"$dir/batch=$id")
      .sorted
    // Every surface dir is written BEFORE its commit marker, so a
    // committed id with a missing dir is corruption or external deletion
    // — fail loudly rather than silently serving a partial manifest
    // (ADVICE r10: the old `.filter(exists)` masked exactly that).
    val missing = dirs.filterNot(p => new java.io.File(p).exists())
    require(missing.isEmpty,
      s"corrupt corpus store: committed batch dirs missing: ${missing.mkString(", ")}")
    dirs
  }

  /** Read one state surface of an incrementally-maintained manifest —
    * the union of committed folds (`surv`, `dedup`, `sig`, `shset`). */
  def state(s: SparkSession, base: String, surface: String): DataFrame = {
    val dirs = committedDirs(base, s"$base/$surface")
    require(dirs.nonEmpty, s"no committed folds under $base/$surface")
    s.read.parquet(dirs: _*)
  }
}
