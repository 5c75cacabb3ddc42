package graft

import graft.ops.{CorpusStore, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The corpus-filter flagship driven INCREMENTALLY — the r8 ask: the
  * batch manifest ([[CorpusStore.survivors]]) is gate → exact dedup →
  * near-dup removal computed once; this spec runs the same chain as a
  * STREAM — documents arrive in uneven doc_id-ordered micro-batches,
  * each batch folds into the on-disk state via
  * [[CorpusStore.refreshBatch]] (gates, fp anti-join against the stored
  * index, LSH band probe against the stored signatures, shared-verbatim
  * Jaccard verification, append), and the unioned per-batch survivors
  * must equal the one-shot rebuild ([[TextOps.filteredCorpusOf]]) over
  * everything ingested.
  *
  * Liveness devices, all deterministic:
  *   - the standard exact-dup plants ([[TextOps.plantAugmented]], %40
  *     under +2^62) arrive in a LATER batch than their originals, so the
  *     cross-batch fp anti-join is proven live;
  *   - additional NEAR-dup plants (%7 — coprime to 40 and to every slice
  *     modulus — gate-passing docs re-issued under +2^62+2^61 with two
  *     appended junk tokens, Jaccard ≥ 0.93 vs the original) land in the
  *     LAST batch, so cross-batch LSH probe + verification is proven
  *     live (at least one must be dropped; the equality assert is the
  *     full correctness proof);
  *   - one batch is REPLAYED verbatim (at-least-once delivery): the fp
  *     anti-join must make it a no-op — checked via the dedup index
  *     staying duplicate-free.
  * Runs on the session-wide RocksDB state store like every streaming
  * spec. */
case class CorpusDoc(doc_id: Long, text: String, source: String)

class CorpusStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("foreachBatch refreshBatch over doc_id-ordered batches equals the " +
      "one-shot corpus-filter rebuild, plants and replay included") {
    implicit val sqlCtx = spark.sqlContext
    val po2 = (1L << 62) + (1L << 61) // TextOps.PlantOffset2 (private[ops])
    val base0 = Tables.documents(spark, TestSession.sf)
      .select(col("doc_id"), col("text"), col("source"))
    // near-dup plants from GATE-PASSING docs so each one reaches the
    // pairwise stage with its original guaranteed present in the index
    val nearPlants = TextOps.corpusGate(base0)
      .filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + po2).as("doc_id"),
        concat(col("text"), lit(" zzz aaa")).as("text"), col("source"))
    val aug = TextOps.plantAugmented(base0).unionAll(nearPlants)
      .localCheckpoint()

    val rows = aug.orderBy(col("doc_id")).as[CorpusDoc].collect().toSeq
    val n = rows.count(_.doc_id < (1L << 62)) // the un-planted prefix
    val slices = Seq(rows.slice(0, n / 3), rows.slice(n / 3, n / 3 + 1),
      rows.slice(n / 3 + 1, n),
      rows.slice(n / 3 + 1, n), // replay: a full batch re-delivered
      rows.slice(n, rows.size)) // both plant families arrive last

    val store = java.nio.file.Files.createTempDirectory("corpusinc").toString
    val in = MemoryStream[CorpusDoc]
    var lastId = -1L
    val q = in.toDS().toDF().writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // crash-mid-fold simulation (the ADVICE scenario): before the
        // LAST batch folds, fake a prior crashed attempt of the SAME
        // batch id — a partial, uncommitted dedup dir (stale bytes copied
        // from an earlier fold). The transactional protocol must (a) not
        // read it as state and (b) overwrite it cleanly on this "replay".
        if (id == 4) {
          val crashed = new java.io.File(s"$store/dedup/batch=$id")
          crashed.mkdirs()
          val donor = new java.io.File(s"$store/dedup/batch=0")
          donor.listFiles().foreach { f =>
            java.nio.file.Files.copy(f.toPath,
              new java.io.File(crashed, f.getName).toPath): Unit
          }
        }
        lastId = id
        CorpusStore.refreshBatch(spark, store, id, batch)
        // committed-fold replay is a no-op (foreachBatch retry of the
        // same id): state must be byte-stable across the second call
        val before = CorpusStore.state(spark, store, "surv").count()
        CorpusStore.refreshBatch(spark, store, id, batch)
        assert(CorpusStore.state(spark, store, "surv").count() === before)
        ()
      }
      .start()
    slices.foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    q.stop()
    assert(lastId === 4L) // the crash simulation actually ran

    def sorted(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val maintained = sorted(CorpusStore.state(spark, store, "surv"))
    val rebuilt = sorted(TextOps.filteredCorpusOf(spark, aug))
    assert(maintained === rebuilt,
      "incremental survivor manifest diverged from the one-shot rebuild")

    val dedupIds = CorpusStore.state(spark, store, "dedup")
      .select("doc_id").as[Long].collect().toSet
    val survIds = CorpusStore.state(spark, store, "surv")
      .select("doc_id").as[Long].collect().toSet
    // replay idempotence: the index holds each doc at most once
    assert(dedupIds.size ===
      CorpusStore.state(spark, store, "dedup").count().toInt)
    // cross-batch exact dedup live: every %40 plant (byte-copy of an
    // earlier-batch original) died at the fp anti-join — none reached
    // the dedup index, none survived
    assert(!dedupIds.exists(id => id >= (1L << 62) && id < po2),
      "an exact-dup plant leaked past the cross-batch fp anti-join")
    // cross-batch NEAR-dup live: near plants reached the index in the
    // last batch and at least one was dropped against an earlier batch
    val nearInIndex = dedupIds.filter(_ >= po2)
    assert(nearInIndex.nonEmpty, "no near-dup plant reached the index")
    assert((nearInIndex -- survIds).nonEmpty,
      "no near-dup plant was dropped — cross-batch LSH probe dead?")
  }
}
