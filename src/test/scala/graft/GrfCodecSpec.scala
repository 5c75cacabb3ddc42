package graft

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.GrfCodec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GrfCodecSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("encode/decode round-trips arbitrary images exactly") {
    val rnd = new scala.util.Random(4242)
    (1 to 200).foreach { _ =>
      val w = rnd.nextInt(1 << 20)
      val h = rnd.nextInt(1 << 20)
      val px = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(px)
      val back = GrfCodec.decode(GrfCodec.encode(GrfCodec.GrfImage(w, h, px)))
      assert(back.width === w)
      assert(back.height === h)
      assert(back.pixels.toSeq === px.toSeq)
    }
    // empty pixel plane is a legal image (header-only payload)
    val empty = GrfCodec.decode(GrfCodec.encode(GrfCodec.GrfImage(3, 5, Array.empty)))
    assert(empty.width === 3 && empty.height === 5 && empty.pixels.isEmpty)
  }

  test("decode rejects truncated payloads and wrong magic instead of guessing") {
    intercept[IllegalArgumentException] {
      GrfCodec.decode(Array[Byte](0x47, 0x52, 0x46)) // 3 bytes < header
    }
    val wrongMagic = GrfCodec.encode(GrfCodec.GrfImage(4, 4, Array.fill(16)(1: Byte)))
    wrongMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException] { GrfCodec.decode(wrongMagic) }
  }

  test("perceptual near-dup liveness: every planted near-copy pairs with " +
      "its original at hamming <= 1") {
    // plants overwrite ONE decoded pixel — a <= 1-bit dHash perturbation,
    // so the banded join is GUARANTEED to surface every plant; a silent
    // zero here would mean the operator never fires on real data
    val pairs = MultimodalOps.mmNearDup(spark, TestSession.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val expected = MultimodalOps.mediaTable(spark, TestSession.sf)
      .filter(col("doc_id") % 25 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(expected.nonEmpty)
    expected.foreach { id =>
      val po = 1L << 62 // TextOps.PlantOffset (private[ops])
      val hit = pairs.find(p => p._1 === id && p._2 === id + po)
      assert(hit.nonEmpty, s"plant for doc $id not surfaced")
      assert(hit.get._3 <= 1, s"plant for doc $id at hamming ${hit.get._3}")
    }
  }

  test("perceptual near-dup components: every plant family closes into " +
      "one component of size >= 2") {
    val comps = MultimodalOps.mmNearDupComponents(spark, TestSession.sf)
      .collect()
    assert(comps.nonEmpty)
    val plants = MultimodalOps.mediaTable(spark, TestSession.sf)
      .filter(col("doc_id") % 25 === 0).count()
    // every planted near-copy must be IN some component with its original
    assert(comps.map(_.getAs[Long]("n_items")).sum >= 2 * plants)
    assert(comps.forall(_.getAs[Long]("n_items") >= 2L),
      "a singleton component: CC emitted a node with no partner")
  }

  test("silence profile liveness: runs exist and the counters are " +
      "internally consistent") {
    val rows = MultimodalOps.mmSilence(spark, TestSession.sf).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Long]("n_runs") > 0L),
      "degenerate: no doc has a trimmable silent run — threshold dead")
    rows.foreach { r =>
      assert(r.getAs[Long]("longest_run") <= r.getAs[Long]("n_silent"))
      assert(r.getAs[Long]("n_silent") <= r.getAs[Long]("n_samples"))
      val share = r.getAs[Double]("silent_share")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("the dims the decoder parses from payload headers equal the " +
      "metadata columns on every generated row") {
    // the decode query re-derives width/height from bytes alone; the
    // metadata query carries the generation formula — a header-layout or
    // endianness bug diverges them
    val parsed = MultimodalOps.mmDecodeFeatures(spark, TestSession.sf)
      .select(col("doc_id"), col("width"), col("height"))
    val meta = MultimodalOps.mmMetadata(spark, TestSession.sf)
      .select(col("doc_id"), col("width"), col("height"))
    assert(parsed.exceptAll(meta).count() === 0)
    assert(meta.exceptAll(parsed).count() === 0)
  }
}
