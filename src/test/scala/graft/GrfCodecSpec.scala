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
