package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata (the mandated training-data
  * extension). No media codecs ship in this container, so the *decode* step
  * is a clearly-marked deterministic stub ([[FakeDecoder]]); everything
  * around it — binary columns, typed metadata structs, per-partition batch
  * decode, frame slicing, feature vectors — is real Spark plumbing and
  * tested.
  *
  * Scale design: payload bytes never shuffle — metadata extraction and
  * decode are map-side; anything aggregated downstream ships only the
  * (id, features) projection. At 100 TB the payload column lives in its own
  * parquet column chunk, so metadata-only queries never read the bytes
  * (column pruning), which is the whole point of the layout.
  */
object MultimodalOps extends QueryModule {

  /** Synthesized media table: payload = utf8 bytes of the document text
    * (deterministic in both engines), metadata derived from doc_id. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      (lit(64) + col("doc_id") % 128).cast("int").as("width"),
      (lit(48) + col("doc_id") % 96).cast("int").as("height"),
      when(col("doc_id") % 3 === 0, "png")
        .when(col("doc_id") % 3 === 1, "jpeg")
        .otherwise("webp").as("format"))

  /** Metadata + header inspection — pure column ops over the binary. */
  def mmMetadata(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d).select(
      col("doc_id"), col("width"), col("height"), col("format"),
      length(col("payload")).as("n_bytes"),
      hex(substring(col("payload"), 1, 4)).as("header_hex"))

  /** Frame sampling arithmetic: 256-byte "frames", count + sampled count
    * (every 4th frame) — integer math, shuffle-free. */
  def mmFrames(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(col("doc_id"), length(col("payload")).as("n_bytes"))
      .withColumn("n_frames", expr("(n_bytes + 255) div 256"))
      .withColumn("n_sampled", expr("(n_frames + 3) div 4"))

  /** The decode stub: a deterministic fake standing in for a codec. In
    * production this body is the ONLY thing that changes (JNI/codec call);
    * signature, batching shape, and the typed output stay as-is. */
  case class DecodedMedia(doc_id: Long, width: Int, height: Int,
                          mean_byte: Double, n_frames: Long)

  object FakeDecoder {
    /** STUB — deterministic stand-in for image decode: "pixels" are the
      * payload bytes; the feature is the mean of the first 64. */
    def decode(docId: Long, payload: Array[Byte], w: Int, h: Int): DecodedMedia = {
      val head = payload.take(64)
      val mean =
        if (head.isEmpty) 0.0
        else head.map(b => (b & 0xff).toDouble).sum / head.length
      DecodedMedia(docId, w, h, mean, (payload.length + 255L) / 256L)
    }
  }

  /** Per-partition batch decode — the `mapPartitions` shape a real codec
    * needs (amortize per-batch init: codec contexts, GPU handles). Feature
    * rows only from here on; payloads stay behind. */
  def mmDecodeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .select(col("doc_id"), col("payload"), col("width"), col("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        // per-partition init would go here (codec/ctx allocation)
        rows.map { case (id, bytes, w, h) => FakeDecoder.decode(id, bytes, w, h) }
      }
      .toDF()
  }

  /** Resize stub: half each spatial dim (area factor 4) and keep every
    * 4th payload byte as the "downsampled pixel stream" — the same
    * per-partition batch shape a real scaler (libvips/ffmpeg) slots
    * into; arithmetic is SQL-expressible so the plumbing stays
    * hash-checked. */
  def mmResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .select(col("doc_id"), col("payload"), col("width"), col("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, bytes, w, h) =>
          val sampled = Array.range(0, bytes.length, 4).map(bytes(_))
          val mean =
            if (sampled.isEmpty) 0.0
            else sampled.map(b => (b & 0xff).toDouble).sum / sampled.length
          (id, w / 2, h / 2, sampled.length, mean)
        }
      }
      .toDF("doc_id", "new_w", "new_h", "resized_n_bytes", "sample_mean")
  }

  /** Feature-extract-then-aggregate: per-format 16-bin value histogram
    * over each payload's first 64 "pixels" — the corpus-statistics shape
    * (channel distributions, clipping detection) a real vision pipeline
    * aggregates after decode. Payload bytes stay map-side; only (format,
    * bin) pairs reach the shuffle, and the partial agg combines them to
    * ≤ formats×16 rows per task regardless of corpus size. */
  def mmHistogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .select(col("format"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (fmt, bytes) =>
        bytes.take(64).map(b => (fmt, (b & 0xff) / 16))
      })
      .toDF("format", "bin")
      .groupBy(col("format"), col("bin"))
      .agg(count(lit(1)).as("n_bytes"))
  }

  /** Exact payload dedup over the BINARY column — the image-dedup stage a
    * multimodal corpus runs before training: group by md5 of the payload
    * bytes; re-ingested copies (planted: every 25th media row re-issued
    * under doc_id+[[TextOps.PlantOffset]] — same bytes, new id, the
    * corpus-filter honesty device; the high-bit offset cannot collide
    * with a real doc_id at any scale) collapse onto the original (min
    * doc_id). The hash-groupBy
    * ships only (fp, doc_id) — payload bytes never shuffle, the property
    * that matters when the column is 100 TB of images. */
  def mmDedup(s: SparkSession, d: String): DataFrame = {
    val m = mediaTable(s, d).select(col("doc_id"), col("payload"))
    val aug = m.unionAll(m.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + TextOps.PlantOffset).as("doc_id"),
        col("payload")))
    aug.groupBy(md5(col("payload")).as("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_histogram" -> mmHistogram _,
    "q_mm_resize"   -> mmResize _,
    "q_mm_metadata" -> mmMetadata _,
    "q_mm_frames"   -> mmFrames _,
    "q_mm_decode"   -> mmDecodeFeatures _,
    "q_mm_dedup"    -> mmDedup _,
  )

  override val oracles: Map[String, String] = Map(
    "q_mm_dedup" ->
      s"""WITH aug AS (
        |  SELECT doc_id, text FROM documents UNION ALL
        |  SELECT doc_id + ${TextOps.PlantOffset}, text FROM documents WHERE doc_id % 25 = 0)
        |SELECT md5(text) AS fp, COUNT(*) AS n_copies,
        |  MIN(doc_id) AS keep_doc
        |FROM aug GROUP BY 1""".stripMargin,
    "q_mm_histogram" ->
      """WITH m AS (SELECT
        |  CASE WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'webp' END AS format,
        |  hex(encode(text)) AS hx,
        |  LEAST(octet_length(encode(text)), 64) AS n FROM documents),
        |e AS (SELECT format, hx, UNNEST(range(0, n)) AS i FROM m)
        |SELECT format,
        |  ('0x' || substring(hx, 2*i+1, 2))::BIGINT // 16 AS bin,
        |  COUNT(*) AS n_bytes
        |FROM e GROUP BY 1, 2""".stripMargin,
    "q_mm_metadata" ->
      """SELECT doc_id,
        |  CAST(64 + doc_id % 128 AS INT) AS width,
        |  CAST(48 + doc_id % 96 AS INT) AS height,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'webp' END AS format,
        |  octet_length(encode(text)) AS n_bytes,
        |  hex(encode(substring(text, 1, 4))) AS header_hex
        |FROM documents""".stripMargin,
    "q_mm_frames" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  (octet_length(encode(text)) + 255) // 256 AS n_frames,
        |  ((octet_length(encode(text)) + 255) // 256 + 3) // 4 AS n_sampled
        |FROM documents""".stripMargin,
    // The decode STUB's arithmetic (mean of the first 64 payload bytes)
    // happens to be SQL-expressible via hex-string byte access, so the
    // plumbing around a future real codec is still hash-checked; a real
    // codec body would move this back to rows-only.
    "q_mm_decode" ->
      """WITH m AS (SELECT doc_id,
        |  CAST(64 + doc_id % 128 AS INT) AS width,
        |  CAST(48 + doc_id % 96 AS INT) AS height,
        |  encode(text) AS payload FROM documents),
        |s AS (SELECT doc_id, width, height,
        |  octet_length(payload) AS len,
        |  LEAST(octet_length(payload), 64) AS n, hex(payload) AS hx FROM m)
        |SELECT doc_id, width, height,
        |  CASE WHEN n = 0 THEN 0.0
        |    ELSE list_sum(list_transform(range(0, n),
        |      i -> CAST(('0x' || substring(hx, 2*i+1, 2))::BIGINT AS DOUBLE))) / n END
        |    AS mean_byte,
        |  (len + 255) // 256 AS n_frames
        |FROM s""".stripMargin,
    "q_mm_resize" ->
      """WITH m AS (SELECT doc_id,
        |  CAST(64 + doc_id % 128 AS INT) AS width,
        |  CAST(48 + doc_id % 96 AS INT) AS height,
        |  encode(text) AS payload FROM documents),
        |s AS (SELECT doc_id, width, height,
        |  octet_length(payload) AS len,
        |  ((octet_length(payload) + 3) // 4) AS ns, hex(payload) AS hx
        |  FROM m)
        |SELECT doc_id, width // 2 AS new_w, height // 2 AS new_h,
        |  CAST(ns AS INT) AS resized_n_bytes,
        |  CASE WHEN ns = 0 THEN 0.0
        |    ELSE list_sum(list_transform(range(0, ns),
        |      i -> CAST(('0x' || substring(hx, 8*i+1, 2))::BIGINT AS DOUBLE))) / ns END
        |    AS sample_mean
        |FROM s""".stripMargin,
  )
}
