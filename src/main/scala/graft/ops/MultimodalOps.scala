package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata (the mandated training-data
  * extension). No media codecs ship in this container, so payloads use the
  * synthetic [[GrfCodec]] container — a REAL byte layout (magic +
  * big-endian dimension header + pixel plane) that the decode stage
  * genuinely parses, not a pass-through fake. Swapping GRF1 for
  * PNG/JPEG means swapping [[GrfCodec.decode]]'s body for a codec call;
  * every Spark-side shape (binary columns, typed metadata structs,
  * per-partition batch decode, frame slicing, feature vectors) stays.
  *
  * Scale design: payload bytes never shuffle — metadata extraction and
  * decode are map-side; anything aggregated downstream ships only the
  * (id, features) projection. At 100 TB the payload column lives in its own
  * parquet column chunk, so metadata-only queries never read the bytes
  * (column pruning), which is the whole point of the layout.
  */
object MultimodalOps extends QueryModule {

  /** The synthetic GRF1 image container:
    * {{{
    *   bytes 0..3   magic "GRF1"
    *   bytes 4..7   width,  uint32 big-endian
    *   bytes 8..11  height, uint32 big-endian
    *   bytes 12..   grayscale pixel plane, 1 byte/px
    * }}}
    * Encode/decode are exact inverses (GrfCodecSpec property-tests the
    * round-trip); decode REJECTS truncated or wrong-magic payloads rather
    * than guessing. The correctness gate exercises the parser for real:
    * q_mm_decode emits the PARSED width/height, and the DuckDB oracle
    * derives them from the generation formula — a flipped endianness or
    * off-by-one header slice hash-mismatches immediately. */
  object GrfCodec {
    val HeaderLen = 12
    val Magic: Array[Byte] = "GRF1".getBytes("UTF-8")

    case class GrfImage(width: Int, height: Int, pixels: Array[Byte])

    def encode(img: GrfImage): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(HeaderLen + img.pixels.length)
      bb.put(Magic).putInt(img.width).putInt(img.height).put(img.pixels)
      bb.array()
    }

    def decode(payload: Array[Byte]): GrfImage = {
      require(payload.length >= HeaderLen,
        s"truncated GRF1 payload: ${payload.length} bytes")
      require(java.util.Arrays.equals(payload, 0, 4, Magic, 0, 4),
        "bad GRF1 magic")
      val bb = java.nio.ByteBuffer.wrap(payload, 4, 8)
      val w = bb.getInt()
      val h = bb.getInt()
      GrfImage(w, h,
        java.util.Arrays.copyOfRange(payload, HeaderLen, payload.length))
    }
  }

  /** Synthesized media table: each payload is a well-formed GRF1 blob —
    * magic, big-endian dims (the metadata formula), then the utf8 text
    * bytes as the pixel plane (deterministic in both engines). The header
    * is built with codegen'd column ops (unhex of zero-padded hex = the
    * big-endian byte encoding), so generation itself never leaves
    * whole-stage codegen. */
  def mediaTable(s: SparkSession, d: String): DataFrame = {
    val w = (lit(64) + col("doc_id") % 128).cast("int")
    val h = (lit(48) + col("doc_id") % 96).cast("int")
    Tables.documents(s, d).select(
      col("doc_id"),
      concat(
        encode(lit("GRF1"), "UTF-8"),
        unhex(lpad(hex(w), 8, "0")),
        unhex(lpad(hex(h), 8, "0")),
        encode(col("text"), "UTF-8")).as("payload"),
      w.as("width"), h.as("height"),
      when(col("doc_id") % 3 === 0, "png")
        .when(col("doc_id") % 3 === 1, "jpeg")
        .otherwise("webp").as("format"))
  }

  /** Metadata + header inspection — pure column ops over the binary; the
    * full 12-byte GRF1 header surfaces as hex (magic + both dims). */
  def mmMetadata(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d).select(
      col("doc_id"), col("width"), col("height"), col("format"),
      length(col("payload")).as("n_bytes"),
      hex(substring(col("payload"), 1, GrfCodec.HeaderLen)).as("header_hex"))

  /** Frame sampling arithmetic: 256-byte "frames" of the payload stream,
    * count + sampled count (every 4th frame) — integer math, shuffle-free. */
  def mmFrames(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(col("doc_id"), length(col("payload")).as("n_bytes"))
      .withColumn("n_frames", expr("(n_bytes + 255) div 256"))
      .withColumn("n_sampled", expr("(n_frames + 3) div 4"))

  /** Typed decode output: parsed dims + first-64-pixel mean + 256-px frame
    * count — the (id, features) projection that is all downstream ever
    * shuffles. */
  case class DecodedMedia(doc_id: Long, width: Int, height: Int,
                          mean_byte: Double, n_frames: Long)

  /** Per-partition batch decode — the `mapPartitions` shape a real codec
    * needs (amortize per-batch init: codec contexts, GPU handles). The
    * width/height emitted here are PARSED from the payload header by
    * [[GrfCodec.decode]], never copied from the metadata columns — the
    * oracle hash-checks the parse against the generation formula. Feature
    * rows only from here on; payloads stay behind. */
  def mmDecodeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would go here (codec/ctx allocation)
        rows.map { case (id, bytes) =>
          val img = GrfCodec.decode(bytes)
          val head = img.pixels.take(64)
          val mean =
            if (head.isEmpty) 0.0
            else head.map(b => (b & 0xff).toDouble).sum / head.length
          DecodedMedia(id, img.width, img.height, mean,
            (img.pixels.length + 255L) / 256L)
        }
      }
      .toDF()
  }

  /** Resize: decode, halve each parsed spatial dim (area factor 4), keep
    * every 4th DECODED pixel as the downsampled stream — the same
    * per-partition batch shape a real scaler (libvips/ffmpeg) slots into;
    * the arithmetic is SQL-expressible so the plumbing stays hash-checked. */
  def mmResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = GrfCodec.decode(bytes)
          val sampled = Array.range(0, img.pixels.length, 4).map(img.pixels(_))
          val mean =
            if (sampled.isEmpty) 0.0
            else sampled.map(b => (b & 0xff).toDouble).sum / sampled.length
          (id, img.width / 2, img.height / 2, sampled.length, mean)
        }
      }
      .toDF("doc_id", "new_w", "new_h", "resized_n_bytes", "sample_mean")
  }

  /** Feature-extract-then-aggregate: per-format 16-bin value histogram
    * over each image's first 64 DECODED pixels — the corpus-statistics
    * shape (channel distributions, clipping detection) a real vision
    * pipeline aggregates after decode. Payload bytes stay map-side; only
    * (format, bin) pairs reach the shuffle, and the partial agg combines
    * them to ≤ formats×16 rows per task regardless of corpus size. */
  def mmHistogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .select(col("format"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (fmt, bytes) =>
        GrfCodec.decode(bytes).pixels.take(64).map(b => (fmt, (b & 0xff) / 16))
      })
      .toDF("format", "bin")
      .groupBy(col("format"), col("bin"))
      .agg(count(lit(1)).as("n_bytes"))
  }

  /** Exact content dedup over the BINARY column — the image-dedup stage a
    * multimodal corpus runs before training. The fingerprint hashes the
    * PIXEL PLANE (payload minus the 12-byte header), not the container:
    * identical images whose headers were re-stamped at ingest must still
    * collapse — the same reason production image dedup hashes decoded
    * bytes, not files. Re-ingested copies (planted: every 25th media row
    * re-issued under doc_id+[[TextOps.PlantOffset]] — same bytes, new id,
    * the corpus-filter honesty device; the high-bit offset cannot collide
    * with a real doc_id at any scale) collapse onto the original (min
    * doc_id). The hash-groupBy ships only (fp, doc_id) — payload bytes
    * never shuffle, the property that matters when the column is 100 TB
    * of images. */
  def mmDedup(s: SparkSession, d: String): DataFrame = {
    val m = mediaTable(s, d).select(col("doc_id"), col("payload"))
    val aug = m.unionAll(m.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + TextOps.PlantOffset).as("doc_id"),
        col("payload")))
    aug.groupBy(
        md5(expr(s"substring(payload, ${GrfCodec.HeaderLen + 1}, " +
          s"length(payload) - ${GrfCodec.HeaderLen})")).as("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc"))
  }

  /** Scene-cut candidates — the temporal member of the multimodal shelf
    * (frame-sequence analysis next to the spatial decode/resize/histogram
    * ops): the decoded pixel stream is treated as a sequence of full
    * 256-byte frames (the [[mmFrames]] framing), each consecutive pair
    * scored by the sum of absolute per-position byte differences (the
    * classic mean-absolute-difference cut detector), and the corpus-wide
    * top-20 sharpest temporal gradients emitted with a total-order
    * tie-break. Integer arithmetic end to end — hash-exact.
    *
    * Scale: per-partition batch decode exactly like [[mmDecodeFeatures]]
    * (payload bytes never shuffle; only (doc, boundary, diff) triples
    * leave the map stage), and the global top-20 runs through
    * `orderBy(...).limit`, which Spark plans as TakeOrderedAndProject —
    * per-partition bounded top-k then a 20-row merge, no full sort at
    * any corpus size. A real detector swaps the byte MAD for a codec
    * call per frame pair; every Spark-side shape stays. */
  def mmSceneCut(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val diffs = mediaTable(s, d)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val px = GrfCodec.decode(bytes).pixels
          val nFull = px.length / 256
          (0 until nFull - 1).iterator.map { f =>
            var sum = 0L
            var i = 0
            while (i < 256) {
              sum += math.abs((px(f * 256 + i) & 0xff) -
                (px((f + 1) * 256 + i) & 0xff))
              i += 1
            }
            (id, f.toLong, sum)
          }
        }
      }
      .toDF("doc_id", "boundary", "diff")
    val ord = Seq(col("diff").desc, col("doc_id").asc, col("boundary").asc)
    diffs.orderBy(ord: _*).limit(20)
      .withColumn("rank",
        row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .select(col("rank"), col("doc_id"), col("boundary"), col("diff"))
  }

  /** 60-bit perceptual difference-hash (dHash) over the DECODED pixel
    * stream: 61 pixels sampled at the evenly-spaced positions
    * pos_i = ⌊i·(n−1)/60⌋, bit i set iff px[pos_i] > px[pos_{i+1}] — the
    * classic gradient-sign fingerprint, robust to small local edits
    * because one changed pixel flips at most the bits that sample it.
    * 60 bits (not 64) keeps the value in signed-long range in both
    * engines — the [[TextOps.simhashWideDocs]] fp60 device. Decode is the
    * same per-partition batch shape as [[mmDecodeFeatures]]: payload
    * bytes never leave the map stage; only (doc_id, long) pairs shuffle. */
  private def mmDhash(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val px = GrfCodec.decode(bytes).pixels
          val n = px.length
          var h = 0L
          if (n >= 2) {
            var i = 0
            while (i < 60) {
              val p0 = (i.toLong * (n - 1) / 60).toInt
              val p1 = ((i + 1).toLong * (n - 1) / 60).toInt
              if ((px(p0) & 0xff) > (px(p1) & 0xff)) h |= 1L << i
              i += 1
            }
          }
          (id, h)
        }
      }.toDF("doc_id", "dhash60")
  }

  /** Multimodal PERCEPTUAL near-duplicate detection — the stage
    * [[mmDedup]]'s exact payload-md5 cannot cover: re-encoded or slightly
    * retouched copies of the same image hash to different bytes but
    * nearly identical dHashes. Candidates come from the
    * [[TextOps.bandedDups]] device (4×15-bit bands over [[mmDhash]];
    * hamming ≤ 3 pairs are GUARANTEED to share a band, 4–6 best-effort —
    * banded recall, the LSH tradeoff), verified by popcount of the XOR
    * ≤ 6. Liveness is proven with PLANTED near-copies: every 25th media
    * row re-issued at doc_id+[[TextOps.PlantOffset]] with its FIRST
    * DECODED PIXEL overwritten (0x7e) — a ≤ 1-bit dHash perturbation, so
    * banding must catch every plant (GrfCodecSpec asserts it; the
    * corpus itself is dup-free).
    *
    * Scale: payload bytes never shuffle (dHash is map-side behind the
    * batch decode); the self-join cost is band collisions, never
    * all-pairs, with per-band keyspace 2^15 widening with the hash-width
    * dial exactly as [[TextOps.simhashWideDups]] documents. Degenerate
    * tiny images (n < 2 ⇒ dhash 0) would pile into one bucket — at 100 TB
    * the upstream length gate (or a min-resolution filter) keeps the
    * bucket bounded; sf-corpus texts are all ≥ the sampling span. */
  def mmNearDup(s: SparkSession, d: String): DataFrame = {
    val m = mediaTable(s, d).select(col("doc_id"), col("payload"))
    val plants = m.filter(col("doc_id") % 25 === 0).select(
      (col("doc_id") + TextOps.PlantOffset).as("doc_id"),
      concat(
        substring(col("payload"), 1, GrfCodec.HeaderLen),
        encode(lit("~"), "UTF-8"),
        substring(col("payload"), lit(GrfCodec.HeaderLen + 2),
          length(col("payload")) - GrfCodec.HeaderLen - 1)).as("payload"))
    TextOps.bandedDups(mmDhash(s, m.unionAll(plants)), "dhash60",
      nBands = 4, bandBits = 15, maxHamming = 6)
  }

  /** "Silent" sample threshold for [[mmSilence]]: on the GRF1 pixel
    * plane (utf8 bytes, measured range 32..116) anything below 'e'
    * (101) plays the role a real audio gate gives low-amplitude
    * samples — low enough that runs are nontrivial, high enough they
    * exist. A real pipeline tunes this against its own amplitude
    * distribution; the RLE mechanism is what's gated. */
  val SilenceThreshold = 101
  /** Minimum run length counted as a trim-able silence segment. */
  val SilenceMinRun = 3

  /** Silence/run-length profile — the AUDIO-pipeline analysis shape
    * (silence trimming, voice-activity segmentation) over the decoded
    * sample stream: per payload, the count of "silent" samples (below
    * [[SilenceThreshold]]), the number of maximal silent RUNS of length
    * ≥ [[SilenceMinRun]] (the segments a trimmer would cut), the longest
    * run, and the silent share (one IEEE division). The per-doc walk is
    * a single typed pass over the decoded bytes — the
    * [[mmDecodeFeatures]] batch shape, hot loop in mapPartitions per the
    * module's codegen-fallback discipline; the DuckDB oracle re-derives
    * the identical runs declaratively (gaps-and-islands over the hex
    * stream), so the imperative RLE is hash-proven against the
    * relational formulation. Payload bytes never shuffle; only the
    * 6-column profile row leaves the map stage. */
  def mmSilence(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val px = GrfCodec.decode(bytes).pixels
          var nSilent = 0L; var nRuns = 0L; var longest = 0L; var cur = 0L
          var i = 0
          while (i < px.length) {
            if ((px(i) & 0xff) < SilenceThreshold) {
              cur += 1; nSilent += 1
              if (cur == SilenceMinRun) nRuns += 1
              if (cur > longest) longest = cur
            } else cur = 0
            i += 1
          }
          (id, px.length.toLong, nSilent, nRuns, longest)
        }
      }.toDF("doc_id", "n_samples", "n_silent", "n_runs", "longest_run")
      .withColumn("silent_share",
        when(col("n_samples") === 0, lit(null).cast("double"))
          .otherwise(col("n_silent").cast("double")
            / col("n_samples").cast("double")))
  }

  /** Perceptual near-dup FAMILIES — [[mmNearDup]]'s pair graph folded to
    * connected components (the modality-agnostic
    * [[TextOps.connectedComponents]] O(log diameter) loop, third member
    * after the text and embedding CC queries): re-encoded copies of one
    * image chain through intermediates, and dedup keeps one per FAMILY,
    * not one per pair. Components are collision-sized (≈ dup families),
    * so everything after the banded pair join is tiny. */
  def mmNearDupComponents(s: SparkSession, d: String): DataFrame =
    TextOps.connectedComponents(
        mmNearDup(s, d).select(col("d1"), col("d2")))
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("n_items"), max(col("id")).as("max_doc"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_neardup"  -> mmNearDup _,
    "q_mm_neardup_components" -> mmNearDupComponents _,
    "q_mm_silence"  -> mmSilence _,
    "q_mm_scenecut" -> mmSceneCut _,
    "q_mm_histogram" -> mmHistogram _,
    "q_mm_resize"   -> mmResize _,
    "q_mm_metadata" -> mmMetadata _,
    "q_mm_frames"   -> mmFrames _,
    "q_mm_decode"   -> mmDecodeFeatures _,
    "q_mm_dedup"    -> mmDedup _,
  )

  // Oracle note: the pixel plane IS encode(text), and the header dims ARE
  // the doc_id formula — so DuckDB mirrors the DECODED view directly (it
  // never re-parses the container; Spark does, and the hash gate compares
  // the two derivations cell-for-cell).

  /** dHash + band-join CTE chain (plant-augmented corpus → 60-bit dHash →
    * 4×15-bit band candidates), shared VERBATIM by `q_mm_neardup` and
    * `q_mm_neardup_components` so the signature definition can never
    * drift between the pair query and its clustering. */
  private val mmNearDupCtes: String =
    s"""base AS (SELECT doc_id, hex(encode(text)) AS hx
       |              FROM documents),
       |aug AS (
       |  SELECT doc_id, hx FROM base
       |  UNION ALL
       |  SELECT doc_id + ${TextOps.PlantOffset}, '7E' || substring(hx, 3)
       |  FROM base WHERE doc_id % 25 = 0),
       |sig AS (
       |  SELECT doc_id,
       |    CASE WHEN length(hx) >= 4 THEN
       |      CAST(list_sum(list_transform(range(0, 60), i ->
       |        CASE WHEN
       |          ('0x'||substring(hx,
       |             2*((i*(length(hx)//2 - 1))//60)+1, 2))::BIGINT >
       |          ('0x'||substring(hx,
       |             2*(((i+1)*(length(hx)//2 - 1))//60)+1, 2))::BIGINT
       |        THEN (1::BIGINT << CAST(i AS INT)) ELSE 0 END)) AS BIGINT)
       |    ELSE 0 END AS dhash60
       |  FROM aug),
       |b AS (SELECT doc_id, dhash60,
       |        (dhash60 >> (15*band)) & 32767 AS bval, band
       |      FROM sig CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS band)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
       |    CAST(bit_count(xor(x.dhash60, y.dhash60)) AS INT) AS hamming
       |  FROM b x JOIN b y
       |    ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id)""".stripMargin

  override val oracles: Map[String, String] = Map(
    // byte-level mirror: the pixel plane IS encode(text), so the plant's
    // first-pixel overwrite is '7E' spliced into the hex stream (never a
    // character edit — multibyte chars would diverge from Spark's byte op)
    "q_mm_neardup" ->
      s"""WITH $mmNearDupCtes
        |SELECT d1, d2, hamming FROM cand WHERE hamming <= 6""".stripMargin,
    // shares the dHash/band CTEs VERBATIM with q_mm_neardup; the CC tail
    // is the q_neardup_components reachability device (mirror written
    // DISTINCT-over-UNION-ALL per the CLAUDE.md recursive-WITH rule —
    // arms are disjoint today, but bare UNION would silently lose dedup
    // the day they overlap)
    "q_mm_neardup_components" ->
      s"""WITH RECURSIVE $mmNearDupCtes,
        |p AS (SELECT d1, d2 FROM cand WHERE hamming <= 6),
        |e AS (SELECT DISTINCT d1, d2 FROM (
        |  SELECT d1, d2 FROM p UNION ALL SELECT d2, d1 FROM p)),
        |reach(src, dst) AS (
        |  SELECT d1, d1 FROM e
        |  UNION
        |  SELECT r.src, e.d2 FROM reach r JOIN e ON r.dst = e.d1),
        |lab AS (SELECT src AS id, MIN(dst) AS comp FROM reach GROUP BY src)
        |SELECT comp, COUNT(*) AS n_items, MAX(id) AS max_doc
        |FROM lab GROUP BY comp""".stripMargin,
    // gaps-and-islands over the hex byte stream — the declarative twin of
    // the typed RLE walk; run groups key on i − row_number() among the
    // silent positions (the classic island id, deterministic per doc)
    "q_mm_silence" ->
      s"""WITH m AS (SELECT doc_id, hex(encode(text)) AS hx,
        |             octet_length(encode(text)) AS n FROM documents),
        |px AS (SELECT doc_id, n, CAST(i AS BIGINT) AS i,
        |         CASE WHEN ('0x'||substring(hx, 2*CAST(i AS INT)+1, 2))
        |                ::BIGINT < $SilenceThreshold
        |              THEN 1 ELSE 0 END AS s
        |       FROM m, UNNEST(range(n)) AS t(i)),
        |sil AS (SELECT doc_id, i,
        |          i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i)
        |            AS grp
        |        FROM px WHERE s = 1),
        |runs AS (SELECT doc_id, grp, COUNT(*) AS len
        |         FROM sil GROUP BY doc_id, grp),
        |agg AS (SELECT doc_id,
        |          CAST(SUM(len) AS BIGINT) AS n_silent,
        |          CAST(COUNT(CASE WHEN len >= $SilenceMinRun THEN 1 END)
        |            AS BIGINT) AS n_runs,
        |          CAST(MAX(len) AS BIGINT) AS longest_run
        |        FROM runs GROUP BY doc_id)
        |SELECT m.doc_id AS doc_id, CAST(n AS BIGINT) AS n_samples,
        |  COALESCE(n_silent, 0) AS n_silent,
        |  COALESCE(n_runs, 0) AS n_runs,
        |  COALESCE(longest_run, 0) AS longest_run,
        |  CASE WHEN n = 0 THEN NULL
        |       ELSE CAST(COALESCE(n_silent, 0) AS DOUBLE) / n
        |  END AS silent_share
        |FROM m LEFT JOIN agg USING (doc_id)""".stripMargin,
    "q_mm_scenecut" ->
      """WITH m AS (SELECT doc_id, hex(encode(text)) AS hx,
        |             octet_length(encode(text)) // 256 AS n_full
        |           FROM documents),
        |pr AS (SELECT doc_id, hx, UNNEST(range(0, n_full - 1)) AS f
        |       FROM m WHERE n_full >= 2),
        |d AS (SELECT doc_id, f AS boundary,
        |        CAST(list_sum(list_transform(range(0, 256), i ->
        |          abs(('0x'||substring(hx, 2*(f*256+i)+1, 2))::BIGINT -
        |              ('0x'||substring(hx, 2*((f+1)*256+i)+1, 2))::BIGINT)))
        |          AS BIGINT) AS diff
        |      FROM pr)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY diff DESC, doc_id ASC,
        |    boundary ASC) AS BIGINT) AS rank,
        |  doc_id, boundary, diff
        |FROM d QUALIFY rank <= 20""".stripMargin,
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
        |  octet_length(encode(text)) + 12 AS n_bytes,
        |  hex(encode('GRF1'))
        |    || lpad(hex(64 + doc_id % 128), 8, '0')
        |    || lpad(hex(48 + doc_id % 96), 8, '0') AS header_hex
        |FROM documents""".stripMargin,
    "q_mm_frames" ->
      """SELECT doc_id, octet_length(encode(text)) + 12 AS n_bytes,
        |  (octet_length(encode(text)) + 12 + 255) // 256 AS n_frames,
        |  ((octet_length(encode(text)) + 12 + 255) // 256 + 3) // 4 AS n_sampled
        |FROM documents""".stripMargin,
    "q_mm_decode" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(64 + doc_id % 128 AS INT) AS width,
        |  CAST(48 + doc_id % 96 AS INT) AS height,
        |  octet_length(encode(text)) AS len,
        |  LEAST(octet_length(encode(text)), 64) AS n,
        |  hex(encode(text)) AS hx FROM documents)
        |SELECT doc_id, width, height,
        |  CASE WHEN n = 0 THEN 0.0
        |    ELSE list_sum(list_transform(range(0, n),
        |      i -> CAST(('0x' || substring(hx, 2*i+1, 2))::BIGINT AS DOUBLE))) / n END
        |    AS mean_byte,
        |  (len + 255) // 256 AS n_frames
        |FROM s""".stripMargin,
    "q_mm_resize" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(64 + doc_id % 128 AS INT) AS width,
        |  CAST(48 + doc_id % 96 AS INT) AS height,
        |  octet_length(encode(text)) AS len,
        |  ((octet_length(encode(text)) + 3) // 4) AS ns,
        |  hex(encode(text)) AS hx FROM documents)
        |SELECT doc_id, width // 2 AS new_w, height // 2 AS new_h,
        |  CAST(ns AS INT) AS resized_n_bytes,
        |  CASE WHEN ns = 0 THEN 0.0
        |    ELSE list_sum(list_transform(range(0, ns),
        |      i -> CAST(('0x' || substring(hx, 8*i+1, 2))::BIGINT AS DOUBLE))) / ns END
        |    AS sample_mean
        |FROM s""".stripMargin,
  )
}
