package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("native FloatDotProduct is bit-identical to the HOF fold") {
    val e = Tables.embeddings(spark, TestSession.sf)
    val diff = e.select(
        VectorFunctions.dot(col("embedding"), col("embedding")).as("native"),
        VectorFunctions.dotHof(col("embedding"), col("embedding")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff === 0)
  }

  test("fast mapPartitions LSH buckets equal the Column-HOF reference impl") {
    import org.apache.spark.sql.functions.col
    val planes = VectorFunctions.hyperplanes(8, 64)
    val hof = Tables.embeddings(spark, TestSession.sf)
      .select(col("vec_id"),
        VectorFunctions.lshBucket(col("embedding"), planes).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fast = ops.VectorOps.lshBuckets(spark, TestSession.sf)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(fast === hof)
  }

  test("approximate ANN variants recall against brute-force ground truth") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(ops.VectorOps.annBruteforce(spark, TestSession.sf))
    val lsh = pairs(ops.VectorOps.annLsh(spark, TestSession.sf))
    val ivf = pairs(ops.VectorOps.ivfTopk(spark, TestSession.sf))
    // approximate methods must (a) return candidates and (b) overlap the
    // exact top-k — they search 1/256 (LSH) or 1/#labels (IVF) of the
    // space, so the floor is deliberately loose; the point is a regression
    // tripwire if bucketing/centroids break silently
    assert(lsh.nonEmpty && ivf.nonEmpty)
    assert((lsh & truth).nonEmpty, "sign-LSH found no true neighbor")
    assert((ivf & truth).nonEmpty, "IVF found no true neighbor")
  }

  test("recall audit: per-probe recall is consistent with ground truth " +
      "and multi-probe recall dominates the single-bucket path") {
    // probing MORE buckets can never lower recall: the candidate set
    // grows, and any exact-top-5 member among candidates outranks every
    // non-member under the same sim order. A violation means the probe
    // fan-out or the top-k merge broke.
    def recallByProbe(df: org.apache.spark.sql.DataFrame,
        truth: Map[Long, Set[Long]]): Map[Long, Int] =
      df.select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1)
        .map { case (p, rows) =>
          p -> rows.map(_._2).count(truth(p).contains) }
    val truth = ops.VectorOps.annBruteforce(spark, TestSession.sf)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2).toSet }
    val single = recallByProbe(
      ops.VectorOps.annLsh(spark, TestSession.sf), truth)
    val multi = recallByProbe(
      ops.VectorOps.annMultiprobe(spark, TestSession.sf), truth)
    truth.keys.foreach { p =>
      assert(multi.getOrElse(p, 0) >= single.getOrElse(p, 0),
        s"probe $p: multi-probe recall below single-bucket")
    }
    // and the gated audit query reports exactly these counts
    val audited = ops.VectorOps.annRecall(spark, TestSession.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(audited === truth.keys.map(p =>
      p -> multi.getOrElse(p, 0).toLong).toMap)
  }

  test("trained-PQ re-rank recall@5 vs exact-L2 ground truth") {
    import org.apache.spark.sql.expressions.Window
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = graft.Tables.embeddings(spark, TestSession.sf)
    val probes = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
    // exact L2 truth (algebraic form is fine for a ranking ground truth)
    val scored = e
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec"))
      .crossJoin(broadcast(probes))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        (VectorFunctions.normSq(col("pvec")) +
          VectorFunctions.normSq(col("nvec")) -
          lit(2.0) * VectorFunctions.dot(col("pvec"), col("nvec"))).as("d"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("d").asc, col("neighbor_id").asc)
    val truth = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the ADC shortlist (100) held the full exact top-5 when measured;
    // the floor leaves margin for near-tie flips only
    val pq = pairs(ops.VectorOps.annPq(spark, TestSession.sf))
    assert(pq.size === truth.size)
    val recall = (pq & truth).size.toDouble / truth.size
    assert(recall >= 0.85, s"PQ re-rank recall@5 = $recall")
    // IVFPQ searches one list per probe — dense ranks, plausible overlap
    val ivfpq = ops.VectorOps.annIvfPq(spark, TestSession.sf).collect()
    assert(ivfpq.nonEmpty)
    ivfpq.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(3)).sorted.toSeq
      assert(ranks === (1 to ranks.size))
    }
    // the TRAINED coarse quantizer is live: with k-means lists the mean
    // recall@5 measures 0.83–0.88; random-label assignment measured
    // 0–0.4 (r8's gated audit). The 0.5 floor trips a silent regression
    // back to untrained lists while leaving noise margin.
    val ivfpqPairs = ivfpq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpqRecall = (ivfpqPairs & truth).size.toDouble / truth.size
    assert(ivfpqRecall >= 0.5,
      s"IVFADC recall@5 = $ivfpqRecall — trained coarse quantizer dead?")
    // nprobe=2 widens the boundary recall (measured 0.925 vs 0.875 at
    // sf0.001). Floor 0.85: deterministic chain on a FIXED corpus, but
    // the driver regenerates testdata between rounds, so the floor keeps
    // a 0.075 margin below the measured point (ADVICE r11 — the r11
    // 0.9 floor left only 0.025 of regeneration headroom)
    val mp = ops.VectorOps.annIvfPqMp(spark, TestSession.sf).collect()
    val mpPairs = mp.map(r => (r.getLong(0), r.getLong(1))).toSet
    val mpRecall = (mpPairs & truth).size.toDouble / truth.size
    assert(mpRecall >= 0.85,
      s"IVFADC nprobe=2 recall@5 = $mpRecall — multi-probe dial broken?")
    // nprobe=4 (measured 0.95 at sf0.001), same regeneration-proof floor
    val mp4 = ops.VectorOps.annIvfPqMp4(spark, TestSession.sf).collect()
    val mp4Pairs = mp4.map(r => (r.getLong(0), r.getLong(1))).toSet
    val mp4Recall = (mp4Pairs & truth).size.toDouble / truth.size
    assert(mp4Recall >= 0.85,
      s"IVFADC nprobe=4 recall@5 = $mp4Recall — multi-probe dial broken?")
    // Monotonicity along the dial is structural for CANDIDATE sets
    // (rank ≤ 1 ⊂ rank ≤ 2 ⊂ rank ≤ 4 lists) but NOT for post-shortlist
    // recall: a widened candidate set can displace a true neighbor from
    // the fixed-size ADC shortlist before the exact re-rank (ADVICE r11).
    // Logged diagnostic, not a hard assert — empirically monotone on
    // every corpus measured so far (0.875 → 0.925 → 0.95).
    info(f"IVFADC recall@5 dial: nprobe=1 $ivfpqRecall%.3f, " +
      f"nprobe=2 $mpRecall%.3f, nprobe=4 $mp4Recall%.3f" +
      (if (mp4Recall < mpRecall || mpRecall < ivfpqRecall)
        " — NON-MONOTONE this corpus (shortlist displacement)" else ""))
  }

  test("two-level topKPerProbe equals the single global window, " +
      "including duplicate-sim ties across partitions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // seeded rows with deliberately clustered sims so ties cross partition
    // boundaries: sim has only 7 distinct values per probe
    val rnd = new scala.util.Random(42)
    val rows = for (p <- 0L until 6L; n <- 0L until 200L) yield
      (p, n, (rnd.nextInt(7) + 1).toDouble / 7.0)
    val scored = rows.toDF("probe_id", "neighbor_id", "sim")
      .repartition(16)
    val got = ops.VectorOps.topKPerProbe(scored, 5)
      .select("probe_id", "neighbor_id", "rank")
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val want = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("probe_id", "neighbor_id", "rank")
      .collect().map(_.toSeq).toSet
    assert(got === want)
  }

  test("semantic decontamination: every planted eval leak is flagged, " +
      "and totals reconcile") {
    val e = Tables.embeddings(spark, TestSession.sf)
    val nEval34 = e.filter(col("vec_id") % 17 === 0 &&
      col("vec_id") % 34 === 0).count()
    assert(nEval34 > 0, "degenerate: no plantable eval vectors at this SF")
    val out = ops.VectorOps
      .semanticDecontaminate(spark, TestSession.sf).collect()
    val nCorpusNatural = e.filter(col("vec_id") % 17 =!= 0).count()
    assert(out.map(_.getLong(1)).sum === nCorpusNatural + nEval34)
    // the plants alone guarantee ≥ nEval34 contaminated rows (each plant
    // sits at cosine ≈ 0.97 vs its eval original, above the 0.92 gate);
    // natural corpus-eval high-sim pairs may flag additionally
    assert(out.map(_.getLong(2)).sum >= nEval34,
      s"planted leaks not all flagged: ${out.map(_.getLong(2)).sum} < $nEval34")
  }

  test("IVF-restricted decontamination: audit flag-recall floor holds and " +
      "every plant survives the list restriction") {
    // measured 1.0 at sf0.001 and sf0.01 (every flagged row is a plant,
    // and each plant's rank-1 list is among its original's nprobe=4
    // probed lists); floor 0.85 leaves driver-regeneration margin (the
    // ADVICE r11 discipline — the gate hash-pins today's exact values,
    // the spec only guards against a silent structural break)
    val r = ops.VectorOps
      .semanticDecontaminateIvfAudit(spark, TestSession.sf).collect()
    assert(r.length === 1)
    val row = r.head
    val (nBrute, nIvf, nCommon) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    val recall = row.getDouble(3)
    val (nPlants, nPlantsFlagged) = (row.getLong(4), row.getLong(5))
    assert(nBrute > 0, "degenerate audit: brute probe flagged nothing")
    assert(nPlants > 0, "degenerate audit: no plants in the corpus")
    assert(recall >= 0.85,
      s"IVF flag recall $recall below floor ($nCommon of $nBrute)")
    // plants are contaminated BY CONSTRUCTION — the sublinear path must
    // keep them all (a plant sits at cosine ~0.97 in its original's
    // immediate list neighborhood); allow 10% regeneration slack
    assert(nPlantsFlagged * 10 >= nPlants * 9,
      s"plants lost by the list restriction: $nPlantsFlagged of $nPlants")
    // the IVF flag set is a subset of the brute set by construction
    // (same cosine gate, restricted pair universe)
    assert(nIvf === nCommon, "IVF flagged a pair brute did not — impossible")
  }

  test("lsh bucket is stable and in range") {
    val b = ops.VectorOps.lshBuckets(spark, TestSession.sf)
    val bad = b.filter(col("bucket") < 0 || col("bucket") > 255).count()
    assert(bad === 0)
    // deterministic across runs
    val first = b.orderBy("vec_id").limit(3).collect().map(_.getInt(2)).toSeq
    val again = ops.VectorOps.lshBuckets(spark, TestSession.sf)
      .orderBy("vec_id").limit(3).collect().map(_.getInt(2)).toSeq
    assert(first === again)
  }

  test("hard negatives: triplet structure, label contracts, and the " +
      "mined negative is truly the hardest (in-JVM cosine cross-check)") {
    val rows = ops.VectorOps.hardNegatives(spark, TestSession.sf).collect()
    val emb = spark.read.parquet(s"${TestSession.sf}/embeddings.parquet")
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(2),
        r.getSeq[Float](1).toArray))).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byAnchor = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(byAnchor.size === 16)
    byAnchor.foreach { case (a, rs) =>
      val (aLabel, aVec) = emb(a)
      val negs = rs.filter(_.getAs[String]("kind") == "hard_neg")
      val pos = rs.filter(_.getAs[String]("kind") == "hard_pos")
      assert(negs.length === 3 && pos.length === 1)
      negs.foreach(n =>
        assert(n.getAs[Int]("n_label") !== aLabel, "negative shares label"))
      assert(pos.head.getAs[Int]("n_label") === aLabel)
      // the rank-1 negative dominates every other different-label vector
      val n1 = negs.find(_.getAs[Int]("rank") == 1).get
        .getAs[Long]("neighbor_id")
      val bestSim = cos(aVec, emb(n1)._2)
      emb.foreach { case (id, (l, v)) =>
        if (id != a && id != n1 && l != aLabel)
          assert(cos(aVec, v) <= bestSim + 1e-12,
            s"anchor $a: $id is a harder negative than mined $n1")
      }
    }
  }

  test("embed drift: shares partition each half and tvd is a bounded " +
      "constant across rows") {
    val rows = ops.VectorOps.embedDrift(spark, TestSession.sf).collect()
    assert(rows.nonEmpty)
    val s0 = rows.map(_.getAs[Double]("share0")).sum
    val s1 = rows.map(_.getAs[Double]("share1")).sum
    assert(math.abs(s0 - 1.0) < 1e-9 && math.abs(s1 - 1.0) < 1e-9)
    val tvds = rows.map(_.getAs[Double]("tvd")).distinct
    assert(tvds.length === 1, "tvd must be one corpus-level constant")
    assert(tvds.head >= 0.0 && tvds.head <= 1.0)
    // exact-count cross-check: the halves partition the stored list table
    val n = rows.map(r => r.getAs[Long]("c0") + r.getAs[Long]("c1")).sum
    val emb = spark.read
      .parquet(s"${TestSession.sf}/embeddings.parquet").count()
    assert(n === emb)
  }

  test("LSH ANN returns in-bucket candidates ranked consistently") {
    // The testdata embeddings are near-uniform on the sphere (within-label
    // mean cosine ≈ 0.02), so rank-1 LSH recall vs brute force is inherently
    // low — assert structure, not recall: candidates exist, share the
    // probe's bucket by construction, and ranks are dense from 1.
    val lsh = ops.VectorOps.annLsh(spark, TestSession.sf).collect()
    assert(lsh.nonEmpty)
    val byProbe = lsh.groupBy(_.getLong(0))
    byProbe.foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(3)).sorted.toSeq
      assert(ranks === (1 to ranks.size))
      assert(rows.map(_.getInt(1)).distinct.length === 1) // one bucket
    }
  }
}
