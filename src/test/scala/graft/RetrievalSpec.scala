package graft

import graft.ops.{CatalogOps, Relational, RetrievalOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 operator invariants: inverted-index search vs a brute-force
  * in-JVM reference, skip-greedy context packing replayed from its own
  * audit trail, catalog-stats self-consistency, compaction-plan
  * partition accounting, and fixed-point PageRank on hand-computable
  * graphs. The DuckDB hash gate proves Spark ≡ DuckDB; these specs prove
  * both ≡ the intended semantics. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("inverted search equals the brute-force conjunctive scan") {
    val out = RetrievalOps.invertedSearch(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty, "no search results at sf0.001")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val queries = out.map(r => (r._1, (r._2, r._3))).distinct
    for ((qid, (ta, tb)) <- queries) {
      val scored = docs.flatMap { case (id, toks) =>
        val ca = toks.count(_ == ta)
        val cb = toks.count(_ == tb)
        if (ca > 0 && cb > 0) Some((id, (ca + cb).toLong)) else None
      }
      val want = scored.sortBy { case (id, s) => (-s, id) }
        .take(RetrievalOps.TopK)
        .zipWithIndex.map { case ((id, s), i) => (i + 1L, id, s) }.toSeq
      val got = out.filter(_._1 == qid).sortBy(_._4)
        .map(r => (r._4, r._5, r._6)).toSeq
      assert(got === want, s"query $qid ($ta AND $tb) diverged")
    }
  }

  test("rag pack: kept/cum replay the greedy fold, budget binds, and " +
      "kept docs are exactly the greedy-feasible ones") {
    val rows = RetrievalOps.ragPack(spark, sf)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("kept"),
        r.getAs[Long]("cum_tok")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq,
        s"query $qid ranks not contiguous")
      var cum = 0L
      sorted.foreach { case (_, rank, nTok, kept, cumTok) =>
        val fits = cum + nTok <= RetrievalOps.TokenBudget
        assert(kept === (if (fits) 1L else 0L),
          s"query $qid rank $rank kept flag diverges from greedy")
        if (fits) cum += nTok
        assert(cumTok === cum, s"query $qid rank $rank cum_tok mismatch")
      }
      assert(cum <= RetrievalOps.TokenBudget)
      assert(sorted.exists(_._4 == 0L),
        s"query $qid: budget never binds — spec can't see the cut")
      assert(sorted.exists(_._4 == 1L), s"query $qid kept nothing")
    }
  }

  test("hybrid RRF: fused score replays in-JVM from the two arm ranks, " +
      "the arms genuinely disagree, and ranks are contiguous per query") {
    val out = RetrievalOps.queries("q_hybrid_rrf")(spark, sf).collect()
    assert(out.nonEmpty)
    // the fusion is non-trivial: the two rankers must actually disagree
    // somewhere (tf-sum favors long repetitive docs; BM25 saturates tf
    // and normalizes length — identical orderings would mean the fusion
    // proves nothing)
    assert(out.exists(r => r.getAs[Long]("r_bm") != r.getAs[Long]("r_tf")),
      "bm25 and tf-sum rankings identical — fusion degenerate")
    // rrf replays exactly from the emitted ranks (same two-term IEEE
    // expression), and the displayed ranking is ordered by it
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq ===
        (1L to byRank.length))
      byRank.foreach { r =>
        val expect = 1.0 / (60L + r.getAs[Long]("r_bm")) +
          1.0 / (60L + r.getAs[Long]("r_tf"))
        assert(r.getAs[Double]("rrf") === expect)
      }
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          val (ra, rb) = (a.getAs[Double]("rrf"), b.getAs[Double]("rrf"))
          assert(ra > rb || (ra == rb &&
            a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
        case _ =>
      }
    }
  }

  test("3-arm hybrid RRF: the dense arm's ordering differs from BOTH " +
      "lexical arms, and the fused score replays from the three ranks") {
    val out = RetrievalOps.queries("q_hybrid_rrf_dense")(spark, sf).collect()
    assert(out.nonEmpty)
    // the dense re-ranker must contribute a genuinely NEW ordering: a
    // dense arm that mirrors either lexical ranking would make the
    // third arm decorative (the r12 verdict's "simulated capability")
    assert(out.exists(r =>
        r.getAs[Long]("r_dense") != r.getAs[Long]("r_bm")),
      "dense and bm25 rankings identical — dense arm degenerate")
    assert(out.exists(r =>
        r.getAs[Long]("r_dense") != r.getAs[Long]("r_tf")),
      "dense and tf-sum rankings identical — dense arm degenerate")
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq ===
        (1L to byRank.length))
      byRank.foreach { r =>
        val expect = 1.0 / (60L + r.getAs[Long]("r_bm")) +
          1.0 / (60L + r.getAs[Long]("r_tf")) +
          1.0 / (60L + r.getAs[Long]("r_dense"))
        assert(r.getAs[Double]("rrf") === expect)
      }
    }
    // the 2-arm fusion is untouched by the third arm's existence: its
    // (query, doc, r_bm, r_tf) surface must agree with the 3-arm run
    val two = RetrievalOps.queries("q_hybrid_rrf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("r_bm"), r.getAs[Long]("r_tf"))).toMap
    out.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))
      two.get(k).foreach { arms =>
        assert(arms === (r.getAs[Long]("r_bm"), r.getAs[Long]("r_tf")),
          s"lexical arms drifted between 2-arm and 3-arm fusion at $k")
      }
    }
  }

  test("dense truncation audit: the 512-char cap keeps top-k overlap " +
      "with the full-text ranking above the floor") {
    val rows = RetrievalOps.queries("q_dense_trunc_audit")(spark, sf)
      .collect()
    assert(rows.nonEmpty, "audit produced no queries")
    val tot = rows.map(_.getAs[Long]("n_topk")).sum
    val ovl = rows.map(_.getAs[Long]("n_overlap")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("n_overlap") <= r.getAs[Long]("n_topk"),
        s"overlap exceeds top-k size: $r")
    }
    // floors pinned at the measured point (the ANN-recall discipline —
    // the chain is deterministic, hashed bigrams of fixed text, so the
    // measurement cannot drift): sf0.001 measures 49/50 aggregate with a
    // per-query minimum of 9/10 (sf0.01 and sf0.1 both measure 50/50 —
    // this corpus's first 512 chars are bigram-representative). A drop
    // below 90%/8 means the truncation CONTRACT changed, not noise.
    rows.foreach { r =>
      assert(r.getAs[Long]("n_overlap") * 10 >=
        r.getAs[Long]("n_topk") * 8,
        s"per-query truncated-vs-full overlap fell below 80%: $r")
    }
    assert(ovl * 10 >= tot * 9,
      s"aggregate truncated-vs-full top-k overlap fell below 90%: $ovl/$tot")
  }

  test("charBigramBuckets (typed hot loop) is bit-parity with the " +
      "declarative explode/md5 form") {
    import org.apache.spark.sql.functions._
    // the declarative reference: per-occurrence substring → md5 bucket →
    // groupBy — exactly the oracle's SQL shape (the form the typed pass
    // replaced for speed; CLAUDE.md hot-loop discipline)
    def declarative(df: org.apache.spark.sql.DataFrame) =
      df.filter(length(col("t")) >= 2)
        .select(col("doc_id"),
          explode(sequence(lit(1), length(col("t")) - 1)).as("i"),
          col("t"))
        .select(col("doc_id"), expr("substring(t, i, 2)").as("bg"))
        .select(col("doc_id"),
          (conv(substring(md5(col("bg")), 1, 4), 16, 10)
            .cast("long") % 256).as("b"))
        .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("cnt"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // live corpus + adversarial edges: empty, 1-char (no grams), exact
    // 2-char, repeated grams, punctuation/digits/whitespace runs
    val live = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text").as("t")).limit(200)
    import spark.implicits._
    val edges = Seq((1L, ""), (2L, "x"), (3L, "ab"), (4L, "aaaa"),
      (5L, "a b\tc\nd"), (6L, "0123 45!?.."), (7L, "ab" * 300))
      .toDF("doc_id", "t")
    for (df <- Seq(live, edges)) {
      val fast = rows(RetrievalOps.charBigramBuckets(df, "doc_id"))
      val slow = rows(declarative(df))
      assert(fast === slow,
        s"typed/declarative divergence: only-fast=${(fast -- slow).take(5)} " +
          s"only-slow=${(slow -- fast).take(5)}")
    }
  }

  test("bm25 ranking equals the in-JVM replay of the rational formula") {
    val out = RetrievalOps.bm25Rank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val n = docs.length.toLong
    val tTok = docs.map(_._2.length.toLong).sum
    val dfMap = docs.flatMap { case (_, toks) => toks.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    // recover each query's term pair from the search entry (same spine)
    val terms = RetrievalOps.invertedSearch(spark, sf)
      .select(col("query_id"), col("term_a"), col("term_b")).distinct()
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
    for ((qid, (ta, tb)) <- terms) {
      val scored = docs.flatMap { case (id, toks) =>
        val dl = toks.length.toLong
        def s(t: String): Option[Double] = {
          val tf = toks.count(_ == t).toLong
          if (tf == 0) None
          else {
            val num = 22L * tf * (2 * n - 2 * dfMap(t) + 1)
            val den = (2 * dfMap(t) + 1) * 10L *
              (tf * 10000L * tTok + 3000L * tTok + 9000L * dl * n)
            Some(num.toDouble / den.toDouble)
          }
        }
        for (a <- s(ta); b <- s(tb)) yield (id, a + b)
      }
      val want = scored.sortBy { case (id, sc) => (-sc, id) }
        .take(RetrievalOps.TopK)
        .zipWithIndex.map { case ((id, sc), i) => (i + 1L, id, sc) }.toSeq
      val got = out.filter(_._1 == qid).sortBy(_._2)
        .map(r => (r._2, r._3, r._4)).toSeq
      assert(got === want, s"query $qid bm25 diverged")
    }
  }

  test("gdpr purge audit is self-consistent and matches direct counts") {
    val out = graft.ops.CatalogOps.gdprPurge(spark, sf).collect()
      .map(r => r.getAs[String]("table_name") -> r).toMap
    assert(out.size === 3)
    out.values.foreach { r =>
      assert(r.getAs[Long]("rows_after") ===
        r.getAs[Long]("rows_before") - r.getAs[Long]("rows_deleted"))
      assert(r.getAs[Long]("surviving_matches") === 0L)
      assert(r.getAs[Long]("keys_present") <=
        r.getAs[Long]("keys_requested"))
    }
    val evDel = Tables.events(spark, sf)
      .filter(pmod(col("user_id"), lit(graft.ops.CatalogOps.GdprModulus))
        === graft.ops.CatalogOps.GdprResidue).count()
    assert(out("events").getAs[Long]("rows_deleted") === evDel)
    assert(evDel > 0, "erasure registry empty — purge never exercised")
  }

  test("incremental posting-list maintenance equals the full rebuild " +
      "under uneven batches and an at-least-once replay") {
    val all = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val n = all.count().toInt
    val slices = Seq(
      all.filter(col("doc_id") % 5 === 0),
      all.filter(col("doc_id") % 5 === 1),
      all.filter(col("doc_id") % 5 === 0), // replayed batch
      all.filter(col("doc_id") % 5 >= 2))
    val store = slices.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      case (acc, batch) =>
        val fresh = RetrievalOps.postingsOf(batch)
        Some(acc.map(s => RetrievalOps.mergePostings(s, fresh))
          .getOrElse(fresh).localCheckpoint())
    }.get
    val direct = RetrievalOps.postingsOf(all)
    assert(store.count() === direct.count())
    assert(store.except(direct).isEmpty && direct.except(store).isEmpty,
      "incrementally maintained index diverged from the rebuild")
    assert(n > 0)
  }

  test("rag pipeline: packs only corpus-filter survivors and actually " +
      "diverges from the raw-corpus pack") {
    val piped = RetrievalOps.ragPipeline(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("kept")))
    assert(piped.nonEmpty)
    // survivors of the shared corpus-filter chain, via its own report
    val surv = graft.ops.TextOps.corpusFilter(spark, sf)
    assert(surv.count() > 0)
    val rawDocs = Tables.documents(spark, sf).count()
    val pipeDocs = piped.map(_._2).distinct.length
    assert(pipeDocs < rawDocs, "cleaned index should be smaller universe")
    val rawPack = RetrievalOps.ragPack(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")))
    assert(piped.map(p => (p._1, p._2)).toSet !== rawPack.toSet,
      "pipeline output identical to raw pack — the filter did nothing")
  }

  test("sq8 ann: full result shape and recall vs the exact L2 top-5") {
    val out = graft.ops.VectorOps.annSq(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
    assert(out.length === 8 * 5, s"expected 8 probes x top-5, got ${out.length}")
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def l2sq(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val dd = a(i).toDouble - b(i).toDouble; acc += dd * dd; i += 1
      }
      acc
    }
    val byId = vecs.toMap
    var hit = 0
    for (p <- 0L until 8L) {
      val exact = vecs.filter(_._1 != p)
        .map { case (id, v) => (id, l2sq(byId(p), v)) }
        .sortBy { case (id, dist) => (dist, id) }.take(5).map(_._1).toSet
      hit += out.filter(_._1 == p).map(_._2).count(exact.contains)
    }
    val recall = hit / 40.0
    assert(recall >= 0.8,
      s"sq8 recall@5 $recall below 0.8 — quantized shortlist too coarse")
  }

  test("length-percentile gate: per source, at most 10% dropped and the " +
      "threshold is the exact P10 boundary") {
    val rows = graft.ops.TextOps.lengthPercentileGate(spark, sf).collect()
    assert(rows.nonEmpty)
    val lens = Tables.documents(spark, sf)
      .select(col("source"), length(col("text")).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s0, g) => s0 -> g.map(_._2).sorted }
    rows.foreach { r =>
      val (src, n, thr, kept, dropped) = (r.getAs[String]("source"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("threshold"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))
      assert(kept + dropped === n)
      assert(dropped * 10 < n, s"$src dropped ≥ 10%")
      val sorted = lens(src)
      // exact P10: smallest value whose cumulative count reaches ceil(n/10)
      val want = sorted((sorted.length + 9) / 10 - 1)
      assert(thr === want, s"$src threshold $thr != exact P10 $want")
    }
  }

  test("cohort retention: offset-0 cell is the cohort itself, no cell " +
      "exceeds its cohort") {
    val rows = graft.ops.Relational.cohortRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, ret, size) = (r.getAs[Long]("offset"),
        r.getAs[Long]("retained"), r.getAs[Long]("cohort_size"))
      assert(ret <= size)
      if (off == 0L) {
        assert(ret === size, "every cohort member is active in week 0")
        assert(r.getAs[Double]("retention_rate") === 1.0)
      }
    }
    assert(rows.exists(_.getAs[Long]("offset") > 0L),
      "no later-week cells — matrix degenerate")
  }

  test("column stats: exact NDV cross-checked, KMV exact below k, " +
      "row counts uniform") {
    val st = CatalogOps.columnStats(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val nLi = Tables.lineitem(spark, sf).count()
    assert(st.values.forall(_.getAs[Long]("n_rows") == nLi))
    val exactFlag = Tables.lineitem(spark, sf)
      .select(countDistinct(col("l_returnflag"))).head().getLong(0)
    assert(st("l_returnflag").getAs[Long]("ndv_exact") === exactFlag)
    // below sketch size k the KMV estimate IS the exact count
    st.values.filter(_.getAs[Long]("ndv_exact") < CatalogOps.StatsKmvK)
      .foreach { r =>
        assert(r.getAs[Long]("ndv_kmv") === r.getAs[Long]("ndv_exact"),
          s"${r.getAs[String]("col_name")}: KMV not exact below k")
      }
    assert(st("l_orderkey").getAs[Long]("n_null") === 0L)
  }

  test("compaction plan: partitions land in exactly one bin, day ranges " +
      "don't overlap, byte totals account for every partition") {
    val plan = CatalogOps.compactionPlan(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bin_id"),
        r.getAs[Long]("n_parts"), r.getAs[Long]("bytes"),
        r.getAs[String]("day_from"), r.getAs[String]("day_to")))
    assert(plan.nonEmpty)
    val partTotals = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd"))
      .agg((sum(length(col("props"))) +
        count(lit(1)) * CatalogOps.RowOverheadBytes).as("b"))
      .groupBy(col("event_type"))
      .agg(sum(col("b")).as("tot"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    plan.groupBy(_._1).foreach { case (et, bins) =>
      val ordered = bins.sortBy(_._2)
      assert(ordered.map(_._4).sum === partTotals(et)._1,
        s"$et: plan bytes don't sum to the partition total")
      assert(ordered.map(_._3).sum === partTotals(et)._2,
        s"$et: plan loses or duplicates partitions")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 < b._5, s"$et: bins ${a._2}/${b._2} day-overlap")
        case _ =>
      }
    }
  }

  test("label propagation: barbell hand-trace pins the synchronous " +
      "tie-break semantics; basket communities are non-degenerate") {
    import spark.implicits._
    // two triangles {1,2,3} / {10,11,12} bridged 3-10: the hand trace
    // (neighbor votes only, tie -> min label, synchronous rounds) lands
    // each triangle on ONE label after 3 rounds and the bridge must NOT
    // merge them; every intermediate round exercises the count-then-min
    // priority (round 1 is all-ties, round 2 has a genuine majority)
    val barbell = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("p1", "p2")
    val labels = Relational.lpaIterate(barbell, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L),
      s"synchronous LPA trace diverged: $labels")
    // the registered query on testdata: every node labeled exactly once
    // (community sizes partition the vertex set) and the result is not
    // one giant blob or all-singletons
    // (note: a community's LABEL need not be one of its members — the
    // barbell's second triangle ends labeled 3, a first-triangle id)
    val rows = Relational.basketCommunities(spark, sf).collect()
    val nodes = rows.map(_.getLong(1)).sum
    assert(rows.length > 1, "LPA collapsed to one community")
    assert(rows.exists(_.getLong(1) >= 2L),
      "all singletons — support gate left no propagating edges")
    assert(nodes > rows.length, "member counts must exceed communities")
  }

  test("pagerank: symmetric 2-cycle is an exact fixed point; star graph " +
      "ranks hand-computed; event graph conserves mass to truncation") {
    import spark.implicits._
    val scale = Relational.PagerankScale
    val cyc = Relational.pagerankIterate(
      Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w"), 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cyc === Map("a" -> scale, "b" -> scale),
      "symmetric cycle must hold the exact initial mass")
    // star a->b, a->c (w 3:1): after ONE iteration b,c hold base + split
    // of a's 0.85 mass; a (no in-edges) leaves the frontier.
    val star = Relational.pagerankIterate(
      Seq(("a", "b", 3L), ("a", "c", 1L)).toDF("src", "dst", "w"), 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = 15L * scale / 100L
    assert(star === Map(
      "b" -> (base + (85L * scale * 3L) / (100L * 4L)),
      "c" -> (base + (85L * scale * 1L) / (100L * 4L))))
    val ranks = Relational.eventPagerank(spark, sf)
      .collect().map(_.getLong(1))
    assert(ranks.length === 5 && ranks.forall(_ > 0))
    val drift = math.abs(ranks.sum - 5L * scale)
    // complete 5x5 graph: <= 25 edges x 10 iters x 1 unit truncation,
    // plus the base-term rounding — generous factor-10 headroom
    assert(drift <= 10L * 25L * Relational.PagerankIters,
      s"mass drift $drift exceeds the truncation budget")
  }

  test("pagerank convergence gate: stops at the FIRST round whose max " +
      "delta <= eps, ranks equal the fixed-iteration algebra at that " +
      "round, and an unreachable eps runs exactly to the cap") {
    import spark.implicits._
    def ranksOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // symmetric 2-cycle: iterate 1 reproduces the initial mass exactly,
    // so even eps = 0 must stop after one round
    val cyc = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val cycConv = Relational.pagerankConverge(cyc, 0L, 10)
    assert(cycConv.select("iters_run").distinct().head().getLong(0) === 1L)
    assert(ranksOf(cycConv.select("v", "rank")) ===
      Map("a" -> Relational.PagerankScale, "b" -> Relational.PagerankScale))
    // asymmetric strongly-connected graph: convergence is gradual, so the
    // gate's stopping round is non-trivial. The convergence run must (a)
    // match pagerankIterate at its own stopping round bit-for-bit (same
    // algebra, genuinely stopped there), and (b) stop at the FIRST
    // converged round: delta(k) <= eps < delta(k-1), derived from the
    // fixed-iteration ladder.
    val g = Seq(("a", "b", 3L), ("b", "c", 2L), ("b", "a", 1L),
      ("c", "a", 1L)).toDF("src", "dst", "w")
    val eps = Relational.PagerankScale / 100L // 1% of unit mass
    val conv = Relational.pagerankConverge(g, eps, 30)
    val k = conv.select("iters_run").distinct().head().getLong(0).toInt
    assert(k > 1 && k < 30, s"stopping round $k must be interior")
    assert(ranksOf(conv.select("v", "rank")) ===
      ranksOf(Relational.pagerankIterate(g, k)))
    def maxDelta(i: Int): Long = {
      val a = ranksOf(Relational.pagerankIterate(g, i))
      val b = if (i == 1)
        a.keys.map(_ -> Relational.PagerankScale).toMap
      else ranksOf(Relational.pagerankIterate(g, i - 1))
      a.collect { case (v, r) if b.contains(v) => math.abs(r - b(v)) }.max
    }
    assert(maxDelta(k) <= eps, s"round $k did not actually converge")
    assert(maxDelta(k - 1) > eps, s"round ${k - 1} already converged — " +
      "the gate overshot the first converged round")
    // unreachable eps (deltas are >= 0 > -1 forever): the cap bounds the
    // run and the result is the fixed-iteration result at the cap
    val capped = Relational.pagerankConverge(g, -1L, 4)
    assert(capped.select("iters_run").distinct().head().getLong(0) === 4L)
    assert(ranksOf(capped.select("v", "rank")) ===
      ranksOf(Relational.pagerankIterate(g, 4)))
  }

  test("denseRankOf precondition: cand unique per (query_id, doc_id) is " +
      "load-bearing — duplicated candidate rows scale the folded norm " +
      "(ADVICE r15)") {
    val spark = TestSession.spark
    import spark.implicits._
    // two docs with hand-sized sparse vectors; doc 20's true dot wins
    val dg = Seq((10L, 1L, 3L), (10L, 2L, 1L), (20L, 1L, 2L))
      .toDF("doc_id", "b", "dcnt")
    val qg = Seq((1L, 1L, 5L), (1L, 2L, 1L)).toDF("query_id", "b", "qcnt")
    val cand = Seq((1L, 10L), (1L, 20L)).toDF("query_id", "doc_id")
    def ranksOf(c: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      RetrievalOps.denseRankOf(c, dg, qg)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // unique cand: dot(10)=16, norm2(10)=10 → 25.6; dot(20)=10,
    // norm2(20)=4 → 25.0 — doc 10 ranks first
    assert(ranksOf(cand) === Map(10L -> 1L, 20L -> 2L))
    // duplicating ONE candidate row doubles every (doc, bucket) row of
    // that doc through the left join: dot AND norm2 both scale, dscore
    // by 2²/2 — the documented silent-scaling failure, pinned here so
    // the single-aggregation fold can never be fed duplicate candidates
    // unnoticed
    val dup = cand.unionAll(Seq((1L, 20L)).toDF("query_id", "doc_id"))
    assert(ranksOf(dup) === Map(20L -> 1L, 10L -> 2L),
      "duplicate candidate rows no longer scale dscore — if the fold " +
      "was replaced by a dedup-safe shape, update the scaladoc contract")
  }
}
