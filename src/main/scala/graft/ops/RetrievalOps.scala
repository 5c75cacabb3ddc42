package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Candidate row flowing into the greedy context packer: one retrieved
  * document for one query, already ranked (1-based, contiguous per query). */
case class RagCand(query_id: Long, rank: Long, doc_id: Long, n_tok: Long,
    score: Long)

/** One packing decision: `kept` = 1 iff the document fit the remaining
  * budget at its turn; `cum_tok` = tokens consumed after the decision. */
case class RagPackRow(query_id: Long, rank: Long, doc_id: Long, n_tok: Long,
    kept: Long, cum_tok: Long, score: Long)

/** The retrieval/serving layer of the training-data pipeline: an
  * inverted-index keyword search (posting lists → conjunctive match →
  * bounded top-k) and RAG-style context assembly (greedy packing of the
  * ranked candidates under a token budget).
  *
  * Reference capability analog: the keyword surface —
  * `DwsTrafficSourceKeywordPageViewWindow.java:69-79` (tokenize + count
  * per word) and `TrafficKeywordsMapper.java:10-21` (keyword serving,
  * ORDER BY score DESC LIMIT k). This module is that surface completed
  * into full-text retrieval: the per-word counts become posting lists,
  * the serving query becomes conjunctive multi-term search, and the
  * LLM-pipeline extension consumes the ranked result as a
  * budget-bounded context.
  *
  * 100 TB stance:
  *   - The posting-list build is ONE shuffle keyed by term with map-side
  *     partial aggregation — the canonical distributed index build. The
  *     shuffle carries (term, doc_id, tf) triples, never document text.
  *   - Query terms are a broadcast-sized table (10 rows here; thousands
  *     in a serving batch): matching is a broadcast hash semi-probe of
  *     the posting scan, so the index side never reshuffles per query
  *     batch.
  *   - Per-query top-k goes through `row_number <= k`, which Spark
  *     executes as WindowGroupLimit: each map task keeps only its local
  *     top-k before the exchange, so the ranking shuffle is bounded by
  *     queries × k, independent of posting-list length.
  *   - The only global sort is the vocabulary ranking that DERIVES the
  *     benchmark queries (df-ordered row_number). That table is
  *     vocab-sized — bounded and tiny relative to the corpus — and in a
  *     production serving path the query set arrives from outside
  *     instead.
  *   - Context packing is sequential PER QUERY by definition (each keep
  *     decision depends on the tokens already consumed), so it runs as a
  *     typed `flatMapGroups` over groups ALREADY bounded by the top-k
  *     cut (≤ [[RetrievalOps.PackCandidates]] rows per query) — the
  *     imperative fold touches O(k) rows per query, never the corpus.
  */
object RetrievalOps extends QueryModule {

  /** Benchmark queries are drawn from the df-ranking: terms ranked
    * [QueryRankFrom, QueryRankTo] (1-based, df DESC then term ASC),
    * paired in rank order → (QueryRankTo-QueryRankFrom+1)/2 two-term
    * conjunctive queries. Mid-frequency terms make conjunctions that are
    * selective but non-empty. */
  val QueryRankFrom = 11
  val QueryRankTo = 20
  /** Bounded top-k emitted per query by [[invertedSearch]]. */
  val TopK = 10
  /** Candidate cut feeding the packer (rank ≤ this). */
  val PackCandidates = 50
  /** Context token budget for [[ragPack]]. */
  val TokenBudget = 512L
  /** Character truncation of the dense-arm document embedding
    * ([[hybridRrfDense]] via [[EmbedStore]]) — the input cap every
    * embedding model has; bounds per-document embed work to a constant
    * regardless of document length (docs here average ~3.5k chars: a 7×
    * cut, measured 5.7 → 2.8 s at sf0.1 in r13). What the cap costs in
    * ranking quality is GATED, not assumed: [[denseTruncAudit]] emits
    * overlap@k of the truncated ranking vs the full-text ranking as an
    * oracle-checked query, and RetrievalSpec pins a floor on it. */
  val DenseEmbedChars = 512

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).repartition(s.sparkContext.defaultParallelism)

  /** Posting-list partials of one document batch: (term, doc_id, tf). */
  def postingsOf(batch: DataFrame): DataFrame =
    batch
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Incremental index maintenance: merge the stored posting lists with a
    * fresh ingest batch's partials (the foreachBatch read → merge →
    * overwrite refresh, same shape as `Relational.mergeOrderPartials`).
    * The corpus is append-only, so distinct doc_ids union disjointly;
    * a REPLAYED document re-derives the identical (term, doc_id, tf)
    * rows and `max` collapses them — the merge is idempotent under
    * at-least-once delivery. Store cost per batch ∝ touched terms, never
    * corpus size; RetrievalSpec proves merge ≡ full rebuild under uneven
    * slicing + replay. */
  def mergePostings(store: DataFrame, fresh: DataFrame): DataFrame =
    store.unionByName(fresh)
      .groupBy(col("term"), col("doc_id"))
      .agg(max(col("tf")).as("tf"))

  /** Posting lists of the whole corpus — PROBED from the materialized
    * [[PostingStore]] (built once per (JVM, sfDir), the way a search
    * system actually operates: index at ingest, probe at query time).
    * The oracles recompute the index from raw text, so the hash gate
    * proves store ≡ fresh build. */
  private def postings(s: SparkSession, d: String): DataFrame =
    PostingStore.postings(s, d)

  /** The derived two-term query table: (query_id, term) + per-query
    * labels (term_a, term_b). Vocab-sized input, broadcast-sized output. */
  private def queryTerms(s: SparkSession, d: String): DataFrame =
    queryTermsOf(postings(s, d))

  private def queryTermsOf(p: DataFrame): DataFrame = {
    val df_ = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
    df_
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("df").desc, col("term").asc))
          .cast("long"))
      .filter(col("rnk").between(QueryRankFrom, QueryRankTo))
      .withColumn("query_id",
        expr(s"(rnk - $QueryRankFrom) div 2"))
      .select(col("query_id"), col("term"))
  }

  /** Conjunctive scored candidates: docs containing ALL the query's
    * terms, scored by summed term frequency, ranked with a doc_id
    * tie-break. Shared spine of search and packing. */
  private def ranked(s: SparkSession, d: String): DataFrame =
    rankedOf(postings(s, d))

  private def rankedOf(p: DataFrame): DataFrame =
    rankedOf(p, queryTermsOf(p))

  /** The spine with a PRECOMPUTED query table — multi-arm consumers
    * (the RRF fusions) derive qt once, checkpoint the 10-row frame and
    * thread it through every arm, so the vocabulary df-ranking is not
    * replanned per plan branch (measured: the 3-arm fusion's plan held
    * 14 copies of the derived-query subtree — one per spine use — at
    * ~0.15 s each; one checkpoint removes them all). */
  private def rankedOf(p: DataFrame, qt: DataFrame): DataFrame = {
    val matched = p
      .join(broadcast(qt), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matched"), sum(col("tf")).as("score"))
      .filter(col("n_matched") === 2)
    matched
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
  }

  /** Inverted-index conjunctive search: per query the top
    * [[TopK]] documents by summed tf (ties → smaller doc_id). */
  def invertedSearch(s: SparkSession, d: String): DataFrame = {
    val qd = queryTerms(s, d).groupBy(col("query_id"))
      .agg(min(col("term")).as("term_a"), max(col("term")).as("term_b"))
    ranked(s, d)
      .filter(col("rank") <= TopK)
      .join(broadcast(qd), Seq("query_id"))
      .select(col("query_id"), col("term_a"), col("term_b"), col("rank"),
        col("doc_id"), col("score"))
  }

  /** BM25-class ranking over the conjunctive candidates — the classic IR
    * scoring function with k1 = 1.2, b = 0.75, in a fully deterministic
    * formulation:
    *
    *   - idf is the rational Robertson–Spärck-Jones core
    *     (N − df + ½)/(df + ½) WITHOUT the log wrap — transcendentals are
    *     banned from gated columns (ln differs cross-engine at the ulp;
    *     CLAUDE.md trap list), and the rational form keeps idf's
    *     rare-term monotonicity. Documented variant, not hidden.
    *   - numerator and denominator are assembled as exact INTEGERS
    *     (constants pre-scaled ×100, avgdl folded in as total_tokens/N by
    *     multiplying through — `den = (2·df+1)·10·(tf·10⁴·T + 3000·T +
    *     9000·dl·N)`), then the score is ONE textually-identical IEEE
    *     division of those integer aggregates — the sanctioned double
    *     pattern. Per query the two per-term scores add commutatively
    *     (2 addends ⇒ order-free), so the double stays hash-exact.
    *   - SCORE SCALE: multiplying avgdl through the denominator without
    *     restoring the 10⁴·T factor in the numerator means the emitted
    *     value is the textbook (rational-idf) BM25 DIVIDED BY 10⁴·T — a
    *     uniform positive constant per corpus, so ranking is invariant
    *     but magnitudes are corpus-size-dependent and not on BM25 scale.
    *     Deliberate: restoring the factor (num × 10⁴·T) would spend the
    *     int64 headroom ~10⁴× faster for a cosmetic rescale the ranking
    *     never reads.
    *   - int64 headroom: den peaks ≈ 3·10¹⁶ at sf0.1 (T ≈ 6.4·10⁵);
    *     overflow arrives only past ~30× that corpus — renormalize T, N
    *     by a common factor before then.
    *
    * Scale: identical plan to [[invertedSearch]] plus one broadcast of
    * the per-term df row and a doc-length join at the POSTING-MATCH grain
    * (every doc containing any query term) — BM25's per-term normalizer
    * needs dl before aggregation, so the match-grain join is inherent to
    * the formula, and its width is bounded by the broadcast query batch's
    * posting selectivity, not the corpus. With the doc-length store
    * bucketed alongside the postings the join is co-located. */
  def bm25Rank(s: SparkSession, d: String): DataFrame =
    bm25RankedAll(s, d)
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("doc_id"), col("bm25"))

  /** The FULL BM25 ranking (no top-k cut) — shared by [[bm25Rank]] and
    * the RRF fusion, which needs every candidate's rank, not just the
    * displayed head. */
  private def bm25RankedAll(s: SparkSession, d: String): DataFrame =
    bm25RankedAllOf(postings(s, d), queryTerms(s, d),
      PostingStore.doclen(s, d))

  /** [[bm25RankedAll]] with precomputed postings/query-table/doc-length
    * frames — the fusion queries' shared-spine entry point (see
    * [[rankedOf]]'s qt-threading note). */
  private def bm25RankedAllOf(p: DataFrame, qt: DataFrame,
      dl: DataFrame): DataFrame = {
    val totals = dl.agg(sum(col("dl")).as("t_tok"),
      count(lit(1)).as("n_docs"))
    val df_ = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val cand = p.join(broadcast(qt), Seq("term"))
      .join(broadcast(df_.join(broadcast(qt), Seq("term"))
        .select(col("term"), col("df"))), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .withColumn("num", expr("22 * tf * (2 * n_docs - 2 * df + 1)"))
      .withColumn("den", expr(
        "(2 * df + 1) * 10 * (tf * 10000 * t_tok + 3000 * t_tok + " +
          "9000 * dl * n_docs)"))
      .withColumn("term_score",
        col("num").cast("double") / col("den").cast("double"))
    val scored = cand.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matched"), sum(col("term_score")).as("bm25"))
      .filter(col("n_matched") === 2)
    scored
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("bm25").desc, col("doc_id").asc)).cast("long"))
  }

  /** RECIPROCAL RANK FUSION of two rankers (Cormack, Clarke & Büttcher,
    * SIGIR'09): fused score = Σ 1/(60 + rank_i) over the input rankings —
    * the standard hybrid-retrieval combiner (production "hybrid search"
    * fuses a lexical and a dense list exactly this way; RRF needs only
    * RANKS, so it composes rankers with incomparable score scales). Here
    * the two arms are the stack's two registered lexical rankers, which
    * genuinely disagree: raw summed-tf ([[ranked]] — favors long
    * repetitive docs) vs BM25 ([[bm25Rank]] — tf-saturated,
    * length-normalized, idf-weighted); RetrievalSpec asserts the
    * orderings actually differ on the live corpus so the fusion is
    * provably non-trivial. An embedding arm would slot in identically
    * (rank from the ANN family's top-k), but the synthetic embeddings
    * table has no doc_id correspondence to fuse against — documented
    * boundary, not a hidden gap.
    *
    * Determinism: each addend is one IEEE division of exact integers
    * (1.0 / (60 + rank)), summed as a fixed two-term left-to-right
    * expression — no reassociation, textually mirrored by the oracle
    * (CAST(1 AS DOUBLE), since a bare `1.0` in DuckDB is DECIMAL). Ties
    * in the fused score break on doc_id, both engines.
    *
    * Scale: both arms are rankings of the SAME conjunctive candidate
    * set (bounded by the broadcast query batch's posting selectivity),
    * so the fusion join is candidate-grain and co-keyed on
    * (query_id, doc_id) — one exchange each side, bounded top-k out. */
  def hybridRrf(s: SparkSession, d: String): DataFrame = {
    val bm = bm25RankedAll(s, d)
      .select(col("query_id"), col("doc_id"), col("rank").as("r_bm"))
    val lex = ranked(s, d)
      .select(col("query_id"), col("doc_id"), col("rank").as("r_tf"))
    bm.join(lex, Seq("query_id", "doc_id"))
      .withColumn("rrf",
        lit(1.0) / (lit(60L) + col("r_bm")).cast("double") +
          lit(1.0) / (lit(60L) + col("r_tf")).cast("double"))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("r_bm"), col("r_tf"), col("rrf"))
  }

  /** THREE-arm reciprocal rank fusion — [[hybridRrf]] completed into the
    * production hybrid-search shape (lexical + DENSE): the third arm
    * ranks the same conjunctive candidate set by cosine similarity
    * between deterministic text embeddings of query and document. The
    * embedding is the DSIR hashed-bigram feature device
    * ([[TextOps.importanceResample]], already oracle-proven): a 256-dim
    * count vector of md5-bucketed CHARACTER bigrams — the hashing
    * vectorizer / fastText-subword family, derived purely from text so
    * both engines (and a real deployment's feature store) compute it
    * bit-identically. No sqrt crosses the gate: for non-negative counts,
    * per-query cosine ordering dot/(‖q‖·‖d‖) ≡ ordering by dot²/‖d‖²
    * (‖q‖ is constant within a query), and THAT is one IEEE division of
    * two exact int64s — the sanctioned double pattern.
    *
    * Scale: the dense arm is CANDIDATE-grain at query time — document
    * vectors are PROBED from the materialized [[EmbedStore]] (embedded
    * once at ingest, the posting-store discipline; r14 closes the one
    * derived per-doc surface that still re-embedded per run), candidate
    * ids broadcast into a left-semi against the sparse scan, query
    * vectors are broadcast-tiny, the dot-product join expands a
    * candidate by at most its ≤256 non-zero buckets, and the fused
    * output is bounded top-k. A full-corpus dense index (IVF/PQ)
    * already exists on the vector shelf ([[VectorOps]]); here dense
    * RE-RANKING of lexical candidates is the retrieval pattern
    * (retrieve-then-rerank), so the corpus never shuffles by content.
    * RetrievalSpec asserts the dense ordering genuinely differs from
    * BOTH lexical arms; the lexical CTE families are shared VERBATIM
    * with `q_hybrid_rrf`/`q_bm25_rank`, so no arm can drift; the
    * truncation contract is audited by `q_dense_trunc_audit`. */
  def hybridRrfDense(s: SparkSession, d: String): DataFrame = {
    val p = postings(s, d)
    // derive the 10-row benchmark query table ONCE and checkpoint it:
    // every arm and branch below consumes it, and without the pin the
    // planner re-derives it per branch (measured 14 copies of the
    // vocab-ranking subtree in this query's plan). In production the
    // query batch ARRIVES from outside — this checkpoint is that
    // boundary made explicit.
    val qt = queryTermsOf(p).localCheckpoint()
    val bm = bm25RankedAllOf(p, qt, PostingStore.doclen(s, d))
      .select(col("query_id"), col("doc_id"), col("rank").as("r_bm"))
    val lex = rankedOf(p, qt)
      .select(col("query_id"), col("doc_id"), col("rank").as("r_tf"))
    // the LEXICAL FUSION JOIN is computed as ONE lazy plan (exactly the
    // 2-arm query's shape — the spines share scans inside it) and
    // checkpointed candidate-grain: both arms rank the SAME conjunctive
    // candidate set (n_matched = 2 in both), so bm ⋈ lex IS that set,
    // and everything dense below — the semi-probe ids, the dot join's
    // frame, the final fusion — is a cheap epilogue over the pinned
    // join. (Earlier shapes checkpointed lex alone and re-ran the bm
    // spine serially after it: measured 3.1–3.2 s where this shape runs
    // 2.1–2.3 s in the same window. Pinned blocks are candidate-grain,
    // the accepted small-checkpoint class.)
    val j = bm.join(lex, Seq("query_id", "doc_id")).localCheckpoint()
    val cand = j.select(col("query_id"), col("doc_id"))
    val qd = qt.groupBy(col("query_id"))
      .agg(concat(min(col("term")), lit(" "), max(col("term"))).as("t"))
    val qg = charBigramBuckets(qd, "query_id")
      .withColumnRenamed("cnt", "qcnt")
    // document vectors come from the MATERIALIZED [[EmbedStore]] — the
    // store probe replaces the per-run embedding pass (r13's catalog
    // maximum at 2.43 s paid the bigram walk every execution; a search
    // system embeds at ingest and probes at query time). Candidate ids
    // broadcast into a left-semi against the sparse scan, so the store
    // never shuffles. The oracle recomputes the embedding from raw text
    // verbatim, so the hash gate proves store ≡ fresh build every round.
    // Consumed ONCE: denseRankOf's single-aggregation shape (r15) folds
    // the norm into the dot pass, so the probe subtree plans and executes
    // exactly once — no checkpoint needed, no second store scan.
    val dg = EmbedStore.vectors(s, d)
      .join(broadcast(cand.select(col("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
      .withColumnRenamed("cnt", "dcnt")
    val rd = denseRankOf(cand, dg, qg)
    // broadcast the pinned candidate-grain join back onto the dense rank
    // (r15): rd leaves denseRankOf already hash-partitioned by query_id
    // (its rank window), so a broadcast of tiny j keeps that layout and
    // the final fused-rank window re-uses it — the SMJ spelling paid two
    // exchanges + sorts to re-key both sides and a third to re-key the
    // window (measured plan: Exchange(2)/(55)/(61) all gone).
    rd.join(broadcast(j), Seq("query_id", "doc_id"))
      .withColumn("rrf",
        lit(1.0) / (lit(60L) + col("r_bm")).cast("double") +
          lit(1.0) / (lit(60L) + col("r_tf")).cast("double") +
          lit(1.0) / (lit(60L) + col("r_dense")).cast("double"))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("r_bm"), col("r_tf"), col("r_dense"), col("rrf"))
  }

  /** Dense cosine-surrogate ranking of `cand` (query_id, doc_id) given
    * sparse document vectors `dg` (doc_id, b, dcnt) and broadcast-tiny
    * query vectors `qg` (query_id, b, qcnt): per query, rank by
    * dot²/‖d‖² (the sqrt-free cosine ordering — ‖q‖ is constant within
    * a query), ties on doc_id. Shared by [[hybridRrfDense]]
    * (store-probed truncated vectors) and [[denseTruncAudit]] (which
    * ranks the SAME candidates under truncated AND full-text vectors to
    * gate the truncation contract). Candidate-grain throughout: the
    * dot join expands a candidate by ≤256 non-zero buckets.
    *
    * PRECONDITION (ADVICE r15): `cand` must be UNIQUE on
    * (query_id, doc_id) — the folded norm is correct only because each
    * (candidate doc, bucket) row appears exactly once in the joined
    * frame, so per group Σdcnt² IS the doc's norm². A caller passing
    * duplicate candidate rows would silently scale norm2 AND dot
    * instead of failing. Both current callers satisfy it (hybridRrfDense
    * joins two per-(query,doc) rank frames; denseTruncAudit's lex is a
    * ranked-per-pair frame); RetrievalSpec's duplicate-cand probe pins
    * the invariant. */
  private[graft] def denseRankOf(cand: DataFrame, dg: DataFrame,
      qg: DataFrame): DataFrame = {
    // ONE aggregation computes the dot product AND the doc norm (r15,
    // guide §2.4): the qg join is LEFT and qg is unique on (query_id, b),
    // so the joined frame still carries every (candidate doc, bucket) row
    // exactly once — per (query_id, doc_id), Σ dcnt² IS the doc's norm².
    // The previous shape aggregated the norm from a SECOND pass over dg
    // (a second store-scan subtree, its own exchange, and a dot⋈norm
    // join); this removes all three. norm2 is NULL exactly when the doc
    // had no vector rows (the left join's all-null padding), matching
    // the old missing-from-dn case. Both sums are exact int64 — no
    // float reassociation crosses the gate.
    cand
      .join(dg, Seq("doc_id"), "left")
      .join(broadcast(qg), Seq("query_id", "b"), "left")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(coalesce(sum(col("qcnt") * col("dcnt")), lit(0L)).as("dot"),
        sum(col("dcnt") * col("dcnt")).as("norm2"))
      .withColumn("dscore",
        when(col("norm2").isNull, lit(0.0))
          .otherwise((col("dot") * col("dot")).cast("double")
            / col("norm2").cast("double")))
      .withColumn("r_dense",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("dscore").desc, col("doc_id").asc)).cast("long"))
      .select(col("query_id"), col("doc_id"), col("r_dense"))
  }

  /** TRUNCATION-CONTRACT AUDIT of the dense arm (VERDICT r13 #6):
    * [[DenseEmbedChars]] is a measured 7× cost lever, and this query
    * GATES what the cap costs in ranking quality instead of assuming it
    * — the `q_ann_pq_recall` discipline applied to the embedding input
    * cap. Per benchmark query it ranks the SAME conjunctive candidate
    * set twice — truncated vectors probed from [[EmbedStore]] vs
    * full-text vectors computed fresh (the verifier arm; at audit grain
    * the full pass is candidate-bounded, so the cost stays bounded by
    * posting selectivity, never the corpus) — and emits top-[[TopK]]
    * overlap counts. Integers only, so the gate is exact; the DuckDB
    * oracle recomputes BOTH rankings from raw text, which also re-proves
    * store ≡ fresh build on the truncated side. RetrievalSpec pins a
    * floor on the overlap so a quality regression (not just a hash
    * drift) fails loudly. */
  def denseTruncAudit(s: SparkSession, d: String): DataFrame = {
    val p = postings(s, d)
    val qt = queryTermsOf(p).localCheckpoint() // see hybridRrfDense
    val lex = rankedOf(p, qt)
      .select(col("query_id"), col("doc_id"))
      .localCheckpoint()
    val candIds = lex.select(col("doc_id")).distinct()
    val qd = qt.groupBy(col("query_id"))
      .agg(concat(min(col("term")), lit(" "), max(col("term"))).as("t"))
    val qg = charBigramBuckets(qd, "query_id")
      .withColumnRenamed("cnt", "qcnt")
    // dgT/dgF are each consumed ONCE since denseRankOf folded the norm
    // into the dot aggregation (r15) — the checkpoints that pinned them
    // against double execution became pure materialization cost; dropped.
    val dgT = EmbedStore.vectors(s, d)
      .join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .withColumnRenamed("cnt", "dcnt")
    val dgF = charBigramBuckets(
        Tables.documents(s, d)
          .join(broadcast(candIds), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("text").as("t")), "doc_id")
      .withColumnRenamed("cnt", "dcnt")
    val topT = denseRankOf(lex, dgT, qg)
      .filter(col("r_dense") <= TopK)
      .select(col("query_id"), col("doc_id"))
    val topF = denseRankOf(lex, dgF, qg)
      .filter(col("r_dense") <= TopK)
      .select(col("query_id"), col("doc_id"))
      .withColumn("hit", lit(1L))
    // both tops are ≤ TopK rows per query by the rank filter — broadcast
    // the verifier arm so the overlap join never re-keys topT (r15): the
    // SMJ spelling exchanged + sorted both top-k frames just to count
    // hits, and topT's query_id layout now flows into the final rollup.
    topT.join(broadcast(topF), Seq("query_id", "doc_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_topk"),
        coalesce(sum(col("hit")), lit(0L)).as("n_overlap"))
  }

  /** 256-dim hashed char-bigram count vector of column `t`, keyed by
    * `key` — sparse rows (key, b, cnt). The md5-bucket device is the
    * [[TextOps.importanceResample]] one; the length≥2 guard mirrors
    * DuckDB's empty `range(1, len)` (Spark's `sequence(1, 0)` would
    * DESCEND).
    *
    * The typed hot-loop face (the CLAUDE.md HOF/codegen discipline):
    * one narrow pass per row — codepoint-correct bigram walk, md5
    * memoized per DISTINCT bigram per partition (the charset bounds the
    * memo to dictionary size), counts folded into a 256-slot array, so
    * there is NO gram-grain aggregation at all. The declarative
    * explode→groupBy→md5 form measured 3.0–4.8 s at sf0.1 where this
    * pass is sub-second; two attempted declarative rescues were
    * measured and rejected first (global-bigram-dictionary broadcast:
    * recomputes the count stage twice, 5.7 → 15.6 s; 512-char
    * truncation alone: the aggregation, not the gram volume, was the
    * floor). Bit-parity vs the declarative form is pinned in
    * RetrievalSpec; the DuckDB oracle keeps the per-occurrence
    * declarative form, so the hash gate proves it cross-engine too.
    *
    * Bucket identity with the SQL device: `conv(substring(md5(bg),1,4),
    * 16,10) % 256` is the first TWO md5 bytes read big-endian mod 256 =
    * the SECOND byte — computed here directly from the digest. */
  private[graft] def charBigramBuckets(df: DataFrame,
      key: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(key).cast("long"), col("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val memo = new java.util.HashMap[String, Integer]()
        def bucket(bg: String): Int = {
          var b = memo.get(bg)
          if (b == null) {
            b = Integer.valueOf(
              md.digest(bg.getBytes("UTF-8"))(1) & 0xff)
            memo.put(bg, b): Unit
          }
          b.intValue()
        }
        it.flatMap { case (id, t) =>
          val cps = t.codePoints().toArray // substring counts codepoints
          if (cps.length < 2) Iterator.empty
          else {
            val counts = new Array[Long](256)
            var i = 0
            while (i < cps.length - 1) {
              counts(bucket(new String(cps, i, 2))) += 1
              i += 1
            }
            (0 until 256).iterator.filter(counts(_) > 0L)
              .map(b => (id, b.toLong, counts(b)))
          }
        }
      }
      .toDF(key, "b", "cnt")
  }

  /** RAG context packing: walk each query's candidates in rank order and
    * keep a document iff it fits the remaining [[TokenBudget]] —
    * skip-greedy, NOT prefix-truncation, so a later smaller document can
    * still use budget a big one couldn't. Emits EVERY candidate with its
    * decision (`kept`) and the running total after it (`cum_tok`), so
    * the full audit trail is gate-checked, not just the survivors.
    *
    * The fold is inherently sequential per query, so it runs as a typed
    * `flatMapGroups` over the top-[[PackCandidates]] cut — bounded O(k)
    * rows per group at any corpus size (see class doc). The DuckDB
    * oracle replays the identical fold as a rank-stepping recursive CTE:
    * a hash match proves the imperative Spark fold ≡ the declarative
    * recursion. */
  def ragPack(s: SparkSession, d: String): DataFrame =
    packOf(s, ranked(s, d), PostingStore.doclen(s, d)
      .select(col("doc_id"), col("dl").as("n_tok")))

  /** The composed retrieval flagship: the full training-data journey from
    * raw corpus to served context — quality/language gates → exact dedup →
    * near-dup removal (the `q_corpus_filter` survivor set, shared with the
    * embedding flagship so text and vector pipelines clean identically) →
    * inverted index over ONLY the survivors → conjunctive search → greedy
    * context packing. Cross-module composition is id-only: the survivor
    * set broadcasts as a LeftSemi against the posting store (the same
    * filter-before-index shape `q_embed_pipeline` uses), so no text
    * re-tokenization and no index rebuild — the cleaned index is the
    * stored index minus dropped postings. Note the df-ranking that
    * derives the benchmark queries recomputes on the CLEANED corpus, as
    * it must: term statistics of a filtered index differ from the raw
    * one, and BM25/selectivity downstream consume the cleaned df. */
  def ragPipeline(s: SparkSession, d: String): DataFrame = {
    val surv = TextOps.filteredCorpus(s, d).select(col("doc_id"))
    val p = postings(s, d)
      .join(broadcast(surv), Seq("doc_id"), "left_semi")
    val toklen = PostingStore.doclen(s, d)
      .join(broadcast(surv), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("dl").as("n_tok"))
    packOf(s, rankedOf(p), toklen)
  }

  private def packOf(s: SparkSession, rankedC: DataFrame,
      toklen: DataFrame): DataFrame = {
    import s.implicits._
    val cand = rankedC
      .filter(col("rank") <= PackCandidates)
      .join(toklen, Seq("doc_id"))
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_tok"),
        col("score"))
      .as[RagCand]
    cand.groupByKey(_.query_id)
      .flatMapGroups { (q: Long, it: Iterator[RagCand]) =>
        val sorted = it.toIndexedSeq.sortBy(_.rank)
        var cum = 0L
        sorted.map { c =>
          val kept = cum + c.n_tok <= TokenBudget
          if (kept) cum += c.n_tok
          RagPackRow(q, c.rank, c.doc_id, c.n_tok, if (kept) 1L else 0L,
            cum, c.score)
        }
      }
      .toDF()
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_inverted_search" -> (invertedSearch _),
      "q_bm25_rank" -> (bm25Rank _),
      "q_hybrid_rrf" -> (hybridRrf _),
      "q_hybrid_rrf_dense" -> (hybridRrfDense _),
      "q_dense_trunc_audit" -> (denseTruncAudit _),
      "q_rag_pack" -> (ragPack _),
      "q_rag_pipeline" -> (ragPipeline _),
    )

  /** Shared oracle spine mirroring [[postings]]/[[queryTerms]]/[[ranked]],
    * parameterized by the document relation so the composed pipeline can
    * run the IDENTICAL spine over the survivor-filtered corpus. */
  private def rankedSqlFrom(docSrc: String): String =
    s"""p AS (
       |  SELECT term, doc_id, COUNT(*) AS tf FROM (
       |    SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
       |    FROM $docSrc)
       |  GROUP BY 1, 2),
       |v AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1),
       |qt AS (
       |  SELECT (rnk - $QueryRankFrom) // 2 AS query_id, term FROM (
       |    SELECT term,
       |      ROW_NUMBER() OVER (ORDER BY df DESC, term ASC) AS rnk
       |    FROM v)
       |  WHERE rnk BETWEEN $QueryRankFrom AND $QueryRankTo),
       |m AS (
       |  SELECT qt.query_id, p.doc_id, COUNT(*) AS n_matched,
       |    CAST(SUM(p.tf) AS BIGINT) AS score
       |  FROM p JOIN qt USING (term) GROUP BY 1, 2),
       |r AS (
       |  SELECT query_id, doc_id, score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
       |  FROM m WHERE n_matched = 2)""".stripMargin

  private val rankedSql: String = rankedSqlFrom("documents")

  /** The full BM25 chain (dl → tot → c → sc → rk) over the `rankedSql`
    * spine — shared VERBATIM by `q_bm25_rank` and the RRF fusion so the
    * fused arm can never drift from the standalone ranking. Mirrors
    * [[bm25RankedAll]] textually (integer num/den, one IEEE division). */
  private val bm25Sql: String =
    s"""dl AS (SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |       FROM documents),
       |tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS t_tok,
       |          COUNT(*) AS n_docs FROM dl),
       |c AS (
       |  SELECT qt.query_id, p.doc_id, p.tf, v.df, dl.dl, tot.t_tok,
       |    tot.n_docs
       |  FROM p JOIN qt USING (term) JOIN v USING (term)
       |    JOIN dl USING (doc_id) CROSS JOIN tot),
       |sc AS (
       |  SELECT query_id, doc_id, COUNT(*) AS n_matched,
       |    SUM(CAST(22 * tf * (2 * n_docs - 2 * df + 1) AS DOUBLE) /
       |        CAST((2 * df + 1) * 10 * (tf * 10000 * t_tok +
       |          3000 * t_tok + 9000 * dl * n_docs) AS DOUBLE)) AS bm25
       |  FROM c GROUP BY 1, 2),
       |rk AS (SELECT query_id, doc_id, bm25,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS rank
       |       FROM sc WHERE n_matched = 2)""".stripMargin

  /** The dense arm's oracle CTE family — query embedding (cq, qg),
    * candidate set (cd), TRUNCATED document embedding (dg), norm (dn),
    * dot (dt) and dense ranking (rd). Shared VERBATIM by
    * `q_hybrid_rrf_dense` and `q_dense_trunc_audit` (the shared-
    * `private val` discipline), so the audited ranking can never drift
    * from the fused one. Mirrors [[denseRankOf]] over
    * [[EmbedStore]]-shaped vectors; recomputing from raw text here is
    * exactly what makes the hash gate a store ≡ fresh-build proof. */
  private val denseArmSql: String =
    s"""cq AS (SELECT query_id, MIN(term) || ' ' || MAX(term) AS t
       |       FROM qt GROUP BY 1),
       |qg AS (
       |  SELECT query_id, ('0x'||substr(md5(bg),1,4))::BIGINT % 256 AS b,
       |    COUNT(*) AS qcnt
       |  FROM (SELECT query_id, substr(t, i, 2) AS bg
       |        FROM (SELECT query_id, t, UNNEST(range(1, length(t))) AS i
       |              FROM cq WHERE length(t) >= 2))
       |  GROUP BY 1, 2),
       |cd AS (SELECT DISTINCT doc_id FROM r),
       |dg AS (
       |  SELECT doc_id, ('0x'||substr(md5(bg),1,4))::BIGINT % 256 AS b,
       |    COUNT(*) AS dcnt
       |  FROM (SELECT doc_id, substr(t, i, 2) AS bg
       |        FROM (SELECT doc_id, t, UNNEST(range(1, length(t))) AS i
       |              FROM (SELECT d.doc_id,
       |                      substr(d.text, 1, $DenseEmbedChars) AS t
       |                    FROM documents d JOIN cd USING (doc_id))
       |              WHERE length(t) >= 2))
       |  GROUP BY 1, 2),
       |dn AS (SELECT doc_id, CAST(SUM(dcnt*dcnt) AS BIGINT) AS norm2
       |       FROM dg GROUP BY 1),
       |dt AS (
       |  SELECT c.query_id, c.doc_id,
       |    CAST(COALESCE(SUM(qg.qcnt * dg.dcnt), 0) AS BIGINT) AS dot
       |  FROM (SELECT query_id, doc_id FROM r) c
       |  LEFT JOIN dg ON dg.doc_id = c.doc_id
       |  LEFT JOIN qg ON qg.query_id = c.query_id AND qg.b = dg.b
       |  GROUP BY 1, 2),
       |rd AS (
       |  SELECT dt.query_id, dt.doc_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY dt.query_id ORDER BY
       |      CASE WHEN dn.norm2 IS NULL THEN CAST(0 AS DOUBLE)
       |           ELSE CAST(dt.dot * dt.dot AS DOUBLE)
       |             / CAST(dn.norm2 AS DOUBLE) END DESC,
       |      dt.doc_id ASC) AS BIGINT) AS r_dense
       |  FROM dt LEFT JOIN dn ON dn.doc_id = dt.doc_id)""".stripMargin

  /** The pack-recursion tail shared verbatim by `q_rag_pack` and
    * `q_rag_pipeline` — the fold must be textually identical over either
    * corpus, so it is one string (the shared-`private val` discipline). */
  private def packSqlTail(docSrc: String): String =
    s"""tl AS (SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |       FROM $docSrc),
       |c AS (SELECT r.query_id, r.rank, r.doc_id, tl.n_tok, r.score
       |      FROM r JOIN tl USING (doc_id)
       |      WHERE r.rank <= $PackCandidates),
       |pack(query_id, rank, doc_id, n_tok, kept, cum, score) AS (
       |  SELECT DISTINCT query_id, CAST(0 AS BIGINT),
       |    CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |  FROM c
       |  UNION ALL
       |  SELECT c.query_id, c.rank, c.doc_id, c.n_tok,
       |    CASE WHEN p.cum + c.n_tok <= $TokenBudget
       |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END,
       |    CASE WHEN p.cum + c.n_tok <= $TokenBudget
       |         THEN p.cum + c.n_tok ELSE p.cum END,
       |    c.score
       |  FROM pack p JOIN c
       |    ON c.query_id = p.query_id AND c.rank = p.rank + 1)
       |SELECT query_id, rank, doc_id, n_tok, kept, cum AS cum_tok, score
       |FROM pack WHERE rank >= 1""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_inverted_search" ->
      s"""WITH $rankedSql,
         |qd AS (SELECT query_id, MIN(term) AS term_a, MAX(term) AS term_b
         |       FROM qt GROUP BY 1)
         |SELECT r.query_id, qd.term_a, qd.term_b, r.rank, r.doc_id, r.score
         |FROM r JOIN qd USING (query_id) WHERE r.rank <= $TopK""".stripMargin,
    "q_bm25_rank" ->
      s"""WITH $rankedSql,
         |$bm25Sql
         |SELECT query_id, rank, doc_id, bm25
         |FROM rk WHERE rank <= $TopK""".stripMargin,
    // RRF over the two rankings the spine (r) and the bm25 chain (rk)
    // already define — both CTE families shared VERBATIM with their
    // standalone queries, so neither arm can drift from what it fuses
    "q_hybrid_rrf" ->
      s"""WITH $rankedSql,
         |$bm25Sql,
         |j AS (SELECT rk.query_id, rk.doc_id, rk.rank AS r_bm,
         |        r.rank AS r_tf
         |      FROM rk JOIN r ON rk.query_id = r.query_id
         |        AND rk.doc_id = r.doc_id),
         |f AS (SELECT query_id, doc_id, r_bm, r_tf,
         |        CAST(1 AS DOUBLE) / (60 + r_bm) +
         |          CAST(1 AS DOUBLE) / (60 + r_tf) AS rrf
         |      FROM j)
         |SELECT query_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rank,
         |  doc_id, r_bm, r_tf, rrf
         |FROM f
         |QUALIFY rank <= $TopK""".stripMargin,
    // the 3-arm fusion: lexical CTEs (r, rk) shared VERBATIM with
    // q_hybrid_rrf/q_bm25_rank; the dense arm mirrors hybridRrfDense's
    // hashed char-bigram embedding (the importanceResample md5-bucket
    // device) and its sqrt-free cosine ordering dot²/‖d‖²
    "q_hybrid_rrf_dense" ->
      s"""WITH $rankedSql,
         |$bm25Sql,
         |$denseArmSql,
         |f3 AS (SELECT rk.query_id, rk.doc_id, rk.rank AS r_bm,
         |         r.rank AS r_tf, rd.r_dense,
         |         CAST(1 AS DOUBLE) / (60 + rk.rank) +
         |           CAST(1 AS DOUBLE) / (60 + r.rank) +
         |           CAST(1 AS DOUBLE) / (60 + rd.r_dense) AS rrf
         |       FROM rk JOIN r ON rk.query_id = r.query_id
         |         AND rk.doc_id = r.doc_id
         |       JOIN rd ON rd.query_id = rk.query_id
         |         AND rd.doc_id = rk.doc_id)
         |SELECT query_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rank,
         |  doc_id, r_bm, r_tf, r_dense, rrf
         |FROM f3
         |QUALIFY rank <= $TopK""".stripMargin,
    // truncation audit: the truncated ranking's CTEs (qg, cd, dg, dn,
    // dt, rd) shared VERBATIM with q_hybrid_rrf_dense via denseArmSql;
    // the full-text family (dgf..rdf) differs ONLY in dropping the
    // substr cap. Integer overlap counts — exact gate.
    "q_dense_trunc_audit" ->
      s"""WITH $rankedSql,
         |$denseArmSql,
         |dgf AS (
         |  SELECT doc_id, ('0x'||substr(md5(bg),1,4))::BIGINT % 256 AS b,
         |    COUNT(*) AS dcnt
         |  FROM (SELECT doc_id, substr(t, i, 2) AS bg
         |        FROM (SELECT doc_id, t, UNNEST(range(1, length(t))) AS i
         |              FROM (SELECT d.doc_id, d.text AS t
         |                    FROM documents d JOIN cd USING (doc_id))
         |              WHERE length(t) >= 2))
         |  GROUP BY 1, 2),
         |dnf AS (SELECT doc_id, CAST(SUM(dcnt*dcnt) AS BIGINT) AS norm2
         |        FROM dgf GROUP BY 1),
         |dtf AS (
         |  SELECT c.query_id, c.doc_id,
         |    CAST(COALESCE(SUM(qg.qcnt * dgf.dcnt), 0) AS BIGINT) AS dot
         |  FROM (SELECT query_id, doc_id FROM r) c
         |  LEFT JOIN dgf ON dgf.doc_id = c.doc_id
         |  LEFT JOIN qg ON qg.query_id = c.query_id AND qg.b = dgf.b
         |  GROUP BY 1, 2),
         |rdf AS (
         |  SELECT dtf.query_id, dtf.doc_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY dtf.query_id ORDER BY
         |      CASE WHEN dnf.norm2 IS NULL THEN CAST(0 AS DOUBLE)
         |           ELSE CAST(dtf.dot * dtf.dot AS DOUBLE)
         |             / CAST(dnf.norm2 AS DOUBLE) END DESC,
         |      dtf.doc_id ASC) AS BIGINT) AS r_dense
         |  FROM dtf LEFT JOIN dnf ON dnf.doc_id = dtf.doc_id),
         |ovt AS (SELECT query_id, doc_id FROM rd WHERE r_dense <= $TopK),
         |ovf AS (SELECT query_id, doc_id FROM rdf WHERE r_dense <= $TopK)
         |SELECT ovt.query_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_topk,
         |  CAST(COALESCE(SUM(CASE WHEN ovf.doc_id IS NOT NULL
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_overlap
         |FROM ovt LEFT JOIN ovf ON ovf.query_id = ovt.query_id
         |  AND ovf.doc_id = ovt.doc_id
         |GROUP BY 1""".stripMargin,
    "q_rag_pack" ->
      s"""WITH RECURSIVE $rankedSql,
         |${packSqlTail("documents")}""".stripMargin,
    // The composed flagship runs the IDENTICAL spine + pack fold over the
    // corpus-filter survivor set (WITH RECURSIVE is safe here: every
    // set-op CTE in corpusSurvivorCtes is UNION ALL, which DuckDB's
    // recursive-WITH quirk leaves intact — only bare UNION loses its
    // dedup; see CLAUDE.md traps).
    "q_rag_pipeline" ->
      s"""WITH RECURSIVE ${TextOps.corpusSurvivorCtes},
         |cleaned AS (SELECT d0.doc_id, d0.text FROM documents d0
         |            WHERE d0.doc_id IN (SELECT doc_id FROM surv)),
         |${rankedSqlFrom("cleaned")},
         |${packSqlTail("cleaned")}""".stripMargin,
  )
}
