package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s (SURVEY F4: the reference defines none, but A4's
  * Set-based exact distinct count is the shape that wants one when the
  * built-in `collect_set` would blow memory limits).
  *
  * Scale note: the buffer is a Scala Set serialized per partial — fine for
  * bounded-cardinality keys (distinct order ids within a 10 s window). For
  * unbounded cardinality switch to `approx_count_distinct` (HLL) — the
  * catalog exposes both so the caller chooses exactness vs memory.
  */
object Aggregators {

  /** Exact distinct-count of strings via a Set buffer
    * (TradeSkuOrderBean.orderIdSet analog, DwsTradeSkuOrderWindow.java:116). */
  val distinctCount: Aggregator[String, Set[String], Long] =
    new Aggregator[String, Set[String], Long] {
      def zero: Set[String] = Set.empty
      def reduce(b: Set[String], a: String): Set[String] =
        if (a == null) b else b + a
      def merge(b1: Set[String], b2: Set[String]): Set[String] = b1 ++ b2
      def finish(r: Set[String]): Long = r.size.toLong
      def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Mergeable Misra–Gries heavy-hitters sketch with `k` counters
    * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
    * Summaries", PODS'12). State is O(k) regardless of stream length or
    * item cardinality, partials combine map-side, and the merge is
    * associative — the properties that let a frequency sketch run as one
    * pass over 100 TB with a k-entry buffer per task.
    *
    * Guarantees (HeavyHitterSpec property-tests both across random
    * partition splits): the finished summary has ≤ k entries; every item
    * with true count > n/(k+1) is present (a fortiori count > n/k); each
    * estimate lies in [true − n/(k+1), true] — MG never overcounts. */
  def misraGries(k: Int): Aggregator[String, Map[String, Long], Map[String, Long]] =
    new Aggregator[String, Map[String, Long], Map[String, Long]] {
      def zero: Map[String, Long] = Map.empty
      def reduce(b: Map[String, Long], a: String): Map[String, Long] =
        if (a == null) b
        else b.get(a) match {
          case Some(c) => b.updated(a, c + 1)
          case None if b.size < k => b.updated(a, 1L)
          case None => // decrement-all: removes k+1 counts incl. the arrival
            b.collect { case (t, c) if c > 1 => t -> (c - 1) }
        }
      def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
        val sum = b2.foldLeft(b1) { case (m, (t, c)) =>
          m.updated(t, m.getOrElse(t, 0L) + c)
        }
        if (sum.size <= k) sum
        else { // subtract the (k+1)-th largest count, keep positives
          val cut = sum.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k)
          sum.collect { case (t, c) if c > cut => t -> (c - cut) }
        }
      }
      def finish(r: Map[String, Long]): Map[String, Long] = r
      def bufferEncoder: Encoder[Map[String, Long]] =
        Encoders.kryo[Map[String, Long]]
      def outputEncoder: Encoder[Map[String, Long]] =
        Encoders.kryo[Map[String, Long]]
    }

  /** Mergeable KMV (k-minimum-values / bottom-k) distinct-count sketch
    * (Bar-Yossef et al., RANDOM'02; Beyer et al., SIGMOD'07 for the
    * unbiased (k−1)·M/h₍ₖ₎ estimator). The buffer is the k smallest
    * DISTINCT hash values seen, kept sorted ascending; merge is
    * distinct-union-then-take-k, which is associative and idempotent —
    * re-delivered rows cannot move the estimate, so the sketch is safe
    * under at-least-once replay.
    *
    * What distinguishes KMV from HLL in this catalog: the sketch state is
    * a pure ORDER STATISTIC of a deterministic hash, so two engines that
    * agree on the hash agree on the estimate BIT-FOR-BIT. The registered
    * query ([[graft.ops.Relational.kmvDistinct]]) therefore carries a
    * full hash-exact DuckDB oracle for the estimate itself — no bracket
    * needed, unlike the HLL entries whose register layouts are
    * engine-private. KmvSpec proves this Aggregator ≡ the declarative
    * window form on the same hashes, and that arbitrary partition splits
    * merge to the identical buffer. */
  def kmv(k: Int): Aggregator[Long, List[Long], Seq[Long]] =
    new Aggregator[Long, List[Long], Seq[Long]] {
      // insert into a sorted-ascending bounded list, dropping duplicates:
      // O(k) per arrival, O(k) state — the map-side cost model that lets
      // the sketch scan 100 TB with a constant-size buffer per task.
      private def insert(b: List[Long], a: Long): List[Long] = {
        if (b.contains(a)) b
        else {
          val (lo, hi) = b.span(_ < a)
          val grown = lo ::: (a :: hi)
          if (grown.size > k) grown.init else grown
        }
      }
      def zero: List[Long] = Nil
      def reduce(b: List[Long], a: Long): List[Long] = insert(b, a)
      def merge(b1: List[Long], b2: List[Long]): List[Long] =
        b2.foldLeft(b1)(insert)
      def finish(r: List[Long]): Seq[Long] = r
      def bufferEncoder: Encoder[List[Long]] = Encoders.kryo[List[Long]]
      // a real array<bigint> (not an opaque kryo BINARY) so the sketch
      // column survives sinks/SQL — the streaming KmvSpec round-trips it
      // through a memory table
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }
}
