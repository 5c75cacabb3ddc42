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
}
