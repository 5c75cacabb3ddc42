package graft

import graft.functions.Aggregators
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the mergeable Misra–Gries sketch, driven directly
  * through the Aggregator's reduce/merge over random streams split into
  * random partitions — i.e. every executor/combine topology Spark could
  * choose. The claims under test are the ones `q_heavy_hitters`' bracket
  * oracle leans on:
  *   1. the summary never exceeds k entries (the O(k)-state scale claim);
  *   2. no false negatives: every item with true count > n/k is present;
  *   3. estimates never overcount and undercount by at most n/k.
  * Streams are Zipf-ish (planted hot items over a uniform tail) so both
  * sides of the n/k boundary are populated. */
class HeavyHitterSpec extends AnyFunSuite {

  private def runSketch(stream: Seq[String], k: Int,
      rnd: scala.util.Random): Map[String, Long] = {
    val mg = Aggregators.misraGries(k)
    // random partitioning: fold each partition, then merge in random order
    val nParts = 1 + rnd.nextInt(8)
    val parts = stream.groupBy(_ => rnd.nextInt(nParts)).values.toSeq
    val buffers = rnd.shuffle(parts.map(_.foldLeft(mg.zero)(mg.reduce)))
    buffers.foldLeft(mg.zero)(mg.merge)
  }

  test("MG: bounded size, no false negatives above n/k, estimates within bound") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 20) {
      val k = 4 + rnd.nextInt(12)
      // uniform tail over 50 items + planted hot items of varying mass
      val tail = (1 to 500).map(_ => s"t${rnd.nextInt(50)}")
      val hot = (1 to (1 + rnd.nextInt(3))).flatMap(h =>
        Seq.fill(100 + rnd.nextInt(400))(s"hot$h"))
      val stream = rnd.shuffle(tail ++ hot)
      val n = stream.size.toLong
      val exact = stream.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
      val summary = runSketch(stream, k, rnd)

      assert(summary.size <= k, s"trial $trial: summary exceeded k=$k")
      for ((t, ct) <- exact if ct * k > n)
        assert(summary.contains(t),
          s"trial $trial: lost heavy hitter $t (ct=$ct, n=$n, k=$k)")
      for ((t, est) <- summary) {
        val ct = exact(t)
        assert(est <= ct, s"trial $trial: $t overcounted ($est > $ct)")
        assert(est >= ct - n / k,
          s"trial $trial: $t undercounted past n/k ($est < $ct - ${n / k})")
      }
    }
  }
}
