package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":<sec>,...,"queries":{name:sec},...}`.
  *
  * Per query it runs `SPARK_GRAFT_BENCH_RUNS` (default 3) executions and
  * reports the MIN (steady-state plan cost, headline `queries`/`value`)
  * alongside the MEDIAN (`queries_median`/`value_median`) — this box is
  * shared and round-1 showed min-of-2 swinging 56 s → 1005 s under
  * contention; the median documents the spread so a noisy run is
  * recognizable as noise. A failed query reports -1 (and the failure goes
  * to stderr so it is never silent).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
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

    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(kv => args.contains(kv._1))
      else SparkEntry.queries
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (best, med) =
        try {
          val ts = (1 to runs).map(_ => time(fn))
          (ts.min, median(ts))
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            (-1.0, -1.0)
        }
      // queries may cache intermediates (LSH signatures); drop them so one
      // query's working set never skews another's measurement
      spark.catalog.clearCache()
      (name, best, med)
    }
    def obj(f: ((String, Double, Double)) => (String, Double)): String =
      results.map { r => val (k, v) = f(r); "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val qs = obj(r => (r._1, r._2))
    val qsMed = obj(r => (r._1, r._3))
    val ok = results.filter(_._2 >= 0)
    val total = ok.map(_._2).sum
    val totalMed = ok.map(_._3).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","value_median":$totalMed,"queries":$qs,"queries_median":$qsMed,"sf":"$sfDir","runs":$runs,"n_queries":${results.size},"n_failed":${results.size - ok.size}}""")
    spark.stop()
  }
}
