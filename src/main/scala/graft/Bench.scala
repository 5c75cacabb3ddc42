package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":<sec>,...,"queries":{name:sec},...}`.
  *
  * Timing = min of `SPARK_GRAFT_BENCH_RUNS` (default 2) executions per
  * query — steady-state throughput, not JVM/codegen warmup. A failed query
  * reports -1 (and the failure goes to stderr so it is never silent).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val spark = GraftSession.get()

    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(kv => args.contains(kv._1))
      else SparkEntry.queries
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val best =
        try (1 to runs).map(_ => time(fn)).min
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
        }
      // queries may cache intermediates (LSH signatures); drop them so one
      // query's working set never skews another's measurement
      spark.catalog.clearCache()
      name -> best
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ok = results.filter(_._2 >= 0)
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"n_queries":${results.size},"n_failed":${results.size - ok.size}}""")
    spark.stop()
  }
}
