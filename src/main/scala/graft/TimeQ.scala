package graft

/** Dev utility: time individual catalog queries in a warm session
  * (`runMain graft.TimeQ <sfDir> <q_name>...`) — 3 runs each, cache
  * cleared between runs, so run1 shows cold/store-build cost and the
  * min shows the steady-state probe path (what Bench's min-of-runs
  * records). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args(0)
    args.drop(1).foreach { q =>
      val fn = SparkEntry.queries(q)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, d).count()
        println(f"[timeq] $q run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        spark.catalog.clearCache()
      }
    }
  }
}
