package graft

import org.apache.spark.sql.SparkSession

/** Developer tool: min-of-N wall time for a subset of SparkEntry.queries —
  * per-query numbers from the full Bench sweep carry session cross-talk
  * (GC, JIT, cache pressure), so A/B perf decisions use this instead.
  * Usage: runMain graft.MicroBench q1 q2 ...  (env: SPARK_GRAFT_SF_DIR, REPS)
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    once("q1_agg") // warm codegen/JIT
    args.foreach { name =>
      val ts = (1 to reps).map { _ =>
        val t = once(name)
        spark.sharedState.cacheManager.clearCache() // no cross-rep reuse
        t
      }
      println(f"MICRO $name min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
