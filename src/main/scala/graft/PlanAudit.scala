package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints `explain("formatted")` for the named queries
  * (default: a scan/join/agg/top-k cross-section) so scan pruning,
  * pushdown, broadcast choices, and partial aggregation can be reviewed
  * per round. Usage: runMain graft.PlanAudit [sfDir] [query...] */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("m1_project", "q1_agg", "join_broadcast", "topk_orders",
        "x2_dedup", "dedup_lsh_verified", "q3_shipping", "sim_ann_ivfpq",
        "curate_filter", "text_winnow", "dedup_span_removal")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
