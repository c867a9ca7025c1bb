package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed exact ntile: bit-equality with SQL ntile across remainder
  * cases, small inputs, and arbitrary partition layouts. */
class NtileSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Relational

  private def check(rows: Seq[(Long, Double)], n: Int): Unit = {
    val df = rows.toDF("id", "v").repartition(5)
    val got = Relational.ntileExact(df, n, Seq(col("v").desc, col("id")), "b")
      .select("id", "b").as[(Long, Int)].collect().toMap
    val want = df.withColumn("b", ntile(n).over(Window.orderBy(col("v").desc, col("id"))))
      .select("id", "b").as[(Long, Int)].collect().toMap
    assert(got === want, s"n=$n rows=${rows.size}")
  }

  test("matches SQL ntile: remainders, ties, total smaller than n") {
    check((1L to 17L).map(i => (i, (i % 5).toDouble)), 4) // 17 = 4*4+1
    check((1L to 16L).map(i => (i, (i % 3).toDouble)), 4) // exact split
    check((1L to 3L).map(i => (i, 1.0)), 4)               // total < n: all ties
    check((1L to 10L).map(i => (i, 42.0)), 3)             // full tie column
  }

  test("withGlobalRank is dense 1..N and deterministic across layouts") {
    val df = (1L to 100L).map(i => (i, (i * 7 % 13).toDouble)).toDF("id", "v")
    val a = Relational.withGlobalRank(df.repartition(7), Seq(col("v"), col("id")))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val b = Relational.withGlobalRank(df.coalesce(1), Seq(col("v"), col("id")))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(a === b)
    assert(a.values.toSeq.sorted === (1L to 100L))
  }
}
