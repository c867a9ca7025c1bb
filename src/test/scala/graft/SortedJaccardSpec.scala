package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Native fused jaccard over sorted hash sets: differential vs the
  * composable array_intersect/array_union form, null/type surface, and
  * codegen participation. */
class SortedJaccardSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.SortedJaccard

  test("native sorted_jaccard equals the composable set form (property)") {
    val setGen = Gen.listOfN(30, Gen.choose(0L, 40L)).map(_.distinct.sorted.toArray)
    val prop = Prop.forAll(Gen.listOfN(8, setGen)) { sets =>
      val df = sets.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      val pairs = df.select(col("id").as("a"), col("s").as("sa"))
        .crossJoin(df.select(col("id").as("b"), col("s").as("sb")))
        .where(col("a") < col("b"))
      val rows = pairs.select(
        SortedJaccard(col("sa"), col("sb")).as("native"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double")).as("composed"))
        .collect()
      rows.forall { r =>
        val n = r.getDouble(0)
        // composable form yields NaN for empty/empty; native defines 0.0
        if (r.isNullAt(1) || r.getDouble(1).isNaN) n == 0.0 else n == r.getDouble(1)
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(r.passed, r.status.toString)
  }

  test("null input yields null; type mismatch rejected; empty sets score 0") {
    val df = Seq(
      (Some(Array(1L, 2L)), Some(Array(2L, 3L))),
      (None, Some(Array(1L))),
      (Some(Array.empty[Long]), Some(Array.empty[Long])))
      .toDF("a", "b")
    val out = df.select(SortedJaccard(col("a"), col("b")).as("j"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq === Seq(Some(1.0 / 3), None, Some(0.0)))

    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", "y")).toDF("a", "b")
        .select(SortedJaccard(col("a"), col("b"))).collect()
    }
  }

  test("sorted_jaccard stays inside whole-stage codegen and registers in SQL") {
    val df = spark.range(100).select(
        array((0 until 6).map(i => col("id") + i): _*).as("a"),
        array((0 until 6).map(i => col("id") + i + 3): _*).as("b"))
      .select(SortedJaccard(col("a"), col("b")).as("j"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.as[Double].collect().forall(_ === 3.0 / 9)) // overlap 3 of 9

    val (id, info, builder) = GraftExtensions.sortedJaccard
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    val viaSql = spark.sql(
      "SELECT sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
      .as[Double].head()
    assert(viaSql === 0.5)
  }
}
