package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.SquaredDistances

/** Native squared-distances kernel: differential-tested against the
  * unrolled literal-chain formulation it replaced (bit-identical
  * left-associative sums), null/short-vector semantics, float widening,
  * and codegen participation (the chains blew Janino's method limit and
  * fell back to interpreted mode — the loop must not). */
class SquaredDistancesSpec extends SparkSpec {
  import spark.implicits._

  private def chainDist(cents: Array[Array[Double]], v: Array[Double]): Array[Double] =
    cents.map { c =>
      // left-associative chain, exactly as the old per-centroid literal
      // expressions (and the DuckDB oracles) associate: ((t0+t1)+t2)+…
      c.indices.map { j => val x = v(j) - c(j); x * x }.reduce(_ + _)
    }

  test("bit-identical to the left-associative literal chains (property)") {
    val dim = 16
    val gen = for {
      cents <- Gen.listOfN(8, Gen.listOfN(dim, Gen.choose(-2.0, 2.0)).map(_.toArray))
      vecs <- Gen.listOfN(20, Gen.listOfN(dim, Gen.choose(-10.0, 10.0)).map(_.toArray))
    } yield (cents.toArray, vecs)
    val prop = Prop.forAll(gen) { case (cents, vecs) =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val got = df.select(col("id"), SquaredDistances(col("v"), cents).as("d"))
        .as[(Long, Array[Double])].collect().sortBy(_._1)
      got.zip(vecs).forall { case ((_, d), v) =>
        d.sameElements(chainDist(cents, v)) // EXACT equality, not approx
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(r.passed, r.status.toString)
  }

  test("float input widens per element like CAST(x AS DOUBLE)") {
    val cents = Array(Array(0.25, -0.5), Array(1.0, 2.0))
    val vf = Array(1.1f, -3.3f)
    val df = Seq((1L, vf)).toDF("id", "v")
    val got = df.select(SquaredDistances(col("v"), cents).as("d"))
      .as[Array[Double]].collect().head
    val expect = chainDist(cents, vf.map(_.toDouble))
    assert(got.sameElements(expect))
  }

  test("null input, null element, and short vector all yield null") {
    val cents = Array(Array(0.0, 0.0, 0.0))
    val rows = Seq(
      (1L, Option(Array[java.lang.Double](1.0, 2.0, 3.0))),
      (2L, None),
      (3L, Option(Array[java.lang.Double](1.0, null, 3.0))),
      (4L, Option(Array[java.lang.Double](1.0, 2.0))) // shorter than dim
    ).toDF("id", "v")
    val out = rows.select(col("id"), SquaredDistances(col("v"), cents).as("d"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
  }

  test("participates in whole-stage codegen (no fallback on wide matrices)") {
    // 16 centroids × 64 dims — the IVF shape that, unrolled, failed to
    // compile. The loop must keep the projection inside WholeStageCodegen.
    val cents = graft.ops.Similarity.ivfCentroids(16, 64)
    // spark.range, not a local Seq: ConvertToLocalRelation would fold the
    // whole projection into a LocalTableScan and there'd be no stage to
    // inspect.
    val df = spark.range(4)
      .withColumn("v", array((0 until 64).map(_ => col("id") * 0.1): _*))
      .select(col("id"), SquaredDistances(col("v"), cents).as("d"))
    val wscg = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wscg.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(df.collect().length == 4)
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", 1)).toDF("v", "i")
        .select(SquaredDistances(col("v"), cents)).collect()
    }
  }

  test("value equality over the centroid matrix: semanticEquals and CSE hold") {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // two structurally-equal but reference-distinct matrices — array
    // reference equality would make these expressions never equal,
    // defeating subexpression elimination and exchange reuse.
    def mat() = Array.tabulate(4, 8)((i, j) => i * 0.5 + j * 0.25)
    val v = AttributeReference("v", ArrayType(DoubleType))()
    val e1 = graft.functions.SquaredDistances(v, mat())
    val e2 = graft.functions.SquaredDistances(v, mat())
    assert(e1 == e2, "deep value equality over the matrix")
    assert(e1.hashCode() == e2.hashCode())
    assert(e1.semanticEquals(e2), "semanticEquals must see through the matrix")
    val other = graft.functions.SquaredDistances(
      v, Array.tabulate(4, 8)((i, j) => i * 0.5 + j * 0.25 + 1))
    assert(!(e1 == other), "different matrices must not compare equal")
  }
}
