package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Native fused multiset intersection: differential vs a reference
  * min-multiplicity count, null surface, and duplicate handling. */
class MultisetIntersectSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.MultisetIntersect

  private def refClip(a: Seq[Long], b: Seq[Long]): Long = {
    val ca = a.groupBy(identity).view.mapValues(_.size)
    val cb = b.groupBy(identity).view.mapValues(_.size)
    ca.map { case (k, n) => math.min(n, cb.getOrElse(k, 0)).toLong }.sum
  }

  test("native multiset_intersect equals min-multiplicity counting (property)") {
    // small value domain forces heavy duplication — the multiset part
    val msGen = Gen.listOfN(40, Gen.choose(0L, 8L)).map(_.sorted)
    val prop = Prop.forAll(Gen.listOfN(6, Gen.zip(msGen, msGen))) { ps =>
      val df = ps.zipWithIndex.map { case ((a, b), i) =>
        (i.toLong, a.toArray, b.toArray) }.toDF("id", "a", "b")
      val got = df.select(col("id"),
        MultisetIntersect(col("a"), col("b")).as("c"))
        .as[(Long, Long)].collect().toMap
      ps.zipWithIndex.forall { case ((a, b), i) =>
        got(i.toLong) == refClip(a, b)
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(r.passed, r.status.toString)
  }

  test("null yields null; empties clip to zero; full dup overlap counts multiplicity") {
    val df = Seq(
      (Some(Array(1L, 1L, 1L)), Some(Array(1L, 1L))),
      (None, Some(Array(1L))),
      (Some(Array.empty[Long]), Some(Array(1L, 2L))))
      .toDF("a", "b")
    val out = df.select(MultisetIntersect(col("a"), col("b")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq === Seq(Some(2L), None, Some(0L)))
  }

  test("null ELEMENTS never match (sort_array places them first; skipped)") {
    val got = spark.range(1).select(MultisetIntersect(
      sort_array(array(lit(null).cast("long"), lit(0L), lit(7L))),
      sort_array(array(lit(null).cast("long"), lit(null).cast("long"),
        lit(7L)))).as("c"))
      .collect().head.getLong(0)
    assert(got === 1L, "only the 7s match; nulls contribute nothing")
  }
}
