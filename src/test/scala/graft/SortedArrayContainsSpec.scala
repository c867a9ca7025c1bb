package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.SortedArrayContains

/** The binary search must agree with array_contains on every sorted
  * array — including null elements (sorted first, never matching) and
  * empty arrays — in both eval paths. */
class SortedArrayContainsSpec extends SparkSpec {
  import spark.implicits._

  test("agrees with array_contains over sorted arrays; nulls skipped") {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val rows = (0 until 200).map { i =>
      val arr = words.filter(_.hashCode % (i % 7 + 2) != 0).sorted
      val probe = words(i % words.length) + (if (i % 3 == 0) "" else "_miss")
      (i.toLong, arr, probe)
    }
    val df = rows.toDF("id", "arr", "probe")
      .withColumn("arr", array_sort(col("arr")))
    val got = df.select(col("id"),
        SortedArrayContains(col("arr"), col("probe")).as("bs"),
        array_contains(col("arr"), col("probe")).as("lin"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getBoolean(1) === r.getBoolean(2), r.toString))
  }

  test("empty array; null runs at either end (sort_array vs array_sort)") {
    val df = Seq(
      (1L, Seq.empty[Option[String]], "x"),
      (2L, Seq[Option[String]](None, None, Some("a"), Some("b")), "a"),
      (3L, Seq[Option[String]](None, Some("a"), Some("b")), "zz"),
      (4L, Seq[Option[String]](Some("a"), Some("b"), None, None), "b"),
      (5L, Seq[Option[String]](Some("a"), Some("b"), None), "zz"),
      (6L, Seq[Option[String]](None, None), "a")
    ).toDF("id", "arr", "probe")
    val got = df.select(col("id"),
        SortedArrayContains(col("arr"), col("probe")).as("bs"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> false,
      4L -> true, 5L -> false, 6L -> false))
    // genuine array_sort output over null-bearing input: nulls LAST
    val sorted = Seq((7L, Seq[Option[String]](Some("b"), None, Some("a")), "b"),
      (8L, Seq[Option[String]](Some("b"), None, Some("a")), "zz"))
      .toDF("id", "arr", "probe")
      .select(col("id"),
        SortedArrayContains(array_sort(col("arr")), col("probe")).as("bs"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(sorted === Map(7L -> true, 8L -> false))
  }

  test("property: equals reference membership over random sorted arrays") {
    val wordGen = Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
    val caseGen = for {
      n <- Gen.choose(0, 25)
      arr <- Gen.listOfN(n, wordGen)
      probe <- Gen.oneOf(wordGen,
        if (arr.nonEmpty) Gen.oneOf(arr) else wordGen)
    } yield (arr.sorted, probe)
    val prop = Prop.forAll(Gen.listOfN(12, caseGen)) { cases =>
      val df = cases.zipWithIndex.map { case ((arr, p), i) =>
        (i.toLong, arr, p) }.toDF("id", "arr", "probe")
      val got = df.select(col("id"),
          SortedArrayContains(col("arr"), col("probe")).as("bs"))
        .as[(Long, Boolean)].collect().toMap
      cases.zipWithIndex.forall { case ((arr, p), i) =>
        got(i.toLong) == arr.contains(p)
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(r.passed, r.status.toString)
  }
}
