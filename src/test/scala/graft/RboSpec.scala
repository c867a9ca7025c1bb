package graft

import org.apache.spark.sql.functions._
import graft.queries.TrainingQueries

/** Laws for eval_rbo's injected tail-sum table and the max-rank
  * identity: the table telescopes so identical rankings score exactly
  * the truncated-RBO ceiling 1 − p^k, the weights are top-heavy, and
  * the lookup identity reproduces the textbook per-depth sum on a
  * hand-built pair of rankings. */
class RboSpec extends SparkSpec {
  import spark.implicits._

  private val v = TrainingQueries.rboVNanos
  private val p = 0.9

  test("tail sums telescope: identical rankings hit 1 - p^5 exactly") {
    // Σ_d V_d = Σ_e e·W_e = (1−p)·Σ p^{e−1} = 1 − p^5
    val sum = v.sum / 1e9
    assert(math.abs(sum - (1 - math.pow(p, 5))) < 1e-8, s"sum = $sum")
    // monotone decreasing, positive: deeper-only overlap is worth less
    v.sliding(2).foreach { case Seq(a, b) => assert(a > b && b > 0) }
  }

  test("max-rank lookup equals the textbook per-depth overlap sum") {
    // rankings over ids: A = [x1 x2 x3 x4 x5], B = [x2 x1 x9 x3 x8]
    // common ids with (ra, rb): x1(1,2) x2(2,1) x3(3,4)
    val pairs = Seq((1, 2), (2, 1), (3, 4))
    val viaTable = pairs.map { case (ra, rb) => v(math.max(ra, rb) - 1) }
      .sum / 1e9
    // textbook: o_d = |A_{1..d} ∩ B_{1..d}|; rbo = Σ (1−p)p^{d−1} o_d/d
    val oByDepth = (1 to 5).map(d =>
      pairs.count { case (ra, rb) => ra <= d && rb <= d })
    val textbook = (1 to 5).map(d =>
      (1 - p) * math.pow(p, d - 1) * oByDepth(d - 1) / d).sum
    assert(math.abs(viaTable - textbook) < 1e-8,
      s"table $viaTable vs textbook $textbook")
  }

  test("disjoint rankings score 0; query universe survives (left join)") {
    val dir = sf()
    val rows = SparkEntry.queries("eval_rbo")(spark, dir).collect()
    assert(rows.length === 10, "one row per query vector, always")
    rows.foreach { r =>
      val rbo = r.getAs[Double]("rbo")
      assert(rbo >= 0.0 && rbo <= 1 - math.pow(p, 5) + 1e-9)
      if (r.getAs[Long]("n_common") == 0) assert(rbo === 0.0)
    }
  }
}
