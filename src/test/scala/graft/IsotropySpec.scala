package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Laws for Similarity.isotropy (emb_isotropy): a corpus whose variance
  * lives in one dimension collapses PR to ~1, equal per-dim variance
  * recovers PR = D exactly, and constant embeddings hit the null
  * guard. */
class IsotropySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: Seq[Seq[Float]]) = rows.toDF("embedding")

  test("equal variance across D dims: PR = D exactly") {
    // 4 dims; vectors alternate +1/-1 independently per dim via sign
    // patterns -> identical variance mass per dim
    val rows = (0 until 64).map { i =>
      Seq.tabulate(4)(d => if (((i >> d) & 1) == 0) 1.0f else -1.0f)
    }
    val r = Similarity.isotropy(vecs(rows), "embedding").collect().head
    assert(r.getAs[Long]("d") === 4L)
    assert(r.getAs[Double]("participation_ratio") === 4.0)
    assert(r.getAs[Double]("eff_dim_frac") === 1.0)
    assert(r.getAs[Double]("top_dim_share") === 0.25)
  }

  test("one rogue dimension: PR collapses toward 1") {
    // dim 0 swings ±10, the other 7 dims ±0.01
    val rows = (0 until 100).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      (10.0f * s) +: Seq.tabulate(7)(_ => 0.01f * s)
    }
    val r = Similarity.isotropy(vecs(rows), "embedding").collect().head
    assert(r.getAs[Double]("participation_ratio") < 1.1,
      s"PR = ${r.getAs[Double]("participation_ratio")}")
    assert(r.getAs[Double]("top_dim_share") > 0.99)
  }

  test("constant embeddings: zero variance mass, null scores") {
    val rows = (0 until 50).map(_ => Seq(0.5f, 0.5f, 0.5f))
    val r = Similarity.isotropy(vecs(rows), "embedding").collect().head
    assert(r.isNullAt(r.fieldIndex("participation_ratio")))
    assert(r.isNullAt(r.fieldIndex("top_dim_share")))
  }
}
