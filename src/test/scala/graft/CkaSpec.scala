package graft

/** Laws for emb_cka: a corpus already on the int8 grid round-trips
  * losslessly so CKA = 1 exactly; the real corpus stays in (0, 1]; and
  * the headline pairing with eval_rbo holds (geometry preserved even
  * though int8 shuffles fine-grained ranks). */
class CkaSpec extends SparkSpec {
  import spark.implicits._

  test("lossless quantization grid: CKA exactly 1") {
    // coordinates in {-1, +1}: per-dim min/max = (-1, 1), range 2,
    // codes {0, 255} -> dequantization reproduces X bit for bit
    var state = 20240816L
    def bit(): Float = {
      state = state * 6364136223846793005L + 1442695040888963407L
      if (((state >>> 33) & 1L) == 0L) -1.0f else 1.0f
    }
    val rows = (0 until 200).map(_ => Seq.fill(64)(bit()))
    val dir = java.nio.file.Files.createTempDirectory("cka").toString
    try {
      rows.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
        .toDF("vec_id", "embedding", "label")
        .write.parquet(s"$dir/embeddings.parquet")
      val r = SparkEntry.queries("emb_cka")(spark, dir).collect().head
      assert(r.getAs[Long]("n_vecs") === 200L)
      assert(r.getAs[Double]("cka_int8") === 1.0)
    } finally rmdirAll(new java.io.File(dir))
  }

  test("real corpus: geometry preserved (CKA ~ 1) while ranks shuffle") {
    val dir = sf()
    val cka = SparkEntry.queries("emb_cka")(spark, dir)
      .collect().head.getAs[Double]("cka_int8")
    assert(cka > 0.99 && cka <= 1.0, s"cka = $cka")
    // the pairing: the SAME quantization scores far below 1 on
    // rank-biased overlap — rank damage without geometry damage
    val rboMax = 1 - math.pow(0.9, 5)
    val avgRbo = SparkEntry.queries("eval_rbo")(spark, dir)
      .agg(org.apache.spark.sql.functions.avg("rbo")).head.getDouble(0)
    assert(avgRbo < 0.9 * rboMax,
      s"rbo $avgRbo should sit well below its ceiling $rboMax")
  }
}
