package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared exact-moment statistics kernels (the stat_* family's common
  * core, reused by the streaming twins so stream ≡ batch is equality of
  * one implementation, not of two transcriptions). */
object Stats {

  private val d38 = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Cents-exact value column (the engine-wide money convention). */
  def cents(valueCol: Column): Column =
    (valueCol.cast("decimal(18,2)") * 100).cast("long")

  /** Per-group exact moments (grp, ni, si, qi): BIGINT count/sum,
    * DECIMAL(38,0) sum of squares. `extraKeys` prepends additional
    * grouping expressions (e.g. a streaming event-time window), so the
    * streaming twin aggregates through THIS definition, not a copy. */
  def groupMoments(df: DataFrame, groupCol: String, valueCol: String,
                   extraKeys: Seq[Column] = Nil): DataFrame = {
    val x = cents(col(valueCol))
    df.groupBy(extraKeys :+ col(groupCol).as("grp"): _*)
      .agg(count(lit(1)).as("ni"), sum(x).as("si"),
        sum(x.cast(d38) * x.cast(d38)).as("qi"))
  }

  /** One-way ANOVA F from per-group moments, optionally per extra key
    * columns (e.g. a streaming window). All moments exact; the one
    * non-rational term A = Σᵢ Sᵢ²/nᵢ folds over the k-bounded group
    * array in sorted grp order, so every engine (and the streaming
    * twin) adds the same doubles in the same sequence. Output keeps
    * `keyCols` plus n, k, f (f null when ssw = 0 or the dfs are
    * degenerate). */
  def fFromGroupMoments(g: DataFrame, keyCols: Seq[String]): DataFrame = {
    val grouped =
      if (keyCols.isEmpty) g.groupBy()
      else g.groupBy(keyCols.map(col): _*)
    val t = grouped.agg(
      sum(col("ni")).as("n"), sum(col("si")).cast(d38).as("s"),
      sum(col("qi")).as("q"), count(lit(1)).as("k"),
      sort_array(collect_list(struct(col("grp"), col("si"), col("ni"))))
        .as("terms"))
    val aFold = aggregate(col("terms"), lit(0.0), (acc, e) =>
      acc + e.getField("si").cast("double") * e.getField("si").cast("double") /
        e.getField("ni").cast("double"))
    val sd = col("s").cast("double")
    t.withColumn("a", aFold)
      .withColumn("ssb", col("a") - sd * sd / col("n").cast("double"))
      .withColumn("ssw", col("q").cast("double") - col("a"))
      .withColumn("f",
        when(col("ssw") > 0 && col("k") > 1 && col("n") > col("k"),
          TimeSeries.portableRound4(
            col("ssb") * (col("n") - col("k")).cast("double") /
              (col("ssw") * (col("k") - 1).cast("double")))))
      .drop("terms", "a", "s", "q", "ssb", "ssw")
  }
}
