package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators beyond the reference's surface (SURVEY §2.9).
  *
  * The reference has no joins/sort/limit/analytics (all record-level compute
  * is UDF-delegated); our engine exposes Spark's relational algebra as
  * first-class engine operators. This file holds the ops that need actual
  * composition rather than a single built-in call.
  */
object Relational {

  /** As-of join: for every left row, the most recent right row with
    * `right.ts <= left.ts` within the same partition keys.
    *
    * Implemented as union + partitioned running `last(_, ignoreNulls)`
    * rather than a per-key lookup join: one shuffle on the partition keys,
    * one sort — the same cost profile as a sort-merge join, so it scales to
    * arbitrarily large fact tables (no per-row subquery, no broadcast of
    * the right side). Ties (equal ts) resolve to the right row, matching
    * ASOF-join >= semantics.
    *
    * @param valueCol single right-side column to carry (null when no right
    *                 row precedes the left row).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, partitionCols: Seq[String],
               tsCol: String, valueCol: String, as: String): DataFrame = {
    val leftCols = left.columns
    // side=0 sorts right rows before left rows at equal ts (inclusive >=).
    val l = left.withColumn("__side", lit(1)).withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(partitionCols.map(col) :+ col(tsCol) :+ col(valueCol).as("__v"): _*)
      .withColumn("__side", lit(0))
    val unioned = l.select((partitionCols :+ tsCol).map(col) ++ Seq(col("__side"), col("__v")) ++
      leftCols.filterNot(c => partitionCols.contains(c) || c == tsCol).map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(as, last(col("__v"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) :+ col(as): _*)
  }

  /** Top-k by explicit ordering. `orderBy(...).limit(k)` plans as
    * TakeOrderedAndProject: each partition keeps k rows, only k*partitions
    * reach the driver — no global sort, safe at any scale. Callers must
    * pass a total order (tie-broken) for deterministic results. */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)
}
