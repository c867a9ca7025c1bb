package graft

import org.apache.spark.sql.functions._

/** Incremental view maintenance: maintained state must equal a
  * from-scratch recompute through inserts, deletes, group birth and
  * group death — and the base view must never shuffle (broadcast
  * anti/semi split). */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Materialize

  private val meas = Seq("s" -> col("v").cast("decimal(18,2)"))

  private def rows(ts: (Int, Int, String)*) =
    ts.toSeq.toDF("k", "v", "tag")

  test("applyDelta equals recompute: inserts, deletes, births, deaths") {
    val old = rows((1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (3, 7, "d"))
    // delta: insert into existing group 1, delete group 3 entirely
    // (death), insert brand-new group 4 (birth), delete one of group
    // 1's rows (survivor).
    val delta = Seq(
      (1, 30, "e", "I"), (3, 7, "d", "D"), (4, 100, "f", "I"), (1, 10, "a", "D")
    ).toDF("k", "v", "tag", "op")
    val base = Materialize.aggTable(old, Seq("k"), meas)
    val out = Materialize.applyDelta(base, delta, Seq("k"), "op", meas)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDecimal(2).doubleValue))
      .toSet
    // new state: group1 = {20,30}, group2 = {5}, group4 = {100}
    assert(out == Set((1, 2L, 50.0), (2, 1L, 5.0), (4, 1L, 100.0)))
  }

  test("untouched groups pass through bit-identical, no base shuffle") {
    val old = rows((1, 10, "a"), (2, 5, "c"))
    val delta = Seq((1, 1, "x", "I")).toDF("k", "v", "tag", "op")
    val base = Materialize.aggTable(old, Seq("k"), meas)
    val out = Materialize.applyDelta(base, delta, Seq("k"), "op", meas)
    val plan = out.queryExecution.executedPlan.toString
    // base participates only via broadcast anti/semi joins — the view
    // itself must not be exchanged on the key.
    assert(plan.contains("BroadcastHashJoin") &&
      (plan.contains("LeftAnti") || plan.contains("left_anti")))
    val vals = out.collect().map(r => (r.getInt(0), r.getLong(1), r.getDecimal(2).doubleValue)).toSet
    assert(vals == Set((1, 2L, 11.0), (2, 1L, 5.0)))
  }

  test("delta alone bootstraps an empty view") {
    val base = Materialize.aggTable(rows(), Seq("k"), meas)
    val delta = Seq((7, 3, "x", "I"), (7, 4, "y", "I")).toDF("k", "v", "tag", "op")
    val out = Materialize.applyDelta(base, delta, Seq("k"), "op", meas)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDecimal(2).doubleValue))
    assert(out.toSeq == Seq((7, 2L, 7.0)))
  }
}
