package graft

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._
import graft.streaming.{CycleStream, UdSource}

/** TRUE unbounded cycles (SURVEY R4): a cycle-to-self vertex whose
  * messages loop a DATA-DEPENDENT number of times — no iteration bound
  * anywhere in the engine — mirroring numaflow TestCycleToSelf
  * (`test/diamond-e2e/diamond_test.go:110`): each message re-enters the
  * same vertex until its own state says stop. */
class CycleStreamSpec extends SparkSpec {

  private def t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  test("messages loop around the cycle edge exactly their own n times") {
    val name = "cycle_self_spec"
    val src = UdSource.register(name, new UdSource.MemoryGraftSource())
    // message i must traverse the cycle edge i times before leaving;
    // 25 exceeds the old boundedLoop spec depths — nothing here caps it.
    val ns = Seq(0, 1, 3, 7, 25)
    ns.zipWithIndex.foreach { case (n, i) =>
      src.append(Seq(s"m$i"), Array[Byte](), t0,
        headers = Map("n" -> n.toString, "loops" -> "0"))
    }

    val done = new ConcurrentLinkedQueue[(String, Int, Int)]()
    val ckpt = java.nio.file.Files.createTempDirectory("cycle_spec").toString
    val q = CycleStream.cycleToSelf(spark, name,
      body = df => df.select(
        col("keys"), col("value"), col("eventTime"),
        map(
          lit("n"), (element_at(col("headers"), "n").cast("int") - 1).cast("string"),
          lit("loops"), (element_at(col("headers"), "loops").cast("int") + 1).cast("string")
        ).as("headers"),
        (element_at(col("headers"), "n").cast("int") > 0).as(CycleStream.CycleCol)),
      onDone = out => out.select(col("keys").getItem(0),
          element_at(col("headers"), "n").cast("int"),
          element_at(col("headers"), "loops").cast("int"))
        .collect().foreach(r => done.add((r.getString(0), r.getInt(1), r.getInt(2)))),
      checkpoint = ckpt)
    try {
      CycleStream.drain(q, name)
      import scala.jdk.CollectionConverters._
      val byKey = done.asScala.toSeq.groupBy(_._1)
      // every message leaves the cycle exactly once...
      assert(byKey.keySet === ns.indices.map(i => s"m$i").toSet)
      assert(byKey.values.forall(_.size == 1))
      // ...having looped exactly its own n times (the body increments
      // `loops` on every traversal, including the final non-cycling one)
      ns.zipWithIndex.foreach { case (n, i) =>
        val (_, _, loops) = byKey(s"m$i").head
        assert(loops == n + 1, s"m$i looped $loops, expected ${n + 1}")
      }
      // the buffer saw exactly initial + Σnᵢ feedback appends: each loop
      // traversal wrote the message back exactly once
      assert(src.latestOffset(0) == ns.length + ns.sum)
    } finally {
      q.stop(); UdSource.unregister(name)
      rmdirAll(new java.io.File(ckpt))
    }
  }

  test("NULL __cycle coalesces to forward-downstream — rows never vanish") {
    val name = "cycle_null_spec"
    val src = UdSource.register(name, new UdSource.MemoryGraftSource())
    (1 to 3).foreach(i => src.append(Seq(s"u$i"), Array[Byte](), t0,
      headers = Map.empty))
    val seen = new ConcurrentLinkedQueue[String]()
    val ckpt = java.nio.file.Files.createTempDirectory("cycle_null").toString
    // the body "forgets" to tag u2: its __cycle is NULL. Before the
    // coalesce both edge filters (c, !c) dropped it — it left NEITHER
    // around the cycle NOR downstream.
    val q = CycleStream.cycleToSelf(spark, name,
      body = df => df.select(col("keys"), col("value"), col("eventTime"),
        col("headers"),
        when(col("keys").getItem(0) =!= "u2", lit(false))
          .as(CycleStream.CycleCol)),
      onDone = out => out.select(col("keys").getItem(0)).collect()
        .foreach(r => seen.add(r.getString(0))),
      checkpoint = ckpt)
    try {
      CycleStream.drain(q, name)
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.toSet === Set("u1", "u2", "u3"))
      assert(src.latestOffset(0) == 3L) // no feedback appends either
    } finally {
      q.stop(); UdSource.unregister(name)
      rmdirAll(new java.io.File(ckpt))
    }
  }

  test("a zero-loop workload never touches the cycle edge") {
    val name = "cycle_noop_spec"
    val src = UdSource.register(name, new UdSource.MemoryGraftSource())
    (1 to 4).foreach(i => src.append(Seq(s"k$i"), Array[Byte](), t0,
      headers = Map("n" -> "0")))
    val seen = new ConcurrentLinkedQueue[String]()
    val ckpt = java.nio.file.Files.createTempDirectory("cycle_noop").toString
    val q = CycleStream.cycleToSelf(spark, name,
      body = df => df.select(col("keys"), col("value"), col("eventTime"),
        col("headers"), lit(false).as(CycleStream.CycleCol)),
      onDone = out => out.select(col("keys").getItem(0)).collect()
        .foreach(r => seen.add(r.getString(0))),
      checkpoint = ckpt)
    try {
      CycleStream.drain(q, name)
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.toSet === (1 to 4).map(i => s"k$i").toSet)
      // latestOffset == 4: no feedback rows were ever appended
      assert(src.latestOffset(0) == 4L)
    } finally {
      q.stop(); UdSource.unregister(name)
      rmdirAll(new java.io.File(ckpt))
    }
  }
}
