package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.SnapshotCdc

case class Cdc(id: Long, seq: Long, op: String, text: String)

/** CDC snapshot maintenance: last-write-wins merge, delete tombstones,
  * partial (touched-bucket-only) rewrites, empty-bucket clearing, and
  * batchId-replay idempotence. */
class SnapshotCdcSpec extends SparkSpec {
  import spark.implicits._

  private val N = 8

  private def readMap(dir: String): Map[Long, (Long, String)] =
    SnapshotCdc.read(spark, dir)
      .map(_.select("id", "seq", "text").as[(Long, Long, String)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap)
      .getOrElse(Map.empty)

  test("merge semantics: upsert, within-batch LWW, delete, batch-beats-stored tie") {
    val dir = Files.createTempDirectory("cdcsnap").toString + "/snap"
    val b1 = Seq(
      Cdc(1L, 10L, "U", "one"), Cdc(2L, 10L, "U", "two"),
      Cdc(3L, 10L, "U", "three"),
      Cdc(4L, 10L, "U", "four-old"), Cdc(4L, 11L, "U", "four-new") // in-batch LWW
    ).toDF()
    SnapshotCdc.applyBatch(dir, b1, "id", "op", "seq", N)
    assert(readMap(dir) === Map(
      1L -> ((10L, "one")), 2L -> ((10L, "two")),
      3L -> ((10L, "three")), 4L -> ((11L, "four-new"))))

    val b2 = Seq(
      Cdc(2L, 20L, "U", "two-v2"),   // update
      Cdc(3L, 20L, "D", ""),         // delete
      Cdc(5L, 20L, "U", "five"),     // insert
      Cdc(1L, 10L, "U", "one-tie")   // same seq as stored: batch wins
    ).toDF()
    SnapshotCdc.applyBatch(dir, b2, "id", "op", "seq", N)
    assert(readMap(dir) === Map(
      1L -> ((10L, "one-tie")), 2L -> ((20L, "two-v2")),
      4L -> ((11L, "four-new")), 5L -> ((20L, "five"))))
  }

  test("only touched buckets rewrite; a fully-tombstoned bucket is cleared") {
    val dir = Files.createTempDirectory("cdcsnap2").toString + "/snap"
    val rows = (1L to 64L).map(i => Cdc(i, 1L, "U", s"v$i"))
    SnapshotCdc.applyBatch(dir, rows.toDF(), "id", "op", "seq", N)
    val bucketDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(f => f.getName -> f.lastModified).toMap
    assert(bucketDirs.size === N) // 64 ids over 8 buckets: all populated

    // touch exactly the ids of ONE bucket: update one, tombstone the rest
    val buckets = (1L to 64L).toDF("id")
      .select(col("id"), SnapshotCdc.bucketOf(col("id"), N).as("b"))
      .as[(Long, Long)].collect().toMap
    val b = buckets(1L)
    val sameBucket = (1L to 64L).filter(buckets(_) == b)
    val batch = Cdc(sameBucket.head, 2L, "U", "kept") +:
      sameBucket.tail.map(i => Cdc(i, 2L, "D", ""))
    Thread.sleep(1100) // ensure mtime granularity can't mask a rewrite
    SnapshotCdc.applyBatch(dir, batch.toDF(), "id", "op", "seq", N)

    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(f => f.getName -> f.lastModified).toMap
    assert(after.contains(s"bucket=$b"))
    // untouched buckets: directories not rewritten
    (bucketDirs.keySet - s"bucket=$b").foreach { d =>
      assert(after(d) === bucketDirs(d), s"$d was rewritten")
    }
    val kept = readMap(dir)
    assert(kept(sameBucket.head) === ((2L, "kept")))
    sameBucket.tail.foreach(i => assert(!kept.contains(i)))

    // now tombstone the LAST survivor of that bucket: directory vanishes
    SnapshotCdc.applyBatch(dir,
      Seq(Cdc(sameBucket.head, 3L, "D", "")).toDF(), "id", "op", "seq", N)
    assert(!new java.io.File(s"$dir/bucket=$b").exists())
    assert(readMap(dir).size === 64 - sameBucket.size)
  }

  test("crash-replay convergence: re-applying an absorbed batch changes nothing") {
    // a crash BETWEEN the parquet write and the marker write replays the
    // batch into applyBatch itself (the marker no longer guards it): the
    // LWW merge of already-applied rows must converge to the same
    // snapshot — batch-beats-stored ties re-pick identical values, and
    // tombstoned ids stay gone (their rows are absent, not resurrected).
    val dir = Files.createTempDirectory("cdcsnap5").toString + "/snap"
    val b1 = Seq(Cdc(1L, 1L, "U", "a"), Cdc(2L, 1L, "U", "b")).toDF()
    SnapshotCdc.applyBatch(dir, b1, "id", "op", "seq", N)
    val b2 = Seq(Cdc(1L, 2L, "U", "a2"), Cdc(2L, 2L, "D", "")).toDF()
    SnapshotCdc.applyBatch(dir, b2, "id", "op", "seq", N)
    val once = readMap(dir)
    SnapshotCdc.applyBatch(dir, b2, "id", "op", "seq", N) // the replay
    assert(readMap(dir) === once)
    assert(once === Map(1L -> ((2L, "a2"))))
  }

  test("snapshotDiff over two snapshot versions recovers the CDC classes") {
    val dir = Files.createTempDirectory("cdcsnap4").toString + "/snap"
    SnapshotCdc.applyBatch(dir, Seq(
      Cdc(1L, 1L, "U", "a"), Cdc(2L, 1L, "U", "b"), Cdc(3L, 1L, "U", "c")
    ).toDF(), "id", "op", "seq", N)
    // materialize v1 before the second apply rewrites its files
    val v1 = SnapshotCdc.read(spark, dir).get
      .select("id", "text").as[(Long, String)].collect().toSeq.toDF("id", "text")
    SnapshotCdc.applyBatch(dir, Seq(
      Cdc(2L, 2L, "U", "b2"), Cdc(3L, 2L, "D", ""), Cdc(4L, 2L, "U", "d")
    ).toDF(), "id", "op", "seq", N)
    val v2 = SnapshotCdc.read(spark, dir).get.select("id", "text")
    val diff = graft.ops.CorpusOps.snapshotDiff(v1, v2, "id", Seq("text"))
      .where(col("change") =!= "unchanged")
      .as[(Long, String)].collect().toMap
    // the diff of consecutive snapshots IS the applied change batch
    assert(diff === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("foreachBatch sink: exactly-once under batch replay, e2e stream") {
    val dir = Files.createTempDirectory("cdcsnap3").toString + "/snap"
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Cdc]
    val q = in.toDF().writeStream
      .foreachBatch(SnapshotCdc.sink(dir, "id", "op", "seq", N))
      .start()
    try {
      in.addData(Cdc(1L, 1L, "U", "a"), Cdc(2L, 1L, "U", "b"))
      q.processAllAvailable()
      in.addData(Cdc(1L, 2L, "U", "a2"), Cdc(2L, 2L, "D", ""))
      q.processAllAvailable()
      assert(readMap(dir) === Map(1L -> ((2L, "a2"))))
    } finally q.stop()
    // replaying an absorbed batch (same batchId) is a no-op
    val replay = Seq(Cdc(1L, 99L, "U", "stale-replay")).toDF()
    SnapshotCdc.sink(dir, "id", "op", "seq", N)(replay, 0L)
    assert(readMap(dir) === Map(1L -> ((2L, "a2"))))
    // a NEW batch id applies
    SnapshotCdc.sink(dir, "id", "op", "seq", N)(replay, 7L)
    assert(readMap(dir) === Map(1L -> ((99L, "stale-replay"))))
  }
}
