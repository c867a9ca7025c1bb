package graft

import graft.ops.Relational

/** Laws for the banded interval-overlap join: differential equality
  * against a brute-force O(n²) reference, exactly-once pair emission
  * across multi-bucket overlaps, and the open-interval boundary rule. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  private def run(iv: Seq[(Long, java.sql.Timestamp, java.sql.Timestamp)]) =
    Relational.intervalOverlapPairs(iv.toDF("k", "s", "e"), "k", "s", "e")
      .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().toSeq.sorted

  private def ref(iv: Seq[(Long, java.sql.Timestamp, java.sql.Timestamp)]) =
    (for {
      (k1, s1, e1) <- iv
      (k2, s2, e2) <- iv
      if k1 < k2 && s1.before(e2) && s2.before(e1)
    } yield (k1, k2,
      if (s1.after(s2)) s1 else s2,
      if (e1.before(e2)) e1 else e2)).sorted

  test("banded pairs equal the brute-force interval join") {
    val iv = Seq(
      (1L, t("2024-01-01 10:05:00"), t("2024-01-01 10:20:00")),
      (2L, t("2024-01-01 10:15:00"), t("2024-01-01 10:40:00")),
      (3L, t("2024-01-01 10:30:00"), t("2024-01-01 12:10:00")),
      (4L, t("2024-01-01 11:00:00"), t("2024-01-01 11:01:00")),
      (5L, t("2024-01-02 09:00:00"), t("2024-01-02 09:30:00")))
    val got = run(iv)
    assert(got === ref(iv))
    assert(got.size === 3) // (1,2) (2,3) (3,4); day-2's 5 pairs with nothing
  }

  test("a pair spanning many shared hour buckets emits exactly once") {
    val iv = Seq(
      (1L, t("2024-01-01 08:10:00"), t("2024-01-01 14:50:00")),
      (2L, t("2024-01-01 09:30:00"), t("2024-01-01 13:20:00")))
    val got = run(iv)
    assert(got === Seq((1L, 2L,
      t("2024-01-01 09:30:00"), t("2024-01-01 13:20:00"))))
  }

  test("touching intervals (end == start) do not pair; same key never pairs") {
    val iv = Seq(
      (1L, t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00")),
      (2L, t("2024-01-01 11:00:00"), t("2024-01-01 12:00:00")),
      (1L, t("2024-01-01 10:30:00"), t("2024-01-01 10:45:00")))
    assert(run(iv).isEmpty)
  }
}
