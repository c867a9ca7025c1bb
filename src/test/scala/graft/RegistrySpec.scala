package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural guards on the query registry itself.
  *
  * `Queries.all`/`Queries.oracles` merge the per-domain packs with
  * `.toMap`, which resolves a cross-pack name collision SILENTLY (the
  * last pack wins and the shadowed query simply vanishes from the
  * driver's correctness gate). These asserts make that failure loud:
  * the sum of per-pack key counts must equal the merged map size, and
  * on mismatch the failing message names every colliding key and the
  * packs that declare it.
  */
class RegistrySpec extends AnyFunSuite {

  private def duplicates(keyed: Seq[(String, Seq[String])]): Map[String, Seq[String]] =
    keyed.flatMap { case (pack, ks) => ks.map(_ -> pack) }
      .groupBy(_._1).collect { case (k, owners) if owners.size > 1 =>
        k -> owners.map(_._2)
      }.toMap

  test("no query name collides across packs") {
    val perPack = Queries.packKeys.map { case (n, qs, _) => (n, qs) }
    val dups = duplicates(perPack)
    assert(dups.isEmpty,
      s"duplicate query keys across packs: ${dups.map { case (k, ps) =>
        s"$k (in ${ps.mkString(", ")})" }.mkString("; ")}")
    assert(perPack.map(_._2.size).sum === Queries.all.size)
  }

  test("no oracle name collides across packs") {
    val perPack = Queries.packKeys.map { case (n, _, os) => (n, os) }
    val dups = duplicates(perPack)
    assert(dups.isEmpty,
      s"duplicate oracle keys across packs: ${dups.map { case (k, ps) =>
        s"$k (in ${ps.mkString(", ")})" }.mkString("; ")}")
    assert(perPack.map(_._2.size).sum === Queries.oracles.size)
  }

  test("within each pack, queries and oracles declare the same key set") {
    // An oracle without a query never runs; a query without an oracle is
    // allowed (rows-only check) but an oracle key must match a query key.
    Queries.packKeys.foreach { case (pack, qs, os) =>
      val orphans = os.toSet -- qs.toSet
      assert(orphans.isEmpty,
        s"$pack declares oracles with no matching query: ${orphans.toSeq.sorted.mkString(", ")}")
    }
  }

  test("every registered oracle key resolves to a query in the merged map") {
    val orphans = Queries.oracles.keySet -- Queries.all.keySet
    assert(orphans.isEmpty, s"orphan oracles: ${orphans.toSeq.sorted.mkString(", ")}")
  }
}
