package graft

/** The no-label-leakage law of ev_feature_snapshot, proven
  * differentially: a sequential driver-side replay walks each user's
  * events in (ts, event_id) order carrying running feature state, and
  * every label row's features must equal the state BEFORE that row was
  * applied — by construction nothing at or after the label can have
  * contributed. The Spark window frame (UNBOUNDED PRECEDING .. 1
  * PRECEDING) must reproduce this exactly, including the cents-exact
  * spend history and the integer-micros recency. */
class FeatureSnapshotSpec extends SparkSpec {

  private case class State(n: Long = 0, clicks: Long = 0, views: Long = 0,
                           errors: Long = 0, spendCents: Long = 0,
                           lastTsUs: Option[Long] = None)

  test("spark features equal the sequential per-user replay on the real table") {
    val dir = sf("sf0.001")
    val rows = graft.ops.Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as ts_us",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))

    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
      var st = State()
      evs.toSeq.sortBy(e => (e._4, e._1)).flatMap { case (id, _, typ, tsUs, cents) =>
        val snap = if (typ == "purchase")
          Some(id -> (st.n, st.clicks, st.views, st.errors, st.spendCents,
            st.lastTsUs.map(tsUs - _)))
        else None
        st = State(st.n + 1,
          st.clicks + (if (typ == "click") 1 else 0),
          st.views + (if (typ == "view") 1 else 0),
          st.errors + (if (typ == "error") 1 else 0),
          st.spendCents + (if (typ == "purchase") cents else 0),
          Some(tsUs))
        snap
      }
    }.toMap

    val got = SparkEntry.queries("ev_feature_snapshot")(spark, dir)
      .collect().map { r =>
        r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6),
          if (r.isNullAt(7)) None else Some(r.getLong(7)))
      }.toMap

    assert(got.keySet == expected.keySet, "one snapshot row per label event")
    for ((id, exp) <- expected)
      assert(got(id) == exp, s"label $id: got ${got(id)}, replay says $exp")
    // leakage canary: every purchase's own spend must be absent from its
    // own feature (spend_before strictly precedes the label)
    val ownSpend = rows.filter(_._3 == "purchase").map(e => e._1 -> e._5).toMap
    val violations = got.count { case (id, g) =>
      expected(id)._5 + ownSpend(id) != g._5 + ownSpend(id) }
    assert(violations == 0)
  }
}
