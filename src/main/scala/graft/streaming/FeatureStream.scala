package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, ValueState}
import org.apache.spark.sql.types._

/** ONLINE point-in-time feature snapshots — the streaming twin of the
  * batch `ev_feature_snapshot` query: every label event (purchase)
  * emits the user's feature vector AS OF the moment before it — running
  * per-type counts, cents-exact spend history, integer-micros recency —
  * computed at ingest with per-user state, exactly what a feature store
  * serves at inference time. Training sets built by the batch query and
  * features served by this stream therefore CANNOT skew: both are the
  * same strictly-before fold (spec proves stream ≡ batch replay).
  *
  * State per user is six longs + a flag — bounded by live users, not
  * event volume. Within a micro-batch, a user's rows apply in
  * (event-time, event_id) order (sorted in the processor), so
  * intra-batch arrival order never changes a snapshot; ACROSS batches
  * the fold applies arrival order, the serving reality — an event that
  * arrives after a later label was already served cannot retroactively
  * change the features that label saw. Batch-vs-stream agreement under
  * in-order feeds is the spec'd contract; the divergence under
  * out-of-order feeds IS the train/serve-skew signal this operator
  * exists to eliminate at the source. */
object FeatureStream {

  private val outSchema = StructType(Seq(
    StructField("label_id", LongType),
    StructField("user_id", LongType),
    StructField("n_before", LongType),
    StructField("clicks_before", LongType),
    StructField("views_before", LongType),
    StructField("errors_before", LongType),
    StructField("spend_before_cents", LongType),
    StructField("micros_since_prev", LongType, nullable = true)))

  /** (n, clicks, views, errors, spendCents, lastTsUs, hasPrev). */
  private type St = (Long, Long, Long, Long, Long, Long, Boolean)

  private final class Proc extends StatefulProcessor[Long, Row, Row] {
    @transient private var st: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[St]("feat",
        Encoders.product[(Long, Long, Long, Long, Long, Long, Boolean)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Row],
                                 timers: TimerValues): Iterator[Row] = {
      var s: St = if (st.exists()) st.get() else (0L, 0L, 0L, 0L, 0L, 0L, false)
      val out = Vector.newBuilder[Row]
      // intra-batch determinism: a user's rows apply in event order
      val sorted = rows.toVector.sortBy(r => (r.getLong(1), r.getLong(0)))
      sorted.foreach { r =>
        val (id, tsUs, typ, cents) =
          (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))
        if (typ == "purchase")
          out += Row(id, user, s._1, s._2, s._3, s._4, s._5,
            if (s._7) java.lang.Long.valueOf(tsUs - s._6) else null)
        s = (s._1 + 1,
          s._2 + (if (typ == "click") 1L else 0L),
          s._3 + (if (typ == "view") 1L else 0L),
          s._4 + (if (typ == "error") 1L else 0L),
          s._5 + (if (typ == "purchase") cents else 0L),
          tsUs, true)
      }
      st.update(s)
      out.result().iterator
    }
  }

  /** @param events streaming DataFrame with event_id, ts, user_id,
    *               event_type, value — the events-table shape. */
  def snapshots(events: DataFrame): DataFrame = {
    implicit val enc = Encoders.row(outSchema)
    events
      .select(col("event_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_type"),
        coalesce((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(0L)).as("cents"),
        col("user_id").cast("long"))
      .groupByKey(_.getLong(4))(Encoders.scalaLong)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Append())
  }
}
