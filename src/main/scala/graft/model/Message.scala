package graft.model

import java.sql.Timestamp

/** Core message model of the engine.
  *
  * Mirrors the reference's unit of data — a keyed, event-timed, tagged,
  * opaque-payload message (numaflow `rust/numaflow-core/src/message.rs:99-128`)
  * — re-expressed as a Spark-encodable case class so a pipeline can be a
  * `Dataset[NumaMessage]` when the payload schema is dynamic. Pipelines with
  * concrete payload schemas should prefer plain `DataFrame`s and carry only
  * the columns they need; this type is the lowest common denominator.
  */
final case class MessageId(
    vertexName: String,
    offset: String,
    /** disambiguates flat-map fan-out siblings (message.rs:569-575). */
    index: Int) {
  /** Canonical string form used for dedup identity (js_writer.rs:167-171). */
  def canonical: String = s"$vertexName-$offset-$index"
}

final case class NumaMessage(
    keys: Seq[String],
    tags: Seq[String],
    value: Array[Byte],
    eventTime: Timestamp,
    headers: Map[String, String],
    id: MessageId,
    isLate: Boolean)

object Tags {
  /** Routing tag that silently drops a message (message.rs:93). */
  val Drop = "U+005C__DROP__"
  /** Routing tag requesting redelivery (message.rs:94). */
  val Nack = "U+005C__NACK__"
}
