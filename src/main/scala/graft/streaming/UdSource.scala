package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** User-defined source SPI (SURVEY S9/S10) — the engine's analog of the
  * reference's UD-source gRPC contract `read / ack / pending / partitions`
  * (numaflow `rust/numaflow-core/src/source/user_defined.rs`; proto
  * `pkg/apis/proto/source/v1/source.proto`).
  *
  * A `GraftSource` plugs into Structured Streaming as a genuine
  * DataSourceV2 micro-batch source: per-partition offset ranges become
  * Spark offsets (checkpointed — the WAL/replay semantics the reference
  * implements by hand come from the engine), `read` runs inside partition
  * readers (parallel across source partitions), and `ack` fires on
  * micro-batch commit — at-least-once, upgraded to effectively-once by the
  * checkpoint exactly like the reference's dedup'd ISB writes.
  *
  * Connector implementations (HTTP, NATS, Pulsar, SQS, …) are then thin
  * adapters: buffer inbound messages, serve them by offset, release them
  * on ack. See [[HttpSource]] for a complete one.
  */
object UdSource {

  /** One message as served by a source: the (partition, offset) pair is
    * the ack/dedup identity (message.rs offset semantics). */
  final case class SourceRecord(
      offset: Long,
      partition: Int,
      keys: Seq[String],
      value: Array[Byte],
      eventTime: Timestamp,
      headers: Map[String, String] = Map.empty)

  /** The SPI: exactly the reference's 4-method contract.
    * All methods are driver-side except `read`, which executes inside the
    * partition reader (same JVM under local[*]; on a real cluster the
    * source is re-resolved per executor via the registry `class=` option). */
  trait GraftSource {
    /** Partition ids this source serves (source.proto partitions()). */
    def partitions: Seq[Int]
    /** Exclusive end of available data for a partition. */
    def latestOffset(partition: Int): Long
    /** Records with `from <= offset < until` for one partition. */
    def read(partition: Int, from: Long, until: Long): Iterator[SourceRecord]
    /** All offsets `< upTo` are processed; the source may release them. */
    def ack(partition: Int, upTo: Long): Unit
    /** Backlog count — feeds lag metrics / autoscaling (S10, LagReader). */
    def pending: Long
    /** Buffer capacity (daemon BufferInfo.bufferLength); MaxValue when
      * unbounded. Serves the /buffers usage + isFull fields. */
    def capacity: Long = Long.MaxValue
  }

  /** Row schema every GraftSource produces (the NumaMessage column set). */
  val schema: StructType = StructType(Seq(
    StructField("keys", ArrayType(StringType)),
    StructField("value", BinaryType),
    StructField("eventTime", TimestampType),
    StructField("headers", MapType(StringType, StringType)),
    StructField("partition", IntegerType),
    StructField("offset", LongType)))

  /** Open a streaming DataFrame over a registered source; `limiter`
    * optionally names a registered [[RateLimit.RampUpLimiter]] (X5). */
  def readStream(spark: SparkSession, sourceName: String,
                 limiter: Option[String] = None): DataFrame = {
    val r = spark.readStream.format(classOf[UdSourceProvider].getName)
      .option("source", sourceName)
    limiter.foreach(r.option("limiter", _))
    r.load()
  }

  // -------- registry ------------------------------------------------------

  /** Name → live source instance. DSv2 instantiates providers reflectively,
    * so stream and test rendezvous through this registry; a cluster deploy
    * instead passes `class=<fqcn>` and each executor constructs its own
    * connector instance (the reference's sidecar-per-pod model). */
  private val registry = new ConcurrentHashMap[String, GraftSource]()

  def register[S <: GraftSource](name: String, src: S): S = {
    registry.put(name, src); src
  }
  def unregister(name: String): Unit = registry.remove(name)
  def get(name: String): GraftSource = {
    val s = registry.get(name)
    require(s != null, s"no GraftSource registered under '$name'")
    s
  }

  // -------- memory implementation (MemoryStream analog) -------------------

  /** Buffer-full policy (SURVEY R5): per-edge `onFull` — numaflow
    * `edge_types.go:27-33,127-133`, WriteOutcome::Dropped in writer.rs,
    * e2e functional_test.go:177 TestDropOnFull. */
  sealed trait OnFull
  /** Reject the append (caller backs off and retries — backpressure). */
  case object RetryUntilSuccess extends OnFull
  /** Load-shed: silently drop the newest message, count it. */
  case object DiscardLatest extends OnFull
  final class BufferFullException(p: Int)
    extends RuntimeException(s"buffer partition $p full")

  /** In-memory GraftSource for tests and loopback pipelines: append
    * records, read them by offset, track acks. `maxLength` bounds UNACKED
    * messages per partition (the ISB buffer bound, default 30k msgs —
    * const.go:183), with [[OnFull]] semantics on overflow. */
  final class MemoryGraftSource(numPartitions: Int = 1,
      maxLength: Int = Int.MaxValue, onFull: OnFull = RetryUntilSuccess)
      extends GraftSource {
    private val bufs = Array.fill(numPartitions)(ArrayBuffer.empty[SourceRecord])
    private val acked = Array.fill(numPartitions)(0L)
    @volatile private var dropped = 0L

    def append(keys: Seq[String], value: Array[Byte], eventTime: Timestamp,
               partition: Int = 0, headers: Map[String, String] = Map.empty): Unit =
      synchronized {
        val buf = bufs(partition)
        if (buf.length - acked(partition) >= maxLength) onFull match {
          case DiscardLatest      => dropped += 1
          case RetryUntilSuccess  => throw new BufferFullException(partition)
        } else {
          buf += SourceRecord(buf.length.toLong, partition, keys, value, eventTime, headers)
        }
      }

    /** Messages shed by DiscardLatest (the reference's drop metric). */
    def droppedCount: Long = dropped

    def partitions: Seq[Int] = 0 until numPartitions
    def latestOffset(p: Int): Long = synchronized(bufs(p).length.toLong)
    def read(p: Int, from: Long, until: Long): Iterator[SourceRecord] =
      synchronized(bufs(p).slice(from.toInt, until.toInt).toList).iterator
    def ack(p: Int, upTo: Long): Unit =
      synchronized { acked(p) = math.max(acked(p), upTo) }
    def ackedUpTo(p: Int): Long = synchronized(acked(p))
    def pending: Long =
      synchronized(partitions.map(p => bufs(p).length - acked(p)).sum)
    override def capacity: Long =
      if (maxLength == Int.MaxValue) Long.MaxValue
      else maxLength.toLong * numPartitions
  }

  // -------- DSv2 plumbing -------------------------------------------------

  /** Offset = per-partition exclusive positions, serialized "p:o;p:o". */
  private[streaming] final case class UdOffset(parts: Map[Int, Long]) extends Offset {
    override def json(): String =
      parts.toSeq.sorted.map { case (p, o) => s"$p:$o" }.mkString(";")
  }
  private[streaming] object UdOffset {
    def fromJson(s: String): UdOffset =
      UdOffset(if (s.isEmpty) Map.empty
      else s.split(";").map { kv =>
        val Array(p, o) = kv.split(":"); p.toInt -> o.toLong
      }.toMap)
  }

  private final case class UdInputPartition(sourceName: String, partition: Int,
      from: Long, until: Long) extends InputPartition

  private[streaming] class UdMicroBatchStream(sourceName: String,
      limiterName: Option[String] = None)
      extends MicroBatchStream with SupportsAdmissionControl {
    private def src = get(sourceName)
    private def limiter = limiterName.flatMap(RateLimit.get)
    override def initialOffset(): Offset =
      UdOffset(src.partitions.map(_ -> 0L).toMap)
    override def latestOffset(): Offset =
      UdOffset(src.partitions.map(p => p -> src.latestOffset(p)).toMap)
    /** Admission control (X5): the per-trigger allowance comes from the
      * ramp-up limiter and caps offsets at the true admission point —
      * partitions consume the shared allowance in partition order. */
    override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      val startParts = start.asInstanceOf[UdOffset].parts
      val latest = src.partitions.map(p => p -> src.latestOffset(p)).toMap
      limiter match {
        case None => UdOffset(latest)
        case Some(l) =>
          var allowance = l.cap
          UdOffset(latest.toSeq.sorted.map { case (p, lat) =>
            val from = startParts.getOrElse(p, 0L)
            val take = math.min(lat - from, allowance)
            allowance -= math.max(take, 0L)
            p -> math.max(from, from + take)
          }.toMap)
      }
    }
    override def reportLatestOffset(): Offset = latestOffset()
    override def deserializeOffset(json: String): Offset = UdOffset.fromJson(json)
    @volatile private var lastPlannedRows = 0L
    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val s = start.asInstanceOf[UdOffset].parts
      val e = end.asInstanceOf[UdOffset].parts
      val parts = e.toSeq.sorted.flatMap { case (p, until) =>
        val from = s.getOrElse(p, 0L)
        if (until > from) Some(UdInputPartition(sourceName, p, from, until)) else None
      }.toArray
      lastPlannedRows = parts.map(ip =>
        ip.asInstanceOf[UdInputPartition].until - ip.asInstanceOf[UdInputPartition].from).sum
      parts.asInstanceOf[Array[InputPartition]]
    }
    override def createReaderFactory(): PartitionReaderFactory = new UdReaderFactory
    /** Micro-batch committed (checkpointed) → ack back to the source, and
      * the limiter climbs its ramp (OnlyIfUsed mode sees the rows the
      * batch actually admitted). */
    override def commit(end: Offset): Unit = {
      end.asInstanceOf[UdOffset].parts.foreach { case (p, o) => src.ack(p, o) }
      limiter.foreach(_.onSuccess(lastPlannedRows))
    }
    override def stop(): Unit = ()
  }

  private class UdReaderFactory extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val ip = partition.asInstanceOf[UdInputPartition]
      new PartitionReader[InternalRow] {
        private val it = UdSource.get(ip.sourceName).read(ip.partition, ip.from, ip.until)
        private var cur: SourceRecord = _
        override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
        override def get(): InternalRow = InternalRow(
          new GenericArrayData(cur.keys.map(UTF8String.fromString).toArray[Any]),
          cur.value,
          cur.eventTime.getTime * 1000L, // micros
          new ArrayBasedMapData(
            new GenericArrayData(cur.headers.keys.map(UTF8String.fromString).toArray[Any]),
            new GenericArrayData(cur.headers.values.map(UTF8String.fromString).toArray[Any])),
          cur.partition,
          cur.offset)
        override def close(): Unit = ()
      }
    }
  }
}

/** DSv2 entry point: `format(classOf[UdSourceProvider].getName)`. */
class UdSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = UdSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new UdSourceTable(properties.get("source"), Option(properties.get("limiter")))
}

private class UdSourceTable(sourceName: String, limiterName: Option[String] = None)
    extends Table with SupportsRead {
  require(sourceName != null, "udsource requires option 'source' (registry name)")
  override def name(): String = s"udsource($sourceName)"
  override def schema(): StructType = UdSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = UdSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new UdSource.UdMicroBatchStream(sourceName, limiterName)
      }
    }
}
