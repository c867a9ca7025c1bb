package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Registry of all driver-checkable queries, merged from per-domain packs. */
object Queries {
  private def packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    PipelineQueries,
    WindowQueries,
    AggQueries,
    FunctionQueries,
    JoinQueries,
    TpchQueries,
    TrainingQueries,
    EventQueries,
    InferenceQueries,
    StyloQueries
  )

  lazy val all: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap
  lazy val oracles: Map[String, String] =
    packs.flatMap(_.oracles).toMap

  /** Per-pack key lists (pack class name, query keys, oracle keys) for
    * the registry duplicate-key spec: `.toMap` above resolves a
    * cross-pack name collision silently (last pack wins, the shadowed
    * query vanishes from the driver gate), so RegistrySpec asserts
    * Σ pack key counts == merged map size for BOTH maps and names any
    * colliding key on failure. */
  private[graft] lazy val packKeys: Seq[(String, Seq[String], Seq[String])] =
    packs.map(p => (p.getClass.getSimpleName.stripSuffix("$"),
      p.queries.keys.toSeq, p.oracles.keys.toSeq))

  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    RelationalQueries.queries("q1_agg")(spark, dir)
}
