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
    InferenceQueries
  )

  lazy val all: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap
  lazy val oracles: Map[String, String] =
    packs.flatMap(_.oracles).toMap

  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    RelationalQueries.queries("q1_agg")(spark, dir)
}
