package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries.
  *
  * `queries` maps name -> (spark, sfDir) -> DataFrame; `oracles` maps the
  * same name -> DuckDB SQL over the raw parquet tables. Names without an
  * oracle get a weaker rows-only check from the driver (used for
  * approximate/sketch operators whose outputs are not bit-stable).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}
