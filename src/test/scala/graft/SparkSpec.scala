package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, lazily built). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  /** Recursive delete for test artifacts. */
  def rmdirAll(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rmdirAll)
    f.delete(); ()
  }

  /** Drop a saveAsTable table AND its local-warehouse directory (a bare
    * DROP leaves files that make the next CREATE fail). */
  def dropLocalTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    rmdirAll(new java.io.File(s"spark-warehouse/$name"))
  }
}
