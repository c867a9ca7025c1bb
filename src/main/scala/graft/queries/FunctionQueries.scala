package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Tables

/** Scalar-function surface (SURVEY §2.3): the reference delegates all
  * scalar logic to UDF containers, so the engine's scalar layer is Spark's
  * built-in (codegen'd) function library — string / date / math / array /
  * map / JSON — verified here against DuckDB equivalents. */
object FunctionQueries extends QueryPack {

  val queries: Map[String, Q] = Map(

    "f_string" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        upper(substring(col("text"), 1, 10)).as("prefix"),
        concat(col("lang"), lit(":"), col("source")).as("tag"),
        length(col("text")).cast("long").as("len"))
    },

    "f_date" -> { (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        to_date(col("ts")).as("day"),
        hour(col("ts")).cast("long").as("hr"),
        month(col("ts")).cast("long").as("mon"),
        year(col("ts")).cast("long").as("yr"))
    },

    "f_math" -> { (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        abs(col("value") - 100.0).as("a"),
        // x*x, not pow(x,2): JVM Math.pow and DuckDB pow disagree in the
        // last ulp on a handful of inputs; multiplication is IEEE-exact.
        (col("value") * col("value")).as("p"),
        sqrt(abs(col("value"))).as("sq"),
        // ln differs from DuckDB's libm in the last ulp; round for parity.
        round(log(col("value") + lit(1.0)), 6).as("lnv"),
        floor(col("value")).cast("long").as("fl"),
        ceil(col("value")).cast("long").as("ce"))
    },

    "f_array" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        array_contains(split(col("text"), " "), "spark").as("has_spark"))
    },

    // map key/value surface, serialized to sorted-csv scalars (driver
    // compare cannot hash array columns).
    "f_map" -> { (s, dir) =>
      val m = from_json(col("props"), lit("map<string,string>"))
      Tables.events(s, dir).select(
        col("event_id"),
        concat_ws(",", sort_array(map_keys(m))).as("ks"),
        concat_ws(",", sort_array(map_values(m))).as("vs"))
    },

    "f_json" -> { (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_int"))
    },

    "f_regex" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("text"), "[aeiou]", "_").as("devoweled"),
        col("text").rlike("data").as("has_data"))
    },

    "f_cond" -> { (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        when(col("value") > 100, "hi").when(col("value") > 10, "mid")
          .otherwise("lo").as("bucket"),
        coalesce(nullif(col("event_type"), lit("view")), lit("other")).as("kind"),
        greatest(col("value"), lit(50.0)).as("g"),
        least(col("value"), lit(50.0)).as("l"))
    },

    // bitwise surface — the ops the hash/fingerprint family is built on
    // (simhash chunks, phash bands, bloom indices). BIGINT &/|/xor/>>
    // match DuckDB exactly; << diverges on OVERFLOW (DuckDB raises,
    // Spark wraps) — fine here because event_id stays far below 2^60,
    // and any caller shifting unbounded values must mask first.
    "f_bitwise" -> { (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        shiftleft(col("event_id"), 3).as("shl"),
        shiftright(col("event_id"), 2).as("shr"),
        col("event_id").bitwiseAND(255L).as("band"),
        col("event_id").bitwiseOR(col("user_id")).as("bor"),
        col("event_id").bitwiseXOR(col("user_id")).as("bxor"),
        expr("CAST(bit_count(event_id) AS BIGINT)").as("pop"))
    }
  )

  val oracles: Map[String, String] = Map(
    "f_string" ->
      """SELECT doc_id, upper(substr(text, 1, 10)) AS prefix,
        |  lang || ':' || source AS tag,
        |  CAST(length(text) AS BIGINT) AS len
        |FROM documents""".stripMargin,
    "f_date" ->
      """SELECT event_id, CAST(ts AS DATE) AS day,
        |  CAST(date_part('hour', ts) AS BIGINT) AS hr,
        |  CAST(date_part('month', ts) AS BIGINT) AS mon,
        |  CAST(date_part('year', ts) AS BIGINT) AS yr
        |FROM events""".stripMargin,
    "f_math" ->
      """SELECT event_id, abs(value - 100.0) AS a, value * value AS p,
        |  sqrt(abs(value)) AS sq, round(ln(value + 1.0), 6) AS lnv,
        |  CAST(floor(value) AS BIGINT) AS fl, CAST(ceil(value) AS BIGINT) AS ce
        |FROM events""".stripMargin,
    "f_array" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark
        |FROM documents""".stripMargin,
    "f_map" ->
      """SELECT event_id,
        |  array_to_string(list_sort(json_keys(props)), ',') AS ks,
        |  array_to_string(list_sort([json_extract_string(props, '$.' || k)
        |    FOR k IN json_keys(props)]), ',') AS vs
        |FROM events""".stripMargin,
    "f_json" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
        |FROM events""".stripMargin,
    "f_regex" ->
      """SELECT doc_id,
        |  regexp_extract(text, '([a-z]+)', 1) AS first_word,
        |  regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
        |  regexp_matches(text, 'data') AS has_data
        |FROM documents""".stripMargin,
    "f_cond" ->
      """SELECT event_id,
        |  CASE WHEN value > 100 THEN 'hi' WHEN value > 10 THEN 'mid'
        |    ELSE 'lo' END AS bucket,
        |  coalesce(nullif(event_type, 'view'), 'other') AS kind,
        |  greatest(value, 50.0) AS g, least(value, 50.0) AS l
        |FROM events""".stripMargin,
    "f_bitwise" ->
      """SELECT event_id,
        |  event_id << 3 AS shl, event_id >> 2 AS shr,
        |  event_id & 255 AS band,
        |  event_id | user_id AS bor,
        |  xor(event_id, user_id) AS bxor,
        |  CAST(bit_count(event_id) AS BIGINT) AS pop
        |FROM events""".stripMargin
  )
}
