package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Scalar function library coverage (SURVEY.md §7.2 step 3): string,
  * date/time, math, array, JSON, and conditional expressions — the
  * reference's only scalar functions are `unicode.IsLetter` and
  * `strconv.Itoa` (worker.go:272, worker.go:287); everything here is the
  * function surface a real engine needs, on built-in codegen'd
  * `org.apache.spark.sql.functions` (no UDFs — SURVEY.md §7.3).
  *
  * Cross-engine notes: `ceil`/`floor` return LONG in Spark but DOUBLE in
  * DuckDB (cast both); `ln`/`exp` are not bit-identical across libm
  * implementations (excluded); `sqrt` is IEEE-correctly-rounded
  * everywhere (safe); array results are flattened to strings via
  * concat_ws to avoid list-representation differences.
  */
object Scalars extends QueryModule {

  val queries: Map[String, Q] = Map(

    "scalar_string" -> { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 4).as("type_prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        trim(lit("  x  ")).as("trimmed"),
        col("p_name").contains("widget").as("is_widget"))
        .orderBy(col("p_partkey"))
    },

    "scalar_datetime" -> { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .as("days_to_2002"))
        .orderBy(col("o_orderkey"))
    },

    "scalar_math" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 500)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_extendedprice") * -1).as("abs_price"),
          round(col("l_extendedprice"), 1).as("round_price"),
          floor(col("l_extendedprice")).cast("long").as("floor_price"),
          ceil(col("l_extendedprice")).cast("long").as("ceil_price"),
          sqrt(col("l_quantity")).as("sqrt_qty"),
          (col("l_orderkey") % 7).as("mod7"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          greatest(col("l_discount"), col("l_tax")).as("max_rate"),
          least(col("l_discount"), col("l_tax")).as("min_rate"))
        // ORDER BY must be a TOTAL order of the output for the driver's
        // row-wise hash compare: the synthetic lineitem does NOT honor
        // the TPC-H (l_orderkey, l_linenumber) primary key (118k dup
        // pairs at sf0.1), so tie rows with different content ordered
        // engine-arbitrarily — caught by the 10× fixture. Every output
        // column participates.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("abs_price"),
          col("sqrt_qty"), col("mod7"), col("qty_sq"),
          col("max_rate"), col("min_rate"))
    },

    "scalar_array" -> { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        size(split(col("p_name"), " ")).as("n_words"),
        concat_ws(",", array_sort(split(col("p_name"), " "))).as("sorted_words"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        array_contains(split(col("p_name"), " "), "widget").as("has_widget"),
        // sort after distinct: DuckDB's list_distinct has no order guarantee
        concat_ws(",", array_sort(array_distinct(split(col("p_name"), " ")))).as("uniq_words"),
        concat_ws(",", slice(split(col("p_name"), " "), 1, 1)).as("head_slice"))
        .orderBy(col("p_partkey"))
    },

    // events.props is a JSON string column; extract + type + aggregate.
    // Spark: get_json_object (codegen'd); oracle: DuckDB JSON extension.
    "scalar_json" -> { (s, d) =>
      // Round-16 optimization: the `.filter(k_val.isNotNull)` form let
      // predicate pushdown substitute the alias, so get_json_object
      // parsed every row TWICE (once in the pushed Filter, again in
      // the Project — WSCG subexpression elimination does not reach
      // across the two operators). The 0-or-1-row generator evaluates
      // the parse ONCE per row and drops the nulls in the same pass —
      // identical rows, schema and types.
      Tables.events(s, d)
        .select(col("event_id"),
          explode(array_compact(array(
            get_json_object(col("props"), "$.k").cast("int")))).as("k_val"))
        .orderBy(col("event_id"))
    },

    "scalar_conditional" -> { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bal_bucket"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER"))
          .as("seg_or_other"),
        (col("c_acctbal") > 0 && col("c_nationkey") < 10).as("flag"))
        .orderBy(col("c_custkey"))
    }
  )

  val oracles: Map[String, String] = Map(

    "scalar_string" ->
      """SELECT p_partkey,
        |       upper(p_name) AS up_name,
        |       lower(p_brand) AS lo_brand,
        |       length(p_name) AS name_len,
        |       substring(p_type, 1, 4) AS type_prefix,
        |       concat_ws('|', p_brand, p_type) AS brand_type,
        |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |       lpad(p_brand, 12, '*') AS padded,
        |       trim('  x  ') AS trimmed,
        |       contains(p_name, 'widget') AS is_widget
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "scalar_datetime" ->
      """SELECT o_orderkey,
        |       year(o_orderdate) AS o_year,
        |       month(o_orderdate) AS o_month,
        |       day(o_orderdate) AS o_day,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |       date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_extendedprice * -1) AS abs_price,
        |       round(l_extendedprice, 1) AS round_price,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |       sqrt(l_quantity) AS sqrt_qty,
        |       l_orderkey % 7 AS mod7,
        |       pow(l_quantity, 2) AS qty_sq,
        |       greatest(l_discount, l_tax) AS max_rate,
        |       least(l_discount, l_tax) AS min_rate
        |FROM lineitem
        |WHERE l_orderkey <= 500
        |ORDER BY l_orderkey, l_linenumber, abs_price, sqrt_qty,
        |         mod7, qty_sq, max_rate, min_rate""".stripMargin,

    "scalar_array" ->
      """SELECT p_partkey,
        |       len(string_split(p_name, ' ')) AS n_words,
        |       array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_words,
        |       string_split(p_name, ' ')[1] AS first_word,
        |       list_contains(string_split(p_name, ' '), 'widget') AS has_widget,
        |       array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',') AS uniq_words,
        |       array_to_string(string_split(p_name, ' ')[1:1], ',') AS head_slice
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "scalar_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val
        |FROM events
        |WHERE json_extract_string(props, '$.k') IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "scalar_conditional" ->
      """SELECT c_custkey,
        |       CASE WHEN c_acctbal < 0 THEN 'negative'
        |            WHEN c_acctbal < 5000 THEN 'low'
        |            ELSE 'high' END AS bal_bucket,
        |       coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
        |       (c_acctbal > 0 AND c_nationkey < 10) AS flag
        |FROM customer
        |ORDER BY c_custkey""".stripMargin
  )
}
