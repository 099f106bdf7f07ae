package graft.queries

import graft.{QueryModule, Tables}

/** Correlated-subquery shapes (TPC-H Q2/Q17/Q22 analogs adapted to the
  * fixture schema, which has no partsupp — lineitem stands in as the
  * part↔supplier price list).
  *
  * Written through `spark.sql` deliberately: correlated subqueries are
  * where Catalyst's decorrelation rewrites (RewriteCorrelatedScalarSubquery
  * et al.) do real work — each scalar subquery becomes an aggregate +
  * join, so the executed plan is shuffle-joins all the way down, with no
  * per-row subquery execution (the naive interpretation would be O(n)
  * subquery runs). DuckDB performs the equivalent decorrelation, making
  * these exact-oracle-comparable.
  *
  * Determinism: every aggregate feeding a comparison is written as
  * decimal-sum/count (identical doubles both engines — see module docs in
  * Relational) and every output has a total ORDER BY.
  */
object Subqueries extends QueryModule {

  private def registerViews(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sq")
    Tables.part(s, d).createOrReplaceTempView("part_sq")
    Tables.supplier(s, d).createOrReplaceTempView("supplier_sq")
    Tables.customer(s, d).createOrReplaceTempView("customer_sq")
    Tables.orders(s, d).createOrReplaceTempView("orders_sq")
  }

  val queries: Map[String, Q] = Map(

    // Q2 shape: cheapest offer per part (scalar MIN per part). Written
    // as the decorrelation done BY HAND rather than the correlated
    // WHERE-subquery form: Catalyst decorrelates that form into a
    // sort-merge join keyed on l_partkey, whose build is the tiny
    // min-per-part aggregate but whose probe exchange carries the ENTIRE
    // fact (measured 10.0 s vs 1.0 s at the 60M-row fixture — the
    // shuffle write happens even when AQE later converts the join).
    // The min table has one row per part — part-dim-sized by
    // construction — so it broadcasts under exactly the same assumption
    // as every other part broadcast in the suite, and the fact is never
    // exchanged at all. Map-side partial MIN means the aggregate itself
    // moves only partial rows. (The correlated-subquery SURFACE stays
    // covered by sq_small_quantity_revenue and sql_tpch_q17.)
    "sq_min_cost_supplier" -> { (s, d) =>
      registerViews(s, d)
      s.sql(
        """SELECT /*+ BROADCAST(m) */ p.p_partkey, p.p_name,
          |       CAST(min(l.l_extendedprice) AS DOUBLE) AS best_price,
          |       min(sup.s_name) AS best_supplier
          |FROM part_sq p
          |JOIN lineitem_sq l ON l.l_partkey = p.p_partkey
          |JOIN supplier_sq sup ON sup.s_suppkey = l.l_suppkey
          |JOIN (SELECT l2.l_partkey, min(l2.l_extendedprice) AS min_price
          |      FROM lineitem_sq l2 GROUP BY l2.l_partkey) m
          |  ON m.l_partkey = l.l_partkey AND l.l_extendedprice = m.min_price
          |GROUP BY p.p_partkey, p.p_name
          |ORDER BY p.p_partkey""".stripMargin)
    },

    // Q17 shape: revenue from small-quantity orders of a brand, where
    // "small" is 20% of that part's own average quantity (correlated AVG).
    "sq_small_quantity_revenue" -> { (s, d) =>
      registerViews(s, d)
      s.sql(
        """SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
          |         AS avg_yearly,
          |       count(*) AS n_items
          |FROM lineitem_sq l
          |JOIN part_sq p ON p.p_partkey = l.l_partkey
          |WHERE p.p_brand = 'Brand#1'
          |  AND l.l_quantity < (
          |    SELECT 0.2 * (sum(l2.l_quantity) / count(*)) FROM lineitem_sq l2
          |    WHERE l2.l_partkey = p.p_partkey)""".stripMargin)
    },

    // Q22 shape: well-funded customers (above the positive-balance
    // average — uncorrelated scalar subquery) with few orders
    // (correlated COUNT — the classic count-over-empty-group
    // decorrelation case: a customer with zero orders must count as 0,
    // not drop out), grouped by nation.
    "sq_idle_rich_customers" -> { (s, d) =>
      registerViews(s, d)
      s.sql(
        """SELECT c.c_nationkey, count(*) AS n_customers,
          |       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
          |FROM customer_sq c
          |WHERE c.c_acctbal > (
          |    SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
          |    FROM customer_sq c2 WHERE c2.c_acctbal > 0)
          |  AND (SELECT count(*) FROM orders_sq o WHERE o.o_custkey = c.c_custkey) < 5
          |GROUP BY c.c_nationkey
          |ORDER BY c.c_nationkey""".stripMargin)
    }
  )

  val oracles: Map[String, String] = Map(

    "sq_min_cost_supplier" ->
      """SELECT p.p_partkey, p.p_name,
        |       CAST(min(l.l_extendedprice) AS DOUBLE) AS best_price,
        |       min(sup.s_name) AS best_supplier
        |FROM part p
        |JOIN lineitem l ON l.l_partkey = p.p_partkey
        |JOIN supplier sup ON sup.s_suppkey = l.l_suppkey
        |WHERE l.l_extendedprice = (
        |  SELECT min(l2.l_extendedprice) FROM lineitem l2
        |  WHERE l2.l_partkey = p.p_partkey)
        |GROUP BY p.p_partkey, p.p_name
        |ORDER BY p.p_partkey""".stripMargin,

    "sq_small_quantity_revenue" ->
      """SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |         AS avg_yearly,
        |       count(*) AS n_items
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#1'
        |  AND l.l_quantity < (
        |    SELECT 0.2 * (sum(l2.l_quantity) / count(*)) FROM lineitem l2
        |    WHERE l2.l_partkey = p.p_partkey)""".stripMargin,

    "sq_idle_rich_customers" ->
      """SELECT c.c_nationkey, count(*) AS n_customers,
        |       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer c
        |WHERE c.c_acctbal > (
        |    SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    FROM customer c2 WHERE c2.c_acctbal > 0)
        |  AND (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) < 5
        |GROUP BY c.c_nationkey
        |ORDER BY c.c_nationkey""".stripMargin
  )
}
