package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see SURVEY.md §2 for the operator inventory.
  *
  * Every `queries` entry is a self-contained (spark, sfDir) => DataFrame;
  * every SQL-expressible entry has a DuckDB oracle in `oracleSql` with
  * identical output column names and cross-engine-stable value encoding
  * (fixed-point bigints instead of raw doubles — see functions.Cols).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.q01 _),
    "q03_topk_revenue"    -> (Relational.q03 _),
    "q04_semijoin_exists" -> (Relational.q04 _),
    "q05_multijoin_volume"-> (Relational.q05 _),
    "q06_filter_agg"      -> (Relational.q06 _),
    "q07_window_rank"     -> (Relational.q07 _),
    "q08_sort_limit"      -> (Relational.q08 _),
    "q09_distinct_agg"    -> (Relational.q09 _),
    "q10_returned_items"  -> (Relational.q10 _),
    "q11_setops"          -> (Relational.q11 _),
    "q12_pivot"           -> (Relational.q12 _),
    "q13_outer_join_agg"  -> (Relational.q13 _),
    "q14_case_ratio"      -> (Relational.q14 _),
    "q16_antijoin"        -> (Relational.q16 _),
    "q17_avg_subquery"    -> (Relational.q17 _),
    "q18_having"          -> (Relational.q18 _),
    "q19_disjunctive"     -> (Relational.q19 _),
    "q21_rollup"          -> (Relational.q21 _),
    "q22_cube"            -> (Relational.q22 _),
  )

  // DuckDB SQL oracles. Fixed-point helper mirrored from Cols.sqlCents:
  private def C(e: String)  = s"CAST(floor(($e) * 100 + 0.5) AS BIGINT)"
  private def BP(e: String) = s"CAST(floor(($e) * 10000 + 0.5) AS BIGINT)"

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${C("sum(l_quantity)")} AS sum_qty,
         ${C("sum(l_extendedprice)")} AS sum_base_price,
         ${C("sum(l_extendedprice*(1-l_discount))")} AS sum_disc_price,
         ${C("sum(l_extendedprice*(1-l_discount)*(1+l_tax))")} AS sum_charge,
         ${C("avg(l_quantity)")} AS avg_qty,
         ${C("avg(l_extendedprice)")} AS avg_price,
         ${BP("avg(l_discount)")} AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",

    "q03_topk_revenue" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         ${C("sum(l_extendedprice*(1-l_discount))")} AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
           AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate  > TIMESTAMP '1998-01-01'
         GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
         ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",

    "q04_semijoin_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
           AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
         GROUP BY o_orderpriority""",

    "q05_multijoin_volume" ->
      s"""SELECT n_name, ${C("sum(l_extendedprice*(1-l_discount))")} AS revenue
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name""",

    "q06_filter_agg" ->
      s"""SELECT ${C("sum(l_extendedprice*l_discount)")} AS revenue, count(*) AS cnt
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

    "q07_window_rank" ->
      s"""SELECT * FROM (
           SELECT c_custkey, c_nationkey, ${C("c_acctbal")} AS acctbal,
             rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
             ${C("sum(c_acctbal) OVER (PARTITION BY c_nationkey)")} AS nation_total
           FROM customer) WHERE rn <= 5""",

    "q08_sort_limit" ->
      s"""SELECT o_orderkey, ${C("o_totalprice")} AS totalprice,
         strftime(o_orderdate, '%Y-%m-%d') AS odate
         FROM orders ORDER BY totalprice DESC, o_orderkey ASC LIMIT 25""",

    "q09_distinct_agg" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps,
         count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status, count(*) AS n_rows
         FROM lineitem""",

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name,
         ${C("sum(l_extendedprice*(1-l_discount))")} AS revenue
         FROM lineitem, orders, customer, nation
         WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
           AND o_custkey = c_custkey AND c_nationkey = n_nationkey
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",

    "q11_setops" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996),
              b AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997)
         SELECT 'both' AS tag, custkey FROM (SELECT custkey FROM a INTERSECT SELECT custkey FROM b)
         UNION ALL
         SELECT 'only_1996' AS tag, custkey FROM (SELECT custkey FROM a EXCEPT SELECT custkey FROM b)
         UNION ALL
         SELECT 'only_1997' AS tag, custkey FROM (SELECT custkey FROM b EXCEPT SELECT custkey FROM a)""",

    "q12_pivot" ->
      s"""SELECT l_returnflag,
         ${C("sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)")} AS qty_f,
         ${C("sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)")} AS qty_o
         FROM lineitem GROUP BY l_returnflag""",

    "q13_outer_join_agg" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'O'
           GROUP BY c_custkey)
         GROUP BY c_count""",

    "q14_case_ratio" ->
      s"""SELECT ${BP("100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END) / sum(l_extendedprice*(1-l_discount))")} AS promo_pct
         FROM lineitem, part
         WHERE l_partkey = p_partkey
           AND l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'""",

    "q16_antijoin" ->
      """SELECT p_brand, p_type, count(*) AS part_cnt
         FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 40)
         GROUP BY p_brand, p_type""",

    "q17_avg_subquery" ->
      s"""SELECT ${C("sum(l_extendedprice) / 7.0")} AS avg_yearly, count(*) AS cnt
         FROM lineitem, part,
           (SELECT l_partkey AS ap_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
            FROM lineitem GROUP BY l_partkey) a
         WHERE p_partkey = l_partkey AND p_size <= 5
           AND ap_partkey = l_partkey AND l_quantity < half_avg_qty""",

    "q18_having" ->
      s"""SELECT c_name, c_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS odate,
         ${C("o_totalprice")} AS totalprice, ${C("bo.total_qty")} AS total_qty
         FROM (SELECT l_orderkey AS bo_orderkey, sum(l_quantity) AS total_qty
               FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) bo,
              orders, customer
         WHERE bo_orderkey = o_orderkey AND o_custkey = c_custkey""",

    "q19_disjunctive" ->
      s"""SELECT ${C("sum(l_extendedprice*(1-l_discount))")} AS revenue, count(*) AS cnt
         FROM lineitem, part
         WHERE l_partkey = p_partkey AND (
           (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11) OR
           (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20) OR
           (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))""",

    "q21_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         coalesce(l_linestatus, 'ALL') AS linestatus,
         ${C("sum(l_quantity)")} AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    "q22_cube" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
         coalesce(o_orderpriority, 'ALL') AS orderpriority,
         ${C("sum(o_totalprice)")} AS sum_price, count(*) AS cnt
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
  )
}
