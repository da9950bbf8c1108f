package graft.operators

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator surface (SURVEY.md §2.4): scans, projection/filter,
  * every join type, partial+final aggregation, distinct / rollup / cube /
  * grouping sets, window functions, sorts/limits/top-k, set ops, scalar
  * function families, subqueries.
  *
  * The reference delegated all of this to stock Spark 1.3 executed on shipped
  * RDD DAGs (reference: SimpleAppClient/src/main/scala/SimpleAppClient.scala:54-72,
  * sparksql-server/examples/.../sql/RDDRelation.scala:37-66); here each
  * capability is a declarative DataFrame/SQL plan so Catalyst plans
  * pushdown/pruning/broadcast natively.
  *
  * Conventions shared with the DuckDB oracles (driver hash-compare):
  *  - every aggregated double is round(_, 2) (or 4/6 where noted) in BOTH
  *    engines — double reductions are order-sensitive in the last ulps;
  *  - every output is deterministically ordered with a unique tie-break;
  *  - derived integers are cast to long (DuckDB arithmetic yields BIGINT).
  */
object Relational {

  private def ts(s: String) = lit(s).cast("timestamp")

  /** TPC-H Q1 shape: scan → filter → partial+final hash agg → sort. */
  def q01PricingSummary(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .filter($"l_shipdate" <= ts("1998-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Oracle: String =
    """SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  /** Projection + conjunctive predicate; both should reach the parquet scan
    * (PushedFilters in the formatted plan). */
  def q02FilterProject(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1997-03-01") && $"l_quantity" < 10)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val q02Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00'
         AND l_quantity < 10
       ORDER BY l_orderkey, l_linenumber"""

  /** TPC-H Q3 shape: 3-way join, filter on both sides, agg, top-k. */
  def q03SegmentRevenue(t: T): DataFrame = {
    import t.spark.implicits._
    t.customer.filter($"c_mktsegment" === "BUILDING")
      .join(t.orders, $"c_custkey" === $"o_custkey")
      .filter($"o_orderdate" < ts("1998-01-01"))
      .join(t.lineitem, $"o_orderkey" === $"l_orderkey")
      .filter($"l_shipdate" > ts("1998-01-01"))
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(20)
  }

  val q03Oracle: String =
    """SELECT l_orderkey, o_orderdate,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM customer JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue DESC, l_orderkey LIMIT 20"""

  /** TPC-H Q4 shape: left-semi join with a non-equi conjunct (EXISTS). */
  def q04OrderPriority(t: T): DataFrame = {
    import t.spark.implicits._
    val o  = t.orders.filter($"o_orderdate" >= ts("1997-01-01") && $"o_orderdate" < ts("1997-07-01"))
    val li = t.lineitem
    o.join(li, o("o_orderkey") === li("l_orderkey") &&
               li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 30 DAYS"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q04Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** TPC-H Q5 shape: 6-way star join; dims are broadcast by Catalyst (verified
    * in the formatted plan), fact side shuffles once on the join key. */
  def q05RegionRevenue(t: T): DataFrame = {
    import t.spark.implicits._
    t.customer
      .join(t.orders, $"c_custkey" === $"o_custkey")
      .join(t.lineitem, $"o_orderkey" === $"l_orderkey")
      .join(t.supplier, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(t.nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(t.region), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA" &&
              $"o_orderdate" >= ts("1996-01-01") && $"o_orderdate" < ts("1998-01-01"))
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q05Oracle: String =
    """SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM customer JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY n_name ORDER BY revenue DESC, n_name"""

  /** TPC-H Q6 shape: tight scan-side filter, scalar aggregate. */
  def q06ForecastRevenue(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .filter($"l_shipdate" >= ts("1996-01-01") && $"l_shipdate" < ts("1997-01-01") &&
              $"l_discount" >= 0.02 && $"l_discount" <= 0.06 && $"l_quantity" < 24)
      .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"))
  }

  val q06Oracle: String =
    """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
         AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24"""

  /** Left outer join preserving customers with zero orders. */
  def q07LeftOuter(t: T): DataFrame = {
    import t.spark.implicits._
    t.customer
      .join(t.orders, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"),
           round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("spend"))
      .orderBy($"c_custkey")
  }

  val q07Oracle: String =
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS spend
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey ORDER BY c_custkey"""

  /** Left-semi join: customers having at least one finished order. */
  def q08SemiJoin(t: T): DataFrame = {
    import t.spark.implicits._
    t.customer
      .join(t.orders.filter($"o_orderstatus" === "F"), $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val q08Oracle: String =
    """SELECT c_custkey, c_name FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
       ORDER BY c_custkey"""

  /** Left-anti join: customers with no urgent open order. */
  def q09AntiJoin(t: T): DataFrame = {
    import t.spark.implicits._
    val urgent = t.orders.filter($"o_orderstatus" === "O" && $"o_orderpriority" === "1-URGENT")
    t.customer
      .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val q09Oracle: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                         AND o_orderstatus = 'O' AND o_orderpriority = '1-URGENT')
       ORDER BY c_custkey"""

  /** ROLLUP with subtotal rows (grouping-set plane the reference never had —
    * only a ghost `groupingsets` import, reference:
    * sparksql-server/.../SparkSQLServer.scala:21). */
  def q10Rollup(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val q10Oracle: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""

  /** CUBE over a join of fact + dim. */
  def q11Cube(t: T): DataFrame = {
    import t.spark.implicits._
    t.customer
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
      .cube($"c_mktsegment", $"n_name")
      .agg(count(lit(1)).as("n"), round(avg($"c_acctbal"), 4).as("avg_bal"))
      .orderBy($"c_mktsegment".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  val q11Oracle: String =
    """SELECT c_mktsegment, n_name, COUNT(*) AS n, ROUND(AVG(c_acctbal), 4) AS avg_bal
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY CUBE (c_mktsegment, n_name)
       ORDER BY c_mktsegment ASC NULLS FIRST, n_name ASC NULLS FIRST"""

  /** Window rank: top-3 orders by price within each priority class. */
  def q12WindowRank(t: T): DataFrame = {
    import t.spark.implicits._
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice".desc, $"o_orderkey")
    t.orders
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_orderpriority", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"rn")
  }

  val q12Oracle: String =
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
         SELECT o_orderpriority, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) WHERE rn <= 3
       ORDER BY o_orderpriority, rn"""

  /** Running (cumulative) sum per customer — frame-bounded window agg. */
  def q13WindowRunning(t: T): DataFrame = {
    import t.spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.orders
      .withColumn("running_spend", round(sum($"o_totalprice").over(w), 2))
      .select($"o_custkey", $"o_orderkey", $"running_spend")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val q13Oracle: String =
    """SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
       FROM orders ORDER BY o_custkey, o_orderkey"""

  /** lag/lead deltas over the events stream table. */
  def q14WindowLagLead(t: T): DataFrame = {
    import t.spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t.events
      .withColumn("prev_value", lag($"value", 1).over(w))
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .select($"user_id", $"event_id",
              round($"value" - coalesce($"prev_value", lit(0.0)), 2).as("delta"),
              coalesce($"next_type", lit("none")).as("next_type"))
      .orderBy($"user_id", $"event_id")
  }

  val q14Oracle: String =
    """SELECT user_id, event_id,
       ROUND(value - COALESCE(LAG(value, 1) OVER w, 0), 2) AS delta,
       COALESCE(LEAD(event_type, 1) OVER w, 'none') AS next_type
       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ORDER BY user_id, event_id"""

  /** Global top-k (TakeOrderedAndProject — no full sort of the table). */
  def q15TopK(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(15)
  }

  val q15Oracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 15"""

  /** Set operators: UNION (distinct) then EXCEPT. */
  def q16SetOps(t: T): DataFrame = {
    import t.spark.implicits._
    val building = t.customer.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val rich     = t.customer.filter($"c_acctbal" > 8000).select($"c_custkey")
    val pending  = t.orders.filter($"o_orderstatus" === "P").select($"o_custkey".as("c_custkey"))
    building.union(rich).distinct().except(pending).orderBy($"c_custkey")
  }

  val q16Oracle: String =
    """SELECT c_custkey FROM (
         SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         UNION
         SELECT c_custkey FROM customer WHERE c_acctbal > 8000
       ) EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
       ORDER BY c_custkey"""

  /** INTERSECT: customers active in both 1996 and 2000. */
  def q17Intersect(t: T): DataFrame = {
    import t.spark.implicits._
    def active(y0: String, y1: String) =
      t.orders.filter($"o_orderdate" >= ts(y0) && $"o_orderdate" < ts(y1)).select($"o_custkey")
    active("1996-01-01", "1997-01-01").intersect(active("2000-01-01", "2001-01-01"))
      .orderBy($"o_custkey")
  }

  val q17Oracle: String =
    """SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       INTERSECT
       SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00' AND o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
       ORDER BY o_custkey"""

  /** distinct / dropDuplicates. */
  def q18Distinct(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders.select($"o_orderstatus", $"o_orderpriority").distinct()
      .orderBy($"o_orderstatus", $"o_orderpriority")
  }

  val q18Oracle: String =
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
       ORDER BY o_orderstatus, o_orderpriority"""

  /** String function family (reference surface was bare split/contains
    * lambdas — reference: SimpleAppClient.scala:55, PROJECT-INTERNALS.md:14). */
  def q19StringFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.part
      .select(
        $"p_partkey",
        upper($"p_name").as("uname"),
        length($"p_name").cast("long").as("name_len"),
        substring($"p_type", 1, 3).as("type3"),
        concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
        regexp_replace($"p_name", "[aeiou]", "").as("novowels"),
        lpad($"p_brand", 12, "_").as("padded"),
        reverse($"p_name").as("rname"))
      .orderBy($"p_partkey")
  }

  val q19Oracle: String =
    """SELECT p_partkey, UPPER(p_name) AS uname,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       SUBSTRING(p_type, 1, 3) AS type3,
       CONCAT_WS('-', p_brand, p_type) AS brand_type,
       REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS novowels,
       LPAD(p_brand, 12, '_') AS padded,
       REVERSE(p_name) AS rname
       FROM part ORDER BY p_partkey"""

  /** Date/time function family over timestamps. */
  def q20DateFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders
      .select(
        $"o_orderkey",
        year($"o_orderdate").cast("long").as("y"),
        month($"o_orderdate").cast("long").as("m"),
        dayofmonth($"o_orderdate").cast("long").as("d"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        datediff($"o_orderdate", lit("1995-01-01").cast("date")).cast("long").as("days_since"))
      .orderBy($"o_orderkey")
  }

  val q20Oracle: String =
    """SELECT o_orderkey,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
       CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS d,
       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
       FROM orders ORDER BY o_orderkey"""

  /** Math function family; transcendentals rounded to 6 places. */
  def q21MathFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem.filter($"l_orderkey" % 10 === 0)
      .select(
        $"l_orderkey", $"l_linenumber",
        round(sqrt($"l_quantity"), 6).as("sqrt_qty"),
        round(log($"l_extendedprice"), 6).as("ln_price"),
        round(pow($"l_discount" + 1, 2), 6).as("disc_sq"),
        round(abs($"l_tax" - 0.05), 6).as("tax_dev"),
        ($"l_linenumber" % 3).cast("long").as("ln_mod"),
        floor($"l_extendedprice").cast("long").as("price_floor"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val q21Oracle: String =
    """SELECT l_orderkey, l_linenumber,
       ROUND(SQRT(l_quantity), 6) AS sqrt_qty,
       ROUND(LN(l_extendedprice), 6) AS ln_price,
       ROUND(POW(l_discount + 1, 2), 6) AS disc_sq,
       ROUND(ABS(l_tax - 0.05), 6) AS tax_dev,
       CAST(l_linenumber % 3 AS BIGINT) AS ln_mod,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor
       FROM lineitem WHERE l_orderkey % 10 = 0
       ORDER BY l_orderkey, l_linenumber"""

  /** CASE WHEN bucketing + aggregation. */
  def q22CaseWhen(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders
      .withColumn("band",
        when($"o_totalprice" < 1000, "small")
          .when($"o_totalprice" < 10000, "medium")
          .when($"o_totalprice" < 50000, "large")
          .otherwise("jumbo"))
      .groupBy($"band")
      .agg(count(lit(1)).as("n"), round(avg($"o_totalprice"), 2).as("avg_price"))
      .orderBy($"band")
  }

  val q22Oracle: String =
    """SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
                   WHEN o_totalprice < 10000 THEN 'medium'
                   WHEN o_totalprice < 50000 THEN 'large'
                   ELSE 'jumbo' END AS band,
       COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
       FROM orders GROUP BY 1 ORDER BY band"""

  /** JSON extraction from the events.props string column. */
  def q23JsonFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.events
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy(($"k" % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .orderBy($"k_bucket")
  }

  val q23Oracle: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
       FROM events GROUP BY 1 ORDER BY k_bucket"""

  /** IN-subquery (rewritten by Catalyst to a semi join). */
  def q24InSubquery(t: T): DataFrame = {
    import t.spark.implicits._
    val heavy = t.lineitem.filter($"l_quantity" > 45).select($"l_partkey")
    t.part
      .join(heavy, $"p_partkey" === $"l_partkey", "left_semi")
      .select($"p_partkey", $"p_brand", $"p_type")
      .orderBy($"p_partkey")
  }

  val q24Oracle: String =
    """SELECT p_partkey, p_brand, p_type FROM part
       WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
       ORDER BY p_partkey"""

  /** Scalar subquery threshold (SQL surface via spark.sql). */
  def q25ScalarSubquery(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT o_orderstatus, COUNT(*) AS n
         FROM orders
         WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.5
         GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  }

  val q25Oracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n
       FROM orders
       WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.5
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Correlated scalar subquery (decorrelated by Catalyst into a join). */
  def q26CorrelatedSubquery(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS bal
         FROM supplier s
         WHERE s_acctbal > (SELECT AVG(s2.s_acctbal) FROM supplier s2
                            WHERE s2.s_nationkey = s.s_nationkey)
         ORDER BY s_suppkey""")
  }

  val q26Oracle: String =
    """SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS bal
       FROM supplier s
       WHERE s_acctbal > (SELECT AVG(s2.s_acctbal) FROM supplier s2
                          WHERE s2.s_nationkey = s.s_nationkey)
       ORDER BY s_suppkey"""

  /** GROUP BY ... HAVING. */
  def q27Having(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .groupBy($"l_suppkey")
      .agg(round(sum($"l_quantity"), 2).as("total_qty"), count(lit(1)).as("n_items"))
      .filter($"total_qty" > 15000)
      .orderBy($"l_suppkey")
  }

  val q27Oracle: String =
    """SELECT l_suppkey, ROUND(SUM(l_quantity), 2) AS total_qty, COUNT(*) AS n_items
       FROM lineitem GROUP BY l_suppkey
       HAVING ROUND(SUM(l_quantity), 2) > 15000 ORDER BY l_suppkey"""

  /** Pivot (conditional aggregation over event types). */
  def q28Pivot(t: T): DataFrame = {
    import t.spark.implicits._
    t.events
      .withColumn("user_bucket", ($"user_id" % 10).cast("long"))
      .groupBy($"user_bucket")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .count()
      .na.fill(0L)
      .orderBy($"user_bucket")
  }

  val q28Oracle: String =
    """SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS error
       FROM events GROUP BY 1 ORDER BY user_bucket"""

  /** Range (interval) join: purchases within 5 minutes of a click by the same
    * user — equi key on user plus a band predicate on time. */
  def q29RangeJoin(t: T): DataFrame = {
    import t.spark.implicits._
    val clicks    = t.events.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("cts"), $"event_id".as("click_id"))
    val purchases = t.events.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts".as("pts"), $"event_id".as("purchase_id"))
    clicks.join(purchases,
        $"cu" === $"pu" && $"pts" >= $"cts" && $"pts" <= $"cts" + expr("INTERVAL 5 MINUTES"))
      .groupBy($"cu".as("user_id"))
      .agg(count(lit(1)).as("n_conversions"))
      .orderBy($"user_id")
  }

  val q29Oracle: String =
    """SELECT c.user_id AS user_id, COUNT(*) AS n_conversions
       FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
       JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
         ON c.user_id = p.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 5 MINUTE
       GROUP BY c.user_id ORDER BY user_id"""

  /** As-of join: each purchase matched to the latest prior event of type
    * 'click' for the same user, expressed as an IGNORE NULLS window last()
    * so the plan is one shuffle + sort (no self-join). */
  def q30AsOfJoin(t: T): DataFrame = {
    import t.spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t.events
      .withColumn("prior_click",
        last(when($"event_type" === "click", $"event_id"), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"),
              coalesce($"prior_click", lit(-1L)).as("prior_click_id"))
      .orderBy($"user_id", $"purchase_id")
  }

  val q30Oracle: String =
    """SELECT user_id, event_id AS purchase_id,
              COALESCE(prior_click, -1) AS prior_click_id
       FROM (SELECT user_id, event_id, event_type,
                    LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click
             FROM events)
       WHERE event_type = 'purchase'
       ORDER BY user_id, purchase_id"""

  /** Top revenue supplier per nation (top-k per group via window). */
  def q31TopPerGroup(t: T): DataFrame = {
    import t.spark.implicits._
    val rev = t.lineitem
      .groupBy($"l_suppkey")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
    val w = Window.partitionBy($"n_name").orderBy($"revenue".desc, $"s_suppkey")
    t.supplier
      .join(rev, $"s_suppkey" === $"l_suppkey")
      .join(broadcast(t.nation), $"s_nationkey" === $"n_nationkey")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"n_name", $"s_suppkey", $"revenue")
      .orderBy($"n_name")
  }

  val q31Oracle: String =
    """SELECT n_name, s_suppkey, revenue FROM (
         SELECT n_name, s_suppkey, revenue,
                ROW_NUMBER() OVER (PARTITION BY n_name
                                   ORDER BY revenue DESC, s_suppkey) AS rk
         FROM supplier
         JOIN (SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
               FROM lineitem GROUP BY l_suppkey) r ON s_suppkey = l_suppkey
         JOIN nation ON s_nationkey = n_nationkey)
       WHERE rk = 1 ORDER BY n_name"""

  /** Full outer join over per-year customer/supplier nation activity. */
  def q32FullOuter(t: T): DataFrame = {
    import t.spark.implicits._
    val custN = t.customer.groupBy($"c_nationkey".as("nk")).agg(count(lit(1)).as("n_cust"))
    val suppN = t.supplier.groupBy($"s_nationkey".as("nk2")).agg(count(lit(1)).as("n_supp"))
    custN.join(suppN, $"nk" === $"nk2", "full_outer")
      .select(coalesce($"nk", $"nk2").as("nationkey"),
              coalesce($"n_cust", lit(0L)).as("n_cust"),
              coalesce($"n_supp", lit(0L)).as("n_supp"))
      .orderBy($"nationkey")
  }

  val q32Oracle: String =
    """SELECT COALESCE(c.nk, s.nk2) AS nationkey,
              COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
       FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
       FULL OUTER JOIN
            (SELECT s_nationkey AS nk2, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
         ON c.nk = s.nk2
       ORDER BY nationkey"""

  /** Grouping sets (explicit, mixed granularities) via SQL surface. */
  def q33GroupingSets(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                ROUND(SUM(l_quantity), 2) AS qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
  }

  val q33Oracle: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              ROUND(SUM(l_quantity), 2) AS qty
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
       ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  /** count(DISTINCT) + multi-distinct aggregation. */
  def q34CountDistinct(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"),
           countDistinct($"l_suppkey").as("n_supps"),
           count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  val q34Oracle: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Ranking-window family: ntile / rank / dense_rank (all integer outputs —
    * percent_rank/cume_dist are ratios whose doubles can tie-break
    * differently across engines, so ranks carry the coverage). */
  def q35WindowRanks(t: T): DataFrame = {
    import t.spark.implicits._
    val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice".desc, $"o_orderkey")
    t.orders
      .select($"o_orderkey",
        ntile(4).over(w).cast("long").as("quartile"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"))
      .orderBy($"o_orderkey")
  }

  val q35Oracle: String =
    """SELECT o_orderkey, CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
              CAST(RANK() OVER w AS BIGINT) AS rk,
              CAST(DENSE_RANK() OVER w AS BIGINT) AS drk
       FROM orders
       WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
       ORDER BY o_orderkey"""

  /** Ordered string aggregation (listagg / string_agg). */
  def q36ListAgg(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT o_orderstatus,
                listagg(DISTINCT o_orderpriority, ',')
                  WITHIN GROUP (ORDER BY o_orderpriority) AS prios,
                COUNT(*) AS n
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  }

  val q36Oracle: String =
    """SELECT o_orderstatus,
              string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS prios,
              COUNT(*) AS n
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Typed JSON parsing: from_json with an explicit schema (q23 covers the
    * per-path get_json_object surface; this is the full-struct path — one
    * parse per row, then ordinary column pruning on the struct). */
  def q37FromJson(t: T): DataFrame = {
    import t.spark.implicits._
    t.events
      .withColumn("p", from_json($"props",
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
      .groupBy(expr("p.k DIV 20").as("k_band"))
      .agg(count(lit(1)).as("n"), sum($"p.k").as("k_sum"))
      .orderBy($"k_band".asc_nulls_first)
  }

  val q37Oracle: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 20 AS k_band,
              COUNT(*) AS n,
              SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS k_sum
       FROM events GROUP BY 1 ORDER BY k_band ASC NULLS FIRST"""

  /** Time-series gap-fill: dense per-user daily activity over the full
    * calendar — generate the day spine (sequence + explode), cross join the
    * (small, broadcast) user dimension, left-join sparse per-day aggregates,
    * zero-fill. Integer aggregates only: per-day double sums would depend on
    * partial-agg order across engines. */
  def q38GapFill(t: T): DataFrame = {
    import t.spark.implicits._
    val users = t.events.filter($"user_id" < 20).select($"user_id").distinct()
    val days = t.spark.sql(
      "SELECT explode(sequence(DATE'2024-01-01', DATE'2024-01-30', INTERVAL 1 DAY)) AS day")
    val daily = t.events.filter($"user_id" < 20)
      .groupBy($"user_id".as("u"), to_date($"ts").as("d"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor($"value").cast("long")).as("value_floor_sum"))
    users.crossJoin(broadcast(days))
      .join(daily, $"user_id" === $"u" && $"day" === $"d", "left_outer")
      // TIMESTAMP (not DATE) on both engines: pandas renders a DuckDB DATE
      // as datetime64 but a parquet DATE as datetime.date, so a date-typed
      // spine hash-mismatches depending on the harness's fetch path
      .select($"user_id", $"day".cast("timestamp").as("day"),
        coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce($"value_floor_sum", lit(0L)).as("value_floor_sum"))
      .orderBy($"user_id", $"day")
  }

  val q38Oracle: String =
    """WITH users AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
       days AS (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                              INTERVAL 1 DAY))::DATE AS day),
       daily AS (
         SELECT user_id AS u, CAST(ts AS DATE) AS d, COUNT(*) AS n_events,
                SUM(CAST(FLOOR(value) AS BIGINT)) AS value_floor_sum
         FROM events WHERE user_id < 20 GROUP BY 1, 2)
       SELECT user_id, day::DATE::TIMESTAMP AS day,
              COALESCE(n_events, 0)::BIGINT AS n_events,
              COALESCE(value_floor_sum, 0)::BIGINT AS value_floor_sum
       FROM users CROSS JOIN days
       LEFT JOIN daily ON user_id = u AND day = d
       ORDER BY user_id, day"""

  /** Exact multi-percentile aggregation (quartiles of quantity per return
    * flag). Spark's `percentile` and DuckDB's `quantile_cont` use the same
    * type-7 interpolation, and quartiles of integer-valued quantities
    * interpolate to exact binary fractions — the doubles hash-match without
    * rounding. */
  def q39Percentiles(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem.groupBy($"l_returnflag")
      .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  val q39Oracle: String =
    """SELECT l_returnflag, quantile_cont(l_quantity, 0.25) AS p25,
              quantile_cont(l_quantity, 0.5) AS p50,
              quantile_cont(l_quantity, 0.75) AS p75, COUNT(*) AS n
       FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""

  /** Statistical aggregates as exact integer moments: sample variance of
    * quantity and quantity~discount covariance per linestatus, in milli-units
    * via n*S2 - S1^2 over n(n-1). Spark's stddev_samp/covar_samp exist but
    * reduce doubles in partial-agg order — not hash-stable cross-engine; the
    * moment form is bit-exact, with the *1000 split across the division
    * (quot*1000 + rem*1000/d — exact, and int64-safe at any sf; DuckDB //
    * truncates like Spark DIV, including on the negative covariance).
    * Discount is fixed to basis points with FLOOR on both engines (same
    * input double -> same product -> same floor). */
  def q40StatsAggs(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .select($"l_linestatus",
        $"l_quantity".cast("long").as("q"),
        floor($"l_discount" * 10000).cast("long").as("d_bp"))
      .groupBy($"l_linestatus")
      .agg(count(lit(1)).as("n"), sum($"q").as("s1"), sum($"q" * $"q").as("s2"),
        sum($"d_bp").as("t1"), sum($"q" * $"d_bp").as("sxy"))
      .withColumn("dv", expr("n * s2 - s1 * s1"))
      .withColumn("dc", expr("n * sxy - s1 * t1"))
      .withColumn("dd", expr("n * (n - 1)"))
      .select($"l_linestatus", $"n",
        expr("(dv DIV dd) * 1000 + (dv % dd) * 1000 DIV dd").as("var_q_milli"),
        expr("(dc DIV dd) * 1000 + (dc % dd) * 1000 DIV dd").as("cov_qd_milli"))
      .orderBy($"l_linestatus")
  }

  val q40Oracle: String =
    """WITH b AS (SELECT l_linestatus, CAST(l_quantity AS BIGINT) AS q,
                  CAST(FLOOR(l_discount * 10000) AS BIGINT) AS d_bp FROM lineitem),
       m AS (SELECT l_linestatus, COUNT(*) AS n, SUM(q)::BIGINT AS s1,
                    SUM(q * q)::BIGINT AS s2, SUM(d_bp)::BIGINT AS t1,
                    SUM(q * d_bp)::BIGINT AS sxy
             FROM b GROUP BY l_linestatus),
       d AS (SELECT l_linestatus, n,
                    (n * s2 - s1 * s1)::BIGINT AS dv,
                    (n * sxy - s1 * t1)::BIGINT AS dc,
                    (n * (n - 1))::BIGINT AS dd
             FROM m)
       SELECT l_linestatus, n,
              ((dv // dd) * 1000 + (dv % dd) * 1000 // dd)::BIGINT AS var_q_milli,
              ((dc // dd) * 1000 + (dc % dd) * 1000 // dd)::BIGINT AS cov_qd_milli
       FROM d ORDER BY l_linestatus"""

  /** LATERAL correlated subquery — per-order aggregate computed inline (the
    * decorrelation shape Catalyst rewrites into a join under the hood). */
  def q41LateralJoin(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT o.o_orderkey, l.n_items, l.max_qty
         FROM orders o, LATERAL (
           SELECT COUNT(*) AS n_items,
                  COALESCE(CAST(MAX(l_quantity) AS BIGINT), 0) AS max_qty
           FROM lineitem WHERE l_orderkey = o.o_orderkey) l
         WHERE o.o_orderkey <= 2000
         ORDER BY o.o_orderkey""")
  }

  val q41Oracle: String =
    """SELECT o.o_orderkey, l.n_items, l.max_qty
       FROM orders o, LATERAL (
         SELECT COUNT(*) AS n_items,
                COALESCE(CAST(MAX(l_quantity) AS BIGINT), 0) AS max_qty
         FROM lineitem WHERE l_orderkey = o.o_orderkey) l
       WHERE o.o_orderkey <= 2000
       ORDER BY o.o_orderkey"""

  /** Array function family over per-order quantity arrays: sort, negative
    * indexing, reverse+slice, fold (higher-order aggregate), membership.
    * collect_list is order-nondeterministic — array_sort immediately after is
    * what makes the column usable in a deterministic pipeline. */
  def q42ArrayFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .groupBy($"l_orderkey")
      .agg(array_sort(collect_list($"l_quantity".cast("long"))).as("qs"))
      .select($"l_orderkey",
        size($"qs").cast("long").as("n_items"),
        expr("aggregate(qs, 0L, (a, x) -> a + x)").as("arr_sum"),
        element_at($"qs", -1).as("arr_max"),
        expr("aggregate(slice(reverse(qs), 1, 3), 0L, (a, x) -> a + x)").as("top3_sum"),
        array_contains($"qs", 50L).as("has_50"))
      .orderBy($"l_orderkey")
  }

  val q42Oracle: String =
    """WITH arr AS (SELECT l_orderkey,
         list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
       FROM lineitem GROUP BY l_orderkey)
       SELECT l_orderkey, len(qs)::BIGINT AS n_items,
              list_sum(qs)::BIGINT AS arr_sum,
              qs[-1] AS arr_max,
              list_sum(list_slice(list_reverse(qs), 1, 3))::BIGINT AS top3_sum,
              list_contains(qs, 50) AS has_50
       FROM arr ORDER BY l_orderkey"""

  /** Map function family: build a per-bucket event_type->count map
    * (map_from_entries over collected structs), then key lookup, cardinality
    * and a fold over map_values. The oracle produces the same scalars with
    * conditional aggregation — map lookups are order-independent, so the
    * nondeterministic collect_list order never shows. */
  def q43MapFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.events
      .groupBy(($"user_id" % 10).as("user_bucket"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_bucket")
      .agg(map_from_entries(collect_list(struct($"event_type", $"n"))).as("m"))
      .select($"user_bucket",
        element_at($"m", "click").as("clicks"),
        element_at($"m", "error").as("errors"),
        size($"m").cast("long").as("n_types"),
        expr("aggregate(map_values(m), 0L, (a, x) -> a + x)").as("total"))
      .orderBy($"user_bucket")
  }

  val q43Oracle: String =
    """SELECT user_id % 10 AS user_bucket,
              SUM(CASE WHEN event_type = 'click' THEN 1 END)::BIGINT AS clicks,
              SUM(CASE WHEN event_type = 'error' THEN 1 END)::BIGINT AS errors,
              COUNT(DISTINCT event_type) AS n_types,
              COUNT(*) AS total
       FROM events GROUP BY 1 ORDER BY user_bucket"""

  /** Unpivot/melt: wide per-flag metrics to (flag, metric, value) rows —
    * Dataset.unpivot (SQL UNPIVOT); all melted metrics share one long type. */
  def q44Unpivot(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .groupBy($"l_returnflag")
      .agg(sum($"l_quantity".cast("long")).as("sum_qty"),
        count(lit(1)).as("n_items"),
        floor(max($"l_extendedprice") * 100).cast("long").as("max_price_c"))
      .unpivot(
        Array($"l_returnflag"),
        Array($"sum_qty", $"n_items", $"max_price_c"),
        "metric", "value")
      .orderBy($"l_returnflag", $"metric")
  }

  val q44Oracle: String =
    """WITH w AS (SELECT l_returnflag, SUM(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
                  COUNT(*) AS n_items,
                  CAST(FLOOR(MAX(l_extendedprice) * 100) AS BIGINT) AS max_price_c
           FROM lineitem GROUP BY l_returnflag)
       SELECT l_returnflag, metric, value FROM (
         SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
         UNION ALL SELECT l_returnflag, 'n_items', n_items FROM w
         UNION ALL SELECT l_returnflag, 'max_price_c', max_price_c FROM w)
       ORDER BY l_returnflag, metric"""

  /** Distribution window family: ntile, percent_rank, cume_dist over a
    * unique (totalprice, orderkey) ordering. The ratios are single IEEE
    * divisions of identical integers on both engines — bit-stable without
    * rounding. */
  def q45NtileFamily(t: T): DataFrame = {
    import t.spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice", $"o_orderkey")
    t.orders
      .select($"o_orderkey", $"o_orderpriority",
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy($"o_orderkey")
  }

  val q45Oracle: String =
    """SELECT o_orderkey, o_orderpriority,
              CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
              PERCENT_RANK() OVER w AS pr,
              CUME_DIST() OVER w AS cd
       FROM orders
       WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
       ORDER BY o_orderkey"""

  /** regexp_extract_all + array scalars: every >=6-letter word of the part
    * name, counted and probed from both ends (negative indexing). */
  def q46RegexpExtractAll(t: T): DataFrame = {
    import t.spark.implicits._
    t.part
      .select($"p_partkey",
        expr("regexp_extract_all(p_name, '[a-z]{6,}', 0)").as("ws"))
      .select($"p_partkey",
        size($"ws").cast("long").as("n_words"),
        // try_element_at: ANSI element_at throws on the empty-array probe
        try_element_at($"ws", lit(1)).as("first_word"),
        try_element_at($"ws", lit(-1)).as("last_word"),
        // DuckDB's array_to_string on an empty list is NULL, Spark's
        // concat_ws is '' — nullif aligns the engines
        nullif(concat_ws("|", $"ws"), lit("")).as("joined"))
      .orderBy($"p_partkey")
  }

  val q46Oracle: String =
    """WITH e AS (SELECT p_partkey, regexp_extract_all(p_name, '[a-z]{6,}') AS ws FROM part)
       SELECT p_partkey, len(ws)::BIGINT AS n_words,
              ws[1] AS first_word, ws[-1] AS last_word,
              array_to_string(ws, '|') AS joined
       FROM e ORDER BY p_partkey"""

  /** max_by/min_by (argmax aggregates): best/worst customer per nation by
    * account balance. The ordering key packs (balance cents, custkey) into
    * one int64 so ties on balance break deterministically — max_by with a
    * non-unique key is free to return either row on either engine. */
  def q47ArgMax(t: T): DataFrame = {
    import t.spark.implicits._
    // 1e8 multiplier: cents <= 1e6, so the packing stays collision-free for
    // custkey < 1e8 (sf ~600) and the key under int64 (1e14 + 1e8)
    val keyed = t.customer.withColumn("bal_key",
      floor($"c_acctbal" * 100).cast("long") * 100000000L + $"c_custkey")
    keyed.groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
        expr("max_by(c_name, bal_key)").as("richest"),
        expr("min_by(c_name, bal_key)").as("poorest"),
        expr("max(bal_key) DIV 100000000").as("top_bal_cents"))
      .orderBy($"c_nationkey")
  }

  val q47Oracle: String =
    """WITH k AS (SELECT c_nationkey, c_name,
                  CAST(FLOOR(c_acctbal * 100) AS BIGINT) * 100000000 + c_custkey AS bal_key
           FROM customer)
       SELECT c_nationkey, COUNT(*) AS n_customers,
              arg_max(c_name, bal_key) AS richest,
              arg_min(c_name, bal_key) AS poorest,
              (MAX(bal_key) // 100000000)::BIGINT AS top_bal_cents
       FROM k GROUP BY c_nationkey ORDER BY c_nationkey"""

  /** Boolean + bitwise aggregate family: bool_and/bool_or and
    * bit_and/bit_or/bit_xor per order priority. */
  def q48BoolBitAggs(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders.groupBy($"o_orderpriority")
      .agg(expr("bool_and(o_totalprice > 1000)").as("all_over_1k"),
        expr("bool_or(o_totalprice > 400000)").as("any_over_400k"),
        sum(when($"o_totalprice" > 150000, 1L).otherwise(0L)).as("n_over_150k"),
        expr("bit_and(o_orderkey)").as("keys_and"),
        expr("bit_or(o_orderkey)").as("keys_or"),
        expr("bit_xor(o_orderkey)").as("keys_xor"))
      .orderBy($"o_orderpriority")
  }

  val q48Oracle: String =
    """SELECT o_orderpriority,
              bool_and(o_totalprice > 1000) AS all_over_1k,
              bool_or(o_totalprice > 400000) AS any_over_400k,
              SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)::BIGINT AS n_over_150k,
              bit_and(o_orderkey)::BIGINT AS keys_and,
              bit_or(o_orderkey)::BIGINT AS keys_or,
              bit_xor(o_orderkey)::BIGINT AS keys_xor
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Exact median per group. Quantity is integer-valued and price is floored
    * to integer cents first, so the even-count midpoint interpolates to an
    * exact .0/.5 double on both engines regardless of how each writes
    * lower + (upper-lower)*0.5. */
  def q49Median(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem.groupBy($"l_returnflag")
      .agg(expr("median(l_quantity)").as("median_qty"),
        expr("median(cast(floor(l_extendedprice * 100) AS bigint))").as("median_price_c"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  val q49Oracle: String =
    """SELECT l_returnflag, median(l_quantity) AS median_qty,
              median(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS median_price_c,
              COUNT(*) AS n
       FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""

  /** MERGE INTO / SCD upsert semantics expressed relationally: a full-outer
    * join of target and source on the key, matched rows take the source
    * values ('update'), source-only rows insert, target-only rows keep —
    * the lakehouse merge pattern without a table format, auditable via the
    * `action` column. One shuffle on the merge key; at scale the source side
    * is typically small enough to broadcast. All prices in integer cents. */
  def q50MergeUpsert(t: T): DataFrame = {
    import t.spark.implicits._
    val target = t.orders.select($"o_orderkey",
      floor($"o_totalprice" * 100).cast("long").as("t_price"),
      $"o_orderstatus".as("t_status"))
    val updates = t.orders.filter($"o_orderkey" % 3 === 0)
      .select($"o_orderkey",
        (floor($"o_totalprice" * 100).cast("long") + 100L).as("s_price"),
        lit("U").as("s_status"))
    val inserts = t.orders.filter($"o_orderkey" % 1000 === 1)
      .select(($"o_orderkey" + 10000000L).as("o_orderkey"),
        lit(1L).as("s_price"), lit("I").as("s_status"))
    target.join(updates.unionByName(inserts), Seq("o_orderkey"), "full_outer")
      .select($"o_orderkey",
        coalesce($"s_price", $"t_price").as("price_c"),
        coalesce($"s_status", $"t_status").as("status"),
        when($"s_price".isNotNull && $"t_price".isNotNull, "update")
          .when($"s_price".isNotNull, "insert").otherwise("keep").as("action"))
      .orderBy($"o_orderkey")
  }

  val q50Oracle: String =
    """WITH target AS (
         SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS t_price,
                o_orderstatus AS t_status FROM orders),
       source AS (
         SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) + 100 AS s_price,
                'U' AS s_status FROM orders WHERE o_orderkey % 3 = 0
         UNION ALL
         SELECT o_orderkey + 10000000, 1, 'I' FROM orders WHERE o_orderkey % 1000 = 1)
       SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
              COALESCE(s_price, t_price)::BIGINT AS price_c,
              COALESCE(s_status, t_status) AS status,
              CASE WHEN s_price IS NOT NULL AND t_price IS NOT NULL THEN 'update'
                   WHEN s_price IS NOT NULL THEN 'insert' ELSE 'keep' END AS action
       FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
       ORDER BY o_orderkey"""

  /** Time-based RANGE window frame: per-user rolling 10-minute event-time
    * sums — RANGE frames bound by *value* distance (here an interval), not
    * row count, and include all ORDER BY peers, so ties in ts resolve
    * identically on both engines. Integer floor-sums for determinism. */
  def q51RangeFrame(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT event_id, user_id, ts,
                SUM(CAST(FLOOR(value) AS BIGINT)) OVER (
                  PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
                  AS rolling_10m,
                COUNT(*) OVER (
                  PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
                  AS n_10m
         FROM events WHERE user_id < 20
         ORDER BY user_id, ts, event_id""")
  }

  val q51Oracle: String =
    """SELECT event_id, user_id, ts,
              SUM(CAST(FLOOR(value) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL '10 minutes' PRECEDING AND CURRENT ROW)
                ::BIGINT AS rolling_10m,
              COUNT(*) OVER (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL '10 minutes' PRECEDING AND CURRENT ROW)
                AS n_10m
       FROM events WHERE user_id < 20
       ORDER BY user_id, ts, event_id"""

  /** Multiset (ALL) set operations — exceptAll/intersectAll keep duplicate
    * cardinalities (q16 covers the distinct variants), summarized per key so
    * the multiset arithmetic itself is what the oracle hashes. */
  def q52SetOpsAll(t: T): DataFrame = {
    import t.spark.implicits._
    val a = t.lineitem.filter($"l_quantity" > 45).select($"l_suppkey")
    val b = t.lineitem.filter($"l_discount" > 0.08).select($"l_suppkey")
    val ex = a.exceptAll(b).groupBy($"l_suppkey").agg(count(lit(1)).as("n_except_all"))
    val in = a.intersectAll(b).groupBy($"l_suppkey").agg(count(lit(1)).as("n_intersect_all"))
    ex.join(in, Seq("l_suppkey"), "full_outer")
      .select($"l_suppkey",
        coalesce($"n_except_all", lit(0L)).as("n_except_all"),
        coalesce($"n_intersect_all", lit(0L)).as("n_intersect_all"))
      .orderBy($"l_suppkey")
  }

  val q52Oracle: String =
    """WITH ex AS (
         SELECT l_suppkey, COUNT(*) AS n_except_all FROM (
           SELECT l_suppkey FROM lineitem WHERE l_quantity > 45
           EXCEPT ALL
           SELECT l_suppkey FROM lineitem WHERE l_discount > 0.08)
         GROUP BY l_suppkey),
       i AS (
         SELECT l_suppkey, COUNT(*) AS n_intersect_all FROM (
           SELECT l_suppkey FROM lineitem WHERE l_quantity > 45
           INTERSECT ALL
           SELECT l_suppkey FROM lineitem WHERE l_discount > 0.08)
         GROUP BY l_suppkey)
       SELECT COALESCE(ex.l_suppkey, i.l_suppkey) AS l_suppkey,
              COALESCE(n_except_all, 0)::BIGINT AS n_except_all,
              COALESCE(n_intersect_all, 0)::BIGINT AS n_intersect_all
       FROM ex FULL OUTER JOIN i ON ex.l_suppkey = i.l_suppkey
       ORDER BY l_suppkey"""

  /** Grouped least-squares fit (price ~ quantity) as exact integer moments:
    * slope = (nSxy - SxSy)/(nSxx - Sx^2) in milli-units — the deterministic
    * twin of regr_slope/regr_intercept, whose double reductions are
    * partial-agg-order dependent (same rationale as q40). Price in whole
    * dollars, and the x1000 is SPLIT across the division
    * (quot*1000 + rem*1000/d, exact) so every intermediate stays under
    * int64 through sf~1 — a naive (nSxy-SxSy)*1000 overflows at sf0.1.
    * All numerators here are positive (price rises with quantity), so
    * truncating DIV and // agree. */
  def q53LinReg(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .select($"l_returnflag",
        $"l_quantity".cast("long").as("x"),
        floor($"l_extendedprice").cast("long").as("y"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
      .withColumn("dnum", expr("n * sxy - sx * sy"))
      .withColumn("dden", expr("n * sxx - sx * sx"))
      .withColumn("slope_milli",
        expr("(dnum DIV dden) * 1000 + (dnum % dden) * 1000 DIV dden"))
      .select($"l_returnflag", $"n", $"slope_milli",
        expr("(sy - slope_milli * sx DIV 1000) DIV n").as("intercept_d"))
      .orderBy($"l_returnflag")
  }

  val q53Oracle: String =
    """WITH b AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
                  CAST(FLOOR(l_extendedprice) AS BIGINT) AS y FROM lineitem),
       m AS (SELECT l_returnflag, COUNT(*) AS n, SUM(x)::BIGINT AS sx,
                    SUM(y)::BIGINT AS sy, SUM(x * x)::BIGINT AS sxx,
                    SUM(x * y)::BIGINT AS sxy
             FROM b GROUP BY l_returnflag),
       d AS (SELECT l_returnflag, n, sx, sy,
                    (n * sxy - sx * sy)::BIGINT AS dnum,
                    (n * sxx - sx * sx)::BIGINT AS dden
             FROM m),
       s AS (SELECT l_returnflag, n, sx, sy,
                    ((dnum // dden) * 1000 + (dnum % dden) * 1000 // dden)::BIGINT AS slope_milli
             FROM d)
       SELECT l_returnflag, n, slope_milli,
              ((sy - slope_milli * sx // 1000) // n)::BIGINT AS intercept_d
       FROM s ORDER BY l_returnflag"""

  /** Value-position window family: first_value/last_value with IGNORE NULLS
    * and nth_value over a full-partition frame, on a deliberately nullable
    * measure (pending orders' prices are NULLed) — q14 covers lag/lead;
    * these are the frame-edge accessors. Unique (date, orderkey) ordering. */
  def q54ValueWindows(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT o_orderkey, o_orderpriority,
                FIRST_VALUE(v) IGNORE NULLS OVER w AS first_v,
                LAST_VALUE(v) IGNORE NULLS OVER w AS last_v,
                NTH_VALUE(v, 3) OVER w AS third_v
         FROM (SELECT o_orderkey, o_orderpriority, o_orderdate,
                      CASE WHEN o_orderstatus = 'P' THEN NULL
                           ELSE CAST(FLOOR(o_totalprice) AS BIGINT) END AS v
               FROM orders)
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_orderkey""")
  }

  val q54Oracle: String =
    """SELECT o_orderkey, o_orderpriority,
              FIRST_VALUE(v IGNORE NULLS) OVER w AS first_v,
              LAST_VALUE(v IGNORE NULLS) OVER w AS last_v,
              NTH_VALUE(v, 3) OVER w AS third_v
       FROM (SELECT o_orderkey, o_orderpriority, o_orderdate,
                    CASE WHEN o_orderstatus = 'P' THEN NULL
                         ELSE CAST(FLOOR(o_totalprice) AS BIGINT) END AS v
             FROM orders)
       WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ORDER BY o_orderkey"""

  /** GROUPING() flags on a rollup — the only way to distinguish subtotal
    * NULLs from data NULLs (q10/q11/q33 cover the shapes; this covers the
    * disambiguator). Two single-arg GROUPING() calls, portable to DuckDB. */
  def q55GroupingFlags(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
                COALESCE(o_orderpriority, 'ALL') AS priority,
                CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
                CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
                COUNT(*) AS n
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY g_status, g_priority, status, priority""")
  }

  val q55Oracle: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
              COALESCE(o_orderpriority, 'ALL') AS priority,
              CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
              CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
              COUNT(*) AS n
       FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
       ORDER BY g_status, g_priority, status, priority"""

  /** Error-safe (try_) function family: division by zero and bad casts
    * yield NULL instead of failing the job — the posture a 100 TB pipeline
    * needs for dirty data. The oracle emulates with CASE/TRY_CAST. */
  def q56TryFns(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT o_orderkey,
                TRY_DIVIDE(CAST(FLOOR(o_totalprice) AS BIGINT), o_orderkey % 5) AS safe_div,
                TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
                TRY_CAST(o_orderstatus AS BIGINT) AS status_num
         FROM orders WHERE o_orderkey <= 3000
         ORDER BY o_orderkey""")
  }

  val q56Oracle: String =
    """SELECT o_orderkey,
              CASE WHEN o_orderkey % 5 = 0 THEN NULL
                   ELSE CAST(FLOOR(o_totalprice) AS BIGINT) / (o_orderkey % 5)
              END AS safe_div,
              TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
              TRY_CAST(o_orderstatus AS BIGINT) AS status_num
       FROM orders WHERE o_orderkey <= 3000
       ORDER BY o_orderkey"""

  /** Generator NULL semantics: explode_outer keeps rows whose array is
    * empty (a plain explode silently drops them — a classic data-loss bug in
    * pipelines); parts with no >=6-letter word survive with a NULL word.
    * The oracle's twin is LEFT JOIN LATERAL unnest. */
  def q57ExplodeOuter(t: T): DataFrame = {
    import t.spark.implicits._
    t.part
      .select($"p_partkey",
        expr("regexp_extract_all(p_name, '[a-z]{6,}', 0)").as("ws"))
      .select($"p_partkey", explode_outer($"ws").as("word"))
      .groupBy($"p_partkey")
      .agg(count(lit(1)).as("n_rows"), count($"word").as("n_words"),
        min($"word").as("first_word"))
      .orderBy($"p_partkey")
  }

  val q57Oracle: String =
    """WITH e AS (SELECT p_partkey, regexp_extract_all(p_name, '[a-z]{6,}') AS ws FROM part),
       x AS (SELECT p_partkey, u.word
             FROM e LEFT JOIN LATERAL (SELECT unnest(ws) AS word) u ON TRUE)
       SELECT p_partkey, COUNT(*) AS n_rows, COUNT(word) AS n_words,
              MIN(word) AS first_word
       FROM x GROUP BY p_partkey ORDER BY p_partkey"""

  /** URL parsing (web-data curation staple): synthesize a URL per doc from
    * its source/id, then take it apart with parse_url — host, path, query
    * parameter. DuckDB has no parse_url, so the oracle reproduces the parts
    * from the same construction (the compare needs equal values, not equal
    * functions) — which is exactly what makes it a real check of parse_url's
    * component extraction. */
  def q58UrlFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.documents
      .withColumn("url", concat(lit("https://"), $"source", lit(".example.com/docs/"),
        $"doc_id", lit("?lang="), $"lang"))
      .select($"doc_id",
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY', 'lang')").as("lang_param"))
      .orderBy($"doc_id")
  }

  val q58Oracle: String =
    """SELECT doc_id,
              source || '.example.com' AS host,
              '/docs/' || doc_id AS path,
              lang AS lang_param
       FROM documents ORDER BY doc_id"""

  /** Edit distance (fuzzy matching): levenshtein is the same integer DP on
    * both engines. Distance from each part name to its type string plus a
    * same-brand near-name pair count at distance <= 4. */
  def q59EditDistance(t: T): DataFrame = {
    import t.spark.implicits._
    t.part
      .select($"p_partkey",
        levenshtein($"p_name", $"p_type").cast("long").as("name_type_dist"),
        levenshtein($"p_brand", lit("Brand#00")).cast("long").as("brand_dist"))
      .orderBy($"p_partkey")
  }

  val q59Oracle: String =
    """SELECT p_partkey,
              levenshtein(p_name, p_type)::BIGINT AS name_type_dist,
              levenshtein(p_brand, 'Brand#00')::BIGINT AS brand_dist
       FROM part ORDER BY p_partkey"""

  /** Higher-order map functions: transform_values, map_filter and
    * map_concat over the per-bucket event-type count map (q43 builds and
    * probes maps; this rewrites them). Output scalars only — the harness
    * can't hash map columns — so each map op is followed by a fold/probe. */
  def q60MapHigherOrder(t: T): DataFrame = {
    import t.spark.implicits._
    t.events
      .groupBy(($"user_id" % 10).as("user_bucket"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_bucket")
      .agg(map_from_entries(collect_list(struct($"event_type", $"n"))).as("m"))
      .select($"user_bucket",
        // transform_values: double every count, then fold to a sum
        expr("aggregate(map_values(transform_values(m, (k, v) -> v * 2)), 0L, (a, x) -> a + x)")
          .as("doubled_total"),
        // map_filter: keep only heavy types, count survivors
        size(expr("map_filter(m, (k, v) -> v >= 190)")).cast("long").as("n_heavy"),
        // map_concat with a sentinel entry, probed back out
        element_at(expr("map_concat(m, map('sentinel', -1L))"), "sentinel").as("sentinel"))
      .orderBy($"user_bucket")
  }

  val q60Oracle: String =
    """SELECT user_id % 10 AS user_bucket,
              (SUM(cnt) * 2)::BIGINT AS doubled_total,
              SUM(CASE WHEN cnt >= 190 THEN 1 ELSE 0 END)::BIGINT AS n_heavy,
              -1::BIGINT AS sentinel
       FROM (SELECT user_id % 10 AS user_id, event_type, COUNT(*) AS cnt
             FROM events GROUP BY 1, 2)
       GROUP BY 1 ORDER BY user_bucket"""

  /** EXISTS / NOT EXISTS correlated subqueries (SQL surface): customers
    * with at least one large order and no urgent ones. Catalyst rewrites
    * both to semi/anti hash joins on o_custkey — one shuffle each, the same
    * plan the q08/q09 DataFrame formulations produce. */
  def q61ExistsSubquery(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT c_custkey, c_mktsegment FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""")
  }

  val q61Oracle: String =
    """SELECT c_custkey, c_mktsegment FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderpriority = '1-URGENT')
       ORDER BY c_custkey"""

  /** Equi-width histogram by integer bucketing — floor BEFORE the integer
    * divide (Spark CAST truncates where DuckDB rounds; floor agrees). One
    * partial+final aggregate on a 10-value key. */
  def q62Histogram(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders
      .select(expr("floor(o_totalprice) DIV 50000").as("bucket"),
        expr("floor(o_totalprice)").as("fp"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_orders"), sum($"fp").as("floor_price_sum"))
      .orderBy($"bucket")
  }

  val q62Oracle: String =
    """SELECT floor(o_totalprice)::BIGINT // 50000 AS bucket,
              COUNT(*) AS n_orders,
              SUM(floor(o_totalprice)::BIGINT)::BIGINT AS floor_price_sum
       FROM orders GROUP BY 1 ORDER BY bucket"""

  /** Bitwise scalar functions: shifts, and/or/xor, population count.
    * (`^` is xor in Spark SQL but power in DuckDB — the oracle uses
    * xor().) */
  def q63Bitwise(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders
      .select($"o_orderkey",
        expr("shiftleft(o_orderkey & 255, 3)").as("shl"),
        expr("shiftright(o_orderkey, 4)").as("shr"),
        expr("o_orderkey ^ 12345").as("xored"),
        expr("o_orderkey | 1024").as("ored"),
        bit_count($"o_orderkey").cast("long").as("popcount"))
      .orderBy($"o_orderkey")
  }

  val q63Oracle: String =
    """SELECT o_orderkey,
              (o_orderkey & 255) << 3 AS shl,
              o_orderkey >> 4 AS shr,
              xor(o_orderkey, 12345) AS xored,
              o_orderkey | 1024 AS ored,
              bit_count(o_orderkey)::BIGINT AS popcount
       FROM orders ORDER BY o_orderkey"""

  /** Radix / encoding scalar functions: hex, binary, base64, ascii/chr.
    * Spark's hex() and DuckDB's agree (uppercase, no leading zeros). */
  def q64Encode(t: T): DataFrame = {
    import t.spark.implicits._
    t.customer
      .select($"c_custkey",
        hex($"c_custkey").as("k_hex"),
        bin($"c_custkey").as("k_bin"),
        expr("base64(cast(c_name AS binary))").as("name_b64"),
        ascii($"c_mktsegment").cast("long").as("seg_ascii"),
        expr("char(65 + c_custkey % 26)").as("bucket_chr"))
      .orderBy($"c_custkey")
  }

  val q64Oracle: String =
    """SELECT c_custkey,
              hex(c_custkey) AS k_hex,
              bin(c_custkey) AS k_bin,
              to_base64(encode(c_name)) AS name_b64,
              ascii(c_mktsegment)::BIGINT AS seg_ascii,
              chr((65 + c_custkey % 26)::INT) AS bucket_chr
       FROM customer ORDER BY c_custkey"""

  /** Field extraction + trim family: split_part, TRIM(LEADING ...),
    * left/right, repeat. */
  def q65SplitTrim(t: T): DataFrame = {
    import t.spark.implicits._
    t.customer
      .select($"c_custkey",
        expr("split_part(c_name, '#', 2)").as("id_digits"),
        expr("trim(LEADING '0' FROM split_part(c_name, '#', 2))").as("id_stripped"),
        expr("left(c_mktsegment, 4)").as("seg_l"),
        expr("right(c_mktsegment, 4)").as("seg_r"),
        expr("repeat(left(c_mktsegment, 1), 3)").as("seg_rep"))
      .orderBy($"c_custkey")
  }

  val q65Oracle: String =
    """SELECT c_custkey,
              split_part(c_name, '#', 2) AS id_digits,
              ltrim(split_part(c_name, '#', 2), '0') AS id_stripped,
              left(c_mktsegment, 4) AS seg_l,
              right(c_mktsegment, 4) AS seg_r,
              repeat(left(c_mktsegment, 1), 3) AS seg_rep
       FROM customer ORDER BY c_custkey"""

  /** Array set algebra: union/intersect/except/position/overlap on
    * per-row generated ranges (scalar outputs only — the harness can't
    * hash array columns). Spark sequence(a,b) is inclusive = DuckDB
    * range(a,b+1). */
  def q66ArraySetOps(t: T): DataFrame = {
    import t.spark.implicits._
    t.part
      .withColumn("a", expr("sequence(cast(p_size AS bigint), cast(p_size AS bigint) + 4)"))
      .withColumn("b", expr("sequence(cast(p_size AS bigint) + 3, cast(p_size AS bigint) + 9)"))
      .select($"p_partkey",
        size(expr("array_union(a, b)")).cast("long").as("n_union"),
        size(expr("array_intersect(a, b)")).cast("long").as("n_intersect"),
        size(expr("array_except(a, b)")).cast("long").as("n_except"),
        expr("element_at(array_except(a, b), 1)").as("first_except"),
        expr("array_position(b, cast(p_size AS bigint) + 4)").as("pos_in_b"),
        expr("arrays_overlap(a, b)").as("overlaps"),
        expr("aggregate(slice(sequence(1, p_size % 7 + 5), 2, 3), 0L, (acc, x) -> acc + x)")
          .as("slice_sum"))
      .orderBy($"p_partkey")
  }

  val q66Oracle: String =
    """SELECT p_partkey,
              len(list_distinct(a || b))::BIGINT AS n_union,
              len(list_intersect(a, b))::BIGINT AS n_intersect,
              len(list_filter(a, x -> NOT list_contains(b, x)))::BIGINT AS n_except,
              list_filter(a, x -> NOT list_contains(b, x))[1]::BIGINT AS first_except,
              list_position(b, p_size + 4)::BIGINT AS pos_in_b,
              list_has_any(a, b) AS overlaps,
              list_sum(list_slice(range(1, p_size % 7 + 6), 2, 4))::BIGINT AS slice_sum
       FROM (SELECT p_partkey, p_size,
               range(p_size::BIGINT, p_size::BIGINT + 5) AS a,
               range(p_size::BIGINT + 3, p_size::BIGINT + 10) AS b
             FROM part)
       ORDER BY p_partkey"""

  /** Date arithmetic: day/month offsets (add_months clamps to month end,
    * as does DuckDB's +INTERVAL MONTH), last_day, weekday, datediff. Date
    * outputs cast to TIMESTAMP on both sides — pandas renders DuckDB DATE
    * as datetime64 but parquet DATE as date objects, which breaks the
    * fetch-path hash (q38 lesson). */
  def q67DateArith(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders
      .withColumn("od", $"o_orderdate".cast("date"))
      .select($"o_orderkey",
        expr("cast(date_add(od, 30) AS timestamp)").as("plus_30d"),
        expr("cast(add_months(od, 3) AS timestamp)").as("plus_3m"),
        expr("cast(last_day(od) AS timestamp)").as("month_end"),
        expr("cast(weekday(od) AS bigint)").as("dow"),
        expr("cast(datediff(od, date'1995-01-01') AS bigint)").as("days_since_epoch"))
      .orderBy($"o_orderkey")
  }

  val q67Oracle: String =
    """SELECT o_orderkey,
              (od + INTERVAL 30 DAY)::TIMESTAMP AS plus_30d,
              (od + INTERVAL 3 MONTH)::TIMESTAMP AS plus_3m,
              last_day(od)::TIMESTAMP AS month_end,
              (isodow(od) - 1)::BIGINT AS dow,
              datediff('day', DATE '1995-01-01', od)::BIGINT AS days_since_epoch
       FROM (SELECT o_orderkey, o_orderdate::DATE AS od FROM orders)
       ORDER BY o_orderkey"""

  /** NULL semantics: nullif-injected nulls, a null-safe (`<=>` /
    * IS NOT DISTINCT FROM) dimension join where the NULL dim row really
    * matches, null-skipping COUNT(col), coalesce bucketing. */
  def q68NullSafe(t: T): DataFrame = {
    import t.spark.implicits._
    val dim = Seq(Some("F"), Some("P"), Option.empty[String]).toDF("v")
    t.orders
      .withColumn("nstat", expr("nullif(o_orderstatus, 'O')"))
      .join(dim, $"nstat" <=> $"v")
      .groupBy(coalesce($"v", lit("<null>")).as("status_bucket"))
      .agg(count(lit(1)).as("n_orders"),
        count($"nstat").as("n_nonnull"),
        max(expr("nvl(nstat, 'zz')")).as("probe"))
      .orderBy($"status_bucket")
  }

  val q68Oracle: String =
    """WITH o AS (SELECT nullif(o_orderstatus, 'O') AS nstat FROM orders),
       dim(v) AS (VALUES ('F'), ('P'), (NULL))
       SELECT COALESCE(v, '<null>') AS status_bucket, COUNT(*) AS n_orders,
              COUNT(nstat) AS n_nonnull,
              MAX(COALESCE(nstat, 'zz')) AS probe
       FROM o JOIN dim ON o.nstat IS NOT DISTINCT FROM dim.v
       GROUP BY 1 ORDER BY status_bucket"""

  /** greatest/least across columns + the least(greatest(...)) clamp idiom
    * (both engines ignore NULLs in greatest/least — verified). */
  def q69GreatestLeast(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
        greatest(expr("floor(l_quantity)"), $"l_linenumber".cast("long"), lit(10L)).as("g"),
        least(expr("floor(l_quantity)"), $"l_linenumber".cast("long")).as("l"),
        least(greatest(expr("floor(l_extendedprice)"), lit(1000L)), lit(50000L)).as("price_clamped"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val q69Oracle: String =
    """SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
              greatest(floor(l_quantity)::BIGINT, l_linenumber::BIGINT, 10) AS g,
              least(floor(l_quantity)::BIGINT, l_linenumber::BIGINT) AS l,
              least(greatest(floor(l_extendedprice)::BIGINT, 1000), 50000) AS price_clamped
       FROM lineitem ORDER BY l_orderkey, l_linenumber"""

  /** Character-substitution family: translate, replace, repeat, md5. */
  def q70Translate(t: T): DataFrame = {
    import t.spark.implicits._
    t.part
      .select($"p_partkey",
        translate($"p_name", "aeiou", "AEIOU").as("tname"),
        regexp_replace($"p_type", "E", "3").as("ltype"),
        expr("repeat(p_brand, 2)").as("b2"),
        md5($"p_name").as("name_md5"))
      .orderBy($"p_partkey")
  }

  val q70Oracle: String =
    """SELECT p_partkey,
              translate(p_name, 'aeiou', 'AEIOU') AS tname,
              replace(p_type, 'E', '3') AS ltype,
              repeat(p_brand, 2) AS b2,
              md5(p_name) AS name_md5
       FROM part ORDER BY p_partkey"""

  /** stack() row-generator (pivot-longer over aggregate columns) joined to
    * an inline VALUES dimension — the two table-constructor surfaces. */
  def q71StackValues(t: T): DataFrame = {
    import t.spark.implicits._
    val dim = Seq(("rev", "revenue"), ("qty", "quantity"), ("n", "line_count"))
      .toDF("metric", "label")
    t.lineitem
      .groupBy($"l_returnflag")
      .agg(sum(expr("floor(l_extendedprice)")).as("rev"),
        sum(expr("floor(l_quantity)")).as("qty"),
        count(lit(1)).as("n"))
      .selectExpr("l_returnflag",
        "stack(3, 'rev', rev, 'qty', qty, 'n', n) AS (metric, val)")
      .join(broadcast(dim), "metric")
      .select($"l_returnflag", $"metric", $"label", $"val")
      .orderBy($"l_returnflag", $"metric")
  }

  val q71Oracle: String =
    """WITH agg AS (
         SELECT l_returnflag,
                SUM(floor(l_extendedprice)::BIGINT)::BIGINT AS rev,
                SUM(floor(l_quantity)::BIGINT)::BIGINT AS qty,
                COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag),
       longf AS (
         SELECT l_returnflag, 'rev' AS metric, rev AS val FROM agg
         UNION ALL SELECT l_returnflag, 'qty', qty FROM agg
         UNION ALL SELECT l_returnflag, 'n', n FROM agg),
       dim(metric, label) AS (VALUES ('rev', 'revenue'), ('qty', 'quantity'),
                                     ('n', 'line_count'))
       SELECT l_returnflag, metric, label, val
       FROM longf JOIN dim USING (metric)
       ORDER BY l_returnflag, metric"""

  /** posexplode: generator with element ordinals (0-based in Spark; the
    * DuckDB twin indexes the list explicitly). */
  def q72Posexplode(t: T): DataFrame = {
    import t.spark.implicits._
    t.part
      .select($"p_partkey", posexplode(split($"p_name", " ")).as(Seq("pos", "word")))
      .select($"p_partkey", $"pos".cast("long").as("pos"), $"word",
        length($"word").cast("long").as("word_len"))
      .orderBy($"p_partkey", $"pos")
  }

  val q72Oracle: String =
    """SELECT p_partkey, i - 1 AS pos, ts[i::INT] AS word,
              length(ts[i::INT])::BIGINT AS word_len
       FROM (SELECT p_partkey, string_split(p_name, ' ') AS ts FROM part),
            range(1, 100) t(i)
       WHERE i <= len(ts)
       ORDER BY p_partkey, pos"""

  /** str_to_map: delimited key=value text -> map, probed back to scalars. */
  def q73StrToMap(t: T): DataFrame = {
    import t.spark.implicits._
    t.documents
      .withColumn("m",
        expr("str_to_map(concat('lang=', lang, '&src=', source, '&len=', n_chars), '&', '=')"))
      .select($"doc_id",
        element_at($"m", "lang").as("m_lang"),
        element_at($"m", "src").as("m_src"),
        element_at($"m", "len").cast("long").as("m_len"),
        size($"m").cast("long").as("n_keys"))
      .orderBy($"doc_id")
  }

  val q73Oracle: String =
    """SELECT doc_id,
              split_part(kv[1], '=', 2) AS m_lang,
              split_part(kv[2], '=', 2) AS m_src,
              split_part(kv[3], '=', 2)::BIGINT AS m_len,
              len(kv)::BIGINT AS n_keys
       FROM (SELECT doc_id,
               string_split('lang=' || lang || '&src=' || source || '&len=' || n_chars,
                            '&') AS kv
             FROM documents)
       ORDER BY doc_id"""

  /** printf-style formatting: %s, zero-padded %05d, lowercase hex %x
    * (Spark's format_string is Java String.format; DuckDB printf agrees
    * on these verbs). */
  def q74FormatString(t: T): DataFrame = {
    import t.spark.implicits._
    t.customer
      .select($"c_custkey",
        format_string("%s-%05d-%x", $"c_mktsegment", $"c_custkey", $"c_custkey")
          .as("formatted"))
      .orderBy($"c_custkey")
  }

  val q74Oracle: String =
    """SELECT c_custkey, printf('%s-%05d-%x', c_mktsegment, c_custkey, c_custkey) AS formatted
       FROM customer ORDER BY c_custkey"""

  /** Date-series generation: sequence(start, end, interval) exploded to a
    * per-month activity spine (the gap-free calendar q38 fills against,
    * here generated per row and re-aggregated). */
  def q75DateSeries(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders
      .withColumn("m0", expr("date_trunc('month', cast(o_orderdate AS date))"))
      .select(explode(expr(
        "sequence(cast(m0 AS date), cast(add_months(m0, 2) AS date), interval 1 month)"))
        .as("month"))
      .groupBy($"month".cast("timestamp").as("month"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy($"month")
  }

  val q75Oracle: String =
    """SELECT m::TIMESTAMP AS month, COUNT(*) AS n_active
       FROM (SELECT unnest(generate_series(date_trunc('month', o_orderdate::DATE),
                      date_trunc('month', o_orderdate::DATE) + INTERVAL 2 MONTH,
                      INTERVAL 1 MONTH)) AS m
             FROM orders)
       GROUP BY 1 ORDER BY month"""

  /** overlay + substring-position functions (DuckDB lacks overlay; the
    * twin splices with substr concatenation). */
  def q76Overlay(t: T): DataFrame = {
    import t.spark.implicits._
    t.part
      .select($"p_partkey",
        expr("overlay(p_name PLACING 'XX' FROM 3)").as("spliced"),
        expr("cast(locate('e', p_name) AS bigint)").as("first_e"),
        expr("cast(instr(p_name, 'id') AS bigint)").as("id_at"),
        expr("cast(position('t' IN p_type) AS bigint)").as("t_in_type"))
      .orderBy($"p_partkey")
  }

  val q76Oracle: String =
    """SELECT p_partkey,
              substr(p_name, 1, 2) || 'XX' || substr(p_name, 5) AS spliced,
              strpos(p_name, 'e')::BIGINT AS first_e,
              instr(p_name, 'id')::BIGINT AS id_at,
              position('t' IN p_type)::BIGINT AS t_in_type
       FROM part ORDER BY p_partkey"""

  /** Cryptographic digest functions (content addressing / cache keys):
    * md5 + sha2-256, full and truncated forms. Both engines emit lowercase
    * hex of the standard algorithms. */
  def q77HashFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.documents
      .select($"doc_id",
        md5($"text").as("h_md5"),
        sha2($"text".cast("binary"), 256).as("h_sha256"),
        substring(sha2($"text".cast("binary"), 256), 1, 16).as("h_short"),
        length(md5($"text")).cast("long").as("md5_len"))
      .orderBy($"doc_id")
  }

  val q77Oracle: String =
    """SELECT doc_id,
              md5(text) AS h_md5,
              sha256(text) AS h_sha256,
              substr(sha256(text), 1, 16) AS h_short,
              length(md5(text))::BIGINT AS md5_len
       FROM documents ORDER BY doc_id"""

  /** Ordered funnel analysis: view -> click -> purchase, each stage's
    * timestamp strictly after the previous stage's FIRST occurrence. Three
    * conditional-min aggregations, each joined back to the (already
    * user-partitioned) event stream — every shuffle is on user_id, so the
    * whole funnel is one partitioning reused across stages at any scale. */
  def q78Funnel(t: T): DataFrame = {
    import t.spark.implicits._
    val ev = t.events.select($"user_id", $"event_type", $"ts")
    val v = ev.groupBy($"user_id")
      .agg(min(when($"event_type" === "view", $"ts")).as("tv"))
    val c = ev.join(v, "user_id")
      .groupBy($"user_id", $"tv")
      .agg(min(when($"event_type" === "click" && $"ts" > $"tv", $"ts")).as("tc"))
    val p = ev.join(c, "user_id")
      .groupBy($"user_id", $"tv", $"tc")
      .agg(min(when($"event_type" === "purchase" && $"ts" > $"tc", $"ts")).as("tp"))
    p.agg(
      count(lit(1)).as("n_users"),
      count($"tv").as("n_view"),
      count($"tc").as("n_view_click"),
      count($"tp").as("n_view_click_purchase"))
  }

  val q78Oracle: String =
    """WITH v AS (
         SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS tv
         FROM events GROUP BY user_id),
       c AS (
         SELECT e.user_id, v.tv,
                MIN(CASE WHEN e.event_type = 'click' AND e.ts > v.tv THEN e.ts END) AS tc
         FROM events e JOIN v ON v.user_id = e.user_id
         GROUP BY e.user_id, v.tv),
       p AS (
         SELECT e.user_id, c.tv, c.tc,
                MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > c.tc THEN e.ts END) AS tp
         FROM events e JOIN c ON c.user_id = e.user_id
         GROUP BY e.user_id, c.tv, c.tc)
       SELECT COUNT(*) AS n_users, COUNT(tv) AS n_view,
              COUNT(tc) AS n_view_click, COUNT(tp) AS n_view_click_purchase
       FROM p"""

  /** Cohort retention: users grouped by first-activity day, distinct active
    * users per (cohort_day, day_offset). The cohort assignment is one
    * aggregate + join on user_id; the retention matrix is one
    * count-distinct on (cohort, offset) — both scale-flat shapes. */
  def q79CohortRetention(t: T): DataFrame = {
    import t.spark.implicits._
    val ev = t.events.select($"user_id", expr("date_trunc('day', ts)").as("day"))
    val cohort = ev.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    ev.join(cohort, "user_id")
      .select($"cohort_day",
        expr("cast(datediff(cast(day AS date), cast(cohort_day AS date)) AS bigint)").as("day_offset"),
        $"user_id")
      .groupBy($"cohort_day", $"day_offset")
      .agg(countDistinct($"user_id").as("n_active"))
      .orderBy($"cohort_day", $"day_offset")
  }

  val q79Oracle: String =
    """WITH ev AS (SELECT user_id, date_trunc('day', ts) AS day FROM events),
       cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
       SELECT cohort_day::TIMESTAMP AS cohort_day,
              datediff('day', cohort_day::DATE, day::DATE)::BIGINT AS day_offset,
              COUNT(DISTINCT user_id) AS n_active
       FROM ev JOIN cohort USING (user_id)
       GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""

  /** Event-type transition matrix (first-order Markov counts): per-user
    * event streams ordered by time, lag-paired, counted per (from, to) with
    * row-share in basis points. One window shuffle on user_id + one small
    * aggregate — the path-analysis primitive behind session flow reports.
    * Ties in ts are broken by event_id so the lag pairing is total-ordered
    * and cross-engine identical. */
  def q80Transitions(t: T): DataFrame = {
    import t.spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val paired = t.events
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
    paired
      .groupBy($"prev_type".as("from_type"), $"event_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum($"n").over(Window.partitionBy($"from_type")))
      .select($"from_type", $"to_type", $"n",
        expr("n * 10000 DIV row_total").as("share_bp"))
      .orderBy($"from_type", $"to_type")
  }

  val q80Oracle: String =
    """WITH paired AS (
         SELECT user_id, event_type,
                LAG(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_type
         FROM events),
       counted AS (
         SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
         FROM paired WHERE prev_type IS NOT NULL
         GROUP BY 1, 2)
       SELECT from_type, to_type, n,
              (n * 10000 // SUM(n) OVER (PARTITION BY from_type))::BIGINT AS share_bp
       FROM counted ORDER BY from_type, to_type"""

  /** Spark 4 VARIANT ingestion: parse_json into the binary semi-structured
    * type, typed path extraction with variant_get, missing-path NULL
    * semantics. The VARIANT stays columnar/binary end to end (no
    * re-parse per access), which is the modern engine's answer to
    * string-JSON hot paths like q23's. */
  def q81Variant(t: T): DataFrame = {
    import t.spark.implicits._
    t.events
      .withColumn("v", expr("parse_json(props)"))
      .select($"event_id",
        expr("variant_get(v, '$.k', 'bigint')").as("vk"),
        coalesce(expr("variant_get(v, '$.missing', 'bigint')"), lit(-1L)).as("v_missing"),
        expr("cast(is_variant_null(variant_get(v, '$.k')) AS boolean)").as("k_is_null"))
      .orderBy($"event_id")
  }

  val q81Oracle: String =
    """SELECT event_id,
              json_extract(props, '$.k')::BIGINT AS vk,
              COALESCE(json_extract(props, '$.missing')::BIGINT, -1) AS v_missing,
              (json_extract(props, '$.k') = 'null'::JSON) AS k_is_null
       FROM events ORDER BY event_id"""

  /** All queries in this module, keyed for SparkEntry. */
  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_percentiles"      -> ((s, d) => q39Percentiles(T(s, d))),
    "q01_pricing_summary"  -> ((s, d) => q01PricingSummary(T(s, d))),
    "q02_filter_project"   -> ((s, d) => q02FilterProject(T(s, d))),
    "q03_segment_revenue"  -> ((s, d) => q03SegmentRevenue(T(s, d))),
    "q04_order_priority"   -> ((s, d) => q04OrderPriority(T(s, d))),
    "q05_region_revenue"   -> ((s, d) => q05RegionRevenue(T(s, d))),
    "q06_forecast_revenue" -> ((s, d) => q06ForecastRevenue(T(s, d))),
    "q07_left_outer"       -> ((s, d) => q07LeftOuter(T(s, d))),
    "q08_semi_join"        -> ((s, d) => q08SemiJoin(T(s, d))),
    "q09_anti_join"        -> ((s, d) => q09AntiJoin(T(s, d))),
    "q10_rollup"           -> ((s, d) => q10Rollup(T(s, d))),
    "q11_cube"             -> ((s, d) => q11Cube(T(s, d))),
    "q12_window_rank"      -> ((s, d) => q12WindowRank(T(s, d))),
    "q13_window_running"   -> ((s, d) => q13WindowRunning(T(s, d))),
    "q14_window_lag_lead"  -> ((s, d) => q14WindowLagLead(T(s, d))),
    "q15_top_k"            -> ((s, d) => q15TopK(T(s, d))),
    "q16_set_ops"          -> ((s, d) => q16SetOps(T(s, d))),
    "q17_intersect"        -> ((s, d) => q17Intersect(T(s, d))),
    "q18_distinct"         -> ((s, d) => q18Distinct(T(s, d))),
    "q19_string_fns"       -> ((s, d) => q19StringFns(T(s, d))),
    "q20_date_fns"         -> ((s, d) => q20DateFns(T(s, d))),
    "q21_math_fns"         -> ((s, d) => q21MathFns(T(s, d))),
    "q22_case_when"        -> ((s, d) => q22CaseWhen(T(s, d))),
    "q23_json_fns"         -> ((s, d) => q23JsonFns(T(s, d))),
    "q24_in_subquery"      -> ((s, d) => q24InSubquery(T(s, d))),
    "q25_scalar_subquery"  -> ((s, d) => q25ScalarSubquery(T(s, d))),
    "q26_correlated_subq"  -> ((s, d) => q26CorrelatedSubquery(T(s, d))),
    "q27_having"           -> ((s, d) => q27Having(T(s, d))),
    "q28_pivot"            -> ((s, d) => q28Pivot(T(s, d))),
    "q29_range_join"       -> ((s, d) => q29RangeJoin(T(s, d))),
    "q30_asof_join"        -> ((s, d) => q30AsOfJoin(T(s, d))),
    "q31_top_per_group"    -> ((s, d) => q31TopPerGroup(T(s, d))),
    "q32_full_outer"       -> ((s, d) => q32FullOuter(T(s, d))),
    "q33_grouping_sets"    -> ((s, d) => q33GroupingSets(T(s, d))),
    "q34_count_distinct"   -> ((s, d) => q34CountDistinct(T(s, d))),
    "q35_window_ranks"     -> ((s, d) => q35WindowRanks(T(s, d))),
    "q36_listagg"          -> ((s, d) => q36ListAgg(T(s, d))),
    "q37_from_json"        -> ((s, d) => q37FromJson(T(s, d))),
    "q38_gap_fill"         -> ((s, d) => q38GapFill(T(s, d))),
    "q40_stats_aggs"       -> ((s, d) => q40StatsAggs(T(s, d))),
    "q41_lateral_join"     -> ((s, d) => q41LateralJoin(T(s, d))),
    "q42_array_fns"        -> ((s, d) => q42ArrayFns(T(s, d))),
    "q43_map_fns"          -> ((s, d) => q43MapFns(T(s, d))),
    "q44_unpivot"          -> ((s, d) => q44Unpivot(T(s, d))),
    "q45_ntile_family"     -> ((s, d) => q45NtileFamily(T(s, d))),
    "q46_regexp_extract"   -> ((s, d) => q46RegexpExtractAll(T(s, d))),
    "q47_arg_max"          -> ((s, d) => q47ArgMax(T(s, d))),
    "q48_bool_bit_aggs"    -> ((s, d) => q48BoolBitAggs(T(s, d))),
    "q49_median"           -> ((s, d) => q49Median(T(s, d))),
    "q50_merge_upsert"     -> ((s, d) => q50MergeUpsert(T(s, d))),
    "q51_range_frame"      -> ((s, d) => q51RangeFrame(T(s, d))),
    "q52_set_ops_all"      -> ((s, d) => q52SetOpsAll(T(s, d))),
    "q53_linreg"           -> ((s, d) => q53LinReg(T(s, d))),
    "q54_value_windows"    -> ((s, d) => q54ValueWindows(T(s, d))),
    "q55_grouping_flags"   -> ((s, d) => q55GroupingFlags(T(s, d))),
    "q56_try_fns"          -> ((s, d) => q56TryFns(T(s, d))),
    "q57_explode_outer"    -> ((s, d) => q57ExplodeOuter(T(s, d))),
    "q58_url_fns"          -> ((s, d) => q58UrlFns(T(s, d))),
    "q59_edit_distance"    -> ((s, d) => q59EditDistance(T(s, d))),
    "q60_map_higher_order" -> ((s, d) => q60MapHigherOrder(T(s, d))),
    "q61_exists_subquery"  -> ((s, d) => q61ExistsSubquery(T(s, d))),
    "q62_histogram"        -> ((s, d) => q62Histogram(T(s, d))),
    "q63_bitwise"          -> ((s, d) => q63Bitwise(T(s, d))),
    "q64_encode"           -> ((s, d) => q64Encode(T(s, d))),
    "q65_split_trim"       -> ((s, d) => q65SplitTrim(T(s, d))),
    "q66_array_set_ops"    -> ((s, d) => q66ArraySetOps(T(s, d))),
    "q67_date_arith"       -> ((s, d) => q67DateArith(T(s, d))),
    "q68_null_safe"        -> ((s, d) => q68NullSafe(T(s, d))),
    "q69_greatest_least"   -> ((s, d) => q69GreatestLeast(T(s, d))),
    "q70_translate"        -> ((s, d) => q70Translate(T(s, d))),
    "q71_stack_values"     -> ((s, d) => q71StackValues(T(s, d))),
    "q72_posexplode"       -> ((s, d) => q72Posexplode(T(s, d))),
    "q73_str_to_map"       -> ((s, d) => q73StrToMap(T(s, d))),
    "q74_format_string"    -> ((s, d) => q74FormatString(T(s, d))),
    "q75_date_series"      -> ((s, d) => q75DateSeries(T(s, d))),
    "q76_overlay"          -> ((s, d) => q76Overlay(T(s, d))),
    "q77_hash_fns"         -> ((s, d) => q77HashFns(T(s, d))),
    "q78_funnel"           -> ((s, d) => q78Funnel(T(s, d))),
    "q79_cohort_retention" -> ((s, d) => q79CohortRetention(T(s, d))),
    "q80_transitions"      -> ((s, d) => q80Transitions(T(s, d))),
    "q81_variant"          -> ((s, d) => q81Variant(T(s, d))),
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary"  -> q01Oracle,
    "q02_filter_project"   -> q02Oracle,
    "q03_segment_revenue"  -> q03Oracle,
    "q04_order_priority"   -> q04Oracle,
    "q05_region_revenue"   -> q05Oracle,
    "q06_forecast_revenue" -> q06Oracle,
    "q07_left_outer"       -> q07Oracle,
    "q08_semi_join"        -> q08Oracle,
    "q09_anti_join"        -> q09Oracle,
    "q10_rollup"           -> q10Oracle,
    "q11_cube"             -> q11Oracle,
    "q12_window_rank"      -> q12Oracle,
    "q13_window_running"   -> q13Oracle,
    "q14_window_lag_lead"  -> q14Oracle,
    "q15_top_k"            -> q15Oracle,
    "q16_set_ops"          -> q16Oracle,
    "q17_intersect"        -> q17Oracle,
    "q18_distinct"         -> q18Oracle,
    "q19_string_fns"       -> q19Oracle,
    "q20_date_fns"         -> q20Oracle,
    "q21_math_fns"         -> q21Oracle,
    "q22_case_when"        -> q22Oracle,
    "q23_json_fns"         -> q23Oracle,
    "q24_in_subquery"      -> q24Oracle,
    "q25_scalar_subquery"  -> q25Oracle,
    "q26_correlated_subq"  -> q26Oracle,
    "q27_having"           -> q27Oracle,
    "q28_pivot"            -> q28Oracle,
    "q29_range_join"       -> q29Oracle,
    "q30_asof_join"        -> q30Oracle,
    "q31_top_per_group"    -> q31Oracle,
    "q32_full_outer"       -> q32Oracle,
    "q33_grouping_sets"    -> q33Oracle,
    "q34_count_distinct"   -> q34Oracle,
    "q35_window_ranks"     -> q35Oracle,
    "q36_listagg"          -> q36Oracle,
    "q37_from_json"        -> q37Oracle,
    "q38_gap_fill"         -> q38Oracle,
    "q39_percentiles"      -> q39Oracle,
    "q40_stats_aggs"       -> q40Oracle,
    "q41_lateral_join"     -> q41Oracle,
    "q42_array_fns"        -> q42Oracle,
    "q43_map_fns"          -> q43Oracle,
    "q44_unpivot"          -> q44Oracle,
    "q45_ntile_family"     -> q45Oracle,
    "q46_regexp_extract"   -> q46Oracle,
    "q47_arg_max"          -> q47Oracle,
    "q48_bool_bit_aggs"    -> q48Oracle,
    "q49_median"           -> q49Oracle,
    "q50_merge_upsert"     -> q50Oracle,
    "q51_range_frame"      -> q51Oracle,
    "q52_set_ops_all"      -> q52Oracle,
    "q53_linreg"           -> q53Oracle,
    "q54_value_windows"    -> q54Oracle,
    "q55_grouping_flags"   -> q55Oracle,
    "q56_try_fns"          -> q56Oracle,
    "q57_explode_outer"    -> q57Oracle,
    "q58_url_fns"          -> q58Oracle,
    "q59_edit_distance"    -> q59Oracle,
    "q60_map_higher_order" -> q60Oracle,
    "q61_exists_subquery"  -> q61Oracle,
    "q62_histogram"        -> q62Oracle,
    "q63_bitwise"          -> q63Oracle,
    "q64_encode"           -> q64Oracle,
    "q65_split_trim"       -> q65Oracle,
    "q66_array_set_ops"    -> q66Oracle,
    "q67_date_arith"       -> q67Oracle,
    "q68_null_safe"        -> q68Oracle,
    "q69_greatest_least"   -> q69Oracle,
    "q70_translate"        -> q70Oracle,
    "q71_stack_values"     -> q71Oracle,
    "q72_posexplode"       -> q72Oracle,
    "q73_str_to_map"       -> q73Oracle,
    "q74_format_string"    -> q74Oracle,
    "q75_date_series"      -> q75Oracle,
    "q76_overlay"          -> q76Oracle,
    "q77_hash_fns"         -> q77Oracle,
    "q78_funnel"           -> q78Oracle,
    "q79_cohort_retention" -> q79Oracle,
    "q80_transitions"      -> q80Oracle,
    "q81_variant"          -> q81Oracle,
  )
}
