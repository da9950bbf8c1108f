package graft.operators

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 SQL-surface widening: scalar-function families the reference's
  * SQL clients rely on that q01-q81 did not yet exercise — delimiter-indexed
  * substrings, padding, arbitrary-base conversion, 1-based list dispatch,
  * calendar navigation, array/map editing, the regexp_* trio, checksum
  * validation (Luhn), and character-level string ops. All map-side scalar
  * projections (narrow, codegen'd, no shuffle beyond the output sort), so
  * the 100 TB story is just "columns in, columns out".
  *
  * Oracle notes (cross-engine, see graft memory rules): every derived
  * integer is cast to BIGINT on the DuckDB side; DATE-typed outputs are cast
  * to TIMESTAMP on BOTH sides (pandas renders DuckDB DATE asymmetrically);
  * DuckDB lacks substring_index / conv / elt / find_in_set / next_day /
  * initcap / luhn_check / regexp_instr, so the oracles state each function's
  * DEFINITION in list/str primitives — which doubles as documentation of the
  * exact semantics implemented.
  */
object SqlSurface {

  /** substring_index: split-join by delimiter with positive (first k) and
    * negative (last k) counts. */
  def q82SubstringIndex(t: T): DataFrame = {
    import t.spark.implicits._
    t.documents.filter($"doc_id" < 1000)
      .select($"doc_id",
        substring_index($"text", " ", 3).as("first3"),
        substring_index($"text", " ", -2).as("last2"))
      .orderBy($"doc_id")
  }

  val q82Oracle: String =
    """SELECT doc_id,
              array_to_string((str_split(text, ' '))[1:3], ' ') AS first3,
              array_to_string((str_split(text, ' '))[-2:], ' ') AS last2
       FROM documents WHERE doc_id < 1000 ORDER BY doc_id"""

  /** lpad / rpad / repeat, including lpad's truncation contract (result is
    * exactly len chars even when the input is longer). */
  def q83PadFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.part.filter($"p_partkey" < 2000)
      .select($"p_partkey",
        lpad($"p_partkey".cast("string"), 8, "0").as("key8"),
        rpad(substring($"p_name", 1, 5), 12, ".").as("name12"),
        lpad($"p_name", 3, "x").as("name_trunc3"),
        repeat(substring($"p_name", 1, 2), 3).as("rep3"))
      .orderBy($"p_partkey")
  }

  val q83Oracle: String =
    """SELECT p_partkey,
              lpad(p_partkey::VARCHAR, 8, '0') AS key8,
              rpad(substr(p_name, 1, 5), 12, '.') AS name12,
              lpad(p_name, 3, 'x') AS name_trunc3,
              repeat(substr(p_name, 1, 2), 3) AS rep3
       FROM part WHERE p_partkey < 2000 ORDER BY p_partkey"""

  /** conv(): arbitrary-base integer rendering (16 / 7 / 36) plus a 36->10
    * round-trip (DuckDB has no from-base, so the round-trip is asserted
    * against the decimal rendering). Spark conv uppercases digits >= A, as
    * does DuckDB to_base. */
  def q84ConvBases(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders.filter($"o_orderkey" < 5000)
      .select($"o_orderkey",
        conv($"o_orderkey".cast("string"), 10, 16).as("hex16"),
        conv($"o_orderkey".cast("string"), 10, 7).as("base7"),
        conv($"o_orderkey".cast("string"), 10, 36).as("base36"),
        conv(conv($"o_orderkey".cast("string"), 10, 36), 36, 10).as("rt10"))
      .orderBy($"o_orderkey")
  }

  val q84Oracle: String =
    """SELECT o_orderkey,
              to_base(o_orderkey, 16) AS hex16,
              to_base(o_orderkey, 7) AS base7,
              to_base(o_orderkey, 36) AS base36,
              o_orderkey::VARCHAR AS rt10
       FROM orders WHERE o_orderkey < 5000 ORDER BY o_orderkey"""

  /** elt (1-based variadic dispatch) and find_in_set (position in a
    * comma-separated list, 0 if absent). */
  def q85EltFindInSet(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders.filter($"o_orderkey" < 20000)
      .withColumn("idx", ($"o_orderkey" % 3 + 1).cast("int"))
      .select($"o_orderkey", $"idx".cast("long").as("idx"),
        expr("elt(idx, 'alpha', 'beta', 'gamma')").as("chosen"),
        expr("cast(find_in_set(elt(idx, 'alpha', 'beta', 'gamma'), 'alpha,beta,gamma') AS bigint)").as("pos"),
        expr("cast(find_in_set('missing', 'alpha,beta,gamma') AS bigint)").as("pos_missing"))
      .orderBy($"o_orderkey")
  }

  val q85Oracle: String =
    """SELECT o_orderkey,
              (o_orderkey % 3 + 1)::BIGINT AS idx,
              (['alpha', 'beta', 'gamma'])[(o_orderkey % 3 + 1)::INT] AS chosen,
              list_position(['alpha', 'beta', 'gamma'],
                (['alpha', 'beta', 'gamma'])[(o_orderkey % 3 + 1)::INT])::BIGINT AS pos,
              coalesce(list_position(['alpha', 'beta', 'gamma'], 'missing'), 0)::BIGINT AS pos_missing
       FROM orders WHERE o_orderkey < 20000 ORDER BY o_orderkey"""

  /** Calendar navigation: next_day (strictly-after next Monday), quarter
    * truncation, day name, day-of-year. */
  def q86CalendarFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders.filter($"o_orderkey" < 20000)
      .withColumn("od", $"o_orderdate".cast("date"))
      .select($"o_orderkey",
        expr("cast(next_day(od, 'MO') AS timestamp)").as("next_mon"),
        expr("cast(trunc(od, 'quarter') AS timestamp)").as("q_start"),
        date_format($"od", "EEEE").as("dayname"),
        dayofyear($"od").cast("long").as("doy"))
      .orderBy($"o_orderkey")
  }

  val q86Oracle: String =
    """SELECT o_orderkey,
              (o_orderdate::DATE + (CASE WHEN (8 - isodow(o_orderdate::DATE)) % 7 = 0
                  THEN 7 ELSE (8 - isodow(o_orderdate::DATE)) % 7 END) * INTERVAL 1 DAY)
                ::TIMESTAMP AS next_mon,
              date_trunc('quarter', o_orderdate::DATE)::TIMESTAMP AS q_start,
              strftime(o_orderdate::DATE, '%A') AS dayname,
              dayofyear(o_orderdate::DATE)::BIGINT AS doy
       FROM orders WHERE o_orderkey < 20000 ORDER BY o_orderkey"""

  /** Array editing: array_insert (1-based, inserts before the position),
    * append / prepend, and array_compact (null removal). Rendered through
    * concat_ws so the harness hashes scalars. */
  def q87ArrayEditFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders.filter($"o_orderkey" < 20000)
      .withColumn("arr", expr("sequence(1L, 1L + o_orderkey % 4)"))
      .select($"o_orderkey",
        concat_ws(",", expr("array_insert(arr, 2, 99L)")).as("ins2"),
        concat_ws(",", expr("array_append(arr, 0L)")).as("app"),
        concat_ws(",", expr("array_prepend(arr, -1L)")).as("pre"),
        concat_ws(",",
          expr("array_compact(transform(arr, x -> CASE WHEN x % 2 = 0 THEN NULL ELSE x END))"))
          .as("odds"))
      .orderBy($"o_orderkey")
  }

  val q87Oracle: String =
    """WITH b AS (SELECT o_orderkey, range(1, 2 + o_orderkey % 4) AS arr
                  FROM orders WHERE o_orderkey < 20000)
       SELECT o_orderkey,
              array_to_string(arr[1:1] || [99] || arr[2:], ',') AS ins2,
              array_to_string(arr || [0], ',') AS app,
              array_to_string([-1] || arr, ',') AS pre,
              array_to_string(list_filter(arr, x -> x % 2 = 1), ',') AS odds
       FROM b ORDER BY o_orderkey"""

  /** Map construction and pointwise combination: map_from_arrays +
    * map_zip_with + map_concat, exploded back to scalar rows for the
    * harness (the DuckDB twin states the same arithmetic relationally). */
  def q88MapBuildFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders.filter($"o_orderkey" < 5000)
      .withColumn("m1", expr("map_from_arrays(sequence(1L, 3L), transform(sequence(1L, 3L), k -> k * (1 + o_orderkey % 7)))"))
      .withColumn("m2", expr("map_from_arrays(sequence(1L, 3L), transform(sequence(1L, 3L), k -> k * k))"))
      .withColumn("mz", expr("map_zip_with(m1, m2, (k, a, b) -> a + b)"))
      .select($"o_orderkey", explode($"mz").as(Seq("k", "v")))
      .orderBy($"o_orderkey", $"k")
  }

  val q88Oracle: String =
    """SELECT o_orderkey, k::BIGINT AS k,
              (k * (1 + o_orderkey % 7) + k * k)::BIGINT AS v
       FROM orders, range(1, 4) t(k)
       WHERE o_orderkey < 5000 ORDER BY o_orderkey, k"""

  /** The regexp_* accessor trio: regexp_count / regexp_instr (1-based
    * position of first match, 0 if none) / regexp_substr (NULL if none). */
  def q89RegexpFamily(t: T): DataFrame = {
    import t.spark.implicits._
    t.documents.filter($"doc_id" < 1000)
      .select($"doc_id",
        expr("cast(regexp_count(text, 'ta[a-z]+') AS bigint)").as("n_ta"),
        expr("cast(regexp_instr(text, 'window') AS bigint)").as("pos_window"),
        expr("regexp_substr(text, 'me[a-z]+')").as("first_me"))
      .orderBy($"doc_id")
  }

  val q89Oracle: String =
    """SELECT doc_id,
              len(regexp_extract_all(text, 'ta[a-z]+'))::BIGINT AS n_ta,
              (CASE WHEN regexp_matches(text, 'window')
                    THEN len(str_split_regex(text, 'window')[1]) + 1 ELSE 0 END)::BIGINT AS pos_window,
              nullif(regexp_extract(text, 'me[a-z]+'), '') AS first_me
       FROM documents WHERE doc_id < 1000 ORDER BY doc_id"""

  /** Luhn checksum validation over zero-padded numeric ids — the standard
    * data-quality gate for account-number-shaped fields. The DuckDB twin
    * states the algorithm digit-by-digit (double every second digit from
    * the right, subtract 9 when > 9, valid iff the sum is divisible by 10). */
  def q90LuhnCheck(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders.filter($"o_orderkey" < 20000)
      .withColumn("acct", lpad($"o_orderkey".cast("string"), 8, "0"))
      .select($"o_orderkey", $"acct",
        expr("cast(CASE WHEN luhn_check(acct) THEN 1 ELSE 0 END AS bigint)").as("luhn_ok"))
      .orderBy($"o_orderkey")
  }

  val q90Oracle: String =
    """WITH b AS (SELECT o_orderkey, lpad(o_orderkey::VARCHAR, 8, '0') AS acct
                  FROM orders WHERE o_orderkey < 20000)
       SELECT o_orderkey, acct,
              (CASE WHEN list_sum(list_transform(range(1, len(acct) + 1), i ->
                 CASE WHEN i % 2 = 0
                      THEN (CASE WHEN 2 * (ascii(substr(reverse(acct), i::INT, 1)) - 48) > 9
                                 THEN 2 * (ascii(substr(reverse(acct), i::INT, 1)) - 48) - 9
                                 ELSE 2 * (ascii(substr(reverse(acct), i::INT, 1)) - 48) END)
                      ELSE ascii(substr(reverse(acct), i::INT, 1)) - 48 END)) % 10 = 0
                 THEN 1 ELSE 0 END)::BIGINT AS luhn_ok
       FROM b ORDER BY o_orderkey"""

  /** Character-level ops: initcap (word-capitalize), chr / ascii, left /
    * right. DuckDB has no initcap; the twin rebuilds it per word. */
  def q91CharFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.documents.filter($"doc_id" < 1000)
      .withColumn("head", substring($"text", 1, 30))
      .select($"doc_id",
        initcap($"head").as("title_head"),
        expr("chr(65 + doc_id % 26)").as("bucket_chr"),
        ascii($"text").cast("long").as("first_code"),
        expr("left(text, 4)").as("l4"),
        expr("right(text, 4)").as("r4"))
      .orderBy($"doc_id")
  }

  val q91Oracle: String =
    """SELECT doc_id,
              array_to_string(list_transform(str_split(substr(text, 1, 30), ' '),
                w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))), ' ') AS title_head,
              chr((65 + doc_id % 26)::INT) AS bucket_chr,
              ascii(substr(text, 1, 1))::BIGINT AS first_code,
              left(text, 4) AS l4,
              right(text, 4) AS r4
       FROM documents WHERE doc_id < 1000 ORDER BY doc_id"""

  /** width_bucket histogram bucketing (equi-width, with the SQL-standard
    * underflow bucket 0 and overflow bucket n+1). DuckDB lacks the function;
    * the twin states the definition arithmetically — identical IEEE ops on
    * identical doubles, so bucketing is cross-engine exact. */
  def q92WidthBucket(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .select(expr("width_bucket(l_quantity, 0, 50, 10)").as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("n"))
      .orderBy($"bucket")
  }

  val q92Oracle: String =
    """SELECT (CASE WHEN l_quantity < 0 THEN 0
                    WHEN l_quantity >= 50 THEN 11
                    ELSE FLOOR((l_quantity - 0) * 10 / (50 - 0)) + 1 END)::BIGINT AS bucket,
              COUNT(*) AS n
       FROM lineitem GROUP BY 1 ORDER BY bucket"""

  /** mask(): PII-shaped redaction — uppercase -> X, lowercase -> x,
    * digit -> n (default), plus a custom-replacement variant. The DuckDB
    * twin is the definition as chained global regexp_replace. */
  def q93MaskFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.documents.filter($"doc_id" < 1000)
      .withColumn("s", concat(upper(substring($"text", 1, 5)), lit("-"), $"doc_id".cast("string")))
      .select($"doc_id",
        expr("mask(s)").as("masked_default"),
        expr("mask(s, 'U', 'l', '9', '#')").as("masked_custom"))
      .orderBy($"doc_id")
  }

  val q93Oracle: String =
    """WITH b AS (SELECT doc_id, upper(substr(text, 1, 5)) || '-' || doc_id::VARCHAR AS s
                  FROM documents WHERE doc_id < 1000)
       SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(s,
                '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked_default,
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(s,
                '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '9', 'g'),
                '[^Ul9]', '#', 'g') AS masked_custom
       FROM b ORDER BY doc_id"""

  /** GROUP BY ALL / ORDER BY ALL: group and order by every non-aggregate
    * select item — the modern analyst-SQL shorthand both engines support
    * natively (grouping resolution is the capability under test; the
    * aggregate arithmetic is deliberately plain). */
  def q94GroupByAll(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
                COUNT(*) AS n,
                SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS total_floor
         FROM orders GROUP BY ALL ORDER BY ALL""")
  }

  val q94Oracle: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
              SUM(FLOOR(o_totalprice))::BIGINT AS total_floor
       FROM orders GROUP BY ALL ORDER BY ALL"""

  /** to_csv / from_csv round-trip: struct -> delimited line -> struct —
    * the schema'd escape hatch for line-oriented interchange. The DuckDB
    * twin states the rendering/parsing explicitly. */
  def q95CsvFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders.filter($"o_orderkey" < 5000)
      .withColumn("line",
        expr("to_csv(struct(o_orderkey, o_orderstatus, cast(floor(o_totalprice) AS bigint) AS p))"))
      .withColumn("back",
        expr("from_csv(line, 'k bigint, s string, p bigint')"))
      .select($"o_orderkey", $"line",
        $"back.k".as("rt_key"), $"back.s".as("rt_status"), $"back.p".as("rt_price"))
      .orderBy($"o_orderkey")
  }

  val q95Oracle: String =
    """SELECT o_orderkey,
              o_orderkey::VARCHAR || ',' || o_orderstatus || ','
                || FLOOR(o_totalprice)::BIGINT::VARCHAR AS line,
              o_orderkey AS rt_key, o_orderstatus AS rt_status,
              FLOOR(o_totalprice)::BIGINT AS rt_price
       FROM orders WHERE o_orderkey < 5000 ORDER BY o_orderkey"""

  /** Bit access: bit_count (population count, the cardinality primitive
    * under the d02/d08 bitmap verify) and getbit / single-bit extraction. */
  def q96BitAccess(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders.filter($"o_orderkey" < 20000)
      .select($"o_orderkey",
        expr("cast(bit_count(o_orderkey) AS bigint)").as("popcount"),
        expr("cast(getbit(o_orderkey, 0) AS bigint)").as("bit0"),
        expr("cast(getbit(o_orderkey, 5) AS bigint)").as("bit5"))
      .orderBy($"o_orderkey")
  }

  val q96Oracle: String =
    """SELECT o_orderkey,
              bit_count(o_orderkey)::BIGINT AS popcount,
              ((o_orderkey >> 0) & 1)::BIGINT AS bit0,
              ((o_orderkey >> 5) & 1)::BIGINT AS bit5
       FROM orders WHERE o_orderkey < 20000 ORDER BY o_orderkey"""

  /** Name-resolved union: position-independent append — the
    * schema-evolution primitive for batches whose column order drifted.
    * Spark's form is Dataset.unionByName (with allowMissingColumns for
    * ragged schemas); DuckDB's is UNION ALL BY NAME — the oracle states
    * the latter, proving both resolve by name, not position. */
  def q97UnionByName(t: T): DataFrame = {
    import t.spark.implicits._
    val even = t.orders.filter($"o_orderkey" % 2 === 0)
      .select(lit("a").as("src"), $"o_orderkey", $"o_orderstatus".as("status"))
    val odd = t.orders.filter($"o_orderkey" % 2 === 1)
      .select($"o_orderstatus".as("status"), $"o_orderkey", lit("b").as("src"))
    even.unionByName(odd) // columns matched by NAME despite reversed order
      .filter($"o_orderkey" < 20000)
      .select($"src", $"o_orderkey", $"status")
      .orderBy($"o_orderkey")
  }

  val q97Oracle: String =
    """SELECT src, o_orderkey, status FROM (
         SELECT 'a' AS src, o_orderkey, o_orderstatus AS status
         FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL BY NAME
         SELECT o_orderstatus AS status, o_orderkey, 'b' AS src
         FROM orders WHERE o_orderkey % 2 = 1)
       WHERE o_orderkey < 20000
       ORDER BY o_orderkey"""

  /** WITH RECURSIVE (Spark 4): transitive closure up a derived decimal-digit
    * hierarchy (parent = key DIV 10) — depth-to-root and ancestor-key sum
    * per row. Same recursion in both engines, pure integer arithmetic. */
  def q98RecursiveCte(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """WITH RECURSIVE anc(k, node, depth) AS (
           SELECT o_orderkey, o_orderkey, 0
           FROM orders WHERE o_orderkey < 5000
           UNION ALL
           SELECT k, node DIV 10, depth + 1 FROM anc WHERE node > 0)
         SELECT k AS o_orderkey, MAX(depth) AS depth_to_root,
                SUM(node) AS anc_sum
         FROM anc GROUP BY k ORDER BY o_orderkey""")
  }

  val q98Oracle: String =
    """WITH RECURSIVE anc(k, node, depth) AS (
         SELECT o_orderkey, o_orderkey, 0
         FROM orders WHERE o_orderkey < 5000
         UNION ALL
         SELECT k, node // 10, depth + 1 FROM anc WHERE node > 0)
       SELECT k AS o_orderkey, MAX(depth)::BIGINT AS depth_to_root,
              SUM(node)::BIGINT AS anc_sum
       FROM anc GROUP BY k ORDER BY o_orderkey"""

  /** EXECUTE IMMEDIATE with USING parameters (Spark 4): the parameterized-
    * SQL entry point a gateway uses to run client statements without string
    * splicing. The oracle is the bound statement itself. */
  def q99ExecuteImmediate(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """EXECUTE IMMEDIATE
           'SELECT o_orderstatus, COUNT(*) AS n,
                   SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS total_floor
            FROM orders WHERE o_orderkey < ? GROUP BY o_orderstatus ORDER BY o_orderstatus'
           USING 20000""")
  }

  val q99Oracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
              SUM(FLOOR(o_totalprice))::BIGINT AS total_floor
       FROM orders WHERE o_orderkey < 20000
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Two-table as-of join through the custom whole-operator stack
    * ([[graft.plans.AsOfJoinPlan]] → AsOfJoinExec): every purchase picks
    * the latest click at or before it per user. Right side is made unique
    * per (user, ts) first so the tie choice is well-defined in both
    * engines. DuckDB's native ASOF LEFT JOIN is the oracle — the clearest
    * possible semantic pin for the operator. q30 keeps the single-table
    * window encoding; this is the genuine two-relation shape (here both
    * inputs derive from `events`, but the operator never assumes that). */
  def q100AsofExec(t: T): DataFrame = {
    import t.spark.implicits._
    val p = t.events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("purchase_id"))
    val c = t.events.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
      .select($"user_id".as("cu"), $"ts".as("cts"), $"click_id")
    graft.plans.AsOf.join(p, c, Seq("user_id"), Seq("cu"), "ts", "cts")
      .select($"user_id", $"purchase_id",
        coalesce($"click_id", lit(-1L)).as("click_id"))
      .orderBy($"user_id", $"purchase_id")
  }

  val q100Oracle: String =
    """WITH p AS (SELECT user_id, ts, event_id AS purchase_id
                  FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id AS cu, ts AS cts, MAX(event_id) AS click_id
               FROM events WHERE event_type = 'click' GROUP BY 1, 2)
       SELECT p.user_id, p.purchase_id, COALESCE(c.click_id, -1) AS click_id
       FROM p ASOF LEFT JOIN c ON p.user_id = c.cu AND p.ts >= c.cts
       ORDER BY user_id, purchase_id"""

  /** Gap-based sessionization (30-min inactivity gap), the canonical
    * event-stream operator: flag session starts with lag(), number sessions
    * with a running sum, then two aggregations. All arithmetic in integer
    * microseconds (`unix_micros` / DuckDB `epoch_ns // 1000` — the exact
    * truncation Tables.load applies), so every value is cross-engine exact.
    * One shuffle on user_id serves the window AND both groupBys (the
    * partial agg for (user_id, sess_id) is co-partitioned already). */
  def q101Sessionize(t: T): DataFrame = {
    import t.spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.events.select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"))
      .withColumn("prev_us", lag($"ts_us", 1).over(wOrd))
      .withColumn("new_sess",
        when($"prev_us".isNull || $"ts_us" - $"prev_us" > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum($"new_sess").over(wRun))
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"),
        (max($"ts_us") - min($"ts_us")).as("dur_us"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max($"n_events").as("max_events"),
        sum($"dur_us").as("total_dur_us"))
      .orderBy($"user_id")
  }

  val q101Oracle: String =
    """WITH ev AS (
         SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events),
       flagged AS (
         SELECT user_id, event_id, ts_us,
                CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS new_sess
         FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       sess AS (
         SELECT user_id, ts_us,
                SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sess_id
         FROM flagged),
       per_sess AS (
         SELECT user_id, sess_id, COUNT(*) AS n_events,
                MAX(ts_us) - MIN(ts_us) AS dur_us
         FROM sess GROUP BY 1, 2)
       SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events)::BIGINT AS max_events,
              SUM(dur_us)::BIGINT AS total_dur_us
       FROM per_sess GROUP BY user_id ORDER BY user_id"""

  /** RFM (recency/frequency/monetary) customer segmentation over purchase
    * events — recency in integer micros, monetary in integer cents
    * (floor(value*100): double sums across engines are partial-agg-order
    * dependent; bigint sums are exact), quartiles via NTILE with user_id
    * tie-break. The global (un-partitioned) windows run on the per-user
    * AGGREGATE, which is |users| rows — already reduced by a partial agg at
    * scale; the raw event table never passes through a single partition. */
  def q102Rfm(t: T): DataFrame = {
    import t.spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val agg = t.events.filter($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("ts_us"),
        expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
      .groupBy($"user_id")
      .agg(max($"ts_us").as("last_us"), count(lit(1)).as("freq"),
        sum($"cents").as("mon_cents"))
    agg
      .withColumn("r_q", ntile(4).over(Window.orderBy($"last_us".desc, $"user_id")).cast("long"))
      .withColumn("f_q", ntile(4).over(Window.orderBy($"freq".desc, $"user_id")).cast("long"))
      .withColumn("m_q", ntile(4).over(Window.orderBy($"mon_cents".desc, $"user_id")).cast("long"))
      .select($"user_id", $"freq", $"mon_cents",
        ($"r_q" * 100 + $"f_q" * 10 + $"m_q").as("rfm_code"))
      .orderBy($"user_id")
  }

  val q102Oracle: String =
    """WITH agg AS (
         SELECT user_id, MAX(epoch_ns(ts) // 1000) AS last_us, COUNT(*) AS freq,
                SUM(FLOOR(value * 100))::BIGINT AS mon_cents
         FROM events WHERE event_type = 'purchase' GROUP BY user_id)
       SELECT user_id, freq, mon_cents,
              (NTILE(4) OVER (ORDER BY last_us DESC, user_id) * 100
               + NTILE(4) OVER (ORDER BY freq DESC, user_id) * 10
               + NTILE(4) OVER (ORDER BY mon_cents DESC, user_id))::BIGINT AS rfm_code
       FROM agg ORDER BY user_id"""

  /** TPC-H Q8-shaped market share: within the ASIA region's STANDARD-part
    * market, NATION_3 suppliers' yearly revenue share in integer basis
    * points. The 8-table join exercises the planner's bread and butter:
    * nation/region broadcast explicitly, part filtered before the join so
    * the big lineitem⋈orders shuffle carries only qualifying rows, and the
    * whole revenue pipeline stays in bigint cents. */
  def q103MarketShare(t: T): DataFrame = {
    import t.spark.implicits._
    val vol = t.lineitem
      .join(t.part.filter($"p_type" === "STANDARD"), $"l_partkey" === $"p_partkey")
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(t.nation.select($"n_nationkey".as("cnk"), $"n_regionkey")),
        $"c_nationkey" === $"cnk")
      .join(broadcast(t.region.filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .join(t.supplier, $"l_suppkey" === $"s_suppkey")
      .join(broadcast(t.nation.select($"n_nationkey".as("snk"), $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"snk")
      .select(year($"o_orderdate").cast("long").as("o_year"),
        expr("CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)").as("vol_cents"),
        $"supp_nation")
    vol.groupBy($"o_year")
      .agg(sum($"vol_cents").as("total_cents"),
        sum(when($"supp_nation" === "NATION_3", $"vol_cents").otherwise(0L)).as("nation_cents"))
      .select($"o_year", $"total_cents", $"nation_cents",
        expr("nation_cents * 10000 DIV total_cents").as("share_bp"))
      .orderBy($"o_year")
  }

  val q103Oracle: String =
    """WITH vol AS (
         SELECT year(o_orderdate) AS o_year,
                FLOOR(l_extendedprice * (1 - l_discount) * 100)::BIGINT AS vol_cents,
                sn.n_name AS supp_nation
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey)
       SELECT o_year::BIGINT AS o_year, SUM(vol_cents)::BIGINT AS total_cents,
              SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_cents ELSE 0 END)::BIGINT AS nation_cents,
              (SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_cents ELSE 0 END) * 10000
                 // SUM(vol_cents))::BIGINT AS share_bp
       FROM vol GROUP BY 1 ORDER BY o_year"""

  /** Modern projection surface in one statement: `SELECT * EXCEPT (...)`
    * (schema-evolution-proof wide-table projection), table indirection via
    * `IDENTIFIER(...)` (the safe dynamic-table-name mechanism a gateway
    * needs instead of string splicing), and LIMIT/OFFSET pagination.
    * DuckDB's `* EXCLUDE` is the oracle twin. Catalyst resolves the star
    * minus the excluded columns at analysis time, so column pruning still
    * reaches the scan — only the 4 surviving columns are read. */
  def q104StarExcept(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT * EXCEPT (o_custkey, o_orderpriority)
         FROM IDENTIFIER('orders')
         WHERE o_orderkey < 1000
         ORDER BY o_orderkey LIMIT 20 OFFSET 10""")
  }

  val q104Oracle: String =
    """SELECT * EXCLUDE (o_custkey, o_orderpriority)
       FROM orders WHERE o_orderkey < 1000
       ORDER BY o_orderkey LIMIT 20 OFFSET 10"""

  /** Time-weighted average event value per user — the correct "average
    * level" statistic for irregularly sampled series (each value weighted
    * by how long it held, i.e. until the next event). lead() pairs each
    * event with its successor; integer cents x whole seconds keeps every
    * product exact and far from int64 overflow (56021 cents x 3e7 s x 1e3
    * events ~ 1.7e15). Users whose events all fall within one second (zero
    * total weight) are excluded rather than divided by zero. */
  def q105TimeWeightedAvg(t: T): DataFrame = {
    import t.spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    t.events
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
        expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
      .withColumn("next_us", lead($"ts_us", 1).over(w))
      .filter($"next_us".isNotNull)
      .withColumn("dur_s", expr("(next_us - ts_us) DIV 1000000"))
      .groupBy($"user_id")
      .agg(sum($"cents" * $"dur_s").as("wsum"), sum($"dur_s").as("tot_s"))
      .filter($"tot_s" > 0)
      .select($"user_id", $"tot_s", expr("wsum DIV tot_s").as("twa_cents"))
      .orderBy($"user_id")
  }

  val q105Oracle: String =
    """WITH ev AS (
         SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
                FLOOR(value * 100)::BIGINT AS cents
         FROM events),
       gaps AS (
         SELECT user_id, cents,
                (lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                   - ts_us) // 1000000 AS dur_s
         FROM ev),
       agg AS (
         SELECT user_id, SUM(cents * dur_s) AS wsum, SUM(dur_s) AS tot_s
         FROM gaps WHERE dur_s IS NOT NULL GROUP BY user_id)
       SELECT user_id, tot_s::BIGINT AS tot_s, (wsum // tot_s)::BIGINT AS twa_cents
       FROM agg WHERE tot_s > 0 ORDER BY user_id"""

  /** CDC compaction: latest record per (user, event_type) key — the
    * row_number()=1 "upsert view" every change-capture pipeline
    * materializes. Spark 3.5+ recognizes the rank<=k-over-window pattern
    * and plans WindowGroupLimit (partial map-side top-1 BEFORE the
    * shuffle, final after), so only one surviving row per key per input
    * partition crosses the wire — the compaction stays linear at 100 TB. */
  def q106LatestPerKey(t: T): DataFrame = {
    import t.spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts_us".desc, $"event_id".desc)
    t.events
      .select($"user_id", $"event_type", $"event_id", unix_micros($"ts").as("ts_us"),
        expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"user_id", $"event_type", $"event_id".as("latest_event_id"),
        $"ts_us".as("latest_ts_us"), $"cents".as("latest_cents"))
      .orderBy($"user_id", $"event_type")
  }

  val q106Oracle: String =
    """SELECT user_id, event_type, event_id AS latest_event_id,
              ts_us AS latest_ts_us, cents AS latest_cents
       FROM (SELECT user_id, event_type, event_id,
                    epoch_ns(ts) // 1000 AS ts_us,
                    FLOOR(value * 100)::BIGINT AS cents,
                    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                       ORDER BY epoch_ns(ts) // 1000 DESC,
                                                event_id DESC) AS rk
             FROM events)
       WHERE rk = 1 ORDER BY user_id, event_type"""

  /** Per-group top-k through the custom [[graft.functions.TopKLongs]]
    * TypedImperativeAggregate: top-3 order totals (integer cents) per
    * order status in ONE aggregation — each map task ships a bounded
    * 3-slot buffer per group instead of ranking rows through a window.
    * Output is posexploded to scalar (status, rk, cents) rows: array
    * columns can't be hashed by the oracle harness, and the explode
    * keeps the aggregate itself on the execution path.
    * DuckDB twin: sort the grouped list descending, slice, unnest with
    * a lateral generate_series as the ordinality. */
  def q107TopkAgg(t: T): DataFrame = {
    import t.spark.implicits._
    graft.functions.Registry.ensure(t.spark)
    t.orders
      .select($"o_orderstatus",
        expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy($"o_orderstatus")
      .agg(expr("topk_longs(cents, 3)").as("top3"))
      .select($"o_orderstatus", posexplode($"top3").as(Seq("pos", "cents")))
      .select($"o_orderstatus", ($"pos" + 1).cast("long").as("rk"), $"cents")
      .orderBy($"o_orderstatus", $"rk")
  }

  val q107Oracle: String =
    """WITH g AS (
         SELECT o_orderstatus,
                (list_sort(list(FLOOR(o_totalprice * 100)::BIGINT), 'DESC'))[1:3] AS top3
         FROM orders GROUP BY o_orderstatus)
       SELECT o_orderstatus, i::BIGINT AS rk, top3[i] AS cents
       FROM g CROSS JOIN (VALUES (1), (2), (3)) AS t(i)
       WHERE i <= len(top3)
       ORDER BY o_orderstatus, rk"""

  /** Exact DECIMAL money arithmetic: cast the double price to
    * DECIMAL(12,2) at the scan (recovering the exact cents the generator
    * rounded to — the stored double is never a .005 tie, so HALF_UP
    * rounding is unambiguous in both engines) and aggregate in decimal
    * space. Decimal sums are exact under any partial-agg order — the
    * money-correctness guarantee double aggregation cannot give. */
  def q108DecimalTotals(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders
      .select($"o_orderstatus", $"o_totalprice".cast("decimal(12,2)").as("price"))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum($"price").cast("string").as("total_price"),
        min($"price").cast("string").as("min_price"),
        max($"price").cast("string").as("max_price"))
      .orderBy($"o_orderstatus")
  }

  val q108Oracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
              SUM(o_totalprice::DECIMAL(12,2))::VARCHAR AS total_price,
              MIN(o_totalprice::DECIMAL(12,2))::VARCHAR AS min_price,
              MAX(o_totalprice::DECIMAL(12,2))::VARCHAR AS max_price
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Rolling 7-day distinct purchasers per day — the rolling-cardinality
    * dashboard metric. Two-level shape that scales: first a per-day
    * distinct-user set (one shuffle on day, sets bounded by daily actives),
    * then a RANGE frame over the tiny per-day table unions 7 sets; the raw
    * event table never enters the window. Set size is order-invariant, so
    * the counts are deterministic despite collect_set's arbitrary order. */
  def q109RollingDistinct(t: T): DataFrame = {
    import t.spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = t.events.filter($"event_type" === "purchase")
      .select(expr("unix_micros(ts) DIV 86400000000").as("day_d"), $"user_id")
      .groupBy($"day_d")
      .agg(collect_set($"user_id").as("users"))
    val w = Window.orderBy($"day_d").rangeBetween(-6, 0)
    daily
      .withColumn("win_users", flatten(collect_list($"users").over(w)))
      .select($"day_d",
        size($"users").cast("long").as("n_day_users"),
        size(array_distinct($"win_users")).cast("long").as("n_rolling_users"))
      .orderBy($"day_d")
  }

  val q109Oracle: String =
    """WITH daily AS (
         SELECT (epoch_ns(ts) // 1000) // 86400000000 AS day_d,
                list(DISTINCT user_id) AS users
         FROM events WHERE event_type = 'purchase' GROUP BY 1)
       SELECT day_d,
              len(users)::BIGINT AS n_day_users,
              len(list_distinct(flatten(list(users) OVER
                (ORDER BY day_d RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))))::BIGINT
                AS n_rolling_users
       FROM daily ORDER BY day_d"""

  /** Click→purchase attribution pairs through the custom
    * [[graft.plans.IntervalJoinPlan]] sweep exec (q29's semantics, but the
    * per-key work is linear in matches instead of SMJ's per-key cross
    * product + residual filter — the difference between a bot user costing
    * |clicks|x|purchases| and costing its actual attributions). Emits the
    * per-user pair count plus the tightest attribution gap. */
  def q110IntervalExec(t: T): DataFrame = {
    import t.spark.implicits._
    val clicks = t.events.filter($"event_type" === "click")
      .select($"user_id", unix_micros($"ts").as("c_us"))
    val purchases = t.events.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), unix_micros($"ts").as("p_us"))
    graft.plans.IntervalJoin.join(clicks, purchases,
        Seq("user_id"), Seq("pu"), "c_us", "p_us", 0L, 300L * 1000000L)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"),
        expr("MIN((p_us - c_us) DIV 1000)").as("min_gap_ms"))
      .orderBy($"user_id")
  }

  val q110Oracle: String =
    """WITH c AS (SELECT user_id, epoch_ns(ts) // 1000 AS c_us
                  FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id AS pu, epoch_ns(ts) // 1000 AS p_us
               FROM events WHERE event_type = 'purchase')
       SELECT user_id, COUNT(*) AS n_pairs,
              MIN((p_us - c_us) // 1000)::BIGINT AS min_gap_ms
       FROM c JOIN p ON user_id = pu
        AND p_us >= c_us AND p_us <= c_us + 300000000
       GROUP BY user_id ORDER BY user_id"""

  /** IGNORE NULLS window family: carry-forward of the latest purchase value
    * over each user's full event stream (last_value IGNORE NULLS — the
    * fill-forward idiom for sparse observations), plus the previous non-null
    * purchase (lag ... IGNORE NULLS). Narrow after one shuffle on user_id;
    * at 100 TB this is the standard sensor/price fill-forward shape. */
  def q111IgnoreNulls(t: T): DataFrame = {
    import t.spark.implicits._
    t.events.filter($"user_id" < 300)
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
        when($"event_type" === "purchase", $"value").as("pv"))
      .selectExpr("user_id", "event_id",
        """last_value(pv) IGNORE NULLS OVER
             (PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase""",
        """lag(pv) IGNORE NULLS OVER
             (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_purchase""")
      .orderBy($"user_id", $"event_id")
  }

  val q111Oracle: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
                         CASE WHEN event_type = 'purchase' THEN value END AS pv
                  FROM events WHERE user_id < 300)
       SELECT user_id, event_id,
              last_value(pv IGNORE NULLS) OVER
                (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase,
              lag(pv IGNORE NULLS) OVER
                (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_purchase
       FROM e ORDER BY user_id, event_id"""

  /** Lateral column aliases: later SELECT-list items reference earlier
    * aliases in the same list (Spark 3.4 analyzer feature; DuckDB has the
    * same resolution). The chain net → taxed → margin_bp is written once
    * instead of re-expanding each subexpression — Catalyst still inlines and
    * codegens the whole projection, so the plan is identical to the
    * expanded form (no materialization between steps). */
  def q112LateralAlias(t: T): DataFrame = {
    t.lineitem.createOrReplaceTempView("lineitem")
    t.spark.sql(
      """SELECT l_orderkey, l_linenumber,
                l_extendedprice * (1 - l_discount) AS net,
                net * (1 + l_tax) AS taxed,
                CAST(FLOOR((taxed - net) * 10000 / taxed) AS BIGINT) AS tax_bp
         FROM lineitem WHERE l_orderkey < 600
         ORDER BY l_orderkey, l_linenumber""")
  }

  val q112Oracle: String =
    """SELECT l_orderkey, l_linenumber,
              l_extendedprice * (1 - l_discount) AS net,
              net * (1 + l_tax) AS taxed,
              FLOOR((taxed - net) * 10000 / taxed)::BIGINT AS tax_bp
       FROM lineitem WHERE l_orderkey < 600
       ORDER BY l_orderkey, l_linenumber"""

  /** Case-insensitive grouping via Spark 4 collations: the group key is
    * collated UTF8_LCASE so 'EN' and 'en' fall in one group *at the
    * comparison level* (hash/sort semantics change, not the bytes).
    * DuckDB oracle states the equivalent canonicalization with lower().
    * The displayed key is lower()ed on both sides because a collated
    * group's representative bytes are whichever variant arrived first. */
  def q113Collation(t: T): DataFrame = {
    t.documents.createOrReplaceTempView("documents")
    t.spark.sql(
      """SELECT lower(k) AS lang_ci, COUNT(*) AS n_docs,
                SUM(n_chars) AS sum_chars
         FROM (SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END
                        COLLATE UTF8_LCASE AS k,
                      n_chars
               FROM documents)
         GROUP BY k ORDER BY lang_ci""")
  }

  val q113Oracle: String =
    """SELECT lower(k) AS lang_ci, COUNT(*) AS n_docs,
              SUM(n_chars)::BIGINT AS sum_chars
       FROM (SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS k,
                    n_chars
             FROM documents)
       GROUP BY lower(k) ORDER BY lang_ci"""

  /** Exact distinct-count via bitmap aggregation (Spark 3.5 bitmap fns):
    * user ids are bucketed (bitmap_bucket_number) and each bucket packs its
    * members' bit positions into one 4 KiB bitmap (bitmap_construct_agg);
    * counting = popcount, merging = bitmap_or_agg. Unlike
    * COUNT(DISTINCT) this pre-aggregates map-side into fixed-size state and
    * merges associatively — the 100 TB distinct-count shape (same layout
    * Delta/Iceberg deletion vectors and ClickHouse groupBitmap use).
    * Oracle is the semantic contract: plain COUNT(DISTINCT). */
  def q114BitmapDistinct(t: T): DataFrame = {
    t.events.createOrReplaceTempView("events")
    t.spark.sql(
      """SELECT event_type,
                CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_users
         FROM (SELECT event_type, bitmap_bucket_number(user_id) AS bkt,
                      bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
               FROM events GROUP BY event_type, bkt)
         GROUP BY event_type ORDER BY event_type""")
  }

  val q114Oracle: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
       FROM events GROUP BY event_type ORDER BY event_type"""

  /** XML ingestion: from_xml parses attribute + element fields into a typed
    * struct (Spark 4 native XML, attributes surfaced with the `_` prefix),
    * with the xpath_* family as the scalar extraction path. The XML is
    * constructed from corpus columns so the round-trip is self-contained;
    * DuckDB has no XML type, so the oracle states the exact extraction
    * semantics in regexp primitives over the identical string. */
  def q115XmlFns(t: T): DataFrame = {
    import t.spark.implicits._
    t.events.filter($"event_id" < 2000)
      .withColumn("xml", concat(
        lit("<e id=\""), $"event_id", lit("\"><t>"), $"event_type",
        lit("</t><k>"), expr("get_json_object(props, '$.k')"), lit("</k></e>")))
      .select($"event_id",
        expr("from_xml(xml, '_id BIGINT, t STRING, k BIGINT')").as("x"),
        expr("xpath_long(xml, '/e/k')").as("xp_k"),
        expr("xpath_string(xml, '/e/t')").as("xp_t"))
      .select($"event_id", $"x._id".as("xml_id"), $"x.t".as("xml_t"),
        $"x.k".as("xml_k"), $"xp_k", $"xp_t")
      .orderBy($"event_id")
  }

  val q115Oracle: String =
    """WITH x AS (
         SELECT event_id,
                '<e id="' || event_id || '"><t>' || event_type || '</t><k>'
                  || json_extract_string(props, '$.k') || '</k></e>' AS xml
         FROM events WHERE event_id < 2000)
       SELECT event_id,
              regexp_extract(xml, 'id="(\d+)"', 1)::BIGINT AS xml_id,
              regexp_extract(xml, '<t>([^<]*)</t>', 1) AS xml_t,
              regexp_extract(xml, '<k>(\d+)</k>', 1)::BIGINT AS xml_k,
              regexp_extract(xml, '<k>(\d+)</k>', 1)::BIGINT AS xp_k,
              regexp_extract(xml, '<t>([^<]*)</t>', 1) AS xp_t
       FROM x ORDER BY event_id"""

  /** Corrupt-record-tolerant ingestion: from_json in PERMISSIVE mode with
    * `_corrupt_record` declared — malformed payloads (here: every 7th row
    * truncated, the classic chopped-upload shape) yield null fields plus
    * the raw text in the corrupt column instead of failing the job. The
    * quarantine-and-continue contract every 100 TB ingest needs: bad rows
    * route to a dead-letter sink, good rows keep flowing. */
  def q116CorruptJson(t: T): DataFrame = {
    import t.spark.implicits._
    t.events.filter($"event_id" < 3000)
      .withColumn("raw",
        when(pmod($"event_id", lit(7)) === 0,
          expr("substring(props, 1, length(props) - 2)")).otherwise($"props"))
      .select($"event_id",
        expr("from_json(raw, 'k BIGINT, _corrupt_record STRING')").as("j"))
      .select($"event_id", $"j.k".as("k"),
        $"j._corrupt_record".isNotNull.as("is_corrupt"),
        $"j._corrupt_record".as("corrupt_raw"))
      .orderBy($"event_id")
  }

  val q116Oracle: String =
    """SELECT event_id,
              CASE WHEN event_id % 7 = 0 THEN NULL
                   ELSE json_extract(props, '$.k')::BIGINT END AS k,
              (event_id % 7 = 0) AS is_corrupt,
              CASE WHEN event_id % 7 = 0
                   THEN substr(props, 1, length(props) - 2) END AS corrupt_raw
       FROM events WHERE event_id < 3000 ORDER BY event_id"""

  /** Order-dependent recursion as a higher-order fold: integer EMA
    * (ema' = (7*ema + 3*v) DIV 10) over each user's purchase sequence via
    * aggregate() on the time-sorted value array — the declarative form of a
    * stateful per-key scan (what mapGroupsWithState does on streams). The
    * fold stays in exact integers so the cross-engine compare is bit-exact
    * (DuckDB twin: list_reduce, first element as init on both sides). */
  def q117IntegerEma(t: T): DataFrame = {
    import t.spark.implicits._
    t.events.filter($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
        abs(floor($"value")).cast("long").as("v"))
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"ts_us", $"event_id", $"v"))).as("obs"))
      .selectExpr("user_id", "CAST(size(obs) AS BIGINT) AS n_obs",
        "transform(obs, o -> o.v) AS vs")
      .selectExpr("user_id", "n_obs",
        "element_at(vs, 1) AS first_v",
        "element_at(vs, -1) AS last_v",
        """aggregate(slice(vs, 2, CAST(n_obs AS INT) - 1), element_at(vs, 1),
             (a, x) -> (a * 7 + x * 3) DIV 10) AS ema""")
      .orderBy($"user_id")
  }

  val q117Oracle: String =
    """WITH p AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
                         abs(floor(value))::BIGINT AS v
                  FROM events WHERE event_type = 'purchase'),
       l AS (SELECT user_id, list(v ORDER BY ts_us, event_id) AS vs
             FROM p GROUP BY user_id)
       SELECT user_id, len(vs)::BIGINT AS n_obs,
              vs[1] AS first_v, vs[-1] AS last_v,
              list_reduce(vs, (a, x) -> (a * 7 + x * 3) // 10)::BIGINT AS ema
       FROM l ORDER BY user_id"""

  /** SQL session variables (Spark 4 DECLARE / SET VAR): a parameterized
    * filter threshold lives in the session, referenced by name in the query
    * text — the session-state contract SQL clients of the gateway use for
    * templated dashboards. Constant-folded into the plan at analysis, so
    * the predicate still pushes into the scan. Oracle inlines the value. */
  def q118SqlVariables(t: T): DataFrame = {
    t.lineitem.createOrReplaceTempView("lineitem")
    // the session variable is shared session state: declare the final value
    // and make the SET VAR self-referential-idempotent (greatest with the
    // same threshold), so concurrent invocations interleaving DECLARE/SET
    // can never fold a partially-updated value into a sibling's plan
    t.spark.sql("DECLARE OR REPLACE VARIABLE graft_min_qty DOUBLE DEFAULT 45.0")
    t.spark.sql("SET VAR graft_min_qty = greatest(graft_min_qty, 45.0)")
    t.spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n,
                CAST(SUM(FLOOR(l_extendedprice)) AS BIGINT) AS price_floor_sum
         FROM lineitem WHERE l_quantity > graft_min_qty
         GROUP BY l_returnflag ORDER BY l_returnflag""")
  }

  val q118Oracle: String =
    """SELECT l_returnflag, COUNT(*) AS n,
              SUM(FLOOR(l_extendedprice))::BIGINT AS price_floor_sum
       FROM lineitem WHERE l_quantity > 45.0
       GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Multi-aggregate PIVOT: one pivot producing BOTH a count and a floored
    * value sum per pivoted event type (Spark names the columns
    * `<value>_<aggAlias>`). q28 is the single-agg form; real reporting
    * pivots carry several measures at once. DuckDB oracle is the FILTER
    * conditional-aggregation expansion, which is also exactly how Catalyst
    * lowers pivot (PivotFirst over grouped FILTER aggregates). */
  def q119MultiAggPivot(t: T): DataFrame = {
    import t.spark.implicits._
    t.events
      .withColumn("user_bucket", ($"user_id" % 10).cast("long"))
      .groupBy($"user_bucket")
      .pivot("event_type", Seq("click", "purchase"))
      .agg(count(lit(1)).as("n"),
        sum(floor($"value")).cast("long").as("vsum"))
      .na.fill(0L)
      .orderBy($"user_bucket")
  }

  val q119Oracle: String =
    """SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
              COUNT(*) FILTER (WHERE event_type = 'click') AS click_n,
              COALESCE(SUM(FLOOR(value)) FILTER (WHERE event_type = 'click'), 0)::BIGINT AS click_vsum,
              COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase_n,
              COALESCE(SUM(FLOOR(value)) FILTER (WHERE event_type = 'purchase'), 0)::BIGINT AS purchase_vsum
       FROM events GROUP BY 1 ORDER BY user_bucket"""

  /** DISTRIBUTE BY / SORT BY: the ETL-writer surface for controlling
    * physical layout (files-per-partition sizing, within-partition
    * clustering for downstream merge reads) without changing the result
    * set. The oracle is the same projection — physical layout is invisible
    * to the rows — while the capability exercised is the Spark-specific
    * repartition+local-sort SQL clauses. */
  def q120DistributeBy(t: T): DataFrame = {
    t.orders.createOrReplaceTempView("orders")
    t.spark.sql(
      """SELECT o_orderkey, o_custkey, o_orderstatus,
                CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor
         FROM orders WHERE o_orderkey < 5000
         DISTRIBUTE BY o_custkey SORT BY o_custkey, o_orderkey""")
      .orderBy("o_orderkey")
  }

  val q120Oracle: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
              FLOOR(o_totalprice)::BIGINT AS price_floor
       FROM orders WHERE o_orderkey < 5000 ORDER BY o_orderkey"""

  /** Join-strategy hints through SQL: BROADCAST pins the dimension build
    * side, REPARTITION sizes the output — the escape hatches when stats
    * mislead the optimizer (the 100 TB "I know better than AQE this once"
    * lever). Result-identical to the unhinted join, which is the oracle;
    * the plan effect (BroadcastHashJoin) is asserted in PlanQualitySpec. */
  def q121JoinHints(t: T): DataFrame = {
    t.orders.createOrReplaceTempView("orders")
    t.customer.createOrReplaceTempView("customer")
    t.spark.sql(
      """SELECT /*+ BROADCAST(customer), REPARTITION(8) */
                c_mktsegment, COUNT(*) AS n_orders,
                CAST(SUM(FLOOR(o_totalprice)) AS BIGINT) AS price_floor_sum
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  val q121Oracle: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
              SUM(FLOOR(o_totalprice))::BIGINT AS price_floor_sum
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** Percent-of-total analytics (ratio_to_report): each segment's share of
    * the grand total and of its own nation, via window sums over the
    * aggregate — one aggregation, two window frames, shares in exact
    * integer basis points. */
  def q122PercentOfTotal(t: T): DataFrame = {
    t.customer.createOrReplaceTempView("customer")
    t.spark.sql(
      """WITH seg AS (
           SELECT c_nationkey, c_mktsegment,
                  CAST(SUM(FLOOR(c_acctbal)) AS BIGINT) AS bal
           FROM customer WHERE c_acctbal > 0
           GROUP BY c_nationkey, c_mktsegment)
         SELECT c_nationkey, c_mktsegment, bal,
                bal * 10000 DIV SUM(bal) OVER () AS share_total_bp,
                bal * 10000 DIV SUM(bal) OVER (PARTITION BY c_nationkey)
                  AS share_nation_bp
         FROM seg ORDER BY c_nationkey, c_mktsegment""")
  }

  val q122Oracle: String =
    """WITH seg AS (
         SELECT c_nationkey, c_mktsegment,
                SUM(FLOOR(c_acctbal))::BIGINT AS bal
         FROM customer WHERE c_acctbal > 0
         GROUP BY c_nationkey, c_mktsegment)
       SELECT c_nationkey, c_mktsegment, bal,
              (bal * 10000 // SUM(bal) OVER ())::BIGINT AS share_total_bp,
              (bal * 10000 // SUM(bal) OVER (PARTITION BY c_nationkey))::BIGINT
                AS share_nation_bp
       FROM seg ORDER BY c_nationkey, c_mktsegment"""

  /** ANSI FILTER clause on aggregates — the standard syntax for conditional
    * aggregation (Spark 3.0+), the form Catalyst lowers CASE-WHEN pivots
    * into. Identical on both engines, so the oracle IS the query. */
  def q123FilterClause(t: T): DataFrame = {
    t.events.createOrReplaceTempView("events")
    t.spark.sql(
      """SELECT user_id % 10 AS user_bucket,
                COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
                COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
                CAST(SUM(FLOOR(value)) FILTER (WHERE event_type = 'purchase')
                     AS BIGINT) AS purchase_floor_sum
         FROM events GROUP BY user_id % 10 ORDER BY user_bucket""")
  }

  val q123Oracle: String =
    """SELECT user_id % 10 AS user_bucket,
              COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
              COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
              SUM(FLOOR(value)) FILTER (WHERE event_type = 'purchase')::BIGINT
                AS purchase_floor_sum
       FROM events GROUP BY user_id % 10 ORDER BY user_bucket"""

  /** The `try_*` error-safe arithmetic family — NULL instead of a thrown
    * error under ANSI mode: try_divide (zero divisor), try_cast (malformed
    * string), try_element_at (index past the end), try_add (overflow — here
    * exercised on in-range values to pin the pass-through). The pattern a
    * pipeline uses to quarantine bad rows declaratively instead of failing
    * a 1000-executor job on one of them. DuckDB twin states each as the
    * explicit NULL-guard it desugars to. */
  def q124TryArithmetic(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT o_orderkey,
                CAST(FLOOR(try_divide(o_totalprice, o_orderkey % 3) * 100) AS BIGINT) AS div_cents,
                try_cast(o_orderpriority AS INT) AS bad_cast,
                try_cast(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_digit,
                try_element_at(split(o_orderpriority, '-'), 3) AS past_end,
                try_add(CAST(o_orderkey AS BIGINT), 1000000000) AS in_range_add
         FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""")
  }

  val q124Oracle: String =
    """SELECT o_orderkey,
              FLOOR(o_totalprice / NULLIF(o_orderkey % 3, 0) * 100)::BIGINT AS div_cents,
              TRY_CAST(o_orderpriority AS INT) AS bad_cast,
              TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_digit,
              string_split(o_orderpriority, '-')[3] AS past_end,
              (o_orderkey + 1000000000)::BIGINT AS in_range_add
       FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey"""

  /** Native session-window aggregation (Spark's SessionWindow operator —
    * merging gap-based windows inside the aggregate, the batch twin of the
    * streaming w02): one shuffle on user_id, sessions merged engine-side.
    * q101 computes the same sessions with manual gaps-and-islands windowing;
    * this declares them and lets the engine own the merge. Oracle: the
    * gaps-and-islands formulation (session end = last event + gap). */
  def q125SessionWindow(t: T): DataFrame = {
    import t.spark.implicits._
    t.events
      .groupBy(session_window($"ts", "10 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"sw.start".as("session_start"),
        $"sw.end".as("session_end"), $"n_events")
      .orderBy($"user_id", $"session_start")
  }

  val q125Oracle: String =
    """WITH ev AS (
         SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events),
       flagged AS (
         SELECT user_id, ts_us,
                CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w > 600000000
                     THEN 1 ELSE 0 END AS new_sess
         FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       sess AS (
         SELECT user_id, ts_us,
                SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                                    ROWS UNBOUNDED PRECEDING) AS sid
         FROM flagged)
       SELECT user_id, make_timestamp(MIN(ts_us)) AS session_start,
              make_timestamp(MAX(ts_us) + 600000000) AS session_end,
              COUNT(*) AS n_events
       FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start"""

  /** Approximate-distinct with a self-measuring error gate: HyperLogLog++
    * (approx_count_distinct) and the Apache DataSketches HLL aggregate
    * (hll_sketch_agg/hll_sketch_estimate) against the exact count, each
    * emitting a boolean "within 10%" verdict. The sketches are
    * implementation-specific so the NUMBERS aren't cross-engine — the GATE
    * is (s06's recall-gate pattern applied to cardinality sketches). At
    * 100 TB approximate-distinct is the production path; exact is the audit. */
  def q126ApproxDistinctGate(t: T): DataFrame = {
    import t.spark.implicits._
    t.orders.groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("n_exact"),
        approx_count_distinct($"o_custkey").as("hllpp"),
        expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").as("ds_hll"))
      .select($"o_orderstatus", $"n_exact",
        ($"hllpp" >= $"n_exact" * 0.9 && $"hllpp" <= $"n_exact" * 1.1).as("hllpp_within_10pct"),
        ($"ds_hll" >= $"n_exact" * 0.9 && $"ds_hll" <= $"n_exact" * 1.1).as("ds_within_10pct"))
      .orderBy($"o_orderstatus")
  }

  val q126Oracle: String =
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_exact,
              TRUE AS hllpp_within_10pct, TRUE AS ds_within_10pct
       FROM orders GROUP BY 1 ORDER BY o_orderstatus"""

  /** Higher-order array predicates — exists / forall / zip_with (the three
    * lambda forms q42/q60 don't touch), all codegen-free Catalyst lambda
    * evaluation over split() tokens; weighted = aggregate(zip_with(lengths,
    * 1..n, *)) in exact integers. */
  def q127HofPredicates(t: T): DataFrame = {
    import t.spark.implicits._
    t.part
      .withColumn("words", split($"p_name", " "))
      .select($"p_partkey",
        size($"words").cast("long").as("n_words"),
        expr("exists(words, w -> length(w) >= 8)").as("has_long"),
        expr("forall(words, w -> length(w) >= 3)").as("all_ge3"),
        expr("""aggregate(
                  zip_with(transform(words, w -> cast(length(w) AS bigint)),
                           sequence(1L, cast(size(words) AS bigint)),
                           (l, i) -> l * i),
                  0L, (acc, x) -> acc + x)""").as("weighted"))
      .orderBy($"p_partkey")
  }

  val q127Oracle: String =
    """SELECT p_partkey,
              len(string_split(p_name, ' '))::BIGINT AS n_words,
              len(list_filter(string_split(p_name, ' '), w -> length(w) >= 8)) > 0 AS has_long,
              len(list_filter(string_split(p_name, ' '), w -> length(w) < 3)) = 0 AS all_ge3,
              COALESCE(list_sum(list_transform(range(1, len(string_split(p_name, ' ')) + 1),
                i -> length(string_split(p_name, ' ')[i::INT]) * i)), 0)::BIGINT AS weighted
       FROM part ORDER BY p_partkey"""

  /** Parameterized SQL — named parameter markers (`:name`, Spark 4
    * `spark.sql(text, args)`) plus the IDENTIFIER() clause binding a table
    * name from a parameter: the injection-safe front-door a SQL gateway
    * needs (values bound as literals by the parser, identifiers resolved
    * through a typed clause, never string-spliced). */
  def q128NamedParams(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n_rows,
                SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS cents
         FROM IDENTIFIER(:tbl)
         WHERE l_quantity <= :qmax AND l_shipdate >= CAST(:minday AS TIMESTAMP)
         GROUP BY l_returnflag ORDER BY l_returnflag""",
      Map("tbl" -> "lineitem", "qmax" -> 25, "minday" -> "1996-01-01"))
  }

  val q128Oracle: String =
    """SELECT l_returnflag, COUNT(*) AS n_rows,
              SUM(FLOOR(l_extendedprice * 100)::BIGINT)::BIGINT AS cents
       FROM lineitem
       WHERE l_quantity <= 25 AND l_shipdate >= TIMESTAMP '1996-01-01'
       GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** SCD type-2 dimension build from an event stream: compress each user's
    * event history into state intervals (one row per run of equal
    * event_type), with valid_from / valid_to (next change, null while
    * current) and a current flag — the canonical warehouse-maintenance op a
    * CDC pipeline runs after ingest. Gaps-and-islands + lead(); all
    * exchanges keyed on user_id. */
  def q129Scd2Build(t: T): DataFrame = {
    import t.spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = t.events
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("ts_us"))
      .withColumn("chg",
        when(lag($"event_type", 1).over(wOrd).isNull
          || lag($"event_type", 1).over(wOrd) =!= $"event_type", 1L).otherwise(0L))
      .withColumn("run_id", sum($"chg").over(wRun))
      .groupBy($"user_id", $"run_id", $"event_type")
      .agg(min($"ts_us").as("from_us"), count(lit(1)).as("n_events"))
    val wNext = Window.partitionBy($"user_id").orderBy($"run_id")
    runs
      .withColumn("to_us", lead($"from_us", 1).over(wNext))
      .select($"user_id", $"run_id", $"event_type",
        timestamp_micros($"from_us").as("valid_from"),
        timestamp_micros($"to_us").as("valid_to"),
        $"to_us".isNull.as("is_current"), $"n_events")
      .orderBy($"user_id", $"run_id")
  }

  val q129Oracle: String =
    """WITH ev AS (
         SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS ts_us
         FROM events),
       flagged AS (
         SELECT user_id, event_type, ts_us,
                CASE WHEN lag(event_type) OVER w IS NULL
                       OR lag(event_type) OVER w <> event_type
                     THEN 1 ELSE 0 END AS chg
         FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       runs0 AS (
         SELECT user_id, event_type, ts_us,
                SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us
                               ROWS UNBOUNDED PRECEDING)::BIGINT AS run_id
         FROM flagged),
       runs AS (
         SELECT user_id, run_id, event_type, MIN(ts_us) AS from_us,
                COUNT(*) AS n_events
         FROM runs0 GROUP BY 1, 2, 3)
       SELECT user_id, run_id, event_type,
              make_timestamp(from_us) AS valid_from,
              make_timestamp(lead(from_us) OVER w2) AS valid_to,
              lead(from_us) OVER w2 IS NULL AS is_current, n_events
       FROM runs WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)
       ORDER BY user_id, run_id"""

  /** Approximate-percentile error gate (q126's pattern for quantile
    * sketches): approx_percentile's p50/p90 must land within +-2 quantity
    * units of the exact percentile_disc per group — booleans out, no float
    * hashing. The sketch path is what a 100 TB profile query runs; the
    * exact arm is the audit. */
  def q130QuantileGate(t: T): DataFrame = {
    import t.spark.implicits._
    t.lineitem.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        expr("approx_percentile(l_quantity, array(0.5, 0.9), 10000)").as("ap"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").as("p90"))
      .select($"l_returnflag", $"n_rows",
        (abs(expr("ap[0]") - $"p50") <= 2.0).as("p50_within_2"),
        (abs(expr("ap[1]") - $"p90") <= 2.0).as("p90_within_2"))
      .orderBy($"l_returnflag")
  }

  val q130Oracle: String =
    """SELECT l_returnflag, COUNT(*) AS n_rows,
              TRUE AS p50_within_2, TRUE AS p90_within_2
       FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""

  /** Mergeable-sketch rollup — the 100 TB distinct-count pattern: each
    * shard (order status here) builds its own HLL sketch; the global
    * cardinality comes from hll_union_agg over the PARTIAL SKETCHES, never
    * re-reading rows. The gate checks the merged estimate lands within 10%
    * of the exact global distinct (q126's self-measuring pattern, one
    * level up the rollup). */
  def q131SketchMerge(t: T): DataFrame = {
    import t.spark.implicits._
    val shards = t.orders.groupBy($"o_orderstatus")
      .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
    val merged = shards.agg(
      count(lit(1)).as("n_shards"),
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = t.orders.agg(countDistinct($"o_custkey").as("n_exact"))
    merged.crossJoin(exact) // two single-row frames
      .select($"n_shards", $"n_exact",
        ($"est" >= $"n_exact" * 0.9 && $"est" <= $"n_exact" * 1.1).as("merged_within_10pct"))
  }

  val q131Oracle: String =
    """SELECT COUNT(DISTINCT o_orderstatus) AS n_shards,
              COUNT(DISTINCT o_custkey) AS n_exact,
              TRUE AS merged_within_10pct
       FROM orders"""

  /** Keyset-free pagination — ORDER BY unique key + LIMIT/OFFSET (Spark's
    * GlobalLimit-with-offset path, SQL standard form): page 3 of the order
    * book, 20 rows per page. At scale OFFSET is a driver-side skip after a
    * TakeOrdered of offset+limit rows — fine for UI pages, documented as
    * NOT the bulk-export path (that's keyset pagination on the sort key). */
  def q132Pagination(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 40""")
  }

  val q132Oracle: String =
    """SELECT o_orderkey, FLOOR(o_totalprice * 100)::BIGINT AS cents
       FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 40"""

  /** Recursive CTE (Spark 4's WITH RECURSIVE, SPARK-24497) generating a
    * month spine from min to max order date, LEFT JOINed against monthly
    * order counts — the gap-filling idiom that makes time series dense
    * (a month with zero orders still gets a row). The recursion depth is
    * the number of months in the data (~80), far under Spark's default
    * 100-row-per-level / 1M-row recursion guards; the spine is tiny and
    * broadcast, the monthly aggregate is the only real shuffle. */
  def q133RecursiveSpine(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """WITH RECURSIVE bounds AS (
           SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
                  CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
           FROM orders),
         spine AS (
           SELECT lo AS m, hi FROM bounds
           UNION ALL
           SELECT CAST(add_months(m, 1) AS DATE) AS m, hi FROM spine WHERE m < hi),
         monthly AS (
           SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                  COUNT(*) AS n_orders
           FROM orders GROUP BY 1)
         SELECT CAST(s.m AS TIMESTAMP) AS month_start,
                COALESCE(n.n_orders, CAST(0 AS BIGINT)) AS n_orders
         FROM spine s LEFT JOIN monthly n ON n.m = s.m
         ORDER BY s.m""")
  }

  val q133Oracle: String =
    """WITH RECURSIVE bounds AS (
         SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
                date_trunc('month', MAX(o_orderdate)) AS hi
         FROM orders),
       spine AS (
         SELECT lo AS m, hi FROM bounds
         UNION ALL
         SELECT (m + INTERVAL 1 MONTH)::DATE AS m, hi FROM spine WHERE m < hi),
       monthly AS (
         SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS n_orders
         FROM orders GROUP BY 1)
       SELECT s.m::TIMESTAMP AS month_start,
              COALESCE(n.n_orders, 0)::BIGINT AS n_orders
       FROM spine s LEFT JOIN monthly n ON n.m = s.m
       ORDER BY s.m"""

  /** Explicit NULLS FIRST / NULLS LAST ordering — the cross-engine trap
    * made a contract: Spark's default is NULLS FIRST ascending, DuckDB's is
    * NULLS LAST, so every sort on a nullable key MUST spell the placement
    * out (as this engine's oracle twins always do). Nullable key synthesized
    * with NULLIF; both directions exercised in one ordering. */
  def q134NullsOrdering(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """SELECT o_orderkey,
              NULLIF(o_orderpriority, '3-MEDIUM') AS pri,
              CAST(FLOOR(o_totalprice) AS BIGINT) AS dollars
         FROM orders
         ORDER BY pri ASC NULLS FIRST, dollars DESC, o_orderkey
         LIMIT 50""")
  }

  val q134Oracle: String =
    """SELECT o_orderkey,
            NULLIF(o_orderpriority, '3-MEDIUM') AS pri,
            FLOOR(o_totalprice)::BIGINT AS dollars
       FROM orders
       ORDER BY pri ASC NULLS FIRST, dollars DESC, o_orderkey
       LIMIT 50"""

  /** Z-order layout audit — the lakehouse file-clustering decision
    * (Delta/Iceberg OPTIMIZE ZORDER) made measurable: interleave the low
    * 16 bits of customer key and order-date day into a space-filling-curve
    * key, split the table into 64 equal files by that key vs by date alone,
    * and report each layout's mean per-file span in BOTH dimensions. Date-
    * sorted files have a ~0 date span but full customer span (customer
    * predicates prune nothing); z-ordered files have moderate spans in
    * both — the property that lets min/max file skipping serve two
    * predicate dimensions at once. Pure integer bit arithmetic + two NTILE
    * windows + one rollup per layout; at scale the NTILE becomes the range
    * partitioner of the actual rewrite job. */
  def q135ZorderLayout(t: T): DataFrame = {
    graft.Tables.register(t.spark, t.dir)
    t.spark.sql(
      """WITH base AS (
           SELECT o_orderkey,
                  CAST(o_custkey % 65536 AS BIGINT) AS x,
                  CAST(datediff(o_orderdate, DATE '1992-01-01') % 65536 AS BIGINT) AS y
           FROM orders),
         zed AS (
           SELECT o_orderkey, x, y,
                  aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, i) ->
                    acc + ((x >> i) & 1) * shiftleft(CAST(1 AS BIGINT), 2 * i)
                        + ((y >> i) & 1) * shiftleft(CAST(1 AS BIGINT), 2 * i + 1)) AS z
           FROM base),
         buckets AS (
           SELECT x, y,
                  NTILE(64) OVER (ORDER BY z, o_orderkey) AS z_file,
                  NTILE(64) OVER (ORDER BY y, o_orderkey) AS d_file
           FROM zed),
         zspans AS (
           SELECT z_file, MAX(x) - MIN(x) AS span_x, MAX(y) - MIN(y) AS span_y
           FROM buckets GROUP BY z_file),
         dspans AS (
           SELECT d_file, MAX(x) - MIN(x) AS span_x, MAX(y) - MIN(y) AS span_y
           FROM buckets GROUP BY d_file)
         SELECT 'date_sorted' AS layout, COUNT(*) AS n_files,
                CAST(SUM(span_x) AS BIGINT) DIV COUNT(*) AS mean_cust_span,
                CAST(SUM(span_y) AS BIGINT) DIV COUNT(*) AS mean_date_span
         FROM dspans
         UNION ALL
         SELECT 'z_ordered', COUNT(*),
                CAST(SUM(span_x) AS BIGINT) DIV COUNT(*),
                CAST(SUM(span_y) AS BIGINT) DIV COUNT(*)
         FROM zspans
         ORDER BY layout""")
  }

  val q135Oracle: String =
    """WITH base AS (
         SELECT o_orderkey,
                (o_custkey % 65536)::BIGINT AS x,
                (datediff('day', DATE '1992-01-01', o_orderdate) % 65536)::BIGINT AS y
         FROM orders),
       zed AS (
         SELECT o_orderkey, x, y,
                list_sum(list_transform(range(0, 16), i ->
                  ((x >> i::INT) & 1) * (1::BIGINT << (2 * i)::INT)
                + ((y >> i::INT) & 1) * (1::BIGINT << (2 * i + 1)::INT)))::BIGINT AS z
         FROM base),
       buckets AS (
         SELECT x, y,
                NTILE(64) OVER (ORDER BY z, o_orderkey) AS z_file,
                NTILE(64) OVER (ORDER BY y, o_orderkey) AS d_file
         FROM zed),
       zspans AS (
         SELECT z_file, MAX(x) - MIN(x) AS span_x, MAX(y) - MIN(y) AS span_y
         FROM buckets GROUP BY z_file),
       dspans AS (
         SELECT d_file, MAX(x) - MIN(x) AS span_x, MAX(y) - MIN(y) AS span_y
         FROM buckets GROUP BY d_file)
       SELECT 'date_sorted' AS layout, COUNT(*)::BIGINT AS n_files,
              SUM(span_x)::BIGINT // COUNT(*)::BIGINT AS mean_cust_span,
              SUM(span_y)::BIGINT // COUNT(*)::BIGINT AS mean_date_span
       FROM dspans
       UNION ALL
       SELECT 'z_ordered', COUNT(*)::BIGINT,
              SUM(span_x)::BIGINT // COUNT(*)::BIGINT,
              SUM(span_y)::BIGINT // COUNT(*)::BIGINT
       FROM zspans
       ORDER BY layout"""

  /** Avro ingestion/egress round-trip as an ORACLE-CHECKED query: project
    * three document columns, write them as real Avro container files
    * (graft.sources.AvroIO — the connector-less reader/writer), read them
    * back, aggregate. The DuckDB oracle computes the same aggregate from
    * the parquet directly, so the hash match proves the Avro round-trip
    * is lossless — the strongest check available with no Avro support in
    * the oracle engine (reference example surface:
    * sparksql-server/examples/src/main/resources/users.avro). */
  /** Temp roots created by q136 in this JVM, removed at exit (ADVICE r9:
    * per-invocation dirs fixed the r8 delete-vs-read race but accreted in
    * /tmp without bound). Deletion must wait for JVM exit — the DataFrame
    * q136 returns reads the Avro dir lazily, so an eager delete of a prior
    * invocation's dir could race a still-pending read. */
  private val avroTempRoots =
    java.util.Collections.synchronizedList(new java.util.ArrayList[java.nio.file.Path]())
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      avroTempRoots.forEach { root =>
        // per-root NonFatal guard (ADVICE r10): Files.walk's iteration throws
        // UncheckedIOException (a RuntimeException) — an IOException-only
        // catch let one bad root kill the hook thread and leak the rest; the
        // stream also holds directory handles until closed
        try {
          val walk = java.nio.file.Files.walk(root)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
          finally walk.close()
        } catch { case scala.util.control.NonFatal(_) => () }
      }))
  }

  def q136AvroRoundtrip(t: T): DataFrame = {
    import t.spark.implicits._
    val docs = t.documents.select($"doc_id", $"lang", $"n_chars")
    // private per-invocation dir (ADVICE r8): a fixed hash-of-dir path let
    // two concurrent JVMs on one corpus race delete-vs-read, and distinct
    // corpora could collide on String.hashCode
    // child path: Hadoop's OutputFormat requires a not-yet-existing dir
    val root = java.nio.file.Files.createTempDirectory("graft-avro-rt-")
    avroTempRoots.add(root)
    val dir = root.resolve("out").toString
    graft.sources.AvroIO.write(docs, dir)
    graft.sources.AvroIO.read(t.spark, dir)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .orderBy($"lang")
  }

  val q136Oracle: String =
    """SELECT lang, COUNT(*) AS n_docs, SUM(n_chars)::BIGINT AS total_chars
       FROM documents GROUP BY lang ORDER BY lang"""

  /** Persistent session-catalog table (VERDICT r10 next-6): `CREATE TABLE
    * ... AS SELECT` against the shared catalog, then the result read back
    * FROM THE TABLE — not the temp view. The reference only ever had
    * per-connection temp tables (reference: sparksql-server/src/main/scala/
    * listener/DAGListener.scala:155-162); a catalog table lives in
    * SharedState, so it survives the connection that created it —
    * QueryGatewaySpec proves a second connection reads a table the first
    * one persisted. Summary-shaped on purpose: at 100 TB a persisted
    * artifact is an aggregate or a curated subset, not a copy of the
    * corpus, so the CTAS write stays a few KB at any input scale.
    *
    * Single-writer assumption (ADVICE r11): the DROP → orphan-dir delete →
    * CTAS sequence on this FIXED table name is not safe under concurrent
    * invocation — two sessions racing here can delete the location out
    * from under each other's CTAS or read. Fine for the sequential
    * bench/verify harness this query serves; a concurrent-gateway caller
    * would derive a session-unique table name instead. */
  def q137CtasCatalog(t: T): DataFrame = {
    val s = t.spark
    t.orders.createOrReplaceTempView("graft_q137_src")
    s.sql("DROP TABLE IF EXISTS graft_q137_priority_summary")
    // a FRESH JVM's in-memory catalog has no entry for the table, so the
    // DROP above no-ops — but the previous JVM's warehouse DIRECTORY
    // survives and CTAS refuses an existing location; clear the orphan
    // (managed-table location = warehouse/<lowercased name>)
    locally {
      val loc = new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier("graft_q137_priority_summary")))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) { fs.delete(loc, true); () }
    }
    // integral measures only (count, key extrema): a DOUBLE sum would make
    // the cross-engine hash compare float-order-sensitive
    s.sql("""CREATE TABLE graft_q137_priority_summary USING parquet AS
             SELECT o_orderpriority AS priority, count(*) AS n_orders,
                    min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
             FROM graft_q137_src GROUP BY o_orderpriority""")
    s.sql("""SELECT priority, n_orders, first_key, last_key
             FROM graft_q137_priority_summary ORDER BY priority""")
  }

  val q137Oracle: String =
    """SELECT o_orderpriority AS priority, COUNT(*) AS n_orders,
              MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
       FROM orders GROUP BY o_orderpriority ORDER BY priority"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_substring_index" -> ((s, d) => q82SubstringIndex(T(s, d))),
    "q83_pad_fns"         -> ((s, d) => q83PadFns(T(s, d))),
    "q84_conv_bases"      -> ((s, d) => q84ConvBases(T(s, d))),
    "q85_elt_find_in_set" -> ((s, d) => q85EltFindInSet(T(s, d))),
    "q86_calendar_fns"    -> ((s, d) => q86CalendarFns(T(s, d))),
    "q87_array_edit_fns"  -> ((s, d) => q87ArrayEditFns(T(s, d))),
    "q88_map_build_fns"   -> ((s, d) => q88MapBuildFns(T(s, d))),
    "q89_regexp_family"   -> ((s, d) => q89RegexpFamily(T(s, d))),
    "q90_luhn_check"      -> ((s, d) => q90LuhnCheck(T(s, d))),
    "q91_char_fns"        -> ((s, d) => q91CharFns(T(s, d))),
    "q92_width_bucket"    -> ((s, d) => q92WidthBucket(T(s, d))),
    "q93_mask_fns"        -> ((s, d) => q93MaskFns(T(s, d))),
    "q94_group_by_all"    -> ((s, d) => q94GroupByAll(T(s, d))),
    "q95_csv_fns"         -> ((s, d) => q95CsvFns(T(s, d))),
    "q96_bit_access"      -> ((s, d) => q96BitAccess(T(s, d))),
    "q97_union_by_name"   -> ((s, d) => q97UnionByName(T(s, d))),
    "q98_recursive_cte"   -> ((s, d) => q98RecursiveCte(T(s, d))),
    "q99_execute_immediate" -> ((s, d) => q99ExecuteImmediate(T(s, d))),
    "q100_asof_exec"      -> ((s, d) => q100AsofExec(T(s, d))),
    "q101_sessionize"     -> ((s, d) => q101Sessionize(T(s, d))),
    "q102_rfm"            -> ((s, d) => q102Rfm(T(s, d))),
    "q103_market_share"   -> ((s, d) => q103MarketShare(T(s, d))),
    "q104_star_except"    -> ((s, d) => q104StarExcept(T(s, d))),
    "q105_time_weighted_avg" -> ((s, d) => q105TimeWeightedAvg(T(s, d))),
    "q106_latest_per_key" -> ((s, d) => q106LatestPerKey(T(s, d))),
    "q107_topk_agg"       -> ((s, d) => q107TopkAgg(T(s, d))),
    "q108_decimal_totals" -> ((s, d) => q108DecimalTotals(T(s, d))),
    "q109_rolling_distinct" -> ((s, d) => q109RollingDistinct(T(s, d))),
    "q110_interval_exec"  -> ((s, d) => q110IntervalExec(T(s, d))),
    "q111_ignore_nulls"   -> ((s, d) => q111IgnoreNulls(T(s, d))),
    "q112_lateral_alias"  -> ((s, d) => q112LateralAlias(T(s, d))),
    "q113_collation"      -> ((s, d) => q113Collation(T(s, d))),
    "q114_bitmap_distinct" -> ((s, d) => q114BitmapDistinct(T(s, d))),
    "q115_xml_fns"        -> ((s, d) => q115XmlFns(T(s, d))),
    "q116_corrupt_json"   -> ((s, d) => q116CorruptJson(T(s, d))),
    "q117_integer_ema"    -> ((s, d) => q117IntegerEma(T(s, d))),
    "q118_sql_variables"  -> ((s, d) => q118SqlVariables(T(s, d))),
    "q119_multi_agg_pivot" -> ((s, d) => q119MultiAggPivot(T(s, d))),
    "q120_distribute_by"  -> ((s, d) => q120DistributeBy(T(s, d))),
    "q121_join_hints"     -> ((s, d) => q121JoinHints(T(s, d))),
    "q122_percent_of_total" -> ((s, d) => q122PercentOfTotal(T(s, d))),
    "q123_filter_clause"  -> ((s, d) => q123FilterClause(T(s, d))),
    "q124_try_arithmetic" -> ((s, d) => q124TryArithmetic(T(s, d))),
    "q125_session_window" -> ((s, d) => q125SessionWindow(T(s, d))),
    "q126_approx_gate"    -> ((s, d) => q126ApproxDistinctGate(T(s, d))),
    "q127_hof_predicates" -> ((s, d) => q127HofPredicates(T(s, d))),
    "q128_named_params"   -> ((s, d) => q128NamedParams(T(s, d))),
    "q129_scd2_build"     -> ((s, d) => q129Scd2Build(T(s, d))),
    "q130_quantile_gate"  -> ((s, d) => q130QuantileGate(T(s, d))),
    "q131_sketch_merge"   -> ((s, d) => q131SketchMerge(T(s, d))),
    "q132_pagination"     -> ((s, d) => q132Pagination(T(s, d))),
    "q133_recursive_spine" -> ((s, d) => q133RecursiveSpine(T(s, d))),
    "q134_nulls_ordering"  -> ((s, d) => q134NullsOrdering(T(s, d))),
    "q135_zorder_layout"   -> ((s, d) => q135ZorderLayout(T(s, d))),
    "q136_avro_roundtrip"  -> ((s, d) => q136AvroRoundtrip(T(s, d))),
    "q137_ctas_catalog"    -> ((s, d) => q137CtasCatalog(T(s, d))),
  )

  val oracles: Map[String, String] = Map(
    "q82_substring_index" -> q82Oracle,
    "q83_pad_fns"         -> q83Oracle,
    "q84_conv_bases"      -> q84Oracle,
    "q85_elt_find_in_set" -> q85Oracle,
    "q86_calendar_fns"    -> q86Oracle,
    "q87_array_edit_fns"  -> q87Oracle,
    "q88_map_build_fns"   -> q88Oracle,
    "q89_regexp_family"   -> q89Oracle,
    "q90_luhn_check"      -> q90Oracle,
    "q91_char_fns"        -> q91Oracle,
    "q92_width_bucket"    -> q92Oracle,
    "q93_mask_fns"        -> q93Oracle,
    "q94_group_by_all"    -> q94Oracle,
    "q95_csv_fns"         -> q95Oracle,
    "q96_bit_access"      -> q96Oracle,
    "q97_union_by_name"   -> q97Oracle,
    "q98_recursive_cte"   -> q98Oracle,
    "q99_execute_immediate" -> q99Oracle,
    "q100_asof_exec"      -> q100Oracle,
    "q101_sessionize"     -> q101Oracle,
    "q102_rfm"            -> q102Oracle,
    "q103_market_share"   -> q103Oracle,
    "q104_star_except"    -> q104Oracle,
    "q105_time_weighted_avg" -> q105Oracle,
    "q106_latest_per_key" -> q106Oracle,
    "q107_topk_agg"       -> q107Oracle,
    "q108_decimal_totals" -> q108Oracle,
    "q109_rolling_distinct" -> q109Oracle,
    "q110_interval_exec"  -> q110Oracle,
    "q111_ignore_nulls"   -> q111Oracle,
    "q112_lateral_alias"  -> q112Oracle,
    "q113_collation"      -> q113Oracle,
    "q114_bitmap_distinct" -> q114Oracle,
    "q115_xml_fns"        -> q115Oracle,
    "q116_corrupt_json"   -> q116Oracle,
    "q117_integer_ema"    -> q117Oracle,
    "q118_sql_variables"  -> q118Oracle,
    "q119_multi_agg_pivot" -> q119Oracle,
    "q120_distribute_by"  -> q120Oracle,
    "q121_join_hints"     -> q121Oracle,
    "q122_percent_of_total" -> q122Oracle,
    "q123_filter_clause"  -> q123Oracle,
    "q124_try_arithmetic" -> q124Oracle,
    "q125_session_window" -> q125Oracle,
    "q126_approx_gate"    -> q126Oracle,
    "q127_hof_predicates" -> q127Oracle,
    "q128_named_params"   -> q128Oracle,
    "q129_scd2_build"     -> q129Oracle,
    "q130_quantile_gate"  -> q130Oracle,
    "q131_sketch_merge"   -> q131Oracle,
    "q132_pagination"     -> q132Oracle,
    "q133_recursive_spine" -> q133Oracle,
    "q134_nulls_ordering"  -> q134Oracle,
    "q135_zorder_layout"   -> q135Oracle,
    "q136_avro_roundtrip"  -> q136Oracle,
    "q137_ctas_catalog"    -> q137Oracle,
  )
}
