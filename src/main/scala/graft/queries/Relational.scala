package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator surface from SURVEY.md §2.3 (Q1–Q21),
  * instantiated against the driver's star schema (TESTDATA.md).
  *
  * Every query here mirrors a construct the reference uses — CTE
  * chains, equi/cross joins, correlated-scalar-as-window, EXCEPT,
  * UNION-distinct, CASE ladders, date arithmetic, the calendar spine —
  * re-expressed as declarative Spark so Catalyst does pushdown,
  * pruning, and join selection. Scale notes per query in Scaladoc.
  */
object Relational {

  /** Per-value DECIMAL(12,2) cast → exact cross-engine summation. */
  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  private def sumMoney(c: Column): Column = sum(dec2(c)).cast("double")

  /** Q6/Q21: hash aggregate with partial (map-side) combine; at 100 TB
    * this shuffles only `|groups| × partitions` pre-aggregated rows.
    * Mirrors `create_f_get_event_changes.sql:61-88` group-by min/max.
    */
  val q01GroupAgg = Query(
    "q01_group_agg",
    Some("""SELECT l_returnflag, l_linestatus,
            |  COUNT(*) AS count_rows,
            |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
            |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
            |  MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
            |FROM lineitem GROUP BY l_returnflag, l_linestatus
            |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("count_rows"),
          sumMoney(col("l_quantity")).as("sum_qty"),
          sumMoney(col("l_extendedprice")).as("sum_price"),
          min("l_shipdate").as("min_ship"),
          max("l_shipdate").as("max_ship")
        )
        .orderBy("l_returnflag", "l_linestatus")
    }
  )

  /** Q7: ungrouped scalar aggregate (`MAX(datasetdate)` analog,
    * `meetmax_url_download.py:52-58`). Single partial-agg round trip.
    */
  val q02ScalarAgg = Query(
    "q02_scalar_agg",
    Some("""SELECT MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date,
            |  COUNT(*) AS n_orders FROM orders""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.orders.agg(
        min("o_orderdate").as("min_date"),
        max("o_orderdate").as("max_date"),
        count(lit(1)).as("n_orders")
      )
    }
  )

  /** Q2: inner equi-join fact→dim. `customer` is the small side —
    * explicitly broadcast, so no shuffle of `orders` at any scale
    * (dim tables stay broadcastable even at SF where facts are 100 TB).
    * Mirrors `create_f_get_event_changes.sql:56` fact→registry join.
    */
  val q03JoinAgg = Query(
    "q03_join_agg",
    Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
            |FROM orders JOIN customer ON o_custkey = c_custkey
            |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), sumMoney(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment")
    }
  )

  /** Q11-adjacent: anti join (NOT EXISTS). Broadcast the orders keys?
    * No — keys side can be huge; Spark plans a shuffled left-anti when
    * the right side exceeds the broadcast threshold, which is the
    * correct 100 TB plan. Here the distinct custkeys are small so AQE
    * picks broadcast.
    */
  val q04AntiJoin = Query(
    "q04_anti_join",
    Some("""SELECT c_nationkey, COUNT(*) AS n_customers_no_orders
            |FROM customer c
            |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
            |                  AND YEAR(o.o_orderdate) = 2001)
            |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.customer
        .join(
          t.orders.filter(year(col("o_orderdate")) === 2001),
          col("c_custkey") === col("o_custkey"),
          "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers_no_orders"))
        .orderBy("c_nationkey")
    }
  )

  /** Q3/Q14/Q18: cross join against a 1-row scalar aggregate (the
    * reference's "MaxURLCheckDate" CTE pattern,
    * `meetmax_url_download.py:52-63`) + interval arithmetic + BETWEEN.
    * The scalar side is broadcast → BroadcastNestedLoopJoin, zero
    * shuffle of the fact side.
    */
  val q05CrossScalar = Query(
    "q05_cross_scalar",
    Some("""WITH mx AS (SELECT MAX(o_orderdate) AS max_d FROM orders)
            |SELECT COUNT(*) AS n_recent,
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS recent_revenue
            |FROM orders, mx
            |WHERE o_orderdate >= max_d - INTERVAL 90 DAY""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      val mx = t.orders.agg(max("o_orderdate").as("max_d"))
      t.orders
        .crossJoin(broadcast(mx))
        .filter(col("o_orderdate") >= col("max_d") - expr("INTERVAL 90 DAY"))
        .agg(
          count(lit(1)).as("n_recent"),
          sumMoney(col("o_totalprice")).as("recent_revenue")
        )
    }
  )

  /** Q5: the correlated scalar subquery ("most recent prior event")
    * expressed the Spark-native way — a window, which needs one shuffle
    * by the partition key instead of a per-row subquery. This is the
    * as-of-join idiom from `create_f_get_event_changes.sql:17-22`.
    */
  val q06WindowPrev = Query(
    "q06_window_prev",
    Some("""SELECT o_orderkey, o_custkey, o_orderdate,
            |  MAX(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_order_date
            |FROM orders ORDER BY o_orderkey""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      val w = Window
        .partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
      t.orders
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          col("o_orderdate"),
          max("o_orderdate").over(w).as("prev_order_date")
        )
        .orderBy("o_orderkey")
    }
  )

  /** Q8/Q10/Q17: COALESCE fallback + CASE ladder + filter on the
    * computed column — the scenario classifier shape of
    * `create_f_get_event_changes.sql:101-110`.
    */
  val q07CaseCoalesce = Query(
    "q07_case_coalesce",
    Some("""WITH c AS (SELECT
            |  CASE WHEN o_totalprice >= 300000 THEN 'jumbo'
            |       WHEN o_totalprice >= 150000 THEN 'large'
            |       WHEN o_totalprice >= 50000 THEN 'medium'
            |       ELSE 'small' END AS bucket,
            |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status
            |FROM orders)
            |SELECT bucket, status, COUNT(*) AS n FROM c
            |WHERE bucket <> 'small'
            |GROUP BY bucket, status ORDER BY bucket, status""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.orders
        .select(
          when(col("o_totalprice") >= 300000, "jumbo")
            .when(col("o_totalprice") >= 150000, "large")
            .when(col("o_totalprice") >= 50000, "medium")
            .otherwise("small")
            .as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status")
        )
        .filter(col("bucket") =!= "small")
        .groupBy("bucket", "status")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket", "status")
    }
  )

  /** Q9/T1/T6 string scalar surface: UPPER/TRIM/LOWER/REPLACE/
    * SUBSTRING/CONCAT — all codegen'd builtins, no UDFs.
    */
  val q08Strings = Query(
    "q08_strings",
    Some("""SELECT p_partkey,
            |  UPPER(TRIM(p_name)) AS name_u,
            |  REPLACE(REPLACE(LOWER(p_type), ' ', '_'), '-', '_') AS type_norm,
            |  SUBSTRING(p_brand, 1, 6) AS brand6,
            |  p_brand || '#' || CAST(p_size AS VARCHAR) AS brand_size,
            |  LENGTH(p_name) AS name_len
            |FROM part ORDER BY p_partkey""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.part
        .select(
          col("p_partkey"),
          upper(trim(col("p_name"))).as("name_u"),
          regexp_replace(regexp_replace(lower(col("p_type")), " ", "_"), "-", "_")
            .as("type_norm"),
          substring(col("p_brand"), 1, 6).as("brand6"),
          concat(col("p_brand"), lit("#"), col("p_size").cast("string")).as("brand_size"),
          length(col("p_name")).cast("long").as("name_len")
        )
        .orderBy("p_partkey")
    }
  )

  /** Q11: EXCEPT (distinct set difference, Postgres semantics) —
    * the add/remove diff of `usefulqueries.sql:30-53`. Spark plans
    * this as a left-anti join over distinct rows.
    */
  val q09Except = Query(
    "q09_except",
    Some("""SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995
            |EXCEPT
            |SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
            |ORDER BY o_custkey""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      val y95 = t.orders.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val y96 = t.orders.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      y95.except(y96).orderBy("o_custkey")
    }
  )

  /** Q12/Q13: UNION with dedup (SQL UNION semantics — Spark's `union`
    * is UNION ALL, so `.distinct()` is required for parity).
    */
  val q10UnionDistinct = Query(
    "q10_union_distinct",
    Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 400000
            |UNION
            |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            |  AND YEAR(o_orderdate) = 2001
            |ORDER BY o_custkey""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      val a = t.orders.filter(col("o_totalprice") > 400000).select("o_custkey")
      val b = t.orders
        .filter(col("o_orderpriority") === "1-URGENT" && year(col("o_orderdate")) === 2001)
        .select("o_custkey")
      a.union(b).distinct().orderBy("o_custkey")
    }
  )

  /** Q13/Q14/Q15: DISTINCT + BETWEEN + IN-list, all pushed to the
    * parquet scan as PushedFilters.
    */
  val q11DistinctFilter = Query(
    "q11_distinct_filter",
    Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
            |WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-12-31 23:59:59'
            |  AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
            |ORDER BY o_orderstatus, o_orderpriority""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.orders
        .filter(
          col("o_orderdate").between("1997-01-01 00:00:00", "1997-12-31 23:59:59") &&
            col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
        )
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    }
  )

  /** Q16 + top-k: multi-key ORDER BY w/ DESC + LIMIT. Spark turns
    * orderBy+limit into TakeOrderedAndProject — no full sort at scale.
    */
  val q12TopK = Query(
    "q12_topk",
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
            |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.orders
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100)
    }
  )

  /** Q19/Q20 + §1.1 calendar dim: date spine via sequence+explode,
    * ISO day-of-week (PG-compatible numbering), holiday overlay, and
    * the previous-business-date window (`dataset_setup.sql:460-498`).
    * At scale the unpartitioned window is fine: the spine is 4k rows
    * regardless of data SF (it's a dimension, not a fact).
    */
  val q13Calendar = Query(
    "q13_calendar",
    Some("""WITH days AS (
            |  SELECT CAST(gs AS DATE) AS fulldate
            |  FROM generate_series(DATE '2024-01-01', DATE '2024-12-31', INTERVAL 1 DAY) AS t(gs)),
            |cal AS (
            |  SELECT fulldate,
            |    CAST(isodow(fulldate) AS INT) AS isodow,
            |    dayname(fulldate) AS downame,
            |    (isodow(fulldate) <= 5 AND fulldate NOT IN
            |      (DATE '2024-01-01', DATE '2024-07-04', DATE '2024-12-25')) AS isbusday
            |  FROM days)
            |SELECT fulldate, isodow, downame, isbusday,
            |  LAST_VALUE(CASE WHEN isbusday THEN fulldate END IGNORE NULLS) OVER
            |    (ORDER BY fulldate ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            |    AS prev_bus_date
            |FROM cal ORDER BY fulldate""".stripMargin),
    (spark, _) => {
      val holidays = Seq("2024-01-01", "2024-07-04", "2024-12-25").map(java.sql.Date.valueOf)
      val days = spark
        .sql(
          "SELECT explode(sequence(to_date('2024-01-01'), to_date('2024-12-31'), interval 1 day)) AS fulldate"
        )
      val cal = days
        .withColumn("isodow", ((dayofweek(col("fulldate")) + 5) % 7 + 1).cast("int"))
        .withColumn("downame", date_format(col("fulldate"), "EEEE"))
        .withColumn(
          "isbusday",
          col("isodow") <= 5 && !col("fulldate").isin(holidays: _*)
        )
      val w = Window.orderBy("fulldate").rowsBetween(Window.unboundedPreceding, -1)
      cal
        .withColumn(
          "prev_bus_date",
          last(when(col("isbusday"), col("fulldate")), ignoreNulls = true).over(w)
        )
        .orderBy("fulldate")
    }
  )

  /** Q1–Q18 composite — the flagship `f_get_event_changes` analog
    * (`create_f_get_event_changes.sql`): 5 CTEs, two scalar aggregates
    * fanned out by cross join, windowed group min/max, CASE scenario
    * ladder, filter on the computed column, multi-key ORDER BY.
    * Entities = customers, snapshots = order months; "added" = first
    * seen in the current snapshot, "removed" = last seen in the prior.
    * Scale: snapshot pruning (BETWEEN prev AND curr) prunes the scan;
    * the group-by shuffles only distinct (custkey, month) pairs.
    */
  val q14Flagship = Query(
    "q14_flagship_changes",
    Some(flagshipSql("orders")),
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.orders.createOrReplaceTempView("graft_q14_orders")
      spark.sql(flagshipSql("graft_q14_orders"))
    }
  )

  private def flagshipSql(ordersTable: String): String =
    s"""WITH snap AS (
       |  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS m
       |  FROM $ordersTable),
       |months AS (SELECT DISTINCT m FROM snap),
       |curr AS (SELECT MAX(m) AS curr_m FROM months),
       |prev AS (SELECT MAX(m) AS prev_m FROM months, curr WHERE m < curr_m),
       |span AS (
       |  SELECT s.o_custkey AS custkey, MIN(s.m) AS first_m, MAX(s.m) AS last_m
       |  FROM snap s, curr, prev
       |  WHERE s.m BETWEEN prev_m AND curr_m
       |  GROUP BY s.o_custkey),
       |classified AS (
       |  SELECT custkey, first_m, last_m,
       |    CASE WHEN first_m = curr_m THEN 'added'
       |         WHEN last_m = prev_m THEN 'removed'
       |         ELSE 'normal' END AS scenario
       |  FROM span, curr, prev)
       |SELECT custkey, scenario, first_m, last_m
       |FROM classified WHERE scenario <> 'normal'
       |ORDER BY scenario DESC, custkey""".stripMargin

  /** Q30 analog: JSON extraction from a config-ish string column. */
  val q15Json = Query(
    "q15_json",
    Some("""SELECT event_type,
            |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
            |  COUNT(*) AS n
            |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.events
        .groupBy("event_type")
        .agg(
          sum(get_json_object(col("props"), "$.k").cast("bigint")).as("sum_k"),
          count(lit(1)).as("n")
        )
        .orderBy("event_type")
    }
  )

  /** Tumbling-window aggregation (batch form; the streaming form with
    * watermark + Trigger.AvailableNow is asserted equivalent in
    * StreamingSpec). Hour buckets via date_trunc in both engines.
    */
  val q16TimeBucket = Query(
    "q16_time_bucket",
    Some("""SELECT date_trunc('hour', ts) AS bucket, event_type, COUNT(*) AS n,
            |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
            |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.events
        .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
        .orderBy("bucket", "event_type")
    }
  )

  /** Q7+Q23 analog: latest-active-version resolution — keep exactly one
    * row per key, the newest, with a total-order tiebreak. This is the
    * single-active-dataset invariant as a query (row_number = 1).
    */
  val q17LatestActive = Query(
    "q17_latest_active",
    Some("""SELECT user_id, ts AS last_ts, event_type AS last_type FROM (
            |  SELECT user_id, ts, event_type,
            |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
      t.events
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts").as("last_ts"), col("event_type").as("last_type"))
        .orderBy("user_id")
    }
  )

  /** Q5 in its literal form — a correlated scalar subquery (the
    * reference's business-day lookup shape,
    * create_f_get_event_changes.sql:17-22). Catalyst decorrelates it
    * into an aggregate + join; q06 shows the equivalent window idiom.
    */
  val q18CorrelatedScalar = Query(
    "q18_correlated_scalar",
    Some("""SELECT c_nationkey, COUNT(*) AS n_above_nation_avg
            |FROM customer c
            |WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
            |                   WHERE c2.c_nationkey = c.c_nationkey)
            |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.customer.createOrReplaceTempView("graft_q18_customer")
      spark.sql(
        """SELECT c_nationkey, COUNT(*) AS n_above_nation_avg
          |FROM graft_q18_customer c
          |WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM graft_q18_customer c2
          |                   WHERE c2.c_nationkey = c.c_nationkey)
          |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    }
  )

  /** Q4: LATERAL subquery — per-group top-N via a correlated derived
    * table (the reference's LEFT JOIN LATERAL,
    * create_f_get_event_changes.sql:100-108).
    */
  val q19Lateral = Query(
    "q19_lateral",
    Some("""SELECT p.o_orderpriority, t.o_orderkey, t.o_totalprice
            |FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
            |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
            |         WHERE o.o_orderpriority = p.o_orderpriority
            |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
            |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.orders.createOrReplaceTempView("graft_q19_orders")
      spark.sql(
        """SELECT p.o_orderpriority, t.o_orderkey, t.o_totalprice
          |FROM (SELECT DISTINCT o_orderpriority FROM graft_q19_orders) p,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM graft_q19_orders o
          |         WHERE o.o_orderpriority = p.o_orderpriority
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin)
    }
  )

  /** Left-semi join (EXISTS) — the complement of q04's anti join. */
  val q20ExistsSemi = Query(
    "q20_exists_semi",
    Some("""SELECT c_nationkey, COUNT(*) AS n_big_spenders
            |FROM customer c
            |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
            |              AND o.o_totalprice > 400000)
            |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.customer
        .join(
          t.orders.filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"),
          "left_semi")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_big_spenders"))
        .orderBy("c_nationkey")
    }
  )

  val all: Seq[Query] = Seq(
    q01GroupAgg, q02ScalarAgg, q03JoinAgg, q04AntiJoin, q05CrossScalar,
    q06WindowPrev, q07CaseCoalesce, q08Strings, q09Except, q10UnionDistinct,
    q11DistinctFilter, q12TopK, q13Calendar, q14Flagship, q15Json,
    q16TimeBucket, q17LatestActive, q18CorrelatedScalar, q19Lateral, q20ExistsSemi
  )
}
