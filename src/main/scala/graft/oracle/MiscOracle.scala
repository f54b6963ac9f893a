package graft.oracle

/**
 * DuckDB oracle SQL for the events-table queries and relational classics.
 * Money columns are cents-integral in the test data, so sums are taken
 * over `CAST(ROUND(x*100) AS BIGINT)` — exact integers in both engines.
 * DuckDB SUM(BIGINT) widens to HUGEINT, so every output sum is cast back
 * to BIGINT to match Spark's LongType.
 */
object MiscOracle {

  def eventsDailySql: String =
    """SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(value*1000) AS BIGINT)) AS BIGINT) AS value_milli
      |FROM events GROUP BY 1, 2""".stripMargin

  def eventsJsonSql: String =
    """WITH e AS (SELECT event_type,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
      |FROM e GROUP BY 1""".stripMargin

  def eventsSessionsSql(gapSec: Int): String =
    s"""WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
       |  FROM events),
       |s AS (SELECT user_id, sec,
       |  lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev FROM e)
       |SELECT user_id, COUNT(*) AS n_events,
       |  CAST(SUM(CASE WHEN prev IS NULL OR sec - prev > $gapSec THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_sessions
       |FROM s GROUP BY user_id""".stripMargin

  /** Interval-join count (RangeJoin.interval semantics): clicks by the
    * same user within [sec - before, sec] of each error, zeros kept. */
  def rangeCountSql(before: Long): String =
    s"""WITH e AS (SELECT event_id, user_id, event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
       |err AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'error'),
       |clk AS (SELECT user_id, sec AS c_sec FROM e WHERE event_type = 'click'),
       |cnt AS (SELECT r.event_id, COUNT(*) AS n FROM err r JOIN clk c
       |    ON c.user_id = r.user_id AND c.c_sec BETWEEN r.sec - $before AND r.sec
       |  GROUP BY 1)
       |SELECT r.event_id, r.user_id,
       |  CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_clicks
       |FROM err r LEFT JOIN cnt ON cnt.event_id = r.event_id""".stripMargin

  def pricingSql(cutoff: String): String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
       |         * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c2,
       |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
       |         * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
       |         * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS BIGINT) AS charge_c3,
       |  COUNT(*) AS count_order,
       |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '$cutoff 00:00:00'
       |GROUP BY 1, 2""".stripMargin

  def topCustomersSql(topN: Int): String =
    s"""WITH t AS (SELECT c.c_mktsegment, c.c_custkey,
       |    CAST(SUM(CAST(ROUND(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |  GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER
       |  (PARTITION BY c_mktsegment ORDER BY total_cents DESC, c_custkey ASC) AS rnk
       |  FROM t)
       |SELECT c_mktsegment, c_custkey, total_cents, CAST(rnk AS INTEGER) AS rank
       |FROM r WHERE rnk <= $topN""".stripMargin

  def setOpsSql(srcA: String, srcB: String): String =
    s"""WITH a AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
       |           FROM documents WHERE source = '$srcA'),
       |b AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
       |      FROM documents WHERE source = '$srcB')
       |SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT tok FROM a INTERSECT SELECT tok FROM b)
       |UNION ALL
       |SELECT 'except_a' AS op, COUNT(*) AS n FROM (SELECT tok FROM a EXCEPT SELECT tok FROM b)
       |UNION ALL
       |SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT tok FROM a UNION SELECT tok FROM b)""".stripMargin

  def rollupSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Exact dyadic quantiles over integral value_milli (see
    * SparkEntry.qEventsQuantiles for the parity argument). */
  def eventsQuantilesSql: String =
    """WITH e AS (SELECT event_type,
      |  CAST(floor(value*1000) AS BIGINT) AS vm FROM events)
      |SELECT event_type, COUNT(*) AS n,
      |  quantile_cont(vm, 0.25) AS q25,
      |  quantile_cont(vm, 0.5)  AS q50,
      |  quantile_cont(vm, 0.75) AS q75
      |FROM e GROUP BY 1""".stripMargin

  /** Star-join revenue by brand and supplier nation (cents-exact). */
  def brandRevenueSql: String =
    """SELECT p_brand, n_name, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
      |      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c2
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY 1, 2""".stripMargin

  /** As-of join: each error event matched to the same user's most recent
    * prior purchase (event-time ordered, ties by event_id). */
  def asofSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |u AS (SELECT user_id, event_id, sec, event_type,
      |    CASE WHEN event_type = 'purchase' THEN event_id END AS p_id,
      |    CASE WHEN event_type = 'purchase' THEN sec END AS p_sec
      |  FROM e WHERE event_type IN ('error', 'purchase')),
      |w AS (SELECT *,
      |    last_value(p_id IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY sec, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_purchase,
      |    last_value(p_sec IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY sec, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_sec
      |  FROM u)
      |SELECT event_id, user_id, asof_purchase,
      |  CAST(sec - asof_sec AS BIGINT) AS lag_sec
      |FROM w WHERE event_type = 'error' AND asof_purchase IS NOT NULL""".stripMargin

  /** Framed analytic window: per-user running sum and 3-row moving count. */
  def runningSql: String =
    """WITH e AS (SELECT event_id, user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |    CAST(floor(value*1000) AS BIGINT) AS vm FROM events)
      |SELECT event_id, user_id,
      |  CAST(SUM(vm) OVER (PARTITION BY user_id ORDER BY sec, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_vm,
      |  CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY sec, event_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS window3_n
      |FROM e""".stripMargin

  def regionStatsSql: String =
    """SELECT r.r_name,
      |  COUNT(DISTINCT n.n_nationkey) AS n_nations,
      |  COUNT(c.c_custkey) AS n_customers,
      |  CAST(SUM(CAST(ROUND(c.c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
      |FROM region r
      |JOIN nation n ON n.n_regionkey = r.r_regionkey
      |JOIN customer c ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1""".stripMargin
}
