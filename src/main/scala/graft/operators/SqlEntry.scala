package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables.t

/** SQL front-end demonstrations: the same query surface as the DataFrame
  * modules, but submitted as ANSI SQL text through `spark.sql` over temp
  * views — the entry point a SQL-first user of the library would take.
  *
  * Each query here is ONE SQL string shared verbatim between the Spark run
  * and the DuckDB oracle, so parity is by construction: both engines parse
  * identical text. That restricts these queries to the ANSI intersection of
  * the two dialects (no QUALIFY, no engine-specific functions) and to the
  * exact-arithmetic idioms from graft.Tables (integer cents before sums,
  * divides last).
  *
  * What the three queries exercise in Catalyst's SQL path:
  *  - q45: parser → filter pushdown from SQL text (Q6-shape single scan;
  *    PlanSpec asserts the predicates reach the parquet reader);
  *  - q46: CTE + HAVING + window function + derived-table filter (the
  *    portable spelling of QUALIFY);
  *  - q47: scalar subquery + IN subquery + correlated EXISTS — Catalyst
  *    decorrelates these into joins (spot-checked in PlanSpec: no
  *    per-row subquery execution survives in the physical plan);
  *  - q48: correlated LATERAL derived table with ORDER BY+LIMIT (top-k
  *    per group as a join);
  *  - q49: explicit GROUPING SETS with NULLS FIRST pinned (the one
  *    ORDER BY default that diverges between the dialects);
  *  - q125: WITH RECURSIVE (Spark 4's UnionLoopExec) — iterative SQL
  *    the DataFrame API has no declarative equivalent for.
  *
  * Scale: q45 is a pure map-side scan+agg (one exchange of one row);
  * q46 shuffles orders once on o_custkey (pre-aggregated before the
  * customer join); q47's subqueries become a broadcast semi-join
  * (customer dim) and a shuffled semi-join (lineitem EXISTS) — the same
  * physical shapes as the hand-written DataFrame variants.
  */
object SqlEntry {

  /** Register the named sf-dir tables as temp views, then run one SQL text. */
  private def runSql(s: SparkSession, d: String, tables: Seq[String],
                     q: String): DataFrame = {
    tables.foreach(n => t(s, d, n).createOrReplaceTempView(n))
    s.sql(q)
  }

  // TPC-H Q6 shape: selective scan + exact-cents arithmetic, no joins.
  private val Q45 =
    """SELECT
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |           * CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/1e4 AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      |  AND round(l_discount*100) BETWEEN 5 AND 7
      |  AND l_quantity < 24""".stripMargin

  // CTE + HAVING + window rank, top-5 spenders per nation. rnk <= 5 is
  // filtered in a derived table (the ANSI spelling both engines share);
  // the rank ordering is fully tie-broken by c_custkey.
  private val Q46 =
    """SELECT * FROM (
      |  WITH spend AS (
      |    SELECT o_custkey, count(*) AS n_orders,
      |           sum(CAST(round(o_totalprice*100) AS BIGINT)) AS spend_cents
      |    FROM orders GROUP BY o_custkey HAVING count(*) >= 4
      |  )
      |  SELECT c_nationkey, c_custkey, n_orders,
      |         CAST(spend_cents AS DOUBLE)/100.0 AS spend,
      |         CAST(rank() OVER (PARTITION BY c_nationkey
      |                      ORDER BY spend_cents DESC, c_custkey) AS BIGINT)
      |           AS rnk
      |  FROM spend JOIN customer ON c_custkey = o_custkey
      |) ranked
      |WHERE rnk <= 5
      |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin

  // Scalar subquery (above-average order value, exact-cents average of
  // exact integers → identical double in both engines), uncorrelated IN,
  // and a correlated EXISTS that Catalyst decorrelates to a semi-join.
  private val Q47 =
    """SELECT o_orderkey, o_custkey,
      |       CAST(CAST(round(o_totalprice*100) AS BIGINT) AS DOUBLE)/100.0
      |         AS o_total
      |FROM orders o
      |WHERE CAST(round(o_totalprice*100) AS BIGINT) >
      |      (SELECT CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)
      |              / count(*) FROM orders)
      |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey < 5)
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
      |ORDER BY o_orderkey""".stripMargin

  // Correlated LATERAL derived table with ORDER BY + LIMIT — per-customer
  // top-2 orders, the "top-k per group as a join" idiom. Catalyst plans
  // the lateral as a rewritten window/join (never a per-row re-execution);
  // the inner ordering is fully tie-broken (cents desc, then key).
  private val Q48 =
    """SELECT c_custkey, t.o_orderkey, t.o_total
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey,
      |         CAST(CAST(round(o_totalprice*100) AS BIGINT) AS DOUBLE)/100.0
      |           AS o_total
      |  FROM orders WHERE o_custkey = c.c_custkey
      |  ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey
      |  LIMIT 2) t
      |WHERE c_nationkey = 3
      |ORDER BY c_custkey, t.o_orderkey""".stripMargin

  // Explicit GROUPING SETS (the general form behind q23 rollup/q24 cube).
  // NULLS FIRST is spelled out: Spark's ASC default is nulls-first,
  // DuckDB's is nulls-last — the one ORDER BY divergence between the
  // dialects, pinned explicitly.
  private val Q49 =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0
      |    AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
      |                        (o_orderstatus, o_orderpriority), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // Recursive CTE (Spark 4's UnionLoopExec; SPARK-24497): a data-driven
  // month spine over the orders date range, LEFT JOINed to the monthly
  // aggregate so ZERO-order months surface — the gaps-filling query that
  // plain GROUP BY cannot express (missing groups simply don't exist).
  // Kept to the ANSI intersection: integer month index m = yr*12+mon-1
  // (date-interval arithmetic spellings diverge between the dialects);
  // the anchor reads a 1-row bounds CTE and CARRIES hi through the
  // recursion state — referencing bounds from the recursive step instead
  // would re-run the min/max scan of orders on EVERY iteration (measured
  // 15 s → 0.6 s at sf0.1 for ~80 iterations when this was rewritten).
  // Scale: the recursion materializes one row per month (~tens) per
  // iteration driver-side — the spine is metadata-sized no matter how
  // large orders is; the single real shuffle is the monthly
  // pre-aggregation, which collapses map-side first.
  private val Q125 =
    """WITH RECURSIVE
      |bounds AS (
      |  SELECT min(year(o_orderdate)*12 + month(o_orderdate) - 1) AS lo,
      |         max(year(o_orderdate)*12 + month(o_orderdate) - 1) AS hi
      |  FROM orders),
      |months(m, hi) AS (
      |  SELECT lo AS m, hi FROM bounds
      |  UNION ALL
      |  SELECT m + 1, hi FROM months WHERE m < hi),
      |monthly AS (
      |  SELECT year(o_orderdate)*12 + month(o_orderdate) - 1 AS m,
      |         count(*) AS n_orders,
      |         sum(CAST(round(o_totalprice*100) AS BIGINT)) AS cents
      |  FROM orders GROUP BY 1)
      |SELECT CAST(floor(m/12.0) AS BIGINT) AS yr,
      |       CAST(m - 12*CAST(floor(m/12.0) AS BIGINT) + 1 AS BIGINT) AS mon,
      |       coalesce(n_orders, 0) AS n_orders,
      |       CAST(coalesce(cents, 0) AS DOUBLE)/100.0 AS total
      |FROM months LEFT JOIN monthly USING (m)
      |ORDER BY yr, mon""".stripMargin

  // SQL pipe syntax (Spark 4, SPARK-49555): the linear FROM-first form —
  // each |> step consumes the previous relation, so the query reads in
  // execution order instead of inside-out. Spark-only surface (DuckDB has
  // no pipe operators), so unlike q45-q49 the oracle is the equivalent
  // ANSI text rather than the same string; Catalyst compiles both to the
  // identical plan (filter pushed, partial agg before the exchange).
  private val Q134 =
    """FROM orders
      ||> WHERE o_orderstatus = 'O'
      ||> AGGREGATE count(*) AS n_orders,
      |     sum(CAST(round(o_totalprice*100) AS BIGINT)) AS cents
      |   GROUP BY o_orderpriority
      ||> SELECT o_orderpriority, n_orders, CAST(cents AS DOUBLE)/100.0 AS total
      ||> ORDER BY o_orderpriority""".stripMargin

  private val Q134Oracle =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0
      |    AS total
      |FROM orders WHERE o_orderstatus = 'O'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // CUSUM changepoint detection — S_t = max(0, S_{t-1} + (n_t − μ − k))
  // LOOKS like an irreducible sequential recurrence (S_t depends on
  // S_{t-1} through a max), but the max-plus algebra LINEARIZES it:
  // S_t = P_t − min_{0≤j≤t} P_j with P the plain prefix sum of
  // z_t = n_t·1000 − μ_milli − k_milli and P_0 = 0 — exactly two
  // windows (running sum, running min) over the metadata-sized day
  // frame, which ride the PlanGuard 'day' allowlist at any corpus
  // scale. (The first cut of this query ran the recurrence through
  // WITH RECURSIVE; UnionLoopExec re-evaluates the CTE chain every
  // iteration, which went quadratic on the sf0.1 300-day span —
  // 41.8 s vs 0.2 s for this form, same rows. The identity is exact
  // in integers, so the oracle hash is unchanged.) The only O(data)
  // work is the one map-side-combined daily-counts aggregate; the day
  // spine is gap-filled (q260's discipline — a zero-event day must
  // enter the statistic as 0). A level shift is INJECTED
  // deterministically (+40 events/day from day 20, the q65/q224
  // discipline — a detector proven only on quiet data proves
  // nothing), and the detector must alarm within a few days:
  // k = 10 events slack, alarm at h = 50, all exact integer
  // milli-events, so the alarm day — the measured detection delay —
  // is oracle-hashed, not asserted. Dialect splits: epoch extraction
  // (unix_micros vs epoch_us), integer division (div vs //), and the
  // spine generator (explode(sequence) vs unnest(range)).
  private def q256Sql(epochUs: String => String, idiv: String,
      spine: String) =
    s"""WITH base AS (
       |  SELECT (${epochUs("ts")} -
       |    (SELECT min(${epochUs("ts")}) FROM events)) $idiv 86400000000
       |    AS day
       |  FROM events),
       |bounds AS (SELECT max(day) AS hi FROM base),
       |daily AS (SELECT day, count(*) AS n FROM base GROUP BY 1),
       |spine AS ($spine),
       |x AS (
       |  SELECT s.day,
       |    CAST(coalesce(n, 0) +
       |      CASE WHEN s.day >= 20 THEN 40 ELSE 0 END AS BIGINT) AS n
       |  FROM spine s LEFT JOIN daily ON daily.day = s.day),
       |stats AS (
       |  SELECT CAST((sum(n) * 1000) $idiv count(*) AS BIGINT)
       |    AS mu_milli FROM x),
       |z AS (
       |  SELECT day, n, n * 1000 - mu_milli - 10000 AS z_milli
       |  FROM x CROSS JOIN stats),
       |pfx AS (
       |  SELECT day, n,
       |    CAST(sum(z_milli) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS p
       |  FROM z),
       |sm AS (
       |  SELECT day, n,
       |    CAST(p - least(CAST(0 AS BIGINT), min(p) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |      AS BIGINT) AS s_milli
       |  FROM pfx)
       |SELECT day, n AS n_obs, s_milli, s_milli > 50000 AS alarm
       |FROM sm ORDER BY day""".stripMargin

  /** q305's parameterized body — ONE text, two binding surfaces. */
  private val Q305Body =
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |    AS BIGINT) AS cents,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q305_sql_params" -> ((s, d) => {
      // Parameterized SQL — BOTH Spark 4 binding surfaces over one
      // query body: the named-parameter API (spark.sql(text, args) —
      // SPARK-44140, the injection-safe path a service embeds) and SQL-
      // level EXECUTE IMMEDIATE ... USING with positional markers
      // (SPARK-44751, the path a SQL client scripts). The two results
      // cross-join side by side with an agreement flag — the query
      // proves the bindings are equivalent, and the oracle (literal
      // parameters) pins both to the unparameterized answer.
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      val viaApi = s.sql(
        Q305Body + " WHERE l_quantity < :cap AND l_returnflag = :flag",
        Map("cap" -> 24, "flag" -> "R"))
      val esc = (Q305Body + " WHERE l_quantity < ? AND l_returnflag = ?")
        .replace("'", "''")
      val viaExec = s.sql(
        s"EXECUTE IMMEDIATE '$esc' USING 24, 'R'")
      viaApi.selectExpr("cents AS api_cents", "n AS api_n")
        .crossJoin(viaExec.selectExpr("cents AS exec_cents", "n AS exec_n"))
        .selectExpr("api_cents", "api_n", "exec_cents", "exec_n",
          "api_cents = exec_cents AND api_n = exec_n AS surfaces_agree")
    }),

    "q256_sql_cusum" -> ((s, d) => {
      graft.Tables.events(s, d).createOrReplaceTempView("events")
      s.sql(q256Sql(c => s"unix_micros($c)", "div",
        "SELECT explode(sequence(CAST(0 AS BIGINT), hi)) AS day " +
          "FROM bounds"))
    }),
    "q45_sql_scan_agg" ->
      ((s, d) => runSql(s, d, Seq("lineitem"), Q45)),
    "q46_sql_cte_window" ->
      ((s, d) => runSql(s, d, Seq("orders", "customer"), Q46)),
    "q47_sql_subqueries" ->
      ((s, d) => runSql(s, d, Seq("orders", "customer", "lineitem"), Q47)),
    "q48_sql_lateral_topk" ->
      ((s, d) => runSql(s, d, Seq("orders", "customer"), Q48)),
    "q49_sql_grouping_sets" ->
      ((s, d) => runSql(s, d, Seq("orders"), Q49)),
    "q125_sql_recursive" ->
      ((s, d) => runSql(s, d, Seq("orders"), Q125)),
    "q134_sql_pipe" ->
      ((s, d) => runSql(s, d, Seq("orders"), Q134)))

  val oracle: Map[String, String] = Map(
    "q305_sql_params" ->
      """WITH a AS (
        |  SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem
        |  WHERE l_quantity < 24 AND l_returnflag = 'R')
        |SELECT cents AS api_cents, n AS api_n,
        |  cents AS exec_cents, n AS exec_n,
        |  TRUE AS surfaces_agree
        |FROM a""".stripMargin,
    "q256_sql_cusum" -> q256Sql(c => s"epoch_us($c)", "//",
      "SELECT unnest(range(0, hi + 1)) AS day FROM bounds"),
    "q45_sql_scan_agg" -> Q45,
    "q46_sql_cte_window" -> Q46,
    "q47_sql_subqueries" -> Q47,
    "q48_sql_lateral_topk" -> Q48,
    "q49_sql_grouping_sets" -> Q49,
    "q125_sql_recursive" -> Q125,
    "q134_sql_pipe" -> Q134Oracle)
}
