package graft

/** DuckDB oracle SQL — TPC-H-shape OLAP queries, sessionization and the
  * event-analytics ledgers (funnels, retention, attribution, growth,
  * PageRank).
  *
  * One link of the ordered `Oracles` trait chain (split from the
  * original single object purely for file-size hygiene). The chain
  * preserves the original top-down DEFINITION ORDER: vals initialize
  * in linearization order, so a member may only reference members of
  * the same or an earlier link — which is why a handful of members
  * sit next to the CTE helpers they depend on rather than with their
  * nominal domain.
  */
private[graft] trait OraclesEventsSql extends OraclesCdcSql {
  val q1LineitemAgg: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
      count(*) AS cnt
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  val qRegionRevenue: String = """
    SELECT r_name,
      count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name"""

  val qTopOrders: String = """
    SELECT o_orderkey, o_custkey, o_totalprice, epoch_ms(o_orderdate) AS o_date_ms
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""

  /** TPC-H Q3 shape — mirrors `q_shipping_priority`: revenue parity as
    * per-row floor(price·(1−discount)·100) cents (identical IEEE op
    * chain both engines) summed exactly. */
  val qShippingPriority: String = """WITH
    c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
    o AS (SELECT o_orderkey, o_custkey, o_orderpriority,
            epoch_ms(o_orderdate) AS o_date_ms
          FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
    l AS (SELECT l_orderkey,
            CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
              AS cents
          FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01')
    SELECT o.o_orderkey, o.o_date_ms, o.o_orderpriority,
      CAST(sum(l.cents) AS BIGINT) AS revenue_cents
    FROM o JOIN c ON o.o_custkey = c.c_custkey
           JOIN l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2, 3
    ORDER BY revenue_cents DESC, o_orderkey LIMIT 10"""

  /** TPC-H Q4 shape — mirrors `q_late_orders`: EXISTS over late-shipped
    * lines (each order counted once), priority rollup. */
  val qLateOrders: String = """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY 1 ORDER BY 1"""

  /** TPC-H Q5 shape — mirrors `q_local_supplier_volume`: one region,
    * customer and supplier nation must match, floor-cents revenue summed
    * exactly, the double only at the final /100 projection. */
  val qLocalSupplierVolume: String = """WITH
    nr AS (SELECT n_nationkey, n_name FROM nation
           JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'),
    l AS (SELECT l_orderkey, l_suppkey,
            CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
              AS cents
          FROM lineitem)
    SELECT nr.n_name,
      CAST(sum(l.cents) AS BIGINT) AS revenue_cents,
      CAST(CAST(sum(l.cents) AS BIGINT) AS DOUBLE) / 100 AS revenue
    FROM l
    JOIN orders ON l.l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nr ON c_nationkey = nr.n_nationkey
    JOIN supplier ON l.l_suppkey = s_suppkey
    WHERE s_nationkey = c_nationkey
    GROUP BY nr.n_name
    ORDER BY revenue_cents DESC, n_name"""

  /** TPC-H Q14 shape — mirrors `q_promo_revenue`: per ship-month promo
    * revenue share, cents summed exactly, one IEEE division. */
  val qPromoRevenue: String = """WITH
    l AS (SELECT l_partkey,
            CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INTEGER)
              AS ship_month,
            CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
              AS cents
          FROM lineitem)
    SELECT ship_month,
      CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents END) AS BIGINT)
        AS promo_cents,
      CAST(sum(cents) AS BIGINT) AS total_cents,
      CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents END) AS BIGINT)
           AS DOUBLE)
        / CAST(sum(cents) AS BIGINT) AS promo_share
    FROM l JOIN part ON l.l_partkey = p_partkey
    GROUP BY ship_month ORDER BY ship_month"""

  /** TPC-H Q19 shape — mirrors `q_disjunctive_revenue`: the three
    * brand/size/quantity disjuncts with the derivable `l_quantity <= 30`
    * conjunct hoisted to the scan (the pushdown the engine relies on),
    * per-brand exact floor-cents rollup. */
  val qDisjunctiveRevenue: String = """WITH
    l AS (SELECT l_partkey, l_quantity,
            CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
              AS cents
          FROM lineitem WHERE l_quantity >= 1 AND l_quantity <= 30)
    SELECT p_brand, count(*) AS n_lines,
      CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM l JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)
    GROUP BY p_brand ORDER BY p_brand"""

  /** TPC-H Q22 shape — mirrors `q_cold_customers`: above-average-balance
    * customers with no orders; balance in exact floor-cents, the average
    * is the one IEEE division, NOT EXISTS is the anti join. */
  val qColdCustomers: String = """WITH
    c AS (SELECT c_custkey, c_mktsegment,
            CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
          FROM customer),
    a AS (SELECT CAST(CAST(sum(bal_cents) AS BIGINT) AS DOUBLE) / count(*)
            AS avg_cents
          FROM c WHERE bal_cents > 0)
    SELECT c_mktsegment, count(*) AS n_customers,
      CAST(sum(bal_cents) AS BIGINT) AS bal_cents
    FROM c, a
    WHERE CAST(bal_cents AS DOUBLE) > avg_cents
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** TPC-H Q18 shape — mirrors `q_big_basket`: HAVING-subquery baskets
    * over threshold 300 (quantities are integral doubles, summed as exact
    * BIGINT), joined back to orders + customer, top-20. */
  val qBigBasket: String = """WITH
    big AS (SELECT l_orderkey,
              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) > 300)
    SELECT c_custkey, c_name, o_orderkey, epoch_ms(o_orderdate) AS o_date_ms,
      total_qty
    FROM big JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY total_qty DESC, o_orderkey LIMIT 20"""

  /** TPC-H Q15 shape — mirrors `q_top_supplier`: argmax over the
    * per-supplier revenue rollup with ties kept; the max comparison is an
    * integer equality on exact floor-cents. */
  val qTopSupplier: String = """WITH
    rev AS (SELECT l_suppkey,
              CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, revenue_cents
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE revenue_cents = (SELECT max(revenue_cents) FROM rev)
    ORDER BY s_suppkey"""

  /** TPC-H Q13 shape — mirrors `q_order_count_distribution`: LEFT OUTER
    * keeps zero-order customers, then the histogram of counts. */
  val qOrderCountDistribution: String = """WITH
    pc AS (SELECT c_custkey, count(o_orderkey) AS n_orders
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey)
    SELECT n_orders, count(*) AS n_customers
    FROM pc GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC"""

  /** TPC-H Q10 shape — mirrors `q_returned_revenue`: per-customer exact
    * floor-cents revenue from R-flagged lines, top-20. */
  val qReturnedRevenue: String = """WITH
    l AS (SELECT l_orderkey,
            CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
              AS cents
          FROM lineitem WHERE l_returnflag = 'R'),
    rev AS (SELECT o_custkey,
              CAST(sum(cents) AS BIGINT) AS revenue_cents
            FROM l JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_custkey)
    SELECT c_custkey, c_name, revenue_cents
    FROM rev JOIN customer ON o_custkey = c_custkey
    ORDER BY revenue_cents DESC, c_custkey LIMIT 20"""

  val qOrdersReturned: String = """
    SELECT o_orderpriority, count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS returned_value
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  val qCustomerTopOrder: String = """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn = 1 ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""

  val qSupplierNation: String = """
    SELECT n_name, count(*) AS n_suppliers,
      CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name"""

  /** Gap-based sessionization — lag/cumsum formulation of the same
    * session semantics Spark's native `session_window` implements
    * (start = first event, end = last event + gap). */
  val qEventsSessions: String = """WITH e AS (
      SELECT user_id, epoch_ms(ts) AS t FROM events),
    o AS (
      SELECT user_id, t,
        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
               OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 28800000
             THEN 1 ELSE 0 END AS brk
      FROM e),
    s AS (
      SELECT user_id, t,
        sum(brk) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid
      FROM o)
    SELECT user_id, min(t) AS session_start, max(t) + 28800000 AS session_end,
      CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"""

  /** Gap-tuning curve — mirrors `Sessions.sessionGapCurve` (candidate
    * gaps 15 m / 30 m / 1 h / 8 h): n_sessions(G) = n_users + breaks(G)
    * off ONE per-user lag. */
  val eventsSessionGapCurve: String = """WITH
    g AS (SELECT user_id,
            epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
              PARTITION BY user_id ORDER BY epoch_ms(ts)) AS gap
          FROM events),
    a AS (SELECT count(DISTINCT user_id) AS n_users,
            count(*) AS n_events,
            count(CASE WHEN gap > 900000 THEN 1 END) AS b15,
            count(CASE WHEN gap > 1800000 THEN 1 END) AS b30,
            count(CASE WHEN gap > 3600000 THEN 1 END) AS b60,
            count(CASE WHEN gap > 28800000 THEN 1 END) AS b480
          FROM g),
    f(gap_ms) AS (VALUES (CAST(900000 AS BIGINT)), (CAST(1800000 AS BIGINT)),
                         (CAST(3600000 AS BIGINT)), (CAST(28800000 AS BIGINT)))
    SELECT f.gap_ms,
      CAST(a.n_users + CASE f.gap_ms WHEN 900000 THEN b15 WHEN 1800000 THEN b30
                       WHEN 3600000 THEN b60 ELSE b480 END AS BIGINT)
        AS n_sessions,
      CAST(a.n_events AS DOUBLE) /
        (a.n_users + CASE f.gap_ms WHEN 900000 THEN b15 WHEN 1800000 THEN b30
                     WHEN 3600000 THEN b60 ELSE b480 END) AS mean_events
    FROM a, f ORDER BY f.gap_ms"""

  /** Session-shape ledger — mirrors `Sessions.sessionStats` (gap 8 h):
    * the `q_events_sessions` sessionization aggregated to one row; exact
    * means, interpolating percentiles rounded to 3 on both sides. */
  val eventsSessionStats: String = """WITH e AS (
      SELECT user_id, epoch_ms(ts) AS t FROM events),
    o AS (
      SELECT user_id, t,
        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
               OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 28800000
             THEN 1 ELSE 0 END AS brk
      FROM e),
    s AS (
      SELECT user_id, t,
        sum(brk) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
    sess AS (
      SELECT max(t) + 28800000 - min(t) AS dur,
        CAST(count(*) AS BIGINT) AS n_events
      FROM s GROUP BY user_id, sid)
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
      CAST(sum(n_events) AS BIGINT) AS n_events,
      CAST(CAST(sum(n_events) AS BIGINT) AS DOUBLE) / count(*) AS mean_events,
      round(quantile_cont(n_events, 0.5), 3) AS p50_events,
      round(quantile_cont(n_events, 0.9), 3) AS p90_events,
      CAST(CAST(sum(dur) AS BIGINT) AS DOUBLE) / count(*) AS mean_duration_ms,
      round(quantile_cont(dur, 0.5), 3) AS p50_duration_ms,
      round(quantile_cont(dur, 0.9), 3) AS p90_duration_ms
    FROM sess"""

  val qEventsHourly: String = """
    SELECT event_type, epoch_ms(ts) // 3600000 AS hour_id, count(*) AS cnt,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type, hour_id
    ORDER BY event_type, hour_id"""

  /** Ordered conversion funnel — mirrors `EventAnalytics.funnel`
    * (signup → click → purchase, first-touch semantics). */
  val eventsFunnel: String = """WITH
    s0 AS (SELECT user_id, min(epoch_ms(ts)) AS c0 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
    s1 AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS c1
           FROM events e JOIN s0 ON s0.user_id = e.user_id
           WHERE e.event_type = 'click' AND epoch_ms(e.ts) > s0.c0
           GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS c2
           FROM events e JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s1.c1
           GROUP BY e.user_id),
    n AS (
      SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name,
        (SELECT count(*) FROM s0) AS n_users
      UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s1)
      UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s2))
    SELECT step, step_name, n_users,
      CASE WHEN coalesce(lag(n_users) OVER (ORDER BY step), n_users) = 0
           THEN 0.0
           ELSE CAST(n_users AS DOUBLE) /
             coalesce(lag(n_users) OVER (ORDER BY step), n_users) END
        AS conv_from_prev,
      CASE WHEN (SELECT n_users FROM n WHERE step = 1) = 0 THEN 0.0
           ELSE CAST(n_users AS DOUBLE) /
             (SELECT n_users FROM n WHERE step = 1) END
        AS conv_from_first
    FROM n ORDER BY step"""

  /** Windowed funnel — mirrors `EventAnalytics.funnel(maxGapMs = 7d)`:
    * the same first-touch chain with an upper bound per step. */
  val eventsFunnelWindowed: String = """WITH
    s0 AS (SELECT user_id, min(epoch_ms(ts)) AS c0 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
    s1 AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS c1
           FROM events e JOIN s0 ON s0.user_id = e.user_id
           WHERE e.event_type = 'click' AND epoch_ms(e.ts) > s0.c0
             AND epoch_ms(e.ts) <= s0.c0 + 604800000
           GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS c2
           FROM events e JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s1.c1
             AND epoch_ms(e.ts) <= s1.c1 + 604800000
           GROUP BY e.user_id),
    n AS (
      SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name,
        (SELECT count(*) FROM s0) AS n_users
      UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s1)
      UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s2))
    SELECT step, step_name, n_users,
      CASE WHEN coalesce(lag(n_users) OVER (ORDER BY step), n_users) = 0
           THEN 0.0
           ELSE CAST(n_users AS DOUBLE) /
             coalesce(lag(n_users) OVER (ORDER BY step), n_users) END
        AS conv_from_prev,
      CASE WHEN (SELECT n_users FROM n WHERE step = 1) = 0 THEN 0.0
           ELSE CAST(n_users AS DOUBLE) /
             (SELECT n_users FROM n WHERE step = 1) END
        AS conv_from_first
    FROM n ORDER BY step"""

  /** RFM segmentation — mirrors `EventAnalytics.rfm` (cuts 7/30 days,
    * 10/3 purchases, 100.00/10.00 money): exact DECIMAL comparisons,
    * integer scores, string segment. */
  val eventsRfm: String = """WITH
    r AS (SELECT max(epoch_ms(ts) // 86400000) AS ref FROM events),
    p AS (SELECT user_id, max(epoch_ms(ts) // 86400000) AS last_d,
            count(*) AS frequency,
            sum(CAST(value AS DECIMAL(18,2))) AS m
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    s AS (SELECT user_id, r.ref - last_d AS recency_days, frequency,
            CAST(m AS DOUBLE) AS monetary,
            CASE WHEN r.ref - last_d <= 7 THEN 3
                 WHEN r.ref - last_d <= 30 THEN 2 ELSE 1 END AS r_score,
            CASE WHEN frequency >= 10 THEN 3
                 WHEN frequency >= 3 THEN 2 ELSE 1 END AS f_score,
            CASE WHEN m >= 100.00 THEN 3
                 WHEN m >= 10.00 THEN 2 ELSE 1 END AS m_score
          FROM p, r)
    SELECT user_id, recency_days, frequency, monetary,
      CAST(r_score AS BIGINT) AS r_score,
      CAST(f_score AS BIGINT) AS f_score,
      CAST(m_score AS BIGINT) AS m_score,
      CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
        CAST(m_score AS VARCHAR) AS segment
    FROM s ORDER BY user_id"""

  /** Session-scoped conversion — mirrors `Sessions.sessionFunnel`
    * (gap 28800000 ms, view → purchase): the established lag/cumsum
    * sessionization CTE, one conditional aggregate per session
    * (existence = max purchase t > min view t), 1-row rollup. */
  val eventsSessionFunnel: String = """WITH
    e AS (SELECT user_id, epoch_ms(ts) AS t, event_type FROM events),
    o AS (SELECT user_id, t, event_type,
            CASE WHEN lag(t) OVER w IS NULL
                   OR t - lag(t) OVER w > 28800000
                 THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
    s AS (SELECT user_id, t, event_type,
            sum(brk) OVER (PARTITION BY user_id ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS sid
          FROM o),
    per AS (SELECT user_id, sid,
              min(CASE WHEN event_type = 'view' THEN t END) AS ff,
              max(CASE WHEN event_type = 'purchase' THEN t END) AS lt
            FROM s GROUP BY 1, 2)
    SELECT count(*) AS n_sessions,
      count(ff) AS n_with_from,
      count(CASE WHEN lt > ff THEN 1 END) AS n_converted,
      CASE WHEN count(*) = 0 THEN 0.0
           ELSE CAST(count(ff) AS DOUBLE) / count(*) END AS from_rate,
      CASE WHEN count(ff) = 0 THEN 0.0
           ELSE CAST(count(CASE WHEN lt > ff THEN 1 END) AS DOUBLE) /
             count(ff) END AS conversion_rate
    FROM per"""

  /** Bot-cadence filter — mirrors `EventAnalytics.botFilter`
    * (minGaps 20, maxDistinctPct 10): user-partitioned lag gaps, exact
    * distinct count, integer flag arithmetic. */
  val eventsBotFilter: String = """WITH
    g AS (SELECT user_id,
            epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
              PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap
          FROM events)
    SELECT user_id,
      count(*) AS n_events,
      count(gap) AS n_gaps,
      count(DISTINCT gap) AS n_distinct_gaps,
      CASE WHEN count(gap) = 0 THEN 0.0
           ELSE CAST(count(DISTINCT gap) AS DOUBLE) / count(gap) END
        AS distinct_ratio,
      (count(gap) >= 20 AND count(DISTINCT gap) * 100 <= count(gap) * 10)
        AS is_bot
    FROM g GROUP BY user_id ORDER BY user_id"""

  /** Hour-of-week profile — mirrors `EventAnalytics.weekdayProfile`:
    * epoch-anchored `(ms // 3600000) % 168`, type totals for the share. */
  val eventsWeekdayProfile: String = """WITH
    c AS (SELECT (epoch_ms(ts) // 3600000) % 168 AS hour_of_week,
            event_type, count(*) AS n_events
          FROM events GROUP BY 1, 2),
    t AS (SELECT event_type, CAST(sum(n_events) AS BIGINT) AS tot
          FROM c GROUP BY event_type)
    SELECT c.hour_of_week, c.event_type, c.n_events,
      CAST(c.n_events AS DOUBLE) / t.tot AS share
    FROM c JOIN t USING (event_type)
    ORDER BY c.hour_of_week, c.event_type"""

  /** ROLLUP revenue cube — mirrors the `q_orders_rollup` entry: NULL
    * rollup keys coalesced to ALL on both sides for a stable sort. */
  val qOrdersRollup: String = """
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      coalesce(o_orderstatus, 'ALL') AS status,
      count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    ORDER BY priority, status"""

  /** Cohorted funnel — mirrors `EventAnalytics.cohortedFunnel`: the
    * funnel chain with every stage carrying its stage-1 week; per-cohort
    * tops join back for the conversion. */
  val eventsFunnelCohorted: String = """WITH
    s0 AS (SELECT user_id, min(epoch_ms(ts)) AS c0 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
    s0w AS (SELECT user_id, c0, c0 // 604800000 AS cohort_week FROM s0),
    s1 AS (SELECT e.user_id, s0w.cohort_week, min(epoch_ms(e.ts)) AS c1
           FROM events e JOIN s0w USING (user_id)
           WHERE e.event_type = 'click' AND epoch_ms(e.ts) > s0w.c0
           GROUP BY 1, 2),
    s2 AS (SELECT e.user_id, s1.cohort_week, min(epoch_ms(e.ts)) AS c2
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s1.c1
           GROUP BY 1, 2),
    n AS (SELECT cohort_week, CAST(1 AS BIGINT) AS step,
            'signup' AS step_name, count(*) AS n_users
          FROM s0w GROUP BY 1
          UNION ALL SELECT cohort_week, 2, 'click', count(*) FROM s1 GROUP BY 1
          UNION ALL SELECT cohort_week, 3, 'purchase', count(*) FROM s2 GROUP BY 1),
    t AS (SELECT cohort_week, n_users AS top FROM n WHERE step = 1)
    SELECT n.cohort_week, n.step, n.step_name, n.n_users,
      CAST(n.n_users AS DOUBLE) / t.top AS conv_from_first
    FROM n JOIN t USING (cohort_week)
    ORDER BY n.cohort_week, n.step"""

  /** Cohort retention matrix — mirrors `EventAnalytics.retention`. */
  val eventsRetention: String = """WITH
    c AS (SELECT user_id, min(epoch_ms(ts) // 86400000) AS cohort_day
          FROM events WHERE event_type = 'signup' GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS active_day
          FROM events),
    m AS (SELECT c.cohort_day, a.active_day - c.cohort_day AS day_offset,
            count(*) AS n_active
          FROM a JOIN c USING (user_id)
          WHERE a.active_day >= c.cohort_day
          GROUP BY 1, 2),
    s AS (SELECT cohort_day, count(*) AS cohort_size FROM c GROUP BY cohort_day)
    SELECT m.cohort_day, m.day_offset, m.n_active, s.cohort_size,
      CAST(m.n_active AS DOUBLE) / s.cohort_size AS retention
    FROM m JOIN s USING (cohort_day)
    ORDER BY m.cohort_day, m.day_offset"""

  /** First-order event-type transition matrix — mirrors
    * `EventAnalytics.transitions`: lead over the per-user (ms, event_id)
    * total order, (from, to)-keyed counts, probability out of the
    * source type. */
  val eventsTransitions: String = """WITH
    e AS (SELECT user_id, event_id, epoch_ms(ts) AS t, event_type,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY epoch_ms(ts), event_id) AS to_type
          FROM events),
    p AS (SELECT event_type AS from_type, to_type, count(*) AS n_pairs
          FROM e WHERE to_type IS NOT NULL GROUP BY 1, 2),
    f AS (SELECT from_type, CAST(sum(n_pairs) AS BIGINT) AS n_from
          FROM p GROUP BY from_type)
    SELECT p.from_type, p.to_type, p.n_pairs, f.n_from,
      CAST(p.n_pairs AS DOUBLE) / f.n_from AS prob
    FROM p JOIN f USING (from_type)
    ORDER BY p.from_type, p.to_type"""

  /** PageRank over the type-transition graph — mirrors
    * `EventAnalytics.pageRank` (10 iterations, damping 17/20, ppm edge
    * weights): the power iteration is UNROLLED (standard SQL forbids
    * aggregation in a recursive CTE member) — every step is the identical
    * integer chain `150000 + Σ ((mass·17) div 20 · w_ppm) div 10⁶`. */
  def eventsPagerank(iters: Int = 10): String = {
    require(iters >= 1, s"pageRank oracle needs at least one iteration, got $iters")
    val steps = (1 to iters).map { i =>
      s"""m$i AS (
      SELECT n.node,
        CAST(150000 + coalesce(sum((em.mass * 17 // 20) * em.w_ppm // 1000000), 0)
          AS BIGINT) AS mass
      FROM nodes n LEFT JOIN
        (SELECT e.dst, e.w_ppm, m.mass
         FROM edges e JOIN m${i - 1} m ON m.node = e.src) em
        ON em.dst = n.node
      GROUP BY n.node)"""
    }.mkString(",\n    ")
    s"""WITH
    e AS (SELECT user_id, event_id, epoch_ms(ts) AS t, event_type,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY epoch_ms(ts), event_id) AS to_type
          FROM events),
    p AS (SELECT event_type AS src, to_type AS dst, count(*) AS n_pairs
          FROM e WHERE to_type IS NOT NULL GROUP BY 1, 2),
    f AS (SELECT src, CAST(sum(n_pairs) AS BIGINT) AS n_out
          FROM p GROUP BY src),
    edges AS (
      SELECT p.src, p.dst,
        CAST(CAST(p.n_pairs AS HUGEINT) * 1000000 // f.n_out AS BIGINT)
          AS w_ppm
      FROM p JOIN f USING (src)),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM p UNION ALL SELECT dst FROM p)),
    m0 AS (SELECT node, CAST(1000000 AS BIGINT) AS mass FROM nodes),
    $steps
    SELECT node AS event_type, mass,
      CAST(mass AS DOUBLE) / t.total AS rank_share
    FROM m$iters, (SELECT CAST(sum(mass) AS BIGINT) AS total FROM m$iters) t
    ORDER BY mass DESC, event_type"""
  }

  /** DAU / rolling active users — mirrors `EventAnalytics.activeUsers`
    * (windowDays = 7): the distinct (user, day) set is the only wide
    * intermediate; the rolling count joins it to the bounded day list. */
  val eventsDau: String = """WITH
    ud AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
           FROM events),
    d AS (SELECT DISTINCT day AS dd FROM ud),
    dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
    wau AS (SELECT d.dd AS day, count(DISTINCT ud.user_id) AS wau
            FROM d JOIN ud ON ud.day BETWEEN d.dd - 6 AND d.dd
            GROUP BY d.dd)
    SELECT dau.day, dau.dau, wau.wau,
      CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
    FROM dau JOIN wau USING (day) ORDER BY day"""

  /** Top-k 3-step event paths — mirrors `EventAnalytics.pathTopK`
    * (k = 10): double lead over the per-user (ms, event_id) order. */
  val eventsPathTopK: String = """WITH
    e AS (SELECT event_type,
            lead(event_type, 1) OVER w AS s2,
            lead(event_type, 2) OVER w AS s3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
    p AS (SELECT event_type AS s1, s2, s3, count(*) AS n_paths
          FROM e WHERE s2 IS NOT NULL AND s3 IS NOT NULL
          GROUP BY 1, 2, 3),
    r AS (SELECT *,
            row_number() OVER (ORDER BY n_paths DESC, s1, s2, s3) AS rnk
          FROM p)
    SELECT CAST(rnk AS BIGINT) AS rnk, s1, s2, s3, n_paths
    FROM r WHERE rnk <= 10 ORDER BY rnk"""

  /** User-activity octaves — mirrors `EventAnalytics.userActivityOctaves`
    * (the events-side Zipf ledger, integer-exact floor(log2)). */
  val eventsUserOctaves: String = """WITH
    u AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
    o AS (SELECT CAST(len(bin(n)) - 1 AS BIGINT) AS octave,
                 count(*) AS n_users,
                 CAST(sum(n) AS BIGINT) AS n_events
          FROM u GROUP BY 1),
    t AS (SELECT CAST(sum(n_users) AS BIGINT) AS tu,
                 CAST(sum(n_events) AS BIGINT) AS te FROM o)
    SELECT octave, n_users, n_events,
      CAST(n_users AS DOUBLE) / tu AS user_share,
      CAST(n_events AS DOUBLE) / te AS event_share
    FROM o, t ORDER BY octave"""

  /** Last-touch attribution — mirrors `EventAnalytics.attribution`
    * (touch types click/view): the carried-forward latest touch via
    * `last_value(.. IGNORE NULLS)` over the preceding-rows frame; exact
    * DECIMAL(18,2) revenue, the share one IEEE division. */
  val eventsAttribution: String = """WITH
    e AS (SELECT user_id, event_id, event_type, value,
            last_value(CASE WHEN event_type IN ('click', 'view')
                            THEN event_type END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ch
          FROM events),
    p AS (SELECT coalesce(ch, 'direct') AS channel,
            count(*) AS n_purchases,
            sum(CAST(value AS DECIMAL(18,2))) AS rev
          FROM e WHERE event_type = 'purchase' GROUP BY 1),
    t AS (SELECT sum(rev) AS tot FROM p)
    SELECT channel, n_purchases, CAST(rev AS DOUBLE) AS revenue,
      CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE) AS revenue_share
    FROM p, t ORDER BY channel"""

  /** Cohort LTV triangle — mirrors `EventAnalytics.cohortLtv`: signup
    * cohorts × week offset, DECIMAL(18,2) weekly revenue, a
    * cohort-partitioned cumulative sum, LTV per cohort user as one
    * division of exact numbers. */
  val eventsCohortLtv: String = """WITH
    c AS (SELECT user_id, min(epoch_ms(ts) // 86400000) AS cohort_day
          FROM events WHERE event_type = 'signup' GROUP BY user_id),
    w AS (SELECT c.cohort_day,
            (epoch_ms(e.ts) // 86400000 - c.cohort_day) // 7 AS week_offset,
            count(*) AS n_purchases,
            sum(CAST(e.value AS DECIMAL(18,2))) AS wrev
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase'
            AND epoch_ms(e.ts) // 86400000 >= c.cohort_day
          GROUP BY 1, 2),
    s AS (SELECT cohort_day, count(*) AS cohort_size FROM c GROUP BY 1),
    m AS (SELECT cohort_day, week_offset, n_purchases, wrev,
            sum(wrev) OVER (PARTITION BY cohort_day ORDER BY week_offset
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crev
          FROM w)
    SELECT m.cohort_day, m.week_offset, m.n_purchases,
      CAST(m.wrev AS DOUBLE) AS week_revenue,
      CAST(m.crev AS DOUBLE) AS cum_revenue,
      s.cohort_size,
      CAST(m.crev AS DOUBLE) / s.cohort_size AS ltv_per_user
    FROM m JOIN s USING (cohort_day)
    ORDER BY m.cohort_day, m.week_offset"""

  /** Inter-arrival gap ledger — mirrors `EventAnalytics.interarrival`:
    * per-(user, type) consecutive gaps in ms; exact interpolating
    * percentiles rounded to 3 on both sides, mean as one division of
    * exact longs. */
  val eventsInterarrival: String = """WITH
    g AS (SELECT event_type,
            epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
              PARTITION BY user_id, event_type
              ORDER BY epoch_ms(ts), event_id) AS gap
          FROM events)
    SELECT event_type, count(*) AS n_gaps,
      CAST(CAST(sum(gap) AS BIGINT) AS DOUBLE) / count(*) AS mean_ms,
      round(quantile_cont(gap, 0.5), 3) AS p50_ms,
      round(quantile_cont(gap, 0.9), 3) AS p90_ms,
      round(quantile_cont(gap, 0.99), 3) AS p99_ms
    FROM g WHERE gap IS NOT NULL
    GROUP BY event_type ORDER BY event_type"""

  /** New-vs-returning split — mirrors `EventAnalytics.newVsReturning`:
    * first-ever-day per user off the distinct user-day set. */
  val eventsNewVsReturning: String = """WITH
    ud AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
           FROM events),
    f AS (SELECT user_id, min(day) AS fd FROM ud GROUP BY user_id)
    SELECT ud.day, count(*) AS dau,
      count(CASE WHEN ud.day = f.fd THEN 1 END) AS new_users,
      CAST(count(*) - count(CASE WHEN ud.day = f.fd THEN 1 END) AS BIGINT)
        AS returning_users,
      CAST(count(CASE WHEN ud.day = f.fd THEN 1 END) AS DOUBLE) / count(*)
        AS new_frac
    FROM ud JOIN f USING (user_id)
    GROUP BY ud.day ORDER BY ud.day"""

  /** Weekly growth accounting — mirrors `EventAnalytics.growthAccounting`:
    * per-user lag/lead over active weeks classifies new/retained/
    * resurrected and emits churn at week+1, clipped at the last observed
    * week; exact longs throughout. */
  val eventsGrowthAccounting: String = """WITH
    uw AS (SELECT DISTINCT user_id,
             (epoch_ms(ts) // 86400000) // 7 AS week FROM events),
    m AS (SELECT week,
            lag(week) OVER w AS prv, lead(week) OVER w AS nxt
          FROM uw WINDOW w AS (PARTITION BY user_id ORDER BY week)),
    status AS (
      SELECT week, CASE WHEN prv IS NULL THEN 'new'
                        WHEN prv = week - 1 THEN 'retained'
                        ELSE 'resurrected' END AS kind FROM m
      UNION ALL
      SELECT week + 1, 'churned' FROM m
      WHERE nxt IS NULL OR nxt > week + 1),
    mx AS (SELECT max(week) AS maxw FROM uw)
    SELECT week,
      count(CASE WHEN kind = 'new' THEN 1 END) AS new_users,
      count(CASE WHEN kind = 'retained' THEN 1 END) AS retained_users,
      count(CASE WHEN kind = 'resurrected' THEN 1 END) AS resurrected_users,
      count(CASE WHEN kind = 'churned' THEN 1 END) AS churned_users,
      count(CASE WHEN kind = 'new' THEN 1 END)
        + count(CASE WHEN kind = 'resurrected' THEN 1 END)
        - count(CASE WHEN kind = 'churned' THEN 1 END) AS net_growth
    FROM status, mx WHERE week <= maxw
    GROUP BY week ORDER BY week"""

  /** Activity-concentration Gini — mirrors `EventAnalytics.gini`: rank
    * form over per-user counts sorted (cnt, user_id); numerator and
    * denominator exact integers (HUGEINT here, DECIMAL(38,0) engine-side),
    * the Gini one IEEE division. */
  val eventsGini: String = """WITH
    u AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
    r AS (SELECT cnt,
            row_number() OVER (ORDER BY cnt, user_id) AS rnk
          FROM u)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
      CAST(sum(cnt) AS BIGINT) AS n_events,
      CAST(2 * sum(CAST(rnk AS HUGEINT) * cnt)
           - (count(*) + 1) * sum(cnt) AS DOUBLE)
        / CAST(count(*) * sum(cnt) AS DOUBLE) AS gini
    FROM r"""

  /** Conversion-lag ledger — mirrors `EventAnalytics.conversionLag`
    * (signup -> click -> purchase): per transition, first completion of
    * step k strictly after the first-touch completion of step k-1; exact
    * mean, interpolating p50/p90/p99 rounded to 3 on both sides. */
  val eventsConversionLag: String = """WITH
    s0 AS (SELECT user_id, min(epoch_ms(ts)) AS c0 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
    s1 AS (SELECT e.user_id, s0.c0, min(epoch_ms(e.ts)) AS c1
           FROM events e JOIN s0 ON e.user_id = s0.user_id
           WHERE e.event_type = 'click' AND epoch_ms(e.ts) > s0.c0
           GROUP BY e.user_id, s0.c0),
    s2 AS (SELECT e.user_id, s1.c1, min(epoch_ms(e.ts)) AS c2
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s1.c1
           GROUP BY e.user_id, s1.c1)
    SELECT CAST(1 AS BIGINT) AS step, 'signup' AS from_step,
      'click' AS to_step, count(*) AS n_users,
      CAST(CAST(sum(c1 - c0) AS BIGINT) AS DOUBLE) / count(*) AS mean_ms,
      round(quantile_cont(c1 - c0, 0.5), 3) AS p50_ms,
      round(quantile_cont(c1 - c0, 0.9), 3) AS p90_ms,
      round(quantile_cont(c1 - c0, 0.99), 3) AS p99_ms
    FROM s1
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'click', 'purchase', count(*),
      CAST(CAST(sum(c2 - c1) AS BIGINT) AS DOUBLE) / count(*),
      round(quantile_cont(c2 - c1, 0.5), 3),
      round(quantile_cont(c2 - c1, 0.9), 3),
      round(quantile_cont(c2 - c1, 0.99), 3)
    FROM s2 ORDER BY step"""

  /** Hourly-volume anomaly ledger — mirrors
    * `EventAnalytics.hourlyAnomaly` (madK = 3): exact interpolating
    * percentiles rounded to 3 decimals on both sides before the flag
    * comparison (the lag-percentile parity pattern). */
  val eventsAnomaly: String = """WITH
    h AS (SELECT epoch_ms(ts) // 3600000 AS hour, count(*) AS n_events
          FROM events GROUP BY 1),
    m AS (SELECT round(quantile_cont(n_events, 0.5), 3) AS med FROM h),
    d AS (SELECT round(quantile_cont(abs(h.n_events - m.med), 0.5), 3) AS mad
          FROM h, m)
    SELECT h.hour, h.n_events, m.med, d.mad,
      abs(h.n_events - m.med) > 3.0 * d.mad AS is_anomaly
    FROM h, m, d ORDER BY h.hour"""

  /** DuckDB's native ASOF JOIN vs `operators/AsOfJoin`'s union +
    * running-last formulation. Build side deduped to one click per
    * (user, ms) in both engines — equal-ts build rows have no defined
    * as-of winner anywhere. */
  val qEventsAsof: String = """WITH
    p AS (SELECT user_id, event_id, epoch_ms(ts) AS t_ms FROM events
          WHERE event_type = 'purchase'),
    c AS (SELECT user_id, epoch_ms(ts) AS click_t, max(event_id) AS click_id
          FROM events WHERE event_type = 'click' GROUP BY 1, 2)
    SELECT p.user_id, p.event_id, p.t_ms, c.click_id,
      p.t_ms - c.click_t AS lag_ms
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.t_ms >= c.click_t
    ORDER BY p.event_id"""

  /** Plain join — `operators/SaltedJoin` must produce identical rows
    * through its (keys, salt) spread. */
  val qEventsSaltedJoin: String = """WITH
    d AS (SELECT user_id, count(*) AS n_user_events FROM events GROUP BY 1)
    SELECT e.user_id, e.event_id, d.n_user_events
    FROM events e JOIN d ON e.user_id = d.user_id
    ORDER BY e.event_id"""

  /** Plain inequality join — the semantics `operators/RangeJoin` must
    * reproduce through its (key, band) equality-join rewrite. */
  val qEventsWindowPairs: String = """WITH
    c AS (SELECT user_id, event_id AS click_id, epoch_ms(ts) AS click_t
          FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS purchase_t
          FROM events WHERE event_type = 'purchase')
    SELECT c.user_id, c.click_id, p.purchase_id,
      p.purchase_t - c.click_t AS gap_ms
    FROM c JOIN p ON c.user_id = p.user_id
      AND p.purchase_t - c.click_t BETWEEN 0 AND 3600000
    ORDER BY c.click_id, p.purchase_id"""

  /** TPC-H Q1 shape, full form — mirrors `q_pricing_summary`: every sum
    * exact floor-cents/long, avgs derived from exact sums with the same
    * left-associated division chain. */
  val qPricingSummary: String = """WITH
    l AS (SELECT l_returnflag, l_linestatus,
            CAST(l_quantity AS BIGINT) AS q,
            CAST(floor(l_extendedprice * 100) AS BIGINT) AS pc,
            CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
              AS dc,
            CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
              * 100) AS BIGINT) AS cc
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01')
    SELECT l_returnflag, l_linestatus,
      CAST(sum(q) AS BIGINT) AS sum_qty,
      CAST(sum(pc) AS BIGINT) AS sum_price_cents,
      CAST(sum(dc) AS BIGINT) AS sum_disc_price_cents,
      CAST(sum(cc) AS BIGINT) AS sum_charge_cents,
      CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / count(*) AS avg_qty,
      CAST(CAST(sum(pc) AS BIGINT) AS DOUBLE) / 100 / count(*) AS avg_price,
      count(*) AS cnt
    FROM l GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** TPC-H Q6 shape — mirrors `q_forecast_revenue`: filter + global agg,
    * exact floor-cents. */
  val qForecastRevenue: String = """
    SELECT
      CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT))
        AS BIGINT) AS forecast_cents,
      count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24"""

  /** TPC-H Q7 shape — mirrors `q_volume_shipping`: both nations
    * prefiltered, pair disjunction post-join (here: both named, unequal),
    * exact floor-cents per (supp, cust, year). */
  val qVolumeShipping: String = """WITH
    sup AS (SELECT s_suppkey, n_name AS supp_nation
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name IN ('NATION_1', 'NATION_2')),
    cus AS (SELECT c_custkey, n_name AS cust_nation
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE n_name IN ('NATION_1', 'NATION_2')),
    l AS (SELECT l_orderkey, l_suppkey,
            CAST(year(l_shipdate) AS INTEGER) AS l_year,
            CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
              AS cents
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01')
    SELECT supp_nation, cust_nation, l_year,
      CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM l
    JOIN sup ON l.l_suppkey = sup.s_suppkey
    JOIN orders ON l.l_orderkey = o_orderkey
    JOIN cus ON o_custkey = cus.c_custkey
    WHERE supp_nation <> cust_nation
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** TPC-H Q8 shape — mirrors `q_market_share`: type-filtered parts,
    * region semi-join on orders, NATION_3's share of exact cents per
    * order year. */
  val qMarketShare: String = """WITH
    p AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
    cus AS (SELECT c_custkey FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'),
    o AS (SELECT o_orderkey,
            CAST(year(o_orderdate) AS INTEGER) AS o_year
          FROM orders
          WHERE EXISTS (SELECT 1 FROM cus WHERE c_custkey = o_custkey)),
    sup AS (SELECT s_suppkey, n_name AS supp_nation
            FROM supplier JOIN nation ON s_nationkey = n_nationkey),
    l AS (SELECT l_orderkey, l_partkey, l_suppkey,
            CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
              AS cents
          FROM lineitem)
    SELECT o_year,
      CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END)
        AS BIGINT) AS nation_cents,
      CAST(sum(cents) AS BIGINT) AS total_cents,
      CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END)
             AS BIGINT) AS DOUBLE)
        / CAST(sum(cents) AS BIGINT) AS mkt_share
    FROM l
    JOIN p ON l.l_partkey = p.p_partkey
    JOIN o ON l.l_orderkey = o.o_orderkey
    JOIN sup ON l.l_suppkey = sup.s_suppkey
    GROUP BY o_year ORDER BY o_year"""

  /** TPC-H Q9 shape (adapted: no partsupp in the testdata, so profit
    * reduces to revenue) — mirrors `q_product_profit`. */
  val qProductProfit: String = """WITH
    p AS (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'),
    sup AS (SELECT s_suppkey, n_name AS nation
            FROM supplier JOIN nation ON s_nationkey = n_nationkey),
    o AS (SELECT o_orderkey,
            CAST(year(o_orderdate) AS INTEGER) AS o_year FROM orders),
    l AS (SELECT l_orderkey, l_partkey, l_suppkey,
            CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
              AS cents
          FROM lineitem)
    SELECT nation, o_year, CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM l
    JOIN p ON l.l_partkey = p.p_partkey
    JOIN o ON l.l_orderkey = o.o_orderkey
    JOIN sup ON l.l_suppkey = sup.s_suppkey
    GROUP BY nation, o_year ORDER BY nation, o_year"""

  /** TPC-H Q17 shape — mirrors `q_small_qty_revenue`: the 0.2·avg
    * threshold evaluated exactly in integers (5·qty·n < Σqty), revenue
    * exact floor-cents. */
  val qSmallQtyRevenue: String = """WITH
    lp AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS pc
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
           WHERE p_brand = 'Brand#13'),
    a AS (SELECT l_partkey AS pk, CAST(sum(q) AS BIGINT) AS sumq,
            count(*) AS n
          FROM lp GROUP BY 1)
    SELECT
      CAST(sum(pc) AS BIGINT) AS small_qty_cents,
      count(*) AS n_lines,
      CAST(CAST(sum(pc) AS BIGINT) AS DOUBLE) / 100 / 7 AS avg_yearly
    FROM lp JOIN a ON lp.l_partkey = a.pk
    WHERE q * 5 * n < sumq"""

  /** TPC-H Q12 shape (adapted: ship class = l_returnflag IN ('A','R')
    * standing in for shipmode IN ('MAIL','SHIP'); late receipt = shipped
    * > 60 days after the order date — the testdata has no shipmode or
    * commit/receipt dates) — mirrors `q_ship_priority_mix`. */
  val qShipPriorityMix: String = """
    SELECT l_returnflag AS ship_class,
      CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY 1 ORDER BY 1"""

  /** TPC-H Q21 shape (adapted: late = shipped > 60 days after the order
    * date — the testdata has no commit/receipt dates) — mirrors
    * `q_waiting_suppliers`: EXISTS another supplier on the order, NOT
    * EXISTS another late one, over distinct (order, supplier) pairs. */
  val qWaitingSuppliers: String = """WITH
    ofin AS (SELECT o_orderkey, o_orderdate FROM orders
             WHERE o_orderstatus = 'F'),
    lf AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
           FROM lineitem JOIN ofin ON l_orderkey = o_orderkey),
    pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lf),
    late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lf
             WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
    blocking AS (
      SELECT l1.l_orderkey, l1.l_suppkey FROM late l1
      WHERE EXISTS (SELECT 1 FROM pairs p
                    WHERE p.l_orderkey = l1.l_orderkey
                      AND p.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM late l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey <> l1.l_suppkey))
    SELECT s_name, numwait FROM (
      SELECT l_suppkey, count(*) AS numwait
      FROM blocking GROUP BY l_suppkey) b
    JOIN supplier ON b.l_suppkey = s_suppkey
    ORDER BY numwait DESC, s_name LIMIT 10"""

}
