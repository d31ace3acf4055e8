package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{GQuery, Tables}

/** Event-stream analytics over the `events` table: time-bucketed
  * aggregation, JSON extraction, sessionization, pivot — the micro-batch
  * analytics surface ([EXT] per SURVEY.md §2.5; the reference's only
  * "streaming" is timer-driven batch). The same logic is reused by the
  * structured-streaming module over an unbounded source.
  *
  * Scale: every query here aggregates or windows on (time-bucket) or
  * (user_id) keys — both shuffle once on that key; JSON parsing is
  * codegen'd `get_json_object`/`from_json`, no UDFs.
  */
object Analytics {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables(s, dir, n)

  val defs: Seq[GQuery] = Seq(

    // ---- Tumbling 1-hour buckets (batch analogue of a tumbling window).
    GQuery(
      "evt_hourly_rollup",
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
        |  count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY bucket
        |ORDER BY bucket""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy("bucket")
    },

    // ---- JSON field extraction (props is a JSON object string).
    GQuery(
      "evt_json_extract",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  count(*) AS n_events,
        |  round(avg(value), 3) AS avg_value
        |FROM events
        |GROUP BY k
        |ORDER BY k""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .agg(count(lit(1)).as("n_events"),
          round(avg(col("value")), 3).as("avg_value"))
        .orderBy("k")
    },

    // ---- Sessionization: 30-minute inactivity gap via lag() + running
    // sum of session-start flags — one shuffle on user_id, then
    // windowed scans within each partition.
    GQuery(
      "evt_sessionize",
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT user_id,
        |  CAST(sum(new_session) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM flagged
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          // microsecond-exact gap compare to match the oracle's interval
          // arithmetic (second-truncated casts would disagree on e.g. a
          // 1800.3 s gap)
          when(col("prev_ts").isNull
            || unix_micros(col("ts")) - unix_micros(col("prev_ts"))
               > 30L * 60L * 1000000L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // ---- Pivot: per-user counts by event type (fixed column set so the
    // plan is a single pass of conditional aggregates, no collect of keys).
    GQuery(
      "evt_type_pivot",
      """SELECT user_id,
        |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
        |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
        |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
        |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
        |FROM events
        |WHERE user_id < 50
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .filter(col("user_id") < 50)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },

    // ---- Top spenders among purchase events (filter → agg → top-k).
    GQuery(
      "evt_top_purchasers",
      """SELECT user_id, count(*) AS n_purchases,
        |  round(sum(value), 2) AS total_value
        |FROM events
        |WHERE event_type = 'purchase'
        |GROUP BY user_id
        |ORDER BY total_value DESC, user_id
        |LIMIT 20""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("total_value").desc, col("user_id"))
        .limit(20)
    },

    // ---- Distinct users per event type: exact + approximate (HLL) side
    // by side; the approx column is excluded from the oracle compare by
    // rounding-free exact assertion in the spec instead.
    GQuery(
      "evt_distinct_users",
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  count(*) AS n_events
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    },

    // ---- Typed custom aggregators (Aggregator API) under the oracle
    // gate: bounded top-k (only the k-sized buffer shuffles, not the
    // group) and exact weighted mean ((sum, weight) buffer) — both
    // map-side merged like built-in aggregates. Weight is a deterministic
    // function of user_id so the oracle reproduces it. The top-3 list is
    // emitted as comma-joined fixed-point longs (value×10000), not an
    // array: the driver's compare sorts rows with pandas, which cannot
    // sort array-typed cells (round-2 gate failure).
    GQuery(
      "evt_weighted_stats",
      """SELECT event_type,
        |  round(sum(value * (1 + user_id % 3)) / sum(1 + user_id % 3), 4)
        |    AS wmean,
        |  array_to_string(list_transform(
        |    (list(value ORDER BY value DESC))[1:3],
        |    x -> CAST(CAST(round(x * 10000) AS BIGINT) AS VARCHAR)), ',')
        |    AS top3_s
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val topk = udaf(graft.operators.Aggregators.TopK(3))
      val wmean = udaf(graft.operators.Aggregators.WeightedMean())
      t(s, dir, "events")
        .withColumn("w", (lit(1) + col("user_id") % 3).cast("double"))
        .groupBy("event_type")
        .agg(
          round(wmean(col("value"), col("w")), 4).as("wmean"),
          topk(col("value")).as("top3"))
        .withColumn("top3_s",
          array_join(transform(col("top3"),
            x => round(x * 10000).cast("long").cast("string")), ","))
        .drop("top3")
        .orderBy("event_type")
    },

    // ---- Funnel / conversion analysis: ordered-sequence detection
    // view → click → purchase per user (each stage's first event must
    // follow the previous stage's). Three grouped mins + two equi-joins,
    // all on user_id — the shuffles share one key, and every aggregate is
    // map-side partial; no window over the raw event stream needed.
    GQuery(
      "evt_funnel",
      """WITH v AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_view
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
        |  GROUP BY e.user_id)
        |SELECT v.user_id,
        |  CAST(1 + (CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |         + (CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS stages,
        |  epoch_us(t_click) - epoch_us(t_view) AS us_view_to_click,
        |  epoch_us(t_purchase) - epoch_us(t_click) AS us_click_to_purchase
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t_view"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("t_view"))
        .groupBy("user_id").agg(min(col("ts")).as("t_click"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("t_click"))
        .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          (lit(1)
            + when(col("t_click").isNotNull, 1).otherwise(0)
            + when(col("t_purchase").isNotNull, 1).otherwise(0))
            .cast("long").as("stages"),
          (unix_micros(col("t_click")) - unix_micros(col("t_view")))
            .as("us_view_to_click"),
          (unix_micros(col("t_purchase")) - unix_micros(col("t_click")))
            .as("us_click_to_purchase"))
        .orderBy("user_id")
    },

    // ---- Sketch cardinality: HyperLogLog++ distinct-user counts. At
    // 100 TB the exact variant above shuffles every distinct (type, user)
    // pair; the sketch is a fixed-size buffer merged map-side — the only
    // cardinality that scales. Approx values are engine-specific (no
    // DuckDB oracle); AnalyticsSpec asserts relative error < 5% vs exact.
    GQuery.noOracle("evt_distinct_users_approx") { (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("n_users_approx"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    }
  )
}
