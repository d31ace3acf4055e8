package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables}
import graft.operators.Joins

/** Advanced relational surface: CUBE, statistical aggregates, exact
  * percentiles, AS-OF and range-bounded joins, JSON schema parsing. */
object Advanced {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables(s, dir, n)

  val defs: Seq[GQuery] = Seq(

    // ---- CUBE over two dimensions.
    GQuery(
      "q21_cube_orders",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // ---- Statistical aggregates (stddev / correlation / covariance).
    GQuery(
      "q22_lineitem_stats",
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 3) AS qty_stddev,
        |  round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS qty_price_corr,
        |  round(covar_samp(l_discount, l_tax), 6) + 0.0 AS disc_tax_covar,
        |  round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 3).as("qty_stddev"),
          (round(corr(col("l_quantity"), col("l_extendedprice")), 4)
            + lit(0.0)).as("qty_price_corr"),
          // + 0.0 normalizes IEEE signed zero: a covariance rounding to
          // zero renders as -0 on one engine and 0 on the other otherwise
          (round(covar_samp(col("l_discount"), col("l_tax")), 6) + lit(0.0))
            .as("disc_tax_covar"),
          round(min(col("l_extendedprice")), 2).as("min_price"),
          round(max(col("l_extendedprice")), 2).as("max_price"))
        .orderBy("l_returnflag")
    },

    // ---- Exact interpolated percentiles (quantile_cont parity).
    GQuery(
      "q23_price_percentiles",
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
        |  round(quantile_cont(o_totalprice, 0.95), 2) AS p95
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          round(percentile(col("o_totalprice"), lit(0.25)), 2).as("p25"),
          round(percentile(col("o_totalprice"), lit(0.5)), 2).as("p50"),
          round(percentile(col("o_totalprice"), lit(0.75)), 2).as("p75"),
          round(percentile(col("o_totalprice"), lit(0.95)), 2).as("p95"))
        .orderBy("o_orderstatus")
    },

    // ---- AS-OF join: each error event matched to the user's most recent
    // click at or before it (union+window implementation; DuckDB has a
    // native ASOF JOIN as the oracle).
    GQuery(
      "q24_asof_error_click",
      """SELECT e.event_id, e.user_id,
        |  round(c.value, 3) AS asof_value,
        |  CAST(c.ts AS TIMESTAMP) AS asof_ts
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'error') e
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, value FROM events
        |      WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      Joins.asofJoin(errors, clicks, "user_id", "ts", "ts",
          Seq("value", "ts"))
        .select(col("event_id"), col("user_id"),
          round(col("asof_value"), 3).as("asof_value"),
          col("asof_ts"))
        .orderBy("event_id")
    },

    // ---- The same AS-OF semantics through the NATIVE operator
    // (custom LogicalPlan → AsofJoinExec merge pass; graded against
    // DuckDB's built-in ASOF JOIN like q24).
    GQuery(
      "q24b_asof_native",
      """SELECT e.event_id, e.user_id,
        |  round(c.value, 3) AS asof_value,
        |  CAST(c.ts AS TIMESTAMP) AS asof_ts
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'error') e
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, value FROM events
        |      WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
          col("value").as("r_value"))
      graft.plans.AsofJoinApi.asofJoinNative(s, errors, clicks,
          leftKey = "user_id", rightKey = "r_user",
          leftTime = "ts", rightTime = "r_ts")
        .select(col("event_id"), col("user_id"),
          round(col("r_value"), 3).as("asof_value"),
          col("r_ts").as("asof_ts"))
        .orderBy("event_id")
    },

    // ---- Range-bounded join: errors in the 10 minutes before each
    // purchase, per user.
    GQuery(
      "q25_errors_before_purchase",
      """SELECT p.event_id, p.user_id, count(e.ts) AS n_in_range
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id, ts FROM events
        |           WHERE event_type = 'error') e
        |  ON e.user_id = p.user_id
        | AND e.ts >= p.ts - INTERVAL 10 MINUTE AND e.ts < p.ts
        |GROUP BY p.event_id, p.user_id
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      Joins.rangeCount(
          ev.filter(col("event_type") === "purchase")
            .select("event_id", "user_id", "ts"),
          ev.filter(col("event_type") === "error").select("user_id", "ts"),
          key = "user_id", leftTime = "ts", rightTime = "ts",
          rangeSeconds = 600, leftId = "event_id")
        .select("event_id", "user_id", "n_in_range")
        .orderBy("event_id")
    },

    // ---- GROUPING SETS + grouping_id through the SQL surface (views
    // registered by Tables.registerViews; same engine, SQL face).
    GQuery(
      "q26_grouping_sets",
      """SELECT r_name, c_mktsegment,
        |  CAST(GROUPING(r_name, c_mktsegment) AS BIGINT) AS gid,
        |  count(*) AS n_customers
        |FROM customer, nation, region
        |WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
        |ORDER BY gid, r_name ASC NULLS FIRST,
        |  c_mktsegment ASC NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.registerViews(s, dir)
      s.sql(
        """SELECT r_name, c_mktsegment,
          |  CAST(grouping_id(r_name, c_mktsegment) AS BIGINT) AS gid,
          |  count(*) AS n_customers
          |FROM customer, nation, region
          |WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
          |GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
          |ORDER BY gid, r_name ASC NULLS FIRST,
          |  c_mktsegment ASC NULLS FIRST""".stripMargin)
    },

    // ---- Window-function breadth: lead, first_value, ntile, and a
    // RANGE frame (value-based, vs q14's ROWS frame).
    GQuery(
      "q27_window_breadth",
      """SELECT o_custkey, o_orderkey,
        |  CAST(lead(o_orderkey, 1) OVER w AS BIGINT) AS next_orderkey,
        |  round(first_value(o_totalprice) OVER w, 2) AS first_price,
        |  CAST(ntile(4) OVER w AS BIGINT) AS spend_quartile,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice
        |    RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW), 2)
        |    AS near_price_mass
        |FROM orders
        |WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wRange = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-10000L, Window.currentRow)
      t(s, dir, "orders").filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          lead(col("o_orderkey"), 1).over(w).cast("long").as("next_orderkey"),
          round(first_value(col("o_totalprice")).over(w), 2).as("first_price"),
          ntile(4).over(w).cast("long").as("spend_quartile"),
          round(sum(col("o_totalprice")).over(wRange), 2).as("near_price_mass"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- Scalar math-function surface.
    GQuery(
      "q28_math_surface",
      """SELECT o_orderkey,
        |  round(ln(o_totalprice), 4) AS ln_price,
        |  round(sqrt(o_totalprice), 4) AS sqrt_price,
        |  round(pow(o_totalprice, 0.5) - sqrt(o_totalprice), 4) + 0.0 AS pow_check,
        |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_bucket,
        |  CAST(abs(o_orderkey % 7 - 3) AS BIGINT) AS cyclic,
        |  round(greatest(o_totalprice - 100000, 0.0), 2) AS excess
        |FROM orders
        |WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          round(log(col("o_totalprice")), 4).as("ln_price"),
          round(sqrt(col("o_totalprice")), 4).as("sqrt_price"),
          (round(pow(col("o_totalprice"), 0.5) - sqrt(col("o_totalprice")), 4)
            + lit(0.0)).as("pow_check"),
          floor(col("o_totalprice") / 1000).cast("long").as("price_bucket"),
          abs(col("o_orderkey") % 7 - 3).cast("long").as("cyclic"),
          round(greatest(col("o_totalprice") - 100000, lit(0.0)), 2).as("excess"))
        .orderBy("o_orderkey")
    },

    // ---- Regex extraction + casting.
    GQuery(
      "q29_regex_extract",
      """SELECT p_partkey,
        |  CAST(regexp_extract(p_brand, '#(\d+)', 1) AS BIGINT) AS brand_num,
        |  regexp_extract(p_name, '^(\w+)', 1) AS first_word
        |FROM part
        |WHERE regexp_matches(p_brand, '#\d+')
        |ORDER BY p_partkey
        |LIMIT 500""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_brand").rlike("#\\d+"))
        .select(col("p_partkey"),
          regexp_extract(col("p_brand"), "#(\\d+)", 1).cast("long")
            .as("brand_num"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"))
        .orderBy("p_partkey")
        .limit(500)
    },

    // ---- Higher-order array functions: transform / filter / aggregate
    // over the token array, scalar outputs.
    GQuery(
      "q30_higher_order",
      """WITH toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id,
        |  CAST(list_sum(list_transform(t, w -> length(w))) AS BIGINT)
        |    AS total_chars,
        |  CAST(list_max(list_transform(t, w -> length(w))) AS BIGINT)
        |    AS max_word_len,
        |  CAST(len(list_filter(t, w -> length(w) > 4)) AS BIGINT)
        |    AS n_long_words
        |FROM toks
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.TextOps
      val toks = TextOps.tokens(col("text"))
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          aggregate(transform(toks, w => length(w).cast("long")), lit(0L),
            (acc, v) => acc + v).as("total_chars"),
          array_max(transform(toks, w => length(w).cast("long")))
            .as("max_word_len"),
          size(filter(toks, w => length(w) > 4)).cast("long")
            .as("n_long_words"))
        .orderBy("doc_id")
    },

    // ---- Positional explode (lateral view shape).
    GQuery(
      "q31_token_positions",
      """WITH toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE doc_id < 20)
        |SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS token
        |FROM (SELECT doc_id, t,
        |        unnest(generate_series(1, len(t))) AS i
        |      FROM toks) x
        |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
      import graft.operators.TextOps
      t(s, dir, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "token")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
        .orderBy("doc_id", "pos")
    },

    // ---- Ordered collect: sorted distinct aggregation to a delimited
    // string (arrays as output values render engine-specifically, so the
    // deterministic string form is the cross-engine contract).
    GQuery(
      "q32_collect_sources",
      """SELECT lang,
        |  string_agg(DISTINCT source, '|' ORDER BY source) AS sources,
        |  count(*) AS n_docs
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(
          concat_ws("|", sort_array(collect_set(col("source")))).as("sources"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang")
    },

    // ---- Schema'd JSON parsing (from_json to a map, keys exploded).
    GQuery(
      "evt_json_keys",
      """SELECT DISTINCT CAST(k AS VARCHAR) AS json_key
        |FROM (SELECT unnest(json_keys(props)) AS k FROM events)
        |ORDER BY json_key""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select(explode(map_keys(
          from_json(col("props"), lit("map<string,int>")))).as("json_key"))
        .distinct()
        .orderBy("json_key")
    }
  )
}
