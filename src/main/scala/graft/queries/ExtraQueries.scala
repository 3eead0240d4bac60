package graft.queries

import graft.cubes.{Cubes, Tables}
import graft.operators.Skew
import graft.query.{CubeQuery, Pred}
import org.apache.spark.sql.{functions => F}

/** Grouping sets, percentile metrics, skew-salted aggregation. */
object ExtraQueries {
  import org.apache.spark.sql.functions.col

  private def li(s: org.apache.spark.sql.SparkSession, d: String): CubeQuery =
    CubeQuery(Cubes.lineitemCube(s, d))

  val qs: Seq[NamedQuery] = Seq(

    // ROLLUP grouping sets (subtotals + grand total)
    NamedQuery("q26_rollup",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .slice("line_status", "lineStatus")
        .measure("cnt", "count")
        .measure("sum_qty", "sumQty")
        .withRollup
        .asc("return_flag", "line_status")
        .toDF,
      Some("""SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
             |count(*) AS cnt, sum(l_quantity) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(1, 2)
             |ORDER BY return_flag ASC NULLS FIRST, line_status ASC NULLS FIRST,
             |cnt ASC, sum_qty ASC""".stripMargin)),

    // CUBE grouping sets (all combinations)
    NamedQuery("q27_cube_sets",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .slice("line_status", "lineStatus")
        .measure("cnt", "count")
        .withCubeSets
        .asc("return_flag", "line_status")
        .toDF,
      Some("""SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
             |count(*) AS cnt
             |FROM lineitem GROUP BY CUBE(1, 2)
             |ORDER BY return_flag ASC NULLS FIRST, line_status ASC NULLS FIRST, cnt ASC"""
        .stripMargin)),

    // exact interpolated percentiles (ClickHouse quantile parity)
    NamedQuery("q28_percentile",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .measure("median_price", "medianPrice")
        .measure("p90_price", "p90Price")
        .asc("return_flag")
        .toDF,
      Some("""SELECT l_returnflag AS return_flag,
             |round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
             |round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
             |FROM lineitem GROUP BY 1
             |ORDER BY return_flag ASC NULLS FIRST, median_price ASC, p90_price ASC"""
        .stripMargin)),

    // salted two-phase aggregation == plain aggregation (skew operator is
    // semantics-preserving; the oracle is the unsalted GROUP BY)
    NamedQuery("q29_salted_agg",
      (s, d) => Skew.saltedCountSum(
          Tables.lineitem(s, d),
          keys = Seq("return_flag" -> col("l_returnflag")),
          sumCols = Seq("sum_qty" -> col("l_quantity")),
          saltSource = col("l_orderkey"),
          salts = 16)
        .withColumn("sum_qty", F.round(col("sum_qty"), 2))
        .orderBy(col("return_flag").asc_nulls_first),
      Some("""SELECT l_returnflag AS return_flag, count(*) AS cnt,
             |round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY 1
             |ORDER BY return_flag ASC NULLS FIRST""".stripMargin)),

    // multi-fact cube merge: line metrics from lineitem + order metrics
    // from orders, full-outer joined on the shared year slice; the oracle
    // is the explicit two-aggregate FULL JOIN
    NamedQuery("q47_merged_cube",
      (s, d) => CubeQuery(Cubes.salesCube(s, d))
        .slice("yr", "year")
        .measure("line_count", "lineCount")
        .measure("sum_qty", "sumQty")
        .measure("order_count", "orderCount")
        .measure("order_revenue", "orderRevenue")
        .asc("yr")
        .toDF,
      Some("""SELECT coalesce(a.yr, b.yr) AS yr, a.line_count, a.sum_qty,
             |b.order_count, b.order_revenue
             |FROM (SELECT CAST(year(l_shipdate) AS INT) AS yr, count(*) AS line_count,
             |      sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1) a
             |FULL JOIN (SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS order_count,
             |      round(sum(o_totalprice), 2) AS order_revenue FROM orders GROUP BY 1) b
             |ON a.yr = b.yr
             |ORDER BY yr ASC NULLS FIRST, line_count ASC NULLS FIRST,
             |sum_qty ASC NULLS FIRST, order_count ASC NULLS FIRST,
             |order_revenue ASC NULLS FIRST""".stripMargin)),

    // merged cube with a selector that both sources re-express (filter
    // applies per source pre-aggregation)
    NamedQuery("q48_merged_cube_filtered",
      (s, d) => CubeQuery(Cubes.salesCube(s, d))
        .slice("yr", "year")
        .measure("line_count", "lineCount")
        .measure("order_revenue", "orderRevenue")
        .when(graft.query.Pred.gteq("year", 1997))
        .asc("yr")
        .toDF,
      Some("""SELECT coalesce(a.yr, b.yr) AS yr, a.line_count, b.order_revenue
             |FROM (SELECT CAST(year(l_shipdate) AS INT) AS yr, count(*) AS line_count
             |      FROM lineitem WHERE year(l_shipdate) >= 1997 GROUP BY 1) a
             |FULL JOIN (SELECT CAST(year(o_orderdate) AS INT) AS yr,
             |      round(sum(o_totalprice), 2) AS order_revenue
             |      FROM orders WHERE year(o_orderdate) >= 1997 GROUP BY 1) b
             |ON a.yr = b.yr
             |ORDER BY yr ASC NULLS FIRST, line_count ASC NULLS FIRST,
             |order_revenue ASC NULLS FIRST""".stripMargin)),

    // analytic window functions (running sum / rank / lag) — no surface
    // in the reference (SURVEY §2.4) but table stakes for a complete
    // engine; one query covers frame, ranking and offset families
    NamedQuery("q67_window_funcs",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables.orders(s, d).filter(col("o_custkey") < 20)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        o.select(
            col("o_custkey").as("cust"),
            col("o_orderkey").as("okey"),
            F.unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"),
            F.round(F.sum(col("o_totalprice"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
              .as("running_total"),
            F.row_number().over(w).as("order_seq"),
            F.round(F.lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
            F.round(F.avg(col("o_totalprice"))
              .over(w.rowsBetween(-2, Window.currentRow)), 4).as("moving_avg3"))
          .orderBy(col("cust").asc, col("order_seq").asc)
      },
      Some("""SELECT o_custkey AS cust, o_orderkey AS okey,
             |epoch_ms(o_orderdate) AS odate_ms,
             |round(sum(o_totalprice) OVER w_run, 2) AS running_total,
             |row_number() OVER w_ord AS order_seq,
             |round(lag(o_totalprice, 1) OVER w_ord, 2) AS prev_price,
             |round(avg(o_totalprice) OVER w_avg, 4) AS moving_avg3
             |FROM orders WHERE o_custkey < 20
             |WINDOW
             |w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
             |w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |w_avg AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             |ORDER BY cust ASC, order_seq ASC""".stripMargin)),

    // single-pass SpaceSaving top-K sketch (streaming/huge-group-count
    // path; exact at this capacity — asserted against the two-phase exact
    // operator in TopKSpec). DuckDB can't express the sketch: the oracle
    // is the exact per-group top-3, which the sketch must reproduce here.
    NamedQuery("q63_topk_sketch",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("return_flag"))
        .agg(graft.functions.TopKFreq(3, capacity = 65536)(col("l_partkey")).as("topk"))
        .selectExpr("return_flag", "inline(topk)")
        .withColumnRenamed("value", "part_key")
        .orderBy(col("return_flag").asc_nulls_first, col("cnt").desc, col("part_key").asc),
      Some("""SELECT return_flag, part_key, cnt FROM (
             |SELECT return_flag, part_key, cnt, row_number() OVER (
             |  PARTITION BY return_flag
             |  ORDER BY cnt DESC NULLS LAST, part_key ASC NULLS FIRST) AS rn
             |FROM (SELECT l_returnflag AS return_flag, l_partkey AS part_key,
             |  count(*) AS cnt FROM lineitem GROUP BY 1, 2))
             |WHERE rn <= 3
             |ORDER BY return_flag ASC NULLS FIRST, cnt DESC NULLS LAST, part_key ASC"""
        .stripMargin)),

    // weighted SpaceSaving sketch (ClickHouse topKWeighted): top parts
    // by TOTAL QUANTITY, not occurrence count — exact while distinct
    // per group <= capacity, so the oracle is exact weighted top-3
    NamedQuery("q110_topk_weighted",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("return_flag"))
        .agg(graft.functions.TopKWeighted(3, capacity = 65536)(
          col("l_partkey"), col("l_quantity").cast("long")).as("topk"))
        .selectExpr("return_flag", "inline(topk)")
        .withColumnRenamed("value", "part_key")
        .withColumnRenamed("cnt", "total_qty")
        .orderBy(col("return_flag").asc_nulls_first,
          col("total_qty").desc, col("part_key").asc),
      Some("""SELECT return_flag, part_key, total_qty FROM (
             |SELECT return_flag, part_key, total_qty, row_number() OVER (
             |  PARTITION BY return_flag
             |  ORDER BY total_qty DESC NULLS LAST, part_key ASC NULLS FIRST) AS rn
             |FROM (SELECT l_returnflag AS return_flag, l_partkey AS part_key,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
             |  FROM lineitem GROUP BY 1, 2))
             |WHERE rn <= 3
             |ORDER BY return_flag ASC NULLS FIRST, total_qty DESC NULLS LAST, part_key ASC"""
        .stripMargin)),

    // analytic-function family beyond q67: lead, ntile, percent_rank,
    // cume_dist, running first_value — default frames match DuckDB's
    NamedQuery("q84_window_funcs2",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("prio")
          .orderBy(col("price").desc, col("okey").asc)
        Tables.orders(s, d).filter(col("o_orderkey") < 2000)
          .select(col("o_orderpriority").as("prio"),
            col("o_orderkey").as("okey"), col("o_totalprice").as("price"))
          .withColumn("next_price", F.lead("price", 1).over(w))
          .withColumn("quartile", F.ntile(4).over(w))
          .withColumn("pct_rank", F.round(F.percent_rank().over(w), 6))
          .withColumn("cume", F.round(F.cume_dist().over(w), 6))
          .withColumn("top_price", F.first("price").over(w))
          .orderBy(col("prio").asc_nulls_first, col("okey").asc)
      },
      Some("""SELECT o_orderpriority AS prio, o_orderkey AS okey,
             |o_totalprice AS price,
             |lead(o_totalprice) OVER w AS next_price,
             |CAST(ntile(4) OVER w AS INT) AS quartile,
             |round(percent_rank() OVER w, 6) AS pct_rank,
             |round(cume_dist() OVER w, 6) AS cume,
             |first_value(o_totalprice) OVER w AS top_price
             |FROM orders WHERE o_orderkey < 2000
             |WINDOW w AS (PARTITION BY o_orderpriority
             |             ORDER BY o_totalprice DESC, o_orderkey ASC)
             |ORDER BY prio ASC NULLS FIRST, okey ASC""".stripMargin)),

    // ClickHouse quantiles(0.25,0.5,0.75) parity: one-pass array metric
    // (to_json at the driver edge — nested values aren't pandas-hashable)
    NamedQuery("q92_quantiles_metric",
      (s, d) => {
        import org.apache.spark.sql.functions.to_json
        li(s, d)
          .slice("return_flag", "returnFlag")
          .measure("price_quartiles", "quantilesPrice")
          .asc("return_flag")
          .toDF
          .withColumn("price_quartiles", to_json(col("price_quartiles")))
      },
      Some("""SELECT l_returnflag AS return_flag,
             |CAST(to_json([round(quantile_cont(l_extendedprice, 0.25), 4),
             |  round(quantile_cont(l_extendedprice, 0.5), 4),
             |  round(quantile_cont(l_extendedprice, 0.75), 4)]) AS VARCHAR) AS price_quartiles
             |FROM lineitem GROUP BY 1
             |ORDER BY return_flag ASC NULLS FIRST, price_quartiles ASC""".stripMargin)),

    // ClickHouse argMin/argMax parity, deterministic under price ties via
    // (price, key) struct ordering; filtered variant exercises FILTER +
    // min_by together. Oracle = window rn=1 (DuckDB arg_min can't take a
    // struct ordering).
    NamedQuery("q93_argminmax",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .measure("cheapest_part", "cheapestPart")
        .measure("priciest_part", "priciestPart")
        .measureWhen("cheapest_hiqty", "cheapestPart", Pred.gt("quantity", 40))
        .asc("return_flag")
        .toDF,
      Some("""WITH lo AS (
             |  SELECT l_returnflag AS f, l_partkey AS pk, row_number() OVER (
             |    PARTITION BY l_returnflag
             |    ORDER BY l_extendedprice ASC, l_partkey ASC) AS rn
             |  FROM lineitem),
             |hi AS (
             |  SELECT l_returnflag AS f, l_partkey AS pk, row_number() OVER (
             |    PARTITION BY l_returnflag
             |    ORDER BY l_extendedprice DESC, l_partkey DESC) AS rn
             |  FROM lineitem),
             |lof AS (
             |  SELECT l_returnflag AS f, l_partkey AS pk, row_number() OVER (
             |    PARTITION BY l_returnflag
             |    ORDER BY l_extendedprice ASC, l_partkey ASC) AS rn
             |  FROM lineitem WHERE l_quantity > 40)
             |SELECT lo.f AS return_flag, lo.pk AS cheapest_part,
             |hi.pk AS priciest_part, lof.pk AS cheapest_hiqty
             |FROM lo JOIN hi ON lo.f = hi.f AND hi.rn = 1
             |JOIN lof ON lof.f = lo.f AND lof.rn = 1
             |WHERE lo.rn = 1
             |ORDER BY return_flag ASC NULLS FIRST, cheapest_part ASC,
             |priciest_part ASC, cheapest_hiqty ASC""".stripMargin)),

    // arbitrary GROUPING SETS — the general form behind ROLLUP (q26) and
    // CUBE (q27): user-chosen aggregation levels in one pass
    NamedQuery("q91_grouping_sets",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .slice("line_status", "lineStatus")
        .measure("cnt", "count")
        .measure("sum_qty", "sumQty")
        .withGroupingSets(Seq(
          Seq("return_flag", "line_status"), Seq("line_status"), Seq()))
        .asc("return_flag", "line_status")
        .toDF,
      Some("""SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
             |count(*) AS cnt, sum(l_quantity) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
             |ORDER BY return_flag ASC NULLS FIRST, line_status ASC NULLS FIRST,
             |cnt ASC, sum_qty ASC""".stripMargin)),

    // EXCEPT completes the set-op family (union q37, intersect q39):
    // orders with no line items (non-empty in this fixture)
    NamedQuery("q85_except_keys",
      (s, d) => Tables.orders(s, d).select(col("o_orderkey"))
        .except(Tables.lineitem(s, d).select(col("l_orderkey")))
        .orderBy(col("o_orderkey").asc),
      Some("""SELECT o_orderkey FROM orders
             |EXCEPT SELECT l_orderkey FROM lineitem
             |ORDER BY o_orderkey ASC""".stripMargin)),

    // one-pass fixed-width histogram per group (ClickHouse histogram()
    // analogue): width_bucket lays l_quantity (1..50) into 10 bins; one
    // conditional sum per bin — a single aggregation pass, no
    // per-bin re-scan, map-side combined. to_json at the driver edge
    // (list cells are unhashable in the harness).
    NamedQuery("q95_histogram",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          F.to_json(F.array((1 to 10).map(i =>
            F.sum(F.when(F.width_bucket(
              col("l_quantity"), F.lit(1.0), F.lit(51.0), F.lit(10)) === i, 1L)
              .otherwise(0L))): _*)).as("hist"),
          F.count(F.lit(1)).as("n"))
        .orderBy(col("flag").asc),
      Some("""WITH b AS (SELECT l_returnflag AS flag,
             |  CAST(floor((l_quantity - 1) / 5) + 1 AS INT) AS bucket FROM lineitem),
             |c AS (SELECT flag, bucket, count(*) AS n FROM b GROUP BY 1, 2),
             |g AS (SELECT f.flag, gs.bucket FROM (SELECT DISTINCT flag FROM b) f,
             |      (SELECT unnest(generate_series(1, 10)) AS bucket) gs),
             |z AS (SELECT g.flag, g.bucket, COALESCE(c.n, 0) AS n
             |      FROM g LEFT JOIN c ON g.flag = c.flag AND g.bucket = c.bucket)
             |SELECT flag, CAST(to_json(list(n ORDER BY bucket)) AS VARCHAR) AS hist,
             |CAST(sum(n) AS BIGINT) AS n
             |FROM z GROUP BY flag ORDER BY flag ASC""".stripMargin)),

    // map-valued aggregate (ClickHouse sumMap) through the front door:
    // per flag, the lineStatus -> sum(qty) map — plan-backed metric #2,
    // proving Metric.planBuild generalizes beyond exact top-K. The
    // FILTERed variant exercises pred flow into the cascaded aggs.
    NamedQuery("q109_sum_map",
      (s, d) => li(s, d)
        .slice("flag", "returnFlag")
        .measure("cnt", "count")
        .measure("qty_by_status", "qtyByStatus")
        .measureWhen("hiqty_by_status", "qtyByStatus", Pred.gt("quantity", 45))
        .asc("flag")
        .toDF,
      Some("""WITH p AS (SELECT l_returnflag AS flag, l_linestatus AS s,
             |            sum(l_quantity) AS v
             |            FROM lineitem GROUP BY 1, 2),
             |h AS (SELECT l_returnflag AS flag, l_linestatus AS s,
             |       sum(l_quantity) AS v
             |       FROM lineitem WHERE l_quantity > 45 GROUP BY 1, 2),
             |pm AS (SELECT flag, CAST(to_json(map_from_entries(
             |         list({'k': s, 'v': v} ORDER BY s))) AS VARCHAR) AS qty_by_status
             |       FROM p GROUP BY 1),
             |hm AS (SELECT flag, CAST(to_json(map_from_entries(
             |         list({'k': s, 'v': v} ORDER BY s))) AS VARCHAR) AS hiqty_by_status
             |       FROM h GROUP BY 1),
             |c AS (SELECT l_returnflag AS flag, count(*) AS cnt FROM lineitem GROUP BY 1)
             |SELECT c.flag, c.cnt, pm.qty_by_status,
             |COALESCE(hm.hiqty_by_status, '{}') AS hiqty_by_status
             |FROM c JOIN pm ON c.flag = pm.flag
             |LEFT JOIN hm ON c.flag = hm.flag
             |ORDER BY c.flag ASC NULLS FIRST, c.cnt ASC,
             |qty_by_status ASC, hiqty_by_status ASC""".stripMargin)),

    // distinct-collect metric (ClickHouse groupUniqArray) with a metric
    // FILTER: which line statuses appear per flag, and which appear on
    // high-quantity rows only
    NamedQuery("q100_group_uniq_array",
      (s, d) => li(s, d)
        .slice("flag", "returnFlag")
        .measure("statuses", "lineStatuses")
        .measureWhen("hiqty_statuses", "lineStatuses", Pred.gt("quantity", 45))
        .measure("cnt", "count")
        .asc("flag")
        .toDF,
      Some("""SELECT l_returnflag AS flag,
             |CAST(to_json(list(DISTINCT l_linestatus ORDER BY l_linestatus)) AS VARCHAR) AS statuses,
             |CAST(to_json(list(DISTINCT l_linestatus ORDER BY l_linestatus)
             |  FILTER (WHERE l_quantity > 45)) AS VARCHAR) AS hiqty_statuses,
             |count(*) AS cnt
             |FROM lineitem GROUP BY 1
             |ORDER BY flag ASC NULLS FIRST, statuses ASC, hiqty_statuses ASC, cnt ASC""".stripMargin))
  )
}
