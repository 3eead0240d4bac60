package graft.queries

import graft.cubes.Cubes
import graft.query.{CubeQuery, Pred}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Core cube-operator queries (SURVEY §2.1 O1–O16), each exercised through
  * the engine (Cube → CubeQuery → Compiler) and mirrored by a DuckDB
  * oracle. Sort order in the oracle reproduces the compiler's tiebreak
  * rule: explicit sort keys first (DESC NULLS LAST / ASC NULLS FIRST),
  * then every remaining output column ascending in schema order.
  */
object CoreQueries {

  private def li(s: SparkSession, d: String): CubeQuery =
    CubeQuery(Cubes.lineitemCube(s, d))

  val qs: Seq[NamedQuery] = Seq(

    // O1: global aggregation, no slice
    NamedQuery("q01_global_agg",
      (s, d) => li(s, d)
        .measure("n_rows", "count")
        .measure("sum_qty", "sumQty")
        .toDF,
      Some("SELECT count(*) AS n_rows, sum(l_quantity) AS sum_qty FROM lineitem")),

    // O1+O2: slice + multiple measures (the classic cube query)
    NamedQuery("q02_slice_measure",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .slice("line_status", "lineStatus")
        .measure("cnt", "count")
        .measure("sum_qty", "sumQty")
        .measure("amount", "amount")
        .measure("avg_disc", "avgDiscount")
        .measure("min_price", "minPrice")
        .measure("max_price", "maxPrice")
        .asc("return_flag", "line_status")
        .toDF,
      Some("""SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
             |count(*) AS cnt, sum(l_quantity) AS sum_qty,
             |round(sum(l_extendedprice), 2) AS amount,
             |round(avg(l_discount), 6) AS avg_disc,
             |min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
             |FROM lineitem GROUP BY 1, 2
             |ORDER BY return_flag ASC NULLS FIRST, line_status ASC NULLS FIRST,
             |cnt ASC, sum_qty ASC, amount ASC, avg_disc ASC, min_price ASC, max_price ASC"""
        .stripMargin)),

    // O3: dimension sub-fields (date { year, month })
    NamedQuery("q03_dim_subfield",
      (s, d) => li(s, d)
        .slice("ship_year", "shipDate", "year")
        .slice("ship_month", "shipDate", "month")
        .measure("cnt", "count")
        .asc("ship_year", "ship_month")
        .toDF,
      Some("""SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
             |CAST(month(l_shipdate) AS INT) AS ship_month, count(*) AS cnt
             |FROM lineitem GROUP BY 1, 2
             |ORDER BY ship_year ASC NULLS FIRST, ship_month ASC NULLS FIRST, cnt ASC"""
        .stripMargin)),

    // O3: chained cast-to-date sub-field
    NamedQuery("q04_subfield_date",
      (s, d) => li(s, d)
        .slice("ship_day", "shipDate", "date")
        .measure("cnt", "count")
        .measure("sum_qty", "sumQty")
        .asc("ship_day")
        .toDF,
      Some("""SELECT CAST(l_shipdate AS DATE) AS ship_day, count(*) AS cnt,
             |sum(l_quantity) AS sum_qty
             |FROM lineitem GROUP BY 1
             |ORDER BY ship_day ASC NULLS FIRST, cnt ASC, sum_qty ASC""".stripMargin)),

    // O4: query-level when (WHERE)
    NamedQuery("q05_when_between",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .measure("cnt", "count")
        .measure("amount", "amount")
        .when(Pred.between("shipDate", "1996-01-01", "1996-12-31"))
        .asc("return_flag")
        .toDF,
      Some("""SELECT l_returnflag AS return_flag, count(*) AS cnt,
             |round(sum(l_extendedprice), 2) AS amount
             |FROM lineitem
             |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
             |GROUP BY 1 ORDER BY return_flag ASC NULLS FIRST, cnt ASC, amount ASC"""
        .stripMargin)),

    // O5: conditional metrics — metric-level when must not filter siblings
    NamedQuery("q06_metric_filter",
      (s, d) => li(s, d)
        .measure("n_all", "count")
        .measureWhen("n_returned", "count", Pred.eq("returnFlag", "R"))
        .measureWhen("amount_hiqty", "amount", Pred.gt("quantity", 25))
        .measureWhen("uniq_ret_orders", "uniqueOrders", Pred.eq("returnFlag", "R"))
        .toDF,
      Some("""SELECT count(*) AS n_all,
             |count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
             |round(sum(l_extendedprice) FILTER (WHERE l_quantity > 25), 2) AS amount_hiqty,
             |count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_orderkey END) AS uniq_ret_orders
             |FROM lineitem""".stripMargin)),

    // O6 + O9: eq predicates, implicit AND of multiple when()
    NamedQuery("q07_sel_eq_and",
      (s, d) => li(s, d)
        .slice("ship_year", "shipDate", "year")
        .measure("cnt", "count")
        .when(Pred.eq("returnFlag", "R"))
        .when(Pred.eq("lineStatus", "F"))
        .asc("ship_year")
        .toDF,
      Some("""SELECT CAST(year(l_shipdate) AS INT) AS ship_year, count(*) AS cnt
             |FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'
             |GROUP BY 1 ORDER BY ship_year ASC NULLS FIRST, cnt ASC""".stripMargin)),

    // O6 nullable: eq(nil) ⇒ IS NULL (parse_tree.rb:9)
    NamedQuery("q08_sel_eq_null",
      (s, d) => li(s, d)
        .measure("cnt", "count")
        .measure("sum_qty", "sumQty")
        .when(Pred.Op("returnFlag", "eq", None))
        .toDF,
      Some("SELECT count(*) AS cnt, sum(l_quantity) AS sum_qty FROM lineitem WHERE l_returnflag IS NULL")),

    // O8: comparison operator family
    NamedQuery("q09_sel_cmp",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .measure("cnt", "count")
        .measure("sum_qty", "sumQty")
        .when(Pred.gt("quantity", 10))
        .when(Pred.lteq("quantity", 40))
        .when(Pred.gteq("price", 5000))
        .when(Pred.lt("discount", 0.08))
        .asc("return_flag")
        .toDF,
      Some("""SELECT l_returnflag AS return_flag, count(*) AS cnt, sum(l_quantity) AS sum_qty
             |FROM lineitem
             |WHERE l_quantity > 10 AND l_quantity <= 40 AND l_extendedprice >= 5000 AND l_discount < 0.08
             |GROUP BY 1 ORDER BY return_flag ASC NULLS FIRST, cnt ASC, sum_qty ASC"""
        .stripMargin)),

    // O7 + O8: in / notIn
    NamedQuery("q10_sel_in_notin",
      (s, d) => li(s, d)
        .slice("line_status", "lineStatus")
        .measure("cnt", "count")
        .when(Pred.in("returnFlag", Seq("A", "N")))
        .when(Pred.notIn("quantity", Seq(1.0, 2.0, 3.0)))
        .asc("line_status")
        .toDF,
      Some("""SELECT l_linestatus AS line_status, count(*) AS cnt
             |FROM lineitem
             |WHERE l_returnflag IN ('A', 'N') AND l_quantity NOT IN (1.0, 2.0, 3.0)
             |GROUP BY 1 ORDER BY line_status ASC NULLS FIRST, cnt ASC""".stripMargin)),

    // O8: like / notLike / notEq
    NamedQuery("q11_sel_like",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .measure("cnt", "count")
        .when(Pred.like("returnFlag", "%R%"))
        .when(Pred.notLike("lineStatus", "O%"))
        .when(Pred.notEq("quantity", 7))
        .asc("return_flag")
        .toDF,
      Some("""SELECT l_returnflag AS return_flag, count(*) AS cnt
             |FROM lineitem
             |WHERE l_returnflag LIKE '%R%' AND l_linestatus NOT LIKE 'O%' AND l_quantity <> 7
             |GROUP BY 1 ORDER BY return_flag ASC NULLS FIRST, cnt ASC""".stripMargin)),

    // O8 nullable family: is (eq-like with value), not (IS NOT NULL when
    // nil — parse_tree.rb:9 NULLABLE_OPERATORS)
    NamedQuery("q12_sel_is_not",
      (s, d) => li(s, d)
        .slice("line_status", "lineStatus")
        .measure("cnt", "count")
        .when(Pred.Op("returnFlag", "is", Some("R")))
        .when(Pred.Op("quantity", "not", None))
        .asc("line_status")
        .toDF,
      Some("""SELECT l_linestatus AS line_status, count(*) AS cnt
             |FROM lineitem
             |WHERE l_returnflag = 'R' AND l_quantity IS NOT NULL
             |GROUP BY 1 ORDER BY line_status ASC NULLS FIRST, cnt ASC""".stripMargin)),

    // O10: any: [...] — OR across AND-groups
    NamedQuery("q13_or_any",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .slice("line_status", "lineStatus")
        .measure("cnt", "count")
        .when(Pred.or(
          Pred.and(Pred.eq("returnFlag", "R"), Pred.gt("quantity", 30)),
          Pred.and(Pred.eq("lineStatus", "F"), Pred.lt("quantity", 5))))
        .asc("return_flag", "line_status")
        .toDF,
      Some("""SELECT l_returnflag AS return_flag, l_linestatus AS line_status, count(*) AS cnt
             |FROM lineitem
             |WHERE (l_returnflag = 'R' AND l_quantity > 30) OR (l_linestatus = 'F' AND l_quantity < 5)
             |GROUP BY 1, 2
             |ORDER BY return_flag ASC NULLS FIRST, line_status ASC NULLS FIRST, cnt ASC"""
        .stripMargin)),

    // nil-pruning (parse_tree.rb:158-160): None-arg non-nullable ops vanish
    NamedQuery("q14_nil_pruning",
      (s, d) => li(s, d)
        .measure("cnt", "count")
        .when(Pred.Op("quantity", "gt", None)) // pruned
        .when(Pred.Op("shipDate", "between", None)) // pruned
        .when(Pred.Or(Seq(Pred.Op("price", "lt", None)))) // fully pruned OR
        .when(Pred.notEq("returnFlag", "X"))
        .toDF,
      Some("SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag <> 'X'")),

    // O11 + O13: desc sort + limit (deterministic via tiebreak)
    NamedQuery("q15_sort_desc_limit",
      (s, d) => li(s, d)
        .slice("ship_year", "shipDate", "year")
        .measure("cnt", "count")
        .measure("sum_qty", "sumQty")
        .desc("cnt")
        .limit(5)
        .toDF,
      Some("""SELECT * FROM (
             |SELECT CAST(year(l_shipdate) AS INT) AS ship_year, count(*) AS cnt,
             |sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1)
             |ORDER BY cnt DESC NULLS LAST, ship_year ASC NULLS FIRST, sum_qty ASC
             |LIMIT 5""".stripMargin)),

    // O11 + O13: asc sort + offset + limit
    NamedQuery("q16_sort_asc_offset",
      (s, d) => li(s, d)
        .slice("ship_day", "shipDate", "date")
        .measure("cnt", "count")
        .asc("ship_day")
        .offset(3)
        .limit(4)
        .toDF,
      Some("""SELECT * FROM (
             |SELECT CAST(l_shipdate AS DATE) AS ship_day, count(*) AS cnt
             |FROM lineitem GROUP BY 1)
             |ORDER BY ship_day ASC NULLS FIRST, cnt ASC
             |LIMIT 4 OFFSET 3""".stripMargin)),

    // O12: desc_by_integer — string-numeric sorted by integer value
    NamedQuery("q17_desc_by_integer",
      (s, d) => li(s, d)
        .slice("okey", "orderKeyStr")
        .measure("cnt", "count")
        .descByInteger("okey")
        .limit(10)
        .toDF,
      Some("""SELECT * FROM (
             |SELECT CAST(l_orderkey AS VARCHAR) AS okey, count(*) AS cnt
             |FROM lineitem GROUP BY 1)
             |ORDER BY CAST(okey AS DECIMAL(38,0)) DESC NULLS LAST, cnt ASC
             |LIMIT 10""".stripMargin)),

    // O14: limit_by — top-N rows per distinct value of a result column
    NamedQuery("q18_limit_by",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .slice("ship_year", "shipDate", "year")
        .measure("cnt", "count")
        .desc("cnt")
        .limitBy(Seq("return_flag"), 3)
        .toDF,
      Some("""SELECT return_flag, ship_year, cnt FROM (
             |SELECT return_flag, ship_year, cnt, row_number() OVER (
             |  PARTITION BY return_flag
             |  ORDER BY cnt DESC NULLS LAST, ship_year ASC NULLS FIRST) AS rn
             |FROM (SELECT l_returnflag AS return_flag,
             |  CAST(year(l_shipdate) AS INT) AS ship_year, count(*) AS cnt
             |  FROM lineitem GROUP BY 1, 2))
             |WHERE rn <= 3
             |ORDER BY cnt DESC NULLS LAST, return_flag ASC NULLS FIRST, ship_year ASC NULLS FIRST"""
        .stripMargin)),

    // O14: limit_by with per-group offset
    NamedQuery("q19_limit_by_offset",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .slice("ship_year", "shipDate", "year")
        .measure("cnt", "count")
        .desc("cnt")
        .limitBy(Seq("return_flag"), 2, offset = 1)
        .toDF,
      Some("""SELECT return_flag, ship_year, cnt FROM (
             |SELECT return_flag, ship_year, cnt, row_number() OVER (
             |  PARTITION BY return_flag
             |  ORDER BY cnt DESC NULLS LAST, ship_year ASC NULLS FIRST) AS rn
             |FROM (SELECT l_returnflag AS return_flag,
             |  CAST(year(l_shipdate) AS INT) AS ship_year, count(*) AS cnt
             |  FROM lineitem GROUP BY 1, 2))
             |WHERE rn > 1 AND rn <= 3
             |ORDER BY cnt DESC NULLS LAST, return_flag ASC NULLS FIRST, ship_year ASC NULLS FIRST"""
        .stripMargin)),

    // distinct-count metrics (ClickHouse uniqExact)
    NamedQuery("q20_uniq",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .measure("uniq_orders", "uniqueOrders")
        .measure("uniq_parts", "uniqueParts")
        .asc("return_flag")
        .toDF,
      Some("""SELECT l_returnflag AS return_flag,
             |count(DISTINCT l_orderkey) AS uniq_orders,
             |count(DISTINCT l_partkey) AS uniq_parts
             |FROM lineitem GROUP BY 1
             |ORDER BY return_flag ASC NULLS FIRST, uniq_orders ASC, uniq_parts ASC"""
        .stripMargin)),

    // approx distinct — the 100 TB default. HLL estimates aren't
    // DuckDB-matchable, so the entry folds its own invariant oracle (the
    // q75 discipline): the cube front-door computes BOTH the sketch and
    // the exact count, and the decidable contract — estimate within
    // 3×rsd (±15%) of exact — is the output. A drifting sketch goes red
    // at the driver instead of hiding behind no_oracle.
    NamedQuery("q21_uniq_approx",
      (s, d) => {
        import org.apache.spark.sql.{functions => F}
        import org.apache.spark.sql.functions.col
        val approx = li(s, d)
          .slice("return_flag", "returnFlag")
          .measure("approx_orders", "uniqueOrdersApprox")
          .toDF
        val exact = li(s, d)
          .slice("return_flag", "returnFlag")
          .measure("uniq_orders", "uniqueOrders")
          .toDF
        approx.join(exact, "return_flag")
          .select(col("return_flag"), col("uniq_orders"),
            (F.abs(col("approx_orders") - col("uniq_orders")) <=
              col("uniq_orders") * 0.15).as("approx_ok"))
          .orderBy(col("return_flag").asc_nulls_first)
      },
      Some("""SELECT l_returnflag AS return_flag,
             |count(DISTINCT l_orderkey) AS uniq_orders,
             |true AS approx_ok
             |FROM lineitem GROUP BY 1
             |ORDER BY return_flag ASC NULLS FIRST""".stripMargin)),

    // O16: option order is semantic — A: desc → limitBy → limit
    NamedQuery("q24_option_order_a",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .slice("ship_year", "shipDate", "year")
        .measure("cnt", "count")
        .desc("cnt")
        .limitBy(Seq("return_flag"), 2)
        .limit(3)
        .toDF,
      Some("""SELECT return_flag, ship_year, cnt FROM (
             |SELECT return_flag, ship_year, cnt, row_number() OVER (
             |  PARTITION BY return_flag
             |  ORDER BY cnt DESC NULLS LAST, ship_year ASC NULLS FIRST) AS rn
             |FROM (SELECT l_returnflag AS return_flag,
             |  CAST(year(l_shipdate) AS INT) AS ship_year, count(*) AS cnt
             |  FROM lineitem GROUP BY 1, 2))
             |WHERE rn <= 2
             |ORDER BY cnt DESC NULLS LAST, return_flag ASC NULLS FIRST, ship_year ASC NULLS FIRST
             |LIMIT 3""".stripMargin)),

    // O16 — B: limitBy (default order = output columns asc) → desc → limit:
    // a DIFFERENT result set than A, proving order sensitivity
    NamedQuery("q25_option_order_b",
      (s, d) => li(s, d)
        .slice("return_flag", "returnFlag")
        .slice("ship_year", "shipDate", "year")
        .measure("cnt", "count")
        .limitBy(Seq("return_flag"), 2)
        .desc("cnt")
        .limit(3)
        .toDF,
      Some("""SELECT return_flag, ship_year, cnt FROM (
             |SELECT return_flag, ship_year, cnt, row_number() OVER (
             |  PARTITION BY return_flag
             |  ORDER BY ship_year ASC NULLS FIRST, cnt ASC NULLS FIRST) AS rn
             |FROM (SELECT l_returnflag AS return_flag,
             |  CAST(year(l_shipdate) AS INT) AS ship_year, count(*) AS cnt
             |  FROM lineitem GROUP BY 1, 2))
             |WHERE rn <= 2
             |ORDER BY cnt DESC NULLS LAST, return_flag ASC NULLS FIRST, ship_year ASC NULLS FIRST
             |LIMIT 3""".stripMargin))
  )
}
