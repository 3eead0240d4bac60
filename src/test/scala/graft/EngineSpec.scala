package graft

import graft.compile.Compiler
import graft.cubes.Cubes
import graft.model.CubeQueryException
import graft.query.{CubeQuery, Pred}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def li = CubeQuery(Cubes.lineitemCube(spark, sf))

  test("viewPurchaseOverlap: metric-filter-emptied groups get 0.0 and never vanish") {
    import graft.cubes.Cubes
    val all = CubeQuery(Cubes.eventsCube(spark, sf))
      .slice("arm", "arm").measure("ov", "viewPurchaseOverlap")
      .toDF.collect()
    assert(all.nonEmpty && all.exists(_.getDouble(1) > 0))
    // a METRIC filter (the plan-backed pred) that removes every row:
    // every arm still present, value 0.0 — the group contract
    val emptied = CubeQuery(Cubes.eventsCube(spark, sf))
      .slice("arm", "arm")
      .measureWhen("ov", "viewPurchaseOverlap", Pred.gt("value", 1e18))
      .toDF.collect()
    assert(emptied.length == all.length)
    assert(emptied.forall(_.getDouble(1) == 0.0))
  }

  test("V1: unknown dimension raises") {
    val e = intercept[CubeQueryException](li.slice("x", "nope").toDF)
    assert(e.getMessage.contains("unknown dimension"))
  }

  test("V2: unknown sub-field raises") {
    val e = intercept[CubeQueryException](li.slice("x", "shipDate", "century").toDF)
    assert(e.getMessage.contains("no sub-field"))
  }

  test("V3: unsupported selector operator raises") {
    val e = intercept[CubeQueryException](
      li.measure("c", "count").when(Pred.Op("quantity", "soundsLike", Some(1))).toDF)
    assert(e.getMessage.contains("unsupported operator"))
  }

  test("V4: unknown option raises") {
    val e = intercept[CubeQueryException](li.option("frobnicate", 1))
    assert(e.getMessage.contains("unknown option"))
  }

  test("unknown metric raises") {
    val e = intercept[CubeQueryException](li.measure("x", "nope").toDF)
    assert(e.getMessage.contains("unknown metric"))
  }

  test("nil pruning: None-arg comparison op drops the predicate entirely") {
    val all = li.measure("c", "count").toDF.collect()(0).getLong(0)
    val pruned = li.measure("c", "count")
      .when(Pred.Op("quantity", "gt", None)).toDF.collect()(0).getLong(0)
    assert(all == pruned && all > 0)
  }

  test("nullable eq(None) is IS NULL, not pruned") {
    val n = li.measure("c", "count")
      .when(Pred.Op("returnFlag", "eq", None)).toDF.collect()(0).getLong(0)
    assert(n == 0) // fixture has no null return flags
  }

  test("conditional metric does not filter sibling metrics") {
    val row = li.measure("all", "count")
      .measureWhen("ret", "count", Pred.eq("returnFlag", "R"))
      .toDF.collect()(0)
    assert(row.getLong(0) > row.getLong(1) && row.getLong(1) > 0)
  }

  test("limitBy caps rows per group") {
    val df = li.slice("f", "returnFlag").slice("y", "shipDate", "year")
      .measure("c", "count").desc("c").limitBy(Seq("f"), 2).toDF
    val counts = df.groupBy("f").count().collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ <= 2))
  }

  test("option order is semantic: desc-then-limit != limit-then-desc rows") {
    val a = li.slice("y", "shipDate", "year").measure("c", "count")
      .desc("c").limit(3).toDF.collect().map(_.getInt(0)).toSet
    val b = li.slice("y", "shipDate", "year").measure("c", "count")
      .asc("y").limit(3).desc("c").toDF.collect().map(_.getInt(0)).toSet
    assert(a != b) // top-3-by-count vs first-3-years re-sorted
  }

  test("source selection: rollup chosen only when it covers the query") {
    val cube = Cubes.lineitemCubeWithRollup(spark, sf)
    val covered = CubeQuery(cube).slice("y", "shipDate", "year").measure("c", "count")
    val uncovered = CubeQuery(cube).slice("p", "partKey").measure("c", "count")
    val uncoveredMetric = CubeQuery(cube).slice("y", "shipDate", "year")
      .measure("u", "uniqueOrders")
    assert(Compiler.chosenSourceName(covered) == "daily_rollup")
    assert(Compiler.chosenSourceName(uncovered) == "fact")
    assert(Compiler.chosenSourceName(uncoveredMetric) == "fact")
  }

  test("stats re-cost the source chooser: measured rows beat stale static costs") {
    import graft.sources.Stats
    val cube0 = Cubes.lineitemCubeWithRollup(spark, sf)
    val real = cube0.altSources.head
    // a stale registration: its static cost CLAIMS it is the cheaper
    // covering source, but its measured cardinality is 2x the real
    // rollup's — exactly the drift ANALYZE exists to correct
    val stale = real.copy(name = "stale_cheap",
      df = real.df.unionByName(real.df), cost = real.cost - 1)
    def covered(c: graft.model.Cube) =
      CubeQuery(c).slice("y", "shipDate", "year").measure("c", "count")
    assert(Compiler.chosenSourceName(
      covered(cube0.copy(altSources = Seq(stale, real)))) == "stale_cheap")
    // re-cost both from their ANALYZE frames: the chooser (unchanged —
    // it still sorts by cost) now picks the truly smaller source
    val recosted = cube0.copy(altSources = Seq(stale, real).map(s =>
      Stats.costedSource(s, Stats.analyze(s.df, Seq(s.df.columns.head)))))
    assert(Compiler.chosenSourceName(covered(recosted)) == real.name)
    // and the measured route still answers exactly like the fact
    val viaRecosted = covered(recosted).asc("y").toDF.collect().map(_.toString).toSeq
    val viaFact = covered(cube0.copy(altSources = Nil))
      .asc("y").toDF.collect().map(_.toString).toSeq
    assert(viaRecosted == viaFact)
  }

  test("rollup and fact agree") {
    val cube = Cubes.lineitemCubeWithRollup(spark, sf)
    val viaRollup = CubeQuery(cube).slice("y", "shipDate", "year")
      .measure("c", "count").measure("q", "sumQty").asc("y").toDF.collect()
    val viaFact = li.slice("y", "shipDate", "year")
      .measure("c", "count").measure("q", "sumQty").asc("y").toDF.collect()
    assert(viaRollup.map(_.toString).toSeq == viaFact.map(_.toString).toSeq)
  }

  test("asOf picks the latest matched row even when its payload is null") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val right = Seq(
      (1L, 10L, Some("old")),
      (1L, 20L, None: Option[String]) // latest prior row, null payload
    ).toDF("k", "rts", "v")
    val left = Seq((1L, 30L, "L")).toDF("k", "lts", "tag")
    val out = graft.operators.Joins.asOf(left, right,
      Seq("k"), "lts", "rts", Seq("v" -> "v", "rts" -> "matched_ts")).collect()
    // must match ts=20 (null v), NOT stitch v="old" from ts=10
    assert(out.length == 1 && out(0).getAs[Long]("matched_ts") == 20L
      && out(0).isNullAt(out(0).fieldIndex("v")))
  }

  test("star join is planned as broadcast (no shuffle of the fact side)") {
    val plan = li.slice("r", "regionName").measure("c", "count").toDF
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("predicate pushdown reaches the parquet scan") {
    val df = li.slice("f", "returnFlag").measure("c", "count")
      .when(Pred.eq("returnFlag", "R")).toDF
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"),
      s"missing pushed filter in:\n$scan")
  }

  test("column pruning: only referenced columns are read") {
    val df = li.slice("f", "returnFlag").measure("c", "count").toDF
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<l_returnflag:string>"),
      s"scan reads more than needed:\n$scan")
  }

  test("groupingSets: unknown key raises; sets union == separate groupBys") {
    import org.apache.spark.sql.functions.col
    val e = intercept[graft.model.CubeQueryException](
      li.slice("f", "returnFlag").measure("c", "count")
        .withGroupingSets(Seq(Seq("bogus"))).toDF)
    assert(e.getMessage.contains("bogus"))
    val sets = li.slice("f", "returnFlag").slice("s", "lineStatus")
      .measure("c", "count")
      .withGroupingSets(Seq(Seq("f", "s"), Seq("f"))).toDF
      .collect().map(_.toString).sorted
    val manual = (
      li.slice("f", "returnFlag").slice("s", "lineStatus").measure("c", "count").toDF
        .collect().map(_.toString) ++
      li.slice("f", "returnFlag").measure("c", "count").toDF
        .select(col("f"), org.apache.spark.sql.functions.lit(null).cast("string").as("s"),
          col("c")).collect().map(_.toString)).sorted
    assert(sets.nonEmpty && sets.sameElements(manual))
  }

  test("plan-backed metric on a cube WITH alt sources: falls back to the fact cleanly") {
    import org.apache.spark.sql.functions.{col, to_json}
    // exact topParts is served only by the fact; the rollup serves the
    // additive metrics. A mixed query must compile single-source from
    // the fact (no merge, no sketch substitution) and stay correct.
    val cube = Cubes.lineitemCubeWithRollup(spark, sf)
    val q = graft.query.CubeQuery(cube).slice("f", "returnFlag")
      .measure("c", "count")
      .measureArgs("tp", "topParts", Seq("size" -> 2, "exact" -> true))
      .asc("f")
    val rows = q.toDF.withColumn("tp", to_json(col("tp")))
      .collect().map(_.toString).sorted
    val plain = graft.query.CubeQuery(Cubes.lineitemCube(spark, sf))
      .slice("f", "returnFlag").measure("c", "count")
      .measureArgs("tp", "topParts", Seq("size" -> 2, "exact" -> true))
      .asc("f").toDF.withColumn("tp", to_json(col("tp")))
      .collect().map(_.toString).sorted
    assert(rows.nonEmpty && rows.sameElements(plain))
    // while a rollup-servable query on the same cube still routes there
    val routed = graft.query.CubeQuery(cube).slice("f", "returnFlag")
      .measure("c", "count").toDF.queryExecution.optimizedPlan.toString
    assert(routed.contains("cnt_p"), s"additive query lost the rollup route:\n$routed")
  }

  test("exploding dimension: element rows, empty arrays drop, invalid combos rejected") {
    import graft.query.CubeQuery
    val docs = CubeQuery(Cubes.documentsCube(spark, sf))
    // token count through the cube == direct explode count
    val viaCube = docs.slice("t", "token").measure("c", "count").toDF
      .agg(org.apache.spark.sql.functions.sum("c")).collect()(0).getLong(0)
    val direct = graft.cubes.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        graft.llm.Dedup.tokens(org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.col("text")))))
      .count()
    assert(viaCube == direct && viaCube > 0)
    // restrictions hold with clear errors
    val twoDims = Cubes.documentsCube(spark, sf)
    val two = CubeQuery(twoDims.copy(dimensions = twoDims.dimensions +
      ("token2" -> twoDims.dimensions("token").copy(name = "token2"))))
    val e1 = intercept[graft.model.CubeQueryException](
      two.slice("a", "token").slice("b", "token2").measure("c", "count").toDF)
    assert(e1.getMessage.contains("one exploding dimension"))
    val e2 = intercept[graft.model.CubeQueryException](
      docs.slice("t", "token").measure("c", "count").withRollup.toDF)
    assert(e2.getMessage.contains("flat grouping"))
  }

  test("Metric.parameterized: declared args rebind, unknown args error") {
    import org.apache.spark.sql.{functions => F}
    val cube = Cubes.lineitemCube(spark, sf)
    val scaled = graft.model.Metric.parameterized("scaledQty", Map("by" -> 1)) {
      bound => p =>
        F.sum(org.apache.spark.sql.functions.col("l_quantity") *
          bound("by").asInstanceOf[Int])
    }
    val c2 = cube.copy(metrics = cube.metrics + ("scaledQty" -> scaled))
    def total(args: Seq[(String, Any)]) =
      graft.query.CubeQuery(c2).measureArgs("q", "scaledQty", args)
        .toDF.collect()(0).getDouble(0)
    assert(total(Seq("by" -> 2)) == 2 * total(Nil))
    val e = intercept[graft.model.CubeQueryException](total(Seq("nope" -> 1)))
    assert(e.getMessage.contains("nope"))
  }

  test("limit_by plans with partial WindowGroupLimit: each partition truncates to K pre-shuffle") {
    val df = li.slice("f", "returnFlag").slice("s", "lineStatus")
      .measure("c", "count").desc("c").limitBy(Seq("f"), 2).toDF
    val plan = df.queryExecution.executedPlan.toString
    val hits = "WindowGroupLimit".r.findAllIn(plan).size
    // Spark's rank-limit pushdown must fire in BOTH modes: partial
    // (map-side, before the exchange — the 100 TB lever: only K rows
    // per partition per group ever shuffle) and final
    assert(hits >= 2, s"expected partial+final WindowGroupLimit, got $hits:\n$plan")
    assert(df.collect().nonEmpty)
  }

  test("plan-backed exact topK: matches the sketch, fills empty groups, rejects rollup") {
    import org.apache.spark.sql.functions.{col, to_json}
    def run(q: graft.query.CubeQuery) =
      q.toDF.withColumn("tp", to_json(col("tp"))).collect().map(_.toString).sorted
    // exact plan-backed == SpaceSaving sketch while distinct < capacity
    val exact = run(li.slice("f", "returnFlag")
      .measureArgs("tp", "topParts", Seq("size" -> 2, "exact" -> true)).asc("f"))
    val sketch = run(li.slice("f", "returnFlag")
      .measureArgs("tp", "topParts", Seq("size" -> 2)).asc("f"))
    assert(exact.nonEmpty && exact.sameElements(sketch))
    // a metric filter nothing survives → empty arrays, not nulls/dropped rows
    val empty = li.slice("f", "returnFlag")
      .measureArgs("tp", "topParts", Seq("size" -> 2, "exact" -> true),
        filter = Some(Pred.gt("quantity", 99999))).toDF.collect()
    assert(empty.length == 3 && empty.forall(_.getSeq[Any](1).isEmpty))
    // global (no slices): one row even with plan-backed metric
    val global = li.measureArgs("tp", "topParts", Seq("size" -> 2, "exact" -> true))
      .toDF.collect()
    assert(global.length == 1 && global(0).getSeq[Any](0).nonEmpty)
    // plan-backed metrics cannot join against rollup supersets
    val e = intercept[graft.model.CubeQueryException](
      li.slice("f", "returnFlag")
        .measureArgs("tp", "topParts", Seq("exact" -> true)).withRollup.toDF)
    assert(e.getMessage.contains("flat grouping"))
    // arg typing
    val e2 = intercept[graft.model.CubeQueryException](
      li.measureArgs("tp", "topParts", Seq("exact" -> "yes")).toDF)
    assert(e2.getMessage.contains("boolean"))
  }

  test("groupingSets: slice alias shadowing a fact column cannot corrupt metrics") {
    // alias the slice key as "l_quantity" — the very column sumQty reads.
    // Materializing keys under user names would overwrite it pre-agg and
    // silently corrupt the aggregate; the __gs_ internal names must not.
    val shadowed = li.slice("l_quantity", "returnFlag").measure("q", "sumQty")
      .withGroupingSets(Seq(Seq("l_quantity"))).toDF
      .collect().map(_.toString).sorted
    val flat = li.slice("l_quantity", "returnFlag").measure("q", "sumQty").toDF
      .collect().map(_.toString).sorted
    assert(shadowed.nonEmpty && shadowed.sameElements(flat))
    // and the reserved prefix itself is rejected as a user alias
    val e = intercept[graft.model.CubeQueryException](
      li.slice("__gs_x", "returnFlag").measure("c", "count")
        .withGroupingSets(Seq(Seq("__gs_x"))).toDF)
    assert(e.getMessage.contains("__gs_"))
  }

  test("sketch rollup source: non-additive distinct routes to daily cells, bit-equal to fact path") {
    import graft.query.CubeQuery
    val cube = Cubes.eventsCubeWithSketchRollup(spark, sf)
    def q(c: graft.model.Cube) = CubeQuery(c).slice("d", "day")
      .measure("uu", "uniqueUsersApprox").measure("c", "count").asc("d")
    // routed to the rollup: the plan re-aggregates sketches (union), it
    // does not re-sketch raw user_ids
    val viaRollup = q(cube).toDF
    val plan = viaRollup.queryExecution.optimizedPlan.toString
    assert(plan.contains("hll_union_agg"), s"not served by the sketch rollup:\n$plan")
    // lossless merge: rollup path == sketching the raw fact, bit-equal
    val viaFact = q(cube.copy(altSources = Nil)).toDF
    assert(viaFact.queryExecution.optimizedPlan.toString.contains("hll_sketch_agg"))
    val a = viaRollup.collect().map(_.toString)
    val b = viaFact.collect().map(_.toString)
    assert(a.nonEmpty && a.sameElements(b))
    // a metric the rollup can't serve (sumValue) falls back to the fact
    val fallback = CubeQuery(cube).slice("d", "day")
      .measure("sv", "sumValue").toDF.queryExecution.optimizedPlan.toString
    assert(!fallback.contains("hll_union_agg"))
    // quantiles route too: served from GK cells, not by re-scanning values
    val med = CubeQuery(cube).slice("d", "day")
      .measure("m", "medianValueApprox").toDF
    assert(!med.queryExecution.optimizedPlan.toString.contains("percentile_approx"),
      "median served from the fact, not the quantile cells")
    assert(med.collect().forall(!_.isNullAt(1)))
  }

  test("documents cube: selector pushes to the scan; derived dims don't widen it") {
    val q = graft.query.CubeQuery(Cubes.documentsCube(spark, sf))
      .slice("lang", "lang").measure("c", "count")
      .when(Pred.gt("nChars", 100)).toDF
    val scan = q.queryExecution.executedPlan.toString
    // the n_chars filter reaches parquet; only text (for langId) and
    // n_chars are read — doc_id/source/everything else pruned
    assert(scan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"),
      s"selector not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<text:string,n_chars:"),
      s"scan reads more than text+n_chars:\n$scan")
  }

  test("PrefixSum.runningTotal == single-window cumsum, with NO single-partition exchange") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val r = new scala.util.Random(7)
    val df = (1 to 500).map(i => (i.toLong, r.nextInt(100).toLong)).toDF("id", "v")
      .repartition(7) // scrambled input partitioning
    val two = graft.operators.PrefixSum.runningTotal(
        df, Seq(F.col("v").desc, F.col("id").asc), F.col("v"), partitions = 5)
      .select(F.col("id"), F.col("cum").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val one = df.withColumn("cum", F.sum("v").over(
        W.orderBy(F.col("v").desc, F.col("id").asc)
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
      .select("id", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == one)
    // runningTotal returns an eagerly-checkpointed frame (so offsets and
    // output share one physical partitioning) — its plan is a LogicalRDD
    // scan. Assert the shape of the distributed stage underneath instead.
    val plan = graft.operators.PrefixSum.localStage(
        df, Seq(F.col("v").desc, F.col("id").asc), F.col("v"), partitions = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.contains("rangepartitioning"), plan)
  }

  test("Fill.fillSeries: per-group spines, defaults only on manufactured rows, empty input stays empty") {
    import spark.implicits._
    import graft.operators.Fill
    val df = Seq(("a", 1, 10L), ("a", 4, 40L), ("b", 2, 20L), ("b", 3, 30L))
      .toDF("g", "k", "v")
    val filled = Fill.fillSeries(df, "k", Seq("g"), F.lit(1),
        Map("v" -> F.lit(0L)))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // a spans 1..4 (2,3 manufactured); b spans 2..3 (dense already)
    assert(filled == Map(
      ("a", 1) -> 10L, ("a", 2) -> 0L, ("a", 3) -> 0L, ("a", 4) -> 40L,
      ("b", 2) -> 20L, ("b", 3) -> 30L))
    val empty = Fill.fillSeries(df.filter(F.lit(false)), "k", Seq("g"),
      F.lit(1), Map("v" -> F.lit(0L)))
    assert(empty.count() == 0)
  }

  test("fill: manufactured rows zero metrics but keep OTHER numeric slice keys null") {
    val q = li.slice("y", "shipDate", "year").slice("pk", "partKey")
      .measure("c", "count")
      .when(Pred.eq("partKey", 5)) // part 5 ships in 6 of its 7-year span
      .asc("y").fill("y")
    val rows = q.toDF.collect()
    val manufactured = rows.filter(_.getLong(2) == 0L)
    assert(manufactured.nonEmpty, "expected gap years for a single part")
    // the pk slice column must be NULL on filled rows — zeroing it would
    // fabricate rows attributed to the real partKey 0
    manufactured.foreach(r => assert(r.isNullAt(1), r.toString))
    rows.filter(_.getLong(2) > 0L).foreach(r => assert(r.getLong(1) == 5L))
  }

  test("FILTER-composed sketch metrics on the rollup route skip nulled cells (no NPE)") {
    val cube = Cubes.eventsCubeWithSketchRollup(spark, sf)
    val q = CubeQuery(cube).slice("day", "day")
      .measureWhen("med", "medianValueApprox", Pred.eq("eventType", "purchase"))
      .measureWhen("uu", "uniqueUsersApprox", Pred.eq("eventType", "purchase"))
      .asc("day")
    assert(Compiler.chosenSourceName(q) == "daily_sketch")
    val rows = q.toDF.collect()
    assert(rows.nonEmpty)
    // cells for other event types arrive as FILTER-nulled inputs; the
    // union aggregators must skip them and still answer from the
    // purchase cells alone
    rows.foreach { r =>
      assert(!r.isNullAt(1) && !r.getDouble(1).isNaN, r.toString)
      assert(r.getLong(2) > 0, r.toString)
    }
  }

  test("SQL function arity errors are domain errors, not IndexOutOfBounds") {
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT cms_estimate(CAST('x' AS BINARY))").collect())
    assert(e.getMessage.contains("2 argument") ||
      Option(e.getCause).exists(_.getMessage.contains("2 argument")), e.toString)
  }

  test("dup3 repetition selector: row-local predicate keeps column pruning tight") {
    val q = graft.query.CubeQuery(Cubes.documentsCube(spark, sf))
      .slice("source", "source").measure("c", "count")
      .when(Pred.lteq("dup3", 0.2)).toDF
    val scan = q.queryExecution.executedPlan.toString
    // the repetition gate is computed from text, so the scan reads
    // exactly (text, source) — nothing else survives pruning, and the
    // single filter stage stays whole-stage-codegen'd
    assert(scan.contains("ReadSchema: struct<text:string,source:string>"),
      s"scan reads more than text+source:\n$scan")
    assert(!scan.contains("CodegenFallback"), s"repetition gate fell out of codegen:\n$scan")
  }
}
