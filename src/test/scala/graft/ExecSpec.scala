package graft

import graft.cubes.Cubes
import graft.exec.{CubeRunner, DatabaseRegistry}
import graft.model.CubeQueryException
import graft.query.Pred
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExecSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val registry = DatabaseRegistry.paths(
    Map("tiny" -> "/root/testdata/sf0.001", "small" -> "/root/testdata/sf0.01"),
    default = "tiny")

  private val doc =
    """{"fields": [{"name": "count", "alias": "cnt"}]}"""

  test("O17: database routing picks the named connection") {
    val tiny = CubeRunner.execute(spark, registry, Cubes.lineitemCube, doc)
    val small = CubeRunner.execute(spark, registry, Cubes.lineitemCube, doc,
      database = Some("small"))
    val (a, b) = (tiny.rows.head.getLong(0), small.rows.head.getLong(0))
    assert(a > 0 && b > 5 * a, s"sf0.01 ($b) should dwarf sf0.001 ($a)")
  }

  test("O17: heterogeneous catalogs — one query routed to parquet AND a JDBC warehouse") {
    import graft.model.{Cube, Dimension, Metric, Selector}
    import graft.sources.{Catalog, JdbcCatalog, PathCatalog}
    import org.apache.spark.sql.functions.col
    // seed an in-memory Derby warehouse from the fixture (the spec-local
    // stand-in for the reference's named ClickHouse connection)
    val url = "jdbc:derby:memory:graftdb;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    graft.cubes.Tables.load(spark, "/root/testdata/sf0.001", "region")
      .write.mode("overwrite").format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", "region").save()

    val hetero = DatabaseRegistry(Map(
      "lake" -> PathCatalog("/root/testdata/sf0.001"),
      "warehouse" -> JdbcCatalog(url, Map("driver" -> driver))), default = "lake")
    def regionCube(s: SparkSession, cat: Catalog): Cube = Cube(
      name = "region",
      fact = graft.cubes.Tables.table(s, cat, "region"),
      dimensions = Map("name" -> Dimension("name", col("r_name"))),
      metrics = Map("count" -> Metric.countAll("count")),
      selectors = Map("name" -> Selector("name", col("r_name"))))
    val rdoc =
      """{"fields": [{"name": "name"}, {"name": "count", "alias": "cnt"}],
          "args": {"options": {"asc": "name"}}}"""

    val lake = CubeRunner.execute(spark, hetero, regionCube, rdoc)
    val wh = CubeRunner.execute(spark, hetero, regionCube, rdoc,
      database = Some("warehouse"))
    assert(lake.rows.nonEmpty)
    assert(lake.rows.map(_.toString) == wh.rows.map(_.toString))
    assert(lake.columns == wh.columns)
  }

  test("O17: unknown database raises") {
    val e = intercept[CubeQueryException](CubeRunner.execute(
      spark, registry, Cubes.lineitemCube, doc, database = Some("prod")))
    assert(e.getMessage.contains("unknown database"))
  }

  test("O18: query hook scopes the query before compilation") {
    val unhooked = CubeRunner.execute(spark, registry, Cubes.lineitemCube, doc)
    val hooked = CubeRunner.execute(spark, registry, Cubes.lineitemCube, doc,
      hook = _.when(Pred.eq("returnFlag", "R")))
    assert(hooked.rows.head.getLong(0) < unhooked.rows.head.getLong(0))
    assert(hooked.rows.head.getLong(0) > 0)
  }

  test("plan cache: statsOnly plans are never memoized — a cached " +
      "serve would replay a frozen LocalRelation after the table moved") {
    import graft.sources.Manifest
    import graft.model.{Cube, Metric}
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("exec_statsonly").toString
    val tbl = s"$dir/t"
    Manifest.create(spark, tbl, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    Manifest.analyzeFiles(spark, tbl, Seq("v"))
    val cubeFor = (s: SparkSession, _: graft.sources.Catalog) =>
      Cube("t", Manifest.read(s, tbl),
        dimensions = Map.empty, metrics = Map("n" -> Metric.countAll("n")),
        selectors = Map.empty, manifestTable = Some(tbl))
    val cache = new graft.exec.PlanCache()
    val sdoc = """{"fields": [{"name": "n", "alias": "n"}],
                   "args": {"options": {"statsOnly": true}}}"""
    val r1 = CubeRunner.execute(spark, registry, cubeFor, sdoc,
      cache = Some(cache))
    Manifest.commitAppend(spark, tbl, Seq((3L, 30L)).toDF("id", "v"))
    val r2 = CubeRunner.execute(spark, registry, cubeFor, sdoc,
      cache = Some(cache))
    assert(r1.rows.head.getLong(0) == 2)
    assert(r2.rows.head.getLong(0) == 3,
      "second execution must re-serve the moved table, not a cached row")
    assert(cache.hits == 0 && cache.misses == 0,
      s"statsOnly must bypass the cache: hits=${cache.hits} misses=${cache.misses}")
    // the SOURCE form of the same hazard: a plain (non-statsOnly)
    // query on a manifested cube resolves the snapshot at compile —
    // caching it would keep serving the old version after a commit
    val pdoc = """{"fields": [{"name": "n", "alias": "n"}]}"""
    val p1 = CubeRunner.execute(spark, registry, cubeFor, pdoc,
      cache = Some(cache))
    Manifest.commitAppend(spark, tbl, Seq((4L, 40L)).toDF("id", "v"))
    val p2 = CubeRunner.execute(spark, registry, cubeFor, pdoc,
      cache = Some(cache))
    assert(p1.rows.head.getLong(0) == 3 && p2.rows.head.getLong(0) == 4)
    assert(cache.hits == 0 && cache.misses == 0,
      s"manifested cubes must bypass the cache: hits=${cache.hits} misses=${cache.misses}")
  }

  test("plan cache: repeated query compiles once, results identical, keys scope by database") {
    val cache = new graft.exec.PlanCache()
    val doc2 =
      """{"fields": [{"name": "returnFlag", "alias": "flag"},
                     {"name": "count", "alias": "cnt"}],
          "args": {"options": {"asc": "flag"}}}"""
    val r1 = CubeRunner.execute(spark, registry, Cubes.lineitemCube, doc2,
      cache = Some(cache))
    val r2 = CubeRunner.execute(spark, registry, Cubes.lineitemCube, doc2,
      cache = Some(cache))
    assert(cache.misses == 1 && cache.hits == 1, s"hits=${cache.hits} misses=${cache.misses}")
    assert(r1.rows.map(_.toString) == r2.rows.map(_.toString) && r1.rows.nonEmpty)
    // a different database root is a different plan (reads different files)
    val r3 = CubeRunner.execute(spark, registry, Cubes.lineitemCube, doc2,
      database = Some("small"), cache = Some(cache))
    assert(cache.misses == 2)
    assert(r3.rows.map(_.getLong(1)).sum > r1.rows.map(_.getLong(1)).sum)
    // a hooked (tenant-scoped) query must NOT collide with the unhooked one
    val r4 = CubeRunner.execute(spark, registry, Cubes.lineitemCube, doc2,
      hook = _.when(Pred.eq("returnFlag", "R")), cache = Some(cache))
    assert(cache.misses == 3)
    assert(r4.rows.map(_.getLong(1)).sum < r1.rows.map(_.getLong(1)).sum)
  }

  test("concurrent serving: N threads, repeat + distinct queries, one build per shape, correct results") {
    // the serving-path race surface: many dashboard clients hitting one
    // CubeRunner + shared PlanCache. Contract under concurrency:
    // results are correct per shape, hit/miss accounting adds up, and
    // single-flight means each distinct shape compiles EXACTLY once no
    // matter how many threads race on its first request.
    val cache = new graft.exec.PlanCache()
    val shapes = Seq(
      """{"fields": [{"name": "count", "alias": "cnt"}]}""",
      """{"fields": [{"name": "returnFlag", "alias": "flag"},
                     {"name": "count", "alias": "cnt"}],
          "args": {"options": {"asc": "flag"}}}""",
      """{"fields": [{"name": "lineStatus", "alias": "st"},
                     {"name": "sumQty", "alias": "qty"}],
          "args": {"options": {"asc": "st"}}}""",
      """{"fields": [{"name": "returnFlag", "alias": "flag"},
                     {"name": "uniqueOrders", "alias": "uo"}],
          "args": {"quantity": {"gt": 10}, "options": {"asc": "flag"}}}""")
    // single-threaded reference results, computed WITHOUT the cache
    val expect = shapes.map { s =>
      s -> CubeRunner.execute(spark, registry, Cubes.lineitemCube, s)
        .rows.map(_.toString)
    }.toMap
    val nThreads = 8
    val iters = 5
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val barrier = new java.util.concurrent.CyclicBarrier(nThreads)
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        try {
          barrier.await() // maximize first-build contention
          for (i <- 0 until iters; s <- shapes) {
            val r = CubeRunner.execute(spark, registry, Cubes.lineitemCube, s,
              cache = Some(cache))
            if (r.rows.map(_.toString) != expect(s))
              failures.add(s"thread $t iter $i: wrong rows for shape $s")
          }
        } catch { case e: Throwable => failures.add(s"thread $t: $e") }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(failures.isEmpty, failures.toArray.mkString("\n"))
    val calls = nThreads * iters * shapes.size
    assert(cache.misses == shapes.size,
      s"single-flight violated: ${cache.misses} builds for ${shapes.size} shapes")
    assert(cache.hits == calls - shapes.size,
      s"accounting: hits=${cache.hits} misses=${cache.misses} calls=$calls")
  }

  test("snapshot metrics bypass the plan cache: centroids must not be frozen by memoization") {
    // semanticSurvivors trains centroids AT COMPILE and bakes them as
    // literals — caching that plan would replay a stale index after the
    // table changes, so CubeRunner compiles it fresh every time
    val cache = new graft.exec.PlanCache()
    val doc =
      """{"fields": [
           {"name": "vectors"},
           {"name": "semanticSurvivors", "alias": "sv",
            "args": {"threshold": 0.9, "nLists": 1}}]}"""
    val r1 = CubeRunner.execute(spark, registry, Cubes.embeddingsCube, doc,
      cache = Some(cache))
    val r2 = CubeRunner.execute(spark, registry, Cubes.embeddingsCube, doc,
      cache = Some(cache))
    assert(cache.hits == 0 && cache.misses == 0,
      s"snapshot metric must not touch the cache: hits=${cache.hits} misses=${cache.misses}")
    assert(r1.rows.map(_.toString) == r2.rows.map(_.toString) && r1.rows.nonEmpty)
    // a cacheable query through the same cache still memoizes
    val plain = """{"fields": [{"name": "vectors", "alias": "n"}]}"""
    CubeRunner.execute(spark, registry, Cubes.embeddingsCube, plain, cache = Some(cache))
    CubeRunner.execute(spark, registry, Cubes.embeddingsCube, plain, cache = Some(cache))
    assert(cache.misses == 1 && cache.hits == 1)
  }

  test("plan cache is bounded: LRU eviction at maxEntries, access refreshes recency") {
    // a long-lived server accumulating distinct query shapes must not
    // grow without bound (janino classes pin metaspace)
    val cache = new graft.exec.PlanCache(maxEntries = 2)
    def df(n: Int) = spark.range(n).toDF()
    cache.getOrCompile("a")(df(1))
    cache.getOrCompile("b")(df(2))
    cache.getOrCompile("a")(df(1))           // touch a → b is now eldest
    cache.getOrCompile("c")(df(3))           // evicts b, not a
    assert(cache.misses == 3 && cache.hits == 1)
    cache.getOrCompile("a")(df(1))           // still cached
    assert(cache.hits == 2, "recently-used entry must survive eviction")
    cache.getOrCompile("b")(df(2))           // evicted → rebuilt
    assert(cache.misses == 4, "evicted entry must be a miss")
  }

  test("plan cache keys are typed: Int vs String args, list splits, separators never alias") {
    import graft.exec.PlanCache.canon
    // the toString trap: Op("flag","eq",Some(25)) and Op("flag","eq",Some("25"))
    // print identically but compile to different plans under coercion
    assert(canon(Pred.Op("flag", "eq", Some(25))) !=
      canon(Pred.Op("flag", "eq", Some("25"))))
    assert(canon(Pred.Op("flag", "eq", Some(25L))) !=
      canon(Pred.Op("flag", "eq", Some(25))))
    // list element boundaries are length-prefixed: ["a,b"] != ["a","b"]
    assert(canon(Seq("a,b")) != canon(Seq("a", "b")))
    // a value containing the old '§' separator cannot forge another key
    assert(canon(("a§b", "c")) != canon(("a", "b§c")))
    // stability: equal values, equal keys
    assert(canon(Pred.and(Pred.eq("f", "R"), Pred.gt("q", 3))) ==
      canon(Pred.and(Pred.eq("f", "R"), Pred.gt("q", 3))))
  }

  test("concurrent execution: parallel queries through one shared PlanCache stay correct") {
    val cache = new graft.exec.PlanCache()
    val flags = Seq("A", "N", "R")
    def docFor(flag: String) =
      s"""{"args": {"returnFlag": {"eq": "$flag"}},
           "fields": [{"name": "count", "alias": "cnt"}]}"""
    // sequential ground truth
    val expected = flags.map(f => f ->
      CubeRunner.execute(spark, registry, Cubes.lineitemCube, docFor(f))
        .rows.head.getLong(0)).toMap
    // 24 parallel executions over 3 query shapes hammer the same cache
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(Future.sequence(
      (1 to 24).map { i =>
        val f = flags(i % 3)
        Future(f -> CubeRunner.execute(spark, registry, Cubes.lineitemCube,
          docFor(f), cache = Some(cache)).rows.head.getLong(0))
      }), 120.seconds)
    results.foreach { case (f, n) => assert(n == expected(f), s"flag $f: $n") }
    // single-flight: each of the 3 shapes compiled exactly once
    assert(cache.misses == 3, s"cache over-compiled: misses=${cache.misses}")
    assert(cache.hits == 21)
  }

  test("ReadCache: one DataFrame per (session, path); distinct paths stay distinct") {
    val a = graft.sources.ReadCache.parquet(spark, "/root/testdata/sf0.001/region.parquet")
    val b = graft.sources.ReadCache.parquet(spark, "/root/testdata/sf0.001/region.parquet")
    assert(a eq b, "same session+path must share the memoized DataFrame")
    val c = graft.sources.ReadCache.parquet(spark, "/root/testdata/sf0.01/region.parquet")
    assert(!(a eq c) && a.count() == c.count()) // region is 5 rows at every SF
  }

  test("O19/O20: execute returns columns+rows and captures stats") {
    val r = CubeRunner.execute(spark, registry, Cubes.lineitemCube, doc)
    assert(r.columns == Seq("cnt") && r.rows.size == 1)
    assert(r.stats.rowCount == 1)
    assert(r.stats.durationNs > 0, "listener should capture duration")
    assert(r.stats.physicalPlan.nonEmpty)
  }
}
