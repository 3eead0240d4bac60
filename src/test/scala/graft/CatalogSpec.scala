package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** The DataSourceV2 SQL front door (graft.sources.v2.GraftCatalog):
  * `spark.sql("SELECT … FROM graft.db.t …")` must serve every manifest
  * capability — snapshot pinning, VERSION/TIMESTAMP AS OF (tags
  * included), driver file skipping with OR/IN tree admission, MoR
  * delete-vector masking, evolved-schema reads — without the CubeQuery
  * front door, because the standard catalog interface is what external
  * tools at 100 TB actually speak.
  */
class CatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.sources.v2.GraftCatalog")
      .getOrCreate()
    SparkSession.setActiveSession(s)
    s
  }

  import graft.sources.Manifest
  import graft.sources.v2.GraftScanInfo

  /** Fresh warehouse root; re-points the cached catalog instance via
    * the dynamically-read conf. */
  private def freshRoot(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_cat").toString
    spark.conf.set("spark.sql.catalog.graft.root", root)
    root
  }

  test("SELECT through the registered catalog matches the native read, " +
      "and a WHERE with IN/OR prunes files at the driver (strict subset)") {
    import spark.implicits._
    val root = freshRoot()
    val tbl = s"$root/db/docs"
    Manifest.create(spark, tbl,
      (1 to 800).map(i => (i.toLong, i * 3L)).toDF("id", "v")
        .repartitionByRange(8, F.col("id")).sortWithinPartitions(F.col("id")))
    Manifest.analyzeFiles(spark, tbl, Seq("id"))
    val nAll = Manifest.read(spark, tbl).inputFiles.length
    assert(nAll == 8)

    // full-table parity, hash-grade: same rows, same schema
    val sql = spark.sql("SELECT id, v FROM graft.db.docs ORDER BY id")
    val native = Manifest.read(spark, tbl).orderBy("id")
    assert(sql.schema == native.schema)
    assert(sql.collect().sameElements(native.collect()))

    // IN probe: two far-apart points — the driver decision admits a
    // strict subset of the snapshot's files
    val q = spark.sql(
      "SELECT count(*) AS n, sum(v) AS sv FROM graft.db.docs " +
        "WHERE id IN (5, 790)")
    assert(q.head() == org.apache.spark.sql.Row(2L, (5L + 790L) * 3))
    val admitted = GraftScanInfo.lastFiles(tbl).get
    assert(admitted.nonEmpty && admitted.size < nAll,
      s"IN probe admitted ${admitted.size} of $nAll files")

    // OR of ranges: union of per-disjunct file sets, still a subset
    val q2 = spark.sql(
      "SELECT count(*) AS n FROM graft.db.docs " +
        "WHERE (id BETWEEN 100 AND 120) OR (id BETWEEN 600 AND 620)")
    assert(q2.head().getLong(0) == 42)
    val adm2 = GraftScanInfo.lastFiles(tbl).get
    assert(adm2.size < nAll, s"OR probe admitted ${adm2.size} files")

    // column pruning reaches the scan builder (pruneColumns → the
    // inner frame selects exactly the pruned schema)
    val proj = spark.sql("SELECT v FROM graft.db.docs WHERE id < 10")
    assert(proj.collect().length == 9)
  }

  test("MoR delete vectors mask rows through the SQL front door") {
    import spark.implicits._
    val root = freshRoot()
    val tbl = s"$root/db/t"
    Manifest.create(spark, tbl,
      (1 to 100).map(i => (i.toLong, s"r$i")).toDF("id", "s").coalesce(2))
    Manifest.deleteWhereMoR(spark, tbl, F.col("id") % 10 === 0)
    val got = spark.sql("SELECT count(*) AS n FROM graft.db.t").head().getLong(0)
    assert(got == 90, s"DV mask must hide the 10 deleted rows, got $got")
    assert(spark.sql("SELECT * FROM graft.db.t WHERE id = 20").count() == 0)
    assert(spark.sql("SELECT * FROM graft.db.t WHERE id = 21").count() == 1)
  }

  test("VERSION AS OF pins versions and resolves tags; TIMESTAMP AS OF " +
      "resolves commit wall time; reads pin snapshots against commits") {
    import spark.implicits._
    val root = freshRoot()
    val tbl = s"$root/db/ev"
    Manifest.create(spark, tbl, Seq((1L, "a")).toDF("id", "s"))
    Manifest.commitAppend(spark, tbl, Seq((2L, "b")).toDF("id", "s"))
    Manifest.tag(spark, tbl, "release-v1", 1L)
    val t2 = Manifest.readSnapshot(spark, tbl, 2L)
      .meta("committed_at").toLong
    Manifest.commitAppend(spark, tbl, Seq((3L, "c")).toDF("id", "s"))

    assert(spark.sql("SELECT * FROM graft.db.ev").count() == 3)
    assert(spark.sql("SELECT * FROM graft.db.ev VERSION AS OF 1").count() == 1)
    assert(spark.sql("SELECT * FROM graft.db.ev VERSION AS OF 2").count() == 2)
    // a tag name is a release pin
    assert(spark.sql(
      "SELECT * FROM graft.db.ev VERSION AS OF 'release-v1'").count() == 1)
    // timestamp resolution: the instant of v2's commit serves v2
    val ts = new java.sql.Timestamp(t2)
    assert(spark.sql(
      s"SELECT * FROM graft.db.ev TIMESTAMP AS OF '$ts'").count() == 2)

    // snapshot pinning: the scan resolves its snapshot at build time,
    // so a plan EXECUTED before a commit served 3 rows, and a fresh
    // resolution after the commit serves 4 — never a torn read
    Manifest.commitAppend(spark, tbl, Seq((4L, "d")).toDF("id", "s"))
    assert(spark.sql("SELECT * FROM graft.db.ev").count() == 4)
  }

  test("aggregate pushdown: count/min/max/sum (flat, filtered, grouped) " +
      "serve from sidecar metadata with zero data files; DVs, 2^53 " +
      "risks, and unservable shapes fall back to the ordinary scan") {
    import spark.implicits._
    val root = freshRoot()
    val tbl = s"$root/db/m"
    Manifest.create(spark, tbl,
      Seq((1L, 10L), (1L, 20L)).toDF("k", "v").coalesce(1))
    Manifest.commitAppend(spark, tbl,
      Seq((2L, 30L), (2L, 40L)).toDF("k", "v").coalesce(1))
    Manifest.analyzeFiles(spark, tbl, Seq("k", "v"))

    def zeroFiles(): Boolean =
      GraftScanInfo.lastFiles(tbl).exists(_.isEmpty)

    // flat: one LocalRelation-backed row, no data file opened
    val flat = spark.sql(
      "SELECT count(*), count(v), min(v), max(v), sum(v) FROM graft.db.m")
    assert(flat.head() == org.apache.spark.sql.Row(4L, 4L, 10L, 40L, 100L))
    assert(zeroFiles(), "flat aggregate must serve from metadata")
    val plan = flat.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [COUNT(*)") &&
      !plan.toLowerCase.contains("hashaggregate"),
      s"the plan must BE the pushed serve, no aggregate exec on top:\n$plan")

    // filtered (exact inclusive ranges): fully-covered serve
    val filt = spark.sql(
      "SELECT count(*), sum(v) FROM graft.db.m WHERE v BETWEEN 30 AND 40")
    assert(filt.head() == org.apache.spark.sql.Row(2L, 70L))
    assert(zeroFiles(), "range-filtered aggregate must serve from metadata")

    // grouped by the file-constant key
    val grp = spark.sql(
      "SELECT k, count(*), sum(v) FROM graft.db.m GROUP BY k ORDER BY k")
    assert(grp.collect().toSeq == Seq(
      org.apache.spark.sql.Row(1L, 2L, 30L),
      org.apache.spark.sql.Row(2L, 2L, 70L)))
    assert(zeroFiles(), "grouped aggregate must serve from metadata")

    // avg rides Spark's own rewrite into pushed sum+count — also a
    // metadata serve
    assert(spark.sql("SELECT avg(v) FROM graft.db.m").head().getDouble(0)
      == 25.0)
    assert(zeroFiles(), "avg rewrites to sum/count and serves")
    // a strict < bound is not a complete range: must NOT claim metadata
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.m WHERE v < 40").head().getLong(0) == 3)
    assert(!zeroFiles(), "a strict bound must scan")

    // grouped + WHERE composes: the range classifies per file, the
    // key partitions the survivors
    val gw = spark.sql(
      "SELECT k, count(*) FROM graft.db.m WHERE v BETWEEN 10 AND 20 " +
        "GROUP BY k ORDER BY k")
    assert(gw.collect().toSeq == Seq(org.apache.spark.sql.Row(1L, 2L)))
    assert(zeroFiles(), "grouped+filtered aggregate must serve")

    // VERSION AS OF + pushdown: the pinned snapshot serves from ITS
    // retained sidecar even after later commits — "how big was
    // release v1" stays a metadata read
    Manifest.tag(spark, tbl, "rel-v1", 1L)
    Manifest.commitAppend(spark, tbl,
      Seq((3L, 50L)).toDF("k", "v").coalesce(1))
    assert(spark.sql(
      "SELECT count(*), sum(v) FROM graft.db.m VERSION AS OF 'rel-v1'")
      .head() == org.apache.spark.sql.Row(2L, 30L))
    assert(zeroFiles(), "a pinned release must still serve from metadata")
    Manifest.analyzeFiles(spark, tbl, Seq("k", "v"))
    assert(spark.sql("SELECT count(*), sum(v) FROM graft.db.m").head()
      == org.apache.spark.sql.Row(5L, 150L))

    // DVs on the snapshot: the serve declines, the scan stays exact
    Manifest.deleteWhereMoR(spark, tbl, $"v" === 20L)
    assert(spark.sql("SELECT count(*), sum(v) FROM graft.db.m").head()
      == org.apache.spark.sql.Row(4L, 130L))
    assert(!zeroFiles(), "a DV-carrying snapshot must scan")
  }

  test("INSERT INTO through the catalog lands a commitAppend: new " +
      "version, history-stamped, schema-checked; OVERWRITE and pinned " +
      "writes refuse") {
    import spark.implicits._
    val root = freshRoot()
    val tbl = s"$root/db/w"
    Manifest.create(spark, tbl, Seq((1L, "a")).toDF("id", "s"))
    spark.sql("INSERT INTO graft.db.w VALUES (2, 'b'), (3, 'c')")
    assert(spark.sql("SELECT * FROM graft.db.w").count() == 3)
    assert(Manifest.versions(spark, tbl) == Seq(1L, 2L),
      "the SQL insert must be one ordinary manifest commit")
    // writeTo.append is the same verb
    Seq((4L, "d")).toDF("id", "s").writeTo("graft.db.w").append()
    assert(Manifest.versions(spark, tbl) == Seq(1L, 2L, 3L))
    assert(spark.sql("SELECT * FROM graft.db.w").count() == 4)
    // schema drift fails loudly (commitAppend's contract / analysis)
    intercept[Exception] {
      spark.sql("INSERT INTO graft.db.w VALUES (5, 'e', 9)")
    }
    // INSERT OVERWRITE is not a capability: refused at analysis
    intercept[Exception] {
      spark.sql("INSERT OVERWRITE graft.db.w VALUES (9, 'z')")
    }
    // nothing landed from the refusals
    assert(spark.sql("SELECT * FROM graft.db.w").count() == 4 &&
      Manifest.versions(spark, tbl) == Seq(1L, 2L, 3L))
  }

  test("readStream.table over the catalog tails the live table " +
      "exactly-once; changeFeed and pinned tables refuse") {
    import spark.implicits._
    val root = freshRoot()
    val tbl = s"$root/db/s"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    Manifest.create(spark, tbl, Seq((1L, "a")).toDF("id", "s"))
    val q = spark.readStream.table("graft.db.s").writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      Manifest.commitAppend(spark, tbl, Seq((2L, "b")).toDF("id", "s"))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(out).orderBy("id").collect().toSeq ==
      Seq(org.apache.spark.sql.Row(1L, "a"), org.apache.spark.sql.Row(2L, "b")))
    // filters and projections stay EXACT through the streaming path —
    // one untranslatable (Spark-residual) and one translatable filter
    // (the shape a batch scan claims handled): the stream must not
    // lose either
    val fq = spark.readStream.table("graft.db.s")
      .filter($"id" % 2 === 0).filter($"id" >= 2).select("id")
      .writeStream.format("parquet").option("path", s"$root/fout")
      .option("checkpointLocation", s"$root/fckpt").start()
    try fq.processAllAvailable() finally fq.stop()
    assert(spark.read.parquet(s"$root/fout").collect().map(_.getLong(0))
      .sorted.sameElements(Array(2L)))

    // changeFeed must route to the format face (fixed catalog schema)
    val cf = intercept[Exception] {
      spark.readStream.option("changeFeed", "true").table("graft.db.s")
        .writeStream.format("noop").start().processAllAvailable()
    }
    assert(cf.getMessage.contains("changeFeed") ||
      Option(cf.getCause).exists(_.getMessage.contains("changeFeed")))
  }

  test("evolved snapshots serve pre-evolution files with NULL new " +
      "columns through SQL; listTables lists manifested dirs; DDL and " +
      "missing tables refuse loudly") {
    import spark.implicits._
    val root = freshRoot()
    val tbl = s"$root/db/evo"
    Manifest.create(spark, tbl, Seq((1L, "a")).toDF("id", "s"))
    Manifest.commitAppend(spark, tbl,
      Seq((2L, "b", 9L)).toDF("id", "s", "extra"), mergeSchema = true)
    val rows = spark.sql(
      "SELECT id, extra FROM graft.db.evo ORDER BY id").collect()
    assert(rows(0).isNullAt(1) && rows(1).getLong(1) == 9L)

    // a second, non-manifested dir is invisible
    new java.io.File(s"$root/db/plaindir").mkdirs()
    val listed = spark.sql("SHOW TABLES IN graft.db").collect()
      .map(_.getString(1)).toSet
    assert(listed.contains("evo") && !listed.contains("plaindir"))

    val miss = intercept[Exception](spark.sql(
      "SELECT * FROM graft.db.nope").collect())
    assert(miss.getMessage.toLowerCase.contains("table"))
    val ddl = intercept[Exception](spark.sql(
      "DROP TABLE graft.db.evo"))
    assert(ddl.getMessage.contains("read-only"))
  }
}
