package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Scaling-curve gate: measure every registry query at THREE data
  * scales with a warm-repeat protocol and print machine-readable lines
  * for `tools/scaling.py` to fit per-query growth exponents — the
  * standing 100×-regression check (a super-linear operator that "works
  * on 60k rows" is exactly what dies at 100 TB).
  *
  * Protocol (BASELINE.md round-3 variance + round-5 sweep lessons):
  *  - Each query's three scale points run CONSECUTIVELY smallest-first,
  *    `repeats`× each; the first small run absorbs the per-query
  *    Catalyst + janino warmup and each point reports the MIN of its
  *    repeats (the warm number). Ratios are taken within one query's
  *    short window, so cross-query GC drift (the q82 in-sweep lesson)
  *    cancels.
  *  - The smallest point doubles as the fixed-overhead floor estimate;
  *    the fitter subtracts it before fitting t ~ rows^e.
  *  - The fixtures scale per TABLE, not per sf dir (documents and
  *    embeddings are constant between sf0.001 and sf0.01), so each
  *    query is classified by the tables its ANALYZED PLAN actually
  *    scans (LogicalRelation root paths — mechanical, no hand-kept
  *    list), and documents-/embeddings-driven queries run against
  *    derived fixture dirs whose driver table is subsampled to three
  *    genuinely distinct sizes (other tables copied from sf0.01).
  *
  * Output lines:
  *   SCALEMETA <query> <driver> <label>=<rows> <label>=<rows> <label>=<rows>
  *   SCALE <query> <label> <t_1>s <t_2>s ...
  *
  * Usage: `sbt "runMain graft.Scale [nameFilter[,nameFilter...]] [repeats]"`
  */
object Scale {

  private val testRoot = "/root/testdata"
  private val synthRoot = "/root/repo/tmp/scale_fixtures"
  private val nativeSfs = Seq("sf0.001", "sf0.01", "sf0.1")

  /** Tables whose rows grow ~10× per native sf step; the rest (region,
    * nation) are constant-ish and never the scale driver. */
  private val growing = Seq("lineitem", "orders", "events", "customer",
    "supplier", "part", "documents", "embeddings")

  // subsample sizes for the constant-at-small-sf tables; smallest ≈ the
  // overhead floor, mid/full a √10 ratio for the exponent fit
  private val docSizes = Seq(50L, 1581L, 5000L)
  private val embSizes = Seq(50L, 632L, 2000L)

  def main(args: Array[String]): Unit = {
    val filters = args.headOption.filter(_.nonEmpty).map(_.split(",").toSeq).getOrElse(Nil)
    val repeats = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    prepareSynthDirs(spark)
    val rowCount = countsCache(spark)

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => filters.isEmpty || filters.exists(name.contains) }
      .foreach { case (name, fn) =>
        try {
          val scanned = scannedTables(fn(spark, s"$testRoot/sf0.01"))
          val driver = growing.reverse.foldLeft(Option.empty[String]) { (acc, t) =>
            if (scanned.contains(t)) Some(t) else acc
          }.getOrElse("none") // `growing` is ordered smallest-last driver priority
          val points: Seq[(String, String)] = driver match {
            case "documents" => docSizes.map(n => s"docs_$n" -> s"$synthRoot/docs_$n")
            case "embeddings" => embSizes.map(n => s"emb_$n" -> s"$synthRoot/emb_$n")
            case _ => nativeSfs.map(sf => sf -> s"$testRoot/$sf")
          }
          val meta = points.map { case (label, dir) =>
            val n = if (driver == "none") 0L else rowCount(driver, dir)
            s"$label=$n"
          }.mkString(" ")
          println(s"SCALEMETA $name $driver $meta")
          points.foreach { case (label, dir) =>
            val times = (1 to repeats).map { _ =>
              val t0 = System.nanoTime()
              fn(spark, dir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            }
            println(s"SCALE $name $label " + times.map(t => f"$t%.3f").mkString(" "))
          }
        } catch {
          case e: Throwable =>
            println(s"SCALEERR $name ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").replace('\n', ' ').take(160))
        }
        System.gc()
      }
    spark.stop()
  }

  /** Parquet table names the query's analyzed plan actually scans. */
  private def scannedTables(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.getName.stripSuffix(".parquet")).toSeq
        case _ => Nil
      }
    }.flatten.toSet

  private def countsCache(spark: SparkSession): (String, String) => Long = {
    val memo = scala.collection.mutable.Map.empty[(String, String), Long]
    (table, dir) => memo.getOrElseUpdate((table, dir),
      spark.read.parquet(s"$dir/$table.parquet").count())
  }

  /** Build the derived fixture dirs once: every sf0.01 table copied,
    * then the driver table overwritten with a deterministic id-ordered
    * subsample of the LARGEST fixture (so mid/full slices nest). */
  private def prepareSynthDirs(spark: SparkSession): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(s"$testRoot/sf0.01")
    def build(kind: String, sizes: Seq[Long], table: String, idCol: String): Unit =
      sizes.foreach { n =>
        val dir = Paths.get(s"$synthRoot/${kind}_$n")
        if (!Files.exists(dir.resolve("_READY"))) {
          Files.createDirectories(dir)
          Files.list(src).forEach { p =>
            if (p.getFileName.toString.endsWith(".parquet"))
              Files.copy(p, dir.resolve(p.getFileName.toString),
                StandardCopyOption.REPLACE_EXISTING)
          }
          // overwrite the driver table with the subsample (directory
          // form — Spark reads either); drop the copied single file
          Files.deleteIfExists(dir.resolve(s"$table.parquet"))
          spark.read.parquet(s"$testRoot/sf0.1/$table.parquet")
            .orderBy(idCol).limit(n.toInt).coalesce(1)
            .write.mode("overwrite").parquet(dir.resolve(s"$table.parquet").toString)
          Files.createFile(dir.resolve("_READY"))
        }
      }
    build("docs", docSizes, "documents", "doc_id")
    build("emb", embSizes, "embeddings", "vec_id")
  }
}
