package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark: one representative query per operator family, run
  * on SPARK_GRAFT_SF_DIR, timings printed as ONE JSON line. Materializes
  * via the noop sink so the full plan (including projections) executes
  * without driver-side collect cost.
  */
object Bench {
  /** One per operator family: global agg, sliced agg, high-cardinality
    * slice, conditional metrics, OR-trees, sort+limit, limit_by window,
    * top-k tuple, 4-way star join, rollup routing, tumbling window,
    * sessionization, minhash-LSH dedup, text profile, ANN. */
  val Headline: Seq[String] = Seq(
    "q01_global_agg", "q02_slice_measure", "q04_subfield_date",
    "q06_metric_filter", "q13_or_any", "q15_sort_desc_limit",
    "q18_limit_by", "q22_topk_flat", "q31_star_region_chain",
    "q36_multisource_rollup", "q41_tumbling_window", "q43_session_window",
    "q46_asof_join", "q66_asof_native", "q47_merged_cube",
    "q51_minhash_pairs", "q55_text_profile", "q57_cosine_topk")

  /** Second frozen set (round 17+): the lakehouse/curation operators
    * the original 18 never touched — CoW merge, MoR delete vectors,
    * change feed, filtered + grouped metadata serving, z-order
    * conjunctive pruning, the exactly-once upsert sink, the
    * graft-table streaming source, Kneser-Ney scoring, and the
    * curation capstone. Reported separately (`lakehouse_value` /
    * `lakehouse_queries`) so the original set's round-over-round
    * series stays comparable. */
  val Lakehouse: Seq[String] = Seq(
    "q208_merge_upsert", "q209_delete_vectors", "q202_change_feed",
    "q226_stats_where", "q228_zorder_pruning", "q215_stream_upsert",
    "q217_table_stream", "q190_kneser_ney", "q195_curation_v4",
    "q231_grouped_statsonly")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: JVM JIT, codegen compiler, parquet footer cache.
    // Round 21 widened it (same purpose, declared in OPTIMIZATION_r21.md):
    // touch the documents footer too (the lakehouse set reads it), and
    // push one tiny synthetic plan through the agg/join/window/sort
    // codegen + noop-sink paths so Janino and the shuffle machinery
    // compile BEFORE the first timed query instead of inside it. The
    // warmup computes nothing any timed query reuses — every timed
    // result still derives entirely from the parquet inputs.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.{functions => F}
      val base = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).as("k"))
      val agg = base.groupBy("k")
        .agg(F.sum("id").as("s"), F.count(F.lit(1)).as("c"))
      base.join(F.broadcast(agg), "k")
        .withColumn("rn", F.row_number().over(
          Window.partitionBy("k").orderBy(F.col("id").desc)))
        .orderBy(F.col("rn").asc, F.col("id").asc)
        .write.format("noop").mode("overwrite").save()
    }

    val all = SparkEntry.queries
    def run(names: Seq[String]): Seq[(String, Double)] =
      names.filter(all.contains).map { name =>
        val t0 = System.nanoTime()
        val ok =
          try {
            all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        name -> (if (ok) dt else -1.0)
      }
    def json(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
        .mkString("{", ",", "}")
    def tot(rs: Seq[(String, Double)]): Double =
      rs.map(_._2).filter(_ >= 0).sum
    val results = run(Headline)
    val lake = run(Lakehouse)
    val line = f"""{"metric":"total","value":${tot(results)}%.3f,"unit":"sec","queries":${json(results)},"lakehouse_value":${tot(lake)}%.3f,"lakehouse_queries":${json(lake)},"sf":"$sfDir"}"""
    println(line)
    // Round 22: the driver has never parsed the println (sbt's logger
    // prefixed it with "[info] " every round — parsed:null in BENCH_r17..21).
    // Write the identical line verbatim to a bare file as well, and rely on
    // build.sbt's StdoutOutput strategy to land the println unprefixed.
    // Additive only: same queries, same timing loop, same JSON content.
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_out.json"),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
