package graft
import org.apache.spark.sql.SparkSession

/** Round-21 measurement harness (guide §1): run named registry queries
  * N times each inside ONE session (first run = plan+codegen+JIT cost,
  * later runs = steady state), timing the noop-sink materialization.
  * Usage: runMain graft.ProfileR21 [reps] [query ...]   (default 3 reps,
  * the two frozen bench sets). SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as
  * in Bench.
  */
object ProfileR21 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (reps, names0) = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption) match {
      case Some(n) => (n, args.drop(1).toSeq)
      case None => (3, args.toSeq)
    }
    val names = if (names0.nonEmpty) names0 else Bench.Headline ++ Bench.Lakehouse
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val all = SparkEntry.queries
    names.filter(all.contains).foreach { name =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(name)
        all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
