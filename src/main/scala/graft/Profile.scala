package graft
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    Seq("q02_slice_measure", "q06_metric_filter", "q55_text_profile").foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    // plan-cache effect on the front-door runner: repeated identical query
    // with and without memoization (response_builder.rb:27-38 analogue)
    import graft.cubes.Cubes
    import graft.exec.{CubeRunner, DatabaseRegistry, PlanCache}
    val registry = DatabaseRegistry.paths(Map("bench" -> dir), "bench")
    val doc =
      """{"fields": [{"name": "returnFlag", "alias": "flag"},
                     {"name": "shipDate", "fields": [{"name": "year"}]},
                     {"name": "count", "alias": "cnt"},
                     {"name": "amount", "args": {"quantity": {"gt": 25}}}],
          "args": {"options": {"desc": "cnt", "limit": 10}}}"""
    val cache = new PlanCache()
    Seq("cached" -> Some(cache), "uncached" -> None).foreach { case (label, c) =>
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        CubeRunner.execute(spark, registry, Cubes.lineitemCube, doc, cache = c)
        println(f"runner-$label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
