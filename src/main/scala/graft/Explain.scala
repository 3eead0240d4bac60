package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of one or more
  * registry queries (or `entry`) without executing them — the
  * per-operator explain-and-iterate loop the build brief mandates.
  *
  * Usage: runMain graft.Explain [query-name|entry ...]
  * The fixture dir comes from SPARK_GRAFT_SF_DIR (default
  * /root/testdata/sf0.1); names default to `entry` when none given.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = if (args.isEmpty) Seq("entry") else args.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"==== $name ====")
      val df =
        if (name == "entry") SparkEntry.entry(spark)
        else SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))(
          spark, sfDir)
      df.explain("formatted")
    }
    spark.stop()
  }
}
