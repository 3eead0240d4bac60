package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

object ExperimentR21b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    @volatile var log = List.empty[String]
    @volatile var t0 = System.nanoTime()
    spark.listenerManager.register(new QueryExecutionListener {
      def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val head = qe.optimizedPlan.getClass.getSimpleName
        val plan = qe.optimizedPlan.toString.linesIterator.take(1).mkString
        log ::= f"+${(System.nanoTime() - t0) / 1e9}%.3f $funcName ${durationNs / 1e9}%.3f $plan"
      }
      def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    val all = SparkEntry.queries
    args.toSeq.filter(all.contains).foreach { name =>
      log = Nil
      t0 = System.nanoTime()
      all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"EXP $name wall=$dt%.3f actions=${log.size}")
      log.reverse.foreach(s => println("ACT " + s.take(200)))
    }
    spark.stop()
  }
}
