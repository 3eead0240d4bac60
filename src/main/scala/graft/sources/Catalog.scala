package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed database-registry entries (O17 — the reference's
  * cube_field.rb:33-38 `connected_to(database:)` routes a query to a
  * named *connection*, not a directory; registry entries are therefore
  * heterogeneous catalogs: a lakehouse path, a JDBC warehouse, ...).
  */
sealed trait Catalog {
  /** Stable identity, used in plan-cache keys and error messages. */
  def id: String
  def load(spark: SparkSession, table: String): DataFrame
}

/** Memoized parquet reads: `spark.read.parquet` pays a file listing +
  * footer/schema read EVERY call, and cube construction eagerly builds
  * every join-spec table — across a large query registry that is
  * hundreds of redundant footer reads. DataFrames are immutable plans,
  * so sharing one per (session, path) is safe for immutable datasets
  * (the engine's source contract; a mutated path would need
  * `REFRESH`-style invalidation, like Spark's own table cache). */
object ReadCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  def parquet(spark: SparkSession, path: String): DataFrame =
    cache.computeIfAbsent((spark, path), k => k._1.read.parquet(k._2))
}

/** A lakehouse root: one parquet dataset per table name. */
final case class PathCatalog(root: String) extends Catalog {
  def id: String = root
  def load(spark: SparkSession, table: String): DataFrame =
    ReadCache.parquet(spark, s"$root/$table.parquet")
}

/** A JDBC database (parity-in-kind with the reference's named ClickHouse
  * connections). Extra options (partitionColumn / lowerBound /
  * upperBound / numPartitions, fetchsize, ...) pass straight through to
  * the Spark JDBC source — at scale a JDBC read WITHOUT a partition
  * column is a single-task scan, so production entries should carry one.
  */
final case class JdbcCatalog(
    url: String,
    options: Map[String, String] = Map.empty) extends Catalog {
  def id: String = url
  def load(spark: SparkSession, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .load()
}
