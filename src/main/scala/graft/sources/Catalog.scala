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

/** A lakehouse root: one parquet dataset per table name. */
final case class PathCatalog(root: String) extends Catalog {
  def id: String = root
  def load(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$root/$table.parquet")
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
