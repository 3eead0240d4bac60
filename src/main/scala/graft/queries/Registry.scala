package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark plan plus (when SQL-expressible)
  * the equivalent DuckDB oracle. Column names must match exactly — the
  * driver sorts columns by name before hashing values.
  */
final case class NamedQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[NamedQuery] =
    CoreQueries.qs ++ StarQueries.qs ++ EventQueries.qs ++ LlmQueries.qs ++
      ParsedQueries.qs ++ ExtraQueries.qs ++ InvariantQueries.qs ++
      TrainQueries.qs ++ CurateQueries.qs ++ Round13Queries.qs ++
      Round14Queries.qs ++ Round15Queries.qs ++ Round17Queries.qs ++
      Round18Queries.qs ++ Round19Queries.qs ++ Round20Queries.qs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
