package graft.exec

import graft.model.{Cube, CubeQueryException}
import graft.parse.QueryParser
import graft.query.CubeQuery
import graft.respond.Renest
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Execution layer — the cube_field.rb analogue (reference
  * lib/activecube/graphql/cube_field.rb:25-54): database routing (O17),
  * the pre-execution query-extension hook (O18), stats collection (O19),
  * and the execute/tabular contract (O20).
  */

/** O17 — `cube.connected_to(database:)` (cube_field.rb:33-38): a named
  * registry of catalogs; the whole query runs against the chosen one.
  * Entries are TYPED ([[graft.sources.Catalog]]): a lakehouse path for
  * the fixtures, a JDBC url for a warehouse — heterogeneous kinds behind
  * one name space, like the reference's named connections.
  */
final case class DatabaseRegistry(
    databases: Map[String, graft.sources.Catalog], default: String) {
  def catalog(db: Option[String]): graft.sources.Catalog = {
    val name = db.getOrElse(default)
    databases.getOrElse(name,
      throw new CubeQueryException(s"unknown database '$name' (have: ${databases.keys.mkString(",")})"))
  }
  /** Legacy accessor for path-backed entries. */
  def dir(db: Option[String]): String = catalog(db) match {
    case graft.sources.PathCatalog(root) => root
    case c => throw new CubeQueryException(s"database '${c.id}' is not path-backed")
  }
}

object DatabaseRegistry {
  /** All-parquet registry (the fixture shape). */
  def paths(m: Map[String, String], default: String): DatabaseRegistry =
    DatabaseRegistry(
      m.map { case (k, v) => k -> (graft.sources.PathCatalog(v): graft.sources.Catalog) },
      default)
}

/** O19 — execution telemetry (cube_field.rb:51-52 `stats`/`headers`
  * passthrough): wall time, output rows, and the physical plan of the
  * last run, captured via Spark's QueryExecutionListener. */
final class ExecStats {
  @volatile var durationNs: Long = -1
  @volatile var rowCount: Long = -1
  @volatile var physicalPlan: String = ""
  override def toString: String =
    f"ExecStats(duration=${durationNs / 1e6}%.1f ms, rows=$rowCount)"
}

/** End-to-end runner: parse → hook → compile → renest → collect. */
object CubeRunner {

  /** O18 — `object.append_cube_query` (cube_field.rb:50): callers (auth,
    * tenant scoping) may transform the built query before compilation. */
  type QueryHook = CubeQuery => CubeQuery

  final case class Result(columns: Seq[String], rows: Seq[Row], stats: ExecStats)

  def execute(
      spark: SparkSession,
      registry: DatabaseRegistry,
      cubeFor: (SparkSession, graft.sources.Catalog) => Cube,
      queryJson: String,
      database: Option[String] = None,
      hook: QueryHook = identity,
      nested: Boolean = true,
      cache: Option[PlanCache] = None): Result = {

    val cat = registry.catalog(database) // O17
    val cube = cubeFor(spark, cat)
    val parsed = QueryParser.parse(cube, queryJson)
    val q = hook(parsed.query) // O18
    def build: DataFrame = {
      val flat = q.toDF
      if (nested) Renest.nest(flat, parsed.root, cube.name) else flat
    }
    // memoized per canonical (post-hook) query — response_builder.rb:27-38.
    // EXCEPT metrics that materialize data into the plan (snapshotsData,
    // e.g. semanticSurvivors' centroids trained at compile): caching one
    // would replay a frozen index after the table changed, so those
    // compile fresh every time.
    // checked against EVERY registry that could resolve the name — the
    // Compiler binds metrics through optimal-source selection, so an
    // alt-source metricOverride that snapshots must also bypass.
    // statsOnly plans are the same hazard in option form: the served
    // LocalRelation freezes the sidecar fold at compile time, so a
    // cached one would replay stale stats after the table moved.
    // Manifest-backed cubes are the hazard in SOURCE form: compiling
    // resolves the snapshot (and any driver file pruning) to a frozen
    // file list, so a cached plan would keep serving the old version
    // after a commit — every manifested fact compiles fresh (the
    // runner rebuilds the cube per execute; only the cache could
    // replay a stale snapshot).
    val cacheable = q.measures.forall { case (_, m) =>
      !cube.metrics.get(m.metric).exists(_.snapshotsData) &&
        !cube.altSources.exists(_.metricOverrides.get(m.metric).exists(_.snapshotsData)) } &&
      !q.options.contains(graft.query.QueryOpt.StatsOnly) &&
      cube.manifestTable.isEmpty
    val df = cache match {
      case Some(c) if cacheable =>
        c.getOrCompile(PlanCache.key(spark, cat.id, cube.name, nested, q, parsed.root))(build)
      case _ => build
    }

    val stats = new ExecStats
    val done = new java.util.concurrent.CountDownLatch(1)
    val listener = new QueryExecutionListener { // O19
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        stats.durationNs = durationNs
        stats.physicalPlan = qe.executedPlan.toString
        done.countDown()
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        done.countDown()
    }
    spark.listenerManager.register(listener)
    try {
      val (cols, rows) = Renest.tabular(df) // O20
      stats.rowCount = rows.size.toLong
      // the listener fires asynchronously; wait briefly for it
      done.await(2, java.util.concurrent.TimeUnit.SECONDS)
      Result(cols, rows, stats)
    } finally spark.listenerManager.unregister(listener)
  }
}
