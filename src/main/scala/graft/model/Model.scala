package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** The cube data model, re-expressed Spark-first.
  *
  * Mirrors the abstractions the reference adapter drives
  * (reference: lib/activecube/graphql/parse_tree.rb:25-36 — metric /
  * dimension / dimension-field / selector lookup on the cube), but every
  * member is a Spark `Column` expression so the compiled query is a single
  * declarative Catalyst plan.
  */

/** A named grouping attribute (reference parse_tree.rb:91 `query.slice`).
  *
  * @param col      the source column expression
  * @param fields   derived sub-fields, chainable (parse_tree.rb:29
  *                 `(parent.field || dimension)[definition.to_sym]`), e.g.
  *                 date{year} → `c => F.year(c)`
  * @param requires names of [[JoinSpec]]s on the cube that must be applied
  *                 before this dimension's column resolves (star schema)
  */
final case class Dimension(
    name: String,
    col: Column,
    fields: Map[String, Column => Column] = Map.empty,
    requires: Set[String] = Set.empty,
    /** ClickHouse `arrayJoin` semantics: the resolved column is an ARRAY
      * and slicing on this dimension emits one row per element (rows
      * with empty arrays drop, like arrayJoin). Flat grouping only; at
      * most one exploding slice per query. */
    explode: Boolean = false) {

  /** Resolve a chained sub-field path, e.g. Seq("year"). */
  def resolve(path: Seq[String]): Column =
    path.foldLeft(col) { (c, f) =>
      fields.getOrElse(
        f,
        throw new CubeQueryException(
          s"dimension '$name' has no sub-field '$f' (has: ${fields.keys.mkString(",")})"))(c)
    }
}

/** A named aggregate (reference parse_tree.rb:88 `query.measure`).
  *
  * `build` receives the optional metric-level predicate (conditional
  * aggregation, parse_tree.rb:88,116 — a metric-level `when` must NOT
  * reduce the row set for sibling metrics) and returns the aggregate
  * Column. FILTER semantics come free from null-skipping aggregates:
  * `sum(when(p, x))` ≡ `sum(x) FILTER (WHERE p)`.
  */
final case class Metric(
    name: String,
    build: Option[Column] => Column,
    requires: Set[String] = Set.empty,
    applyArgFn: Option[(String, Any) => Metric] = None,
    /** Plan-backed escape hatch for metrics whose value is not ONE
      * aggregate expression (e.g. EXACT top-K, which needs a two-phase
      * count + window plan). Given the pre-filtered fact, the resolved
      * slice keys, and the metric-level predicate, returns a DataFrame
      * of (slice keys..., `__pb_value`); the Compiler joins it back on
      * the slice keys and renames the value to the measure key. Flat
      * grouping only. */
    planBuild: Option[(DataFrame, Seq[(String, Column)], Option[Column]) => DataFrame] = None,
    /** True when compiling this metric MATERIALIZES data into the plan
      * (runs Spark actions whose results become literals — e.g.
      * semanticSurvivors' k-means centroids, an IVF index build). Such a
      * plan is a snapshot: re-executing it after the underlying table
      * changed replays the frozen index, so the PlanCache must not memo
      * it ([[graft.exec.CubeRunner]] skips the cache when a bound metric
      * sets this). Pure plan-backed metrics (exact top-K) stay
      * cacheable: their plans re-scan the table per execution like any
      * Spark plan. */
    snapshotsData: Boolean = false) {
  /** Post-process the aggregate value (e.g. rounding for stable compare). */
  def mapValue(f: Column => Column): Metric = copy(build = p => f(build(p)))

  /** Dispatch a named argument onto the metric — the reference applies
    * ANY metric argument that isn't a selector onto the metric object
    * (parse_tree.rb:111-135 apply_args; e.g. topK's size). Unknown arg
    * ⇒ InputArgumentError analogue (parse_tree.rb:130, V4). */
  def applyArg(k: String, v: Any): Metric =
    applyArgFn.map(_(k, v)).getOrElse(throw new CubeQueryException(
      s"metric '$name' takes no argument '$k'"))
}

object Metric {
  /** A metric with named parameters and defaults: every declared arg can
    * be (re)bound from a query document, producing a specialized metric
    * (parse_tree.rb:127-130 — args dispatch as methods on the metric). */
  def parameterized(name: String, defaults: Map[String, Any])(
      factory: Map[String, Any] => Option[Column] => Column): Metric = {
    def make(bound: Map[String, Any]): Metric =
      Metric(name, factory(bound), applyArgFn = Some { (k, v) =>
        if (bound.contains(k)) make(bound + (k -> v))
        else throw new CubeQueryException(
          s"metric '$name' takes no argument '$k' (has: ${defaults.keys.mkString(",")})")
      })
    make(defaults)
  }

  private def filtered(c: Column, p: Option[Column]): Column =
    p.map(pr => F.when(pr, c)).getOrElse(c)

  def countAll(name: String): Metric =
    Metric(name, p => F.count(filtered(F.lit(1), p)))
  def sumOf(name: String, c: Column): Metric =
    Metric(name, p => F.sum(filtered(c, p)))
  def avgOf(name: String, c: Column): Metric =
    Metric(name, p => F.avg(filtered(c, p)))
  def minOf(name: String, c: Column): Metric =
    Metric(name, p => F.min(filtered(c, p)))
  def maxOf(name: String, c: Column): Metric =
    Metric(name, p => F.max(filtered(c, p)))
  /** Exact distinct count (ClickHouse `uniqExact`). */
  def uniqExact(name: String, c: Column): Metric =
    Metric(name, p => F.count_distinct(filtered(c, p)))
  /** Approximate distinct (ClickHouse `uniq`) — the 100 TB default. */
  def uniqApprox(name: String, c: Column, rsd: Double = 0.02): Metric =
    Metric(name, p => F.approx_count_distinct(filtered(c, p), rsd))
}

/** A named filterable attribute (reference parse_tree.rb:119,125,153 —
  * `cube.selectors[k]`, `selector.eq(value)`, dynamic operator dispatch).
  */
final case class Selector(
    name: String,
    col: Column,
    requires: Set[String] = Set.empty)

/** A star-schema join used to resolve dimensions/selectors that live on a
  * dimension table (reference surface: dimension sub-fields crossing
  * tables, parse_tree.rb:29; the join itself was delegated to activecube).
  * Dimension tables are small → broadcast by default so the fact table
  * never shuffles.
  */
final case class JoinSpec(
    name: String,
    right: DataFrame,
    cond: Column,
    joinType: String = "inner",
    broadcastRight: Boolean = true,
    dependsOn: Set[String] = Set.empty)

/** One physical table able to serve a cube, with the dimension/metric
  * names it can answer. Mirrors activecube's optimal-table selection
  * (SURVEY §4): the compiler picks the cheapest source covering the
  * query — e.g. a pre-aggregated daily rollup instead of the raw fact.
  *
  * @param cost relative scan cost (rows); lower wins among covering sources
  * @param dimOverrides    dimensions re-expressed over THIS source's columns
  * @param metricOverrides metrics re-expressed over this source (e.g. a
  *                        rollup's `count` = `sum(partial_cnt)` — aggregate
  *                        re-aggregation)
  */
final case class CubeSource(
    name: String,
    df: DataFrame,
    servesDimensions: Set[String],
    servesMetrics: Set[String],
    cost: Long,
    dimOverrides: Map[String, Dimension] = Map.empty,
    metricOverrides: Map[String, Metric] = Map.empty,
    selectorOverrides: Map[String, Selector] = Map.empty)

/** A named analytical entity: fact source(s) + registries
  * (reference cube_field.rb:18, parse_tree.rb:16,32,119).
  */
final case class Cube(
    name: String,
    fact: DataFrame,
    dimensions: Map[String, Dimension],
    metrics: Map[String, Metric],
    selectors: Map[String, Selector],
    joins: Map[String, JoinSpec] = Map.empty,
    altSources: Seq[CubeSource] = Nil,
    /** Path of the [[graft.sources.Manifest]] table backing `fact`,
      * when there is one — what makes the `asOf` time-travel query
      * option resolvable (absent ⇒ asOf fails loudly, V4-style). */
    manifestTable: Option[String] = None) {

  def dimension(n: String): Dimension =
    dimensions.getOrElse(n, throw new CubeQueryException(
      s"cube '$name': unknown dimension '$n'"))  // V1, parse_tree.rb:32-34
  def metric(n: String): Metric =
    metrics.getOrElse(n, throw new CubeQueryException(
      s"cube '$name': unknown metric '$n'"))
  def selector(n: String): Selector =
    selectors.getOrElse(n, throw new CubeQueryException(
      s"cube '$name': unknown selector '$n'"))
  def join(n: String): JoinSpec =
    joins.getOrElse(n, throw new CubeQueryException(
      s"cube '$name': unknown join '$n'"))
}

/** Error hierarchy (reference cube_field.rb:42-43 surfaces
  * InputArgumentError as GraphQL::ExecutionError; V1-V8 in SURVEY §2.3).
  */
class CubeQueryException(msg: String) extends RuntimeException(msg)
