package graft.plans

import graft.model.CubeQueryException
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the full custom-operator stack (logical node →
  * planner strategy → physical exec), the escape hatch for semantics the
  * built-in operators can't express efficiently (build brief preference
  * (c); spark_guide.md "Custom operator").
  *
  * Semantics match [[graft.operators.Joins.asOf]] (latest right row with
  * rightTs <= leftTs per key, inner flavor) — both are verified against
  * DuckDB's native ASOF JOIN. Where the union+window form sorts the
  * combined stream and windows over it, this exec merges the two sorted,
  * co-partitioned sides in ONE streaming pass per partition: no window
  * buffering, no union materialization, right side consumed exactly once.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightValues: Seq[Attribute],
    isLeft: Boolean = false,
    forward: Boolean = false) extends BinaryNode {
  // plain Attributes only: CleanupAliases strips Alias from every node
  // except Project/Aggregate/Window, so a custom node must not carry them.
  // Left flavor: unmatched lefts emit NULL values, so the carried
  // attributes turn nullable (same exprIds — nullability is metadata).
  override def output: Seq[Attribute] =
    left.output ++ (if (isLeft) rightValues.map(_.withNullability(true)) else rightValues)
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

/** Optimizer rule for the custom node: Catalyst's PushDownPredicates
  * cannot see through [[AsOfJoinPlan]], so a Filter above it would run
  * AFTER the exchange+merge at scale. Pushing is sound only for
  * conjuncts that reference the LEFT side alone — each left row's match
  * is independent of other left rows. Right-side or match-column
  * predicates must stay above: they filter the join RESULT, not the
  * right input (pushing them would change which row is "latest").
  * Once below the node, the built-in rules carry the predicate on into
  * the scan (`PushedFilters`). */
object AsOfPushdownRule extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with PredicateHelper {
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      // deterministic only, mirroring Catalyst's own PushDownPredicates:
      // rand() < 0.1 has an empty reference set but pushing it changes
      // how many times (and on which rows) it is evaluated
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(e => e.references.subsetOf(j.left.outputSet) && e.deterministic)
      if (leftOnly.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(leftOnly.reduce(And), j.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, rv, flavor, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, rv, flavor, fwd) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightValues: Seq[Attribute],
    isLeft: Boolean = false,
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (isLeft) rightValues.map(_.withNullability(true)) else rightValues)

  // co-partition by key (EnsureRequirements inserts matching hash
  // exchanges, exactly as for sort-merge join) and sort each side by
  // (keys, ts) so a single merge pass suffices
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val valProj = UnsafeProjection.create(rightValues, rOut)
      val lTsBound = BindReferences.bindReference(leftTs, lOut)
      val rTsBound = BindReferences.bindReference(rightTs, rOut)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val outProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val nullVal: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightValues.length)

      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastKey: InternalRow = null
      var lastVal: InternalRow = null

      if (forward) lIter.flatMap { lRow =>
        // FORWARD: earliest right row with rightTs >= leftTs. Discard
        // right rows strictly before this left row — left ts only grows,
        // so they can never match a later left either — then PEEK (not
        // consume) the boundary row: it may also be the match for
        // several subsequent left rows.
        val lKey = lKeyProj(lRow)
        val lTsV = lTsBound.eval(lRow)
        var advance = true
        while (advance && rRow != null) {
          val rKey = rKeyProj(rRow)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0 || (c == 0 && tsOrd.lt(rTsBound.eval(rRow), lTsV)))
            rRow = if (rIter.hasNext) rIter.next() else null
          else advance = false
        }
        if (rRow != null && keyOrd.compare(rKeyProj(rRow), lKeyProj(lRow)) == 0)
          Iterator.single(outProj(joined(lRow, valProj(rRow))))
        else if (isLeft) Iterator.single(outProj(joined(lRow, nullVal)))
        else Iterator.empty
      }
      else lIter.flatMap { lRow =>
        val lKey = lKeyProj(lRow)
        val lTsV = lTsBound.eval(lRow)
        // consume right rows at-or-before this left row, remembering the
        // latest one per key (copies: iterator rows are reused buffers)
        var advance = true
        while (advance && rRow != null) {
          val rKey = rKeyProj(rRow)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0 || (c == 0 && tsOrd.lteq(rTsBound.eval(rRow), lTsV))) {
            lastKey = rKey.copy()
            lastVal = valProj(rRow).copy()
            rRow = if (rIter.hasNext) rIter.next() else null
          } else advance = false
        }
        if (lastKey != null && keyOrd.compare(lastKey, lKeyProj(lRow)) == 0)
          Iterator.single(outProj(joined(lRow, lastVal)))
        else if (isLeft) Iterator.single(outProj(joined(lRow, nullVal)))
        else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

object AsOfJoin {

  /** DataFrame front door: resolves columns by name against the analyzed
    * children, registers [[AsOfStrategy]] on the session (public
    * `experimental.extraStrategies` — no extensions restart needed), and
    * wraps the logical node. Same signature as `Joins.asOf`. */
  def dataframe(
      spark: SparkSession,
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      valueCols: Seq[(String, String)],
      joinType: String = "inner",
      direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "asOf needs at least one key column")
    require(joinType == "inner" || joinType == "left",
      s"asOf joinType must be inner or left, got '$joinType'")
    require(direction == "backward" || direction == "forward",
      s"asOf direction must be backward or forward, got '$direction'")
    val lPlan = GraftBridge.analyzed(left)
    // Catalyst's ColumnPruning doesn't see through a custom node, so
    // prune the right side HERE: only keys, the timestamp, and the
    // requested value columns survive into the exchange + sort. At scale
    // this is the difference between shuffling three columns and
    // shuffling the whole right table.
    val rNeeded = (keys ++ Seq(rightTs) ++ valueCols.map(_._1)).distinct
    // left and right often derive from the same relation (self as-of) and
    // would share expression ids, which the analyzer's relation dedup
    // rewrites out from under a custom node — alias every right column
    // through a Project so the right side carries fresh ids
    val rAliased = right.select(rNeeded.map(c =>
      org.apache.spark.sql.functions.col(c).as(s"__r_$c")): _*)
    val rPlan = GraftBridge.analyzed(rAliased)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new CubeQueryException(
          s"asOf: no column '$name' in (${plan.output.map(_.name).mkString(",")})"))
    val rightValues = valueCols.map { case (src, _) => attr(rPlan, s"__r_$src") }
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies = strategies :+ AsOfStrategy
    val optimizations = spark.experimental.extraOptimizations
    if (!optimizations.contains(AsOfPushdownRule))
      spark.experimental.extraOptimizations = optimizations :+ AsOfPushdownRule
    val raw = GraftBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, s"__r_$k")),
      attr(lPlan, leftTs), attr(rPlan, s"__r_$rightTs"),
      rightValues, isLeft = joinType == "left",
      forward = direction == "forward"))
    // rename through an ordinary Project (aliases are legal there)
    import org.apache.spark.sql.functions.col
    raw.select(left.columns.map(col).toSeq ++
      valueCols.map { case (src, dst) => col(s"__r_$src").as(dst) }: _*)
  }
}
