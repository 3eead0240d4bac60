package graft.functions

import graft.model.CubeQueryException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for the engine's custom expressions, so
  * `spark.sql("SELECT simhash64(...)")` works alongside the Column API.
  *
  * Two entry points:
  *  - [[GraftExtensions]] for `SparkSession.builder.withExtensions(...)`
  *    (the SparkSessionExtensions path — survives into every session built
  *    with it);
  *  - [[GraftFunctions.register]] for an already-running session.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new CubeQueryException(s"$what must be an int literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (exprs => SimHash64(exprs.head)),
    "cosine_sim" -> (exprs => CosineSim(exprs(0), exprs(1))),
    "polyhash64" -> (exprs => PolyHash64(exprs.head)),
    "word_shingles" -> (exprs =>
      WordShingles(exprs.head,
        if (exprs.size > 1) intLit(exprs(1), "word_shingles k") else 3)),
    "cms_estimate" -> (exprs => CmsEstimate(exprs(0), exprs(1))),
    "funnel_stage" -> (exprs => FunnelStage(exprs(0),
      longLit(exprs(1), "funnel_stage window"), intLit(exprs(2), "funnel_stage steps"),
      if (exprs.size > 3) boolLit(exprs(3), "funnel_stage anyAnchor") else false)),
    "minhash_sig" -> (exprs => MinHashSig(exprs(0),
      intLit(exprs(1), "minhash_sig numHashes"), longLit(exprs(2), "minhash_sig seed"))),
    "seq_count" -> (exprs => SeqCount(exprs(0), intLit(exprs(1), "seq_count steps"))),
    "ngram_stats" -> (exprs => NgramStats(exprs(0), intLit(exprs(1), "ngram_stats n"))))

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new CubeQueryException(s"$what must be a long literal, got $other")
  }

  private def boolLit(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new CubeQueryException(s"$what must be a boolean literal, got $other")
  }

  /** Imperative registration on a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` —
  * functions AND the native as-of planner strategy in one shot (the
  * deployment path; `AsOfJoin.dataframe` also self-registers the
  * strategy on `experimental.extraStrategies` for ad-hoc sessions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
    e.injectOptimizerRule(_ => graft.plans.AsOfPushdownRule)
  }
}
