package graft.operators

import graft.functions.FunnelStage
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Event-sequence analytics (the ClickHouse windowFunnel / retention
  * family — the reference's ClickHouse backend ships these as first-class
  * aggregates for exactly the event-stream data this engine targets).
  *
  * Scale shape: both operators are ONE hash aggregation by user — no
  * join per funnel step, no self-joins. funnel's per-user state is the
  * user's own step events (bounded by per-user activity, combinable
  * map-side as a list merge); retention's is a handful of booleans.
  *
  * Whale guard: per-user state is bounded by that user's OWN events,
  * which is fine for humans but not for the one bot/ETL account with
  * 10⁸ step events a 100 TB corpus always has — one giant list row on
  * one reducer. `maxEventsPerUser = Some(n)` switches the event
  * aggregation to [[graft.functions.EarliestN]]: deterministic
  * earliest-n truncation with aggregation state hard-capped at 2n per
  * user everywhere (map-side partials included). Results for users at
  * or under the cap are bit-identical to the uncapped path.
  */
object Funnel {

  /** The (ts, step)-sorted event array feeding the chain scans: a plain
    * sorted collect_list, or the state-bounded earliest-cap prefix. */
  private def eventArray(cap: Option[Int]): Column = cap match {
    case Some(n) => graft.functions.EarliestN(n)(F.col("__ts"), F.col("__step"))
    case None => F.sort_array(F.collect_list(F.struct(F.col("__ts"), F.col("__step"))))
  }

  /** Furthest funnel stage per user. Two anchor modes:
    *  - default (first-touch attribution): the chain starts at the
    *    user's FIRST `steps(0)` event; each later step must occur
    *    strictly after the previous and within `windowMicros` of it.
    *  - `anyAnchor = true` (ClickHouse windowFunnel semantics): the
    *    chain may start at ANY `steps(0)` event — a user who missed the
    *    window from their first anchor but converted from a later one
    *    still counts (single-pass DP, [[FunnelStage.computeAny]]).
    * Output: (user_id, stage) with stage in 0..steps.size; users with
    * no funnel events at all are absent, users with later-step events
    * but no anchor get 0.
    */
  def funnelStages(events: DataFrame, user: Column, ts: Column, etype: Column,
      steps: Seq[String], windowMicros: Long,
      anyAnchor: Boolean = false,
      maxEventsPerUser: Option[Int] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got ${steps.mkString(",")}")
    val stepIdx = steps.zipWithIndex.tail.foldLeft(
      F.when(etype === steps.head, 0)) { case (acc, (s, i)) => acc.when(etype === s, i) }
    events.filter(etype.isin(steps: _*))
      .select(user.as("user_id"), F.unix_micros(ts).as("__ts"), stepIdx.as("__step"))
      .groupBy(F.col("user_id"))
      .agg(eventArray(maxEventsPerUser).as("__ev"))
      .select(F.col("user_id"),
        FunnelStage(F.col("__ev"), windowMicros, steps.size, anyAnchor).as("stage"))
  }

  /** Non-overlapping ordered-sequence occurrences per user — ClickHouse
    * `sequenceCount('(?1).*(?2).*…')` with the step conditions restricted
    * to disjoint event-type equalities (the activecube-backend form).
    * `n_matches` is the maximum number of DISJOINT step-0→…→step-(k-1)
    * subsequences in the user's (ts, step)-sorted events (greedy scan,
    * [[graft.functions.SeqCount]]); `matched` (= ClickHouse
    * `sequenceMatch`) is `n_matches > 0`. No time-window constraint —
    * that's [[funnelStages]]' contract. Same scale shape as the funnel:
    * ONE hash aggregation by user, per-user state bounded by that user's
    * own step events, no per-step self-joins.
    */
  def sequenceCount(events: DataFrame, user: Column, ts: Column, etype: Column,
      steps: Seq[String],
      maxEventsPerUser: Option[Int] = None): DataFrame = {
    require(steps.nonEmpty, "sequence needs at least one step")
    require(steps.distinct.size == steps.size,
      s"sequence steps must be distinct, got ${steps.mkString(",")}")
    val stepIdx = steps.zipWithIndex.tail.foldLeft(
      F.when(etype === steps.head, 0)) { case (acc, (s, i)) => acc.when(etype === s, i) }
    events.filter(etype.isin(steps: _*))
      .select(user.as("user_id"), F.unix_micros(ts).as("__ts"), stepIdx.as("__step"))
      .groupBy(F.col("user_id"))
      .agg(eventArray(maxEventsPerUser).as("__ev"))
      .select(F.col("user_id"),
        graft.functions.SeqCount(F.col("__ev"), steps.size).as("n_matches"))
      .withColumn("matched", F.col("n_matches") > 0)
  }

  /** [[sequenceCount]] as a PLAN-BACKED cube metric
    * ([[graft.model.Metric]] `planBuild` contract): per slice group,
    * Σ over users of the greedy disjoint-chain count — "total completed
    * step₀→…→stepₖ sequences" sliced by any cube dimension. Grouping is
    * (slice keys..., user) for the chain scan, then one re-aggregation:
    * two cascaded hash aggs exactly like [[retentionJson]], shuffle ∝
    * distinct (group, user), never a per-step join.
    *
    * Group contract: one row for EVERY group present in `df` — a group
    * whose rows are all removed by `pred` (or that has no step events)
    * gets 0, never null. */
  def sequenceTotalPlan(
      df: DataFrame,
      groupCols: Seq[(String, Column)],
      user: Column, ts: Column, etype: Column,
      steps: Seq[String],
      pred: Option[Column],
      outKey: String = "__pb_value",
      maxEventsPerUser: Option[Int] = None): DataFrame = {
    require(steps.nonEmpty, "sequence needs at least one step")
    require(steps.distinct.size == steps.size,
      s"sequence steps must be distinct, got ${steps.mkString(",")}")
    PlanBacked.groupContract(df, groupCols, pred, outKey) { (vals, keyed) =>
      val stepIdx = steps.zipWithIndex.tail.foldLeft(
        F.when(etype === steps.head, 0)) { case (acc, (s, i)) => acc.when(etype === s, i) }
      val perUser = vals.filter(etype.isin(steps: _*))
        .select((keyed.map { case (n, c) => c.as(n) } :+ user.as("__u") :+
          F.unix_micros(ts).as("__ts") :+ stepIdx.as("__step")): _*)
        .groupBy((keyed.map { case (n, _) => F.col(n) } :+ F.col("__u")): _*)
        .agg(eventArray(maxEventsPerUser).as("__ev"))
        .select((keyed.map { case (n, _) => F.col(n) } :+
          graft.functions.SeqCount(F.col("__ev"), steps.size).cast("long").as("__n")): _*)
      perUser.groupBy(keyed.map { case (n, _) => F.col(n) }: _*)
        .agg(F.sum(F.col("__n")).as(outKey))
    }(_ => F.lit(0L))
  }

  /** Cohort retention (ClickHouse `retention` semantics): `conds.head`
    * is the anchor condition; element k of the result counts users
    * satisfying BOTH the anchor and condition k, so the series reads
    * "of the anchor cohort, how many came back for each window".
    * Returns one row: (n_cohort, retained_1, ..., retained_{n-1}).
    */
  def retention(events: DataFrame, user: Column, conds: Seq[Column]): DataFrame = {
    require(conds.size >= 2, "retention needs an anchor plus >=1 condition")
    val flags = conds.zipWithIndex.map { case (c, i) =>
      F.max(F.when(c, 1).otherwise(0)).as(s"__r$i")
    }
    val perUser = events.groupBy(user.as("__u")).agg(flags.head, flags.tail: _*)
    val out = F.sum(F.col("__r0")).as("n_cohort") +:
      (1 until conds.size).map(i =>
        F.sum(F.col("__r0") * F.col(s"__r$i")).as(s"retained_$i"))
    perUser.agg(out.head, out.tail: _*)
  }

  /** Retention as a PLAN-BACKED cube metric ([[graft.model.Metric]]
    * `planBuild` contract): per slice group, the JSON array
    * `[n_cohort, retained_1, ...]`. Grouping is (slice keys..., user) —
    * a user whose events span several slice values contributes flags to
    * each, exactly ClickHouse's `retention(...) GROUP BY dim`. Two
    * cascaded hash aggregations, both map-side combined; shuffle ∝
    * distinct (group, user) pairs, never a join per condition.
    *
    * Group contract: one row for EVERY group present in `df` — a group
    * whose rows are all removed by `pred` gets an all-zero series, never
    * null. */
  def retentionJson(
      df: DataFrame,
      groupCols: Seq[(String, Column)],
      user: Column,
      conds: Seq[Column],
      pred: Option[Column],
      outKey: String = "__pb_value"): DataFrame = {
    require(conds.size >= 2, "retention needs an anchor plus >=1 condition")
    val zeros = "[" + conds.indices.map(_ => "0").mkString(",") + "]"
    PlanBacked.groupContract(df, groupCols, pred, outKey) { (vals, keyed) =>
      val flags = conds.zipWithIndex.map { case (c, i) =>
        F.max(F.when(c, 1L).otherwise(0L)).as(s"__r$i")
      }
      val perUser = vals
        .groupBy((keyed.map { case (n, c) => c.as(n) } :+ user.as("__u")): _*)
        .agg(flags.head, flags.tail: _*)
      val sums = F.sum(F.col("__r0")).as("__s0") +:
        (1 until conds.size).map(i =>
          F.sum(F.col("__r0") * F.col(s"__r$i")).as(s"__s$i"))
      perUser.groupBy(keyed.map { case (n, _) => F.col(n) }: _*)
        .agg(sums.head, sums.tail: _*)
        .select((keyed.map { case (n, _) => F.col(n) } :+
          F.to_json(F.array(conds.indices.map(i => F.col(s"__s$i")): _*)).as(outKey)): _*)
    }(_ => F.lit(zeros))
  }
}
