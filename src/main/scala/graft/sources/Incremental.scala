package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Incremental materialized-aggregate maintenance over a manifested
  * table — the first row-level consumer of [[Manifest.readChanges]],
  * and the classic counting algorithm for materialized views (Gupta &
  * Mumick, "Maintenance of Materialized Views: Problems, Techniques,
  * and Applications", IEEE Data Eng. Bull. 1995): additive aggregates
  * (count + sums) update from the change feed with +1/−1 signs.
  *
  * The 100 TB point: refreshing a dashboard aggregate after a commit
  * costs ∝ that commit's changed rows (the feed reads only
  * added/removed files, the delta aggregation shuffles only changed
  * rows, the merge join is aggregate-sized) — never a table rescan.
  * Groups whose maintained count reaches zero disappear, exactly as a
  * recompute would produce; non-additive views (avg, ratios) derive
  * at read time from the maintained count/sums.
  */
object Incremental {

  /** The maintainable aggregate shape: per-`keys` group, `n_rows`
    * plus `cnt_<c>` (non-null count) and `sum_<c>` for each of
    * `sumCols` (numeric columns; sums use the column's own type, so
    * long columns stay exact). The non-null count is what lets
    * [[applyChanges]] return a sum to NULL when every contributing
    * row has been deleted — a bare maintained sum would read 0 where
    * a recompute reads NULL (SQL `sum` over no non-null inputs). */
  def aggregate(df: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "aggregate needs at least one key")
    val aggs = F.count(F.lit(1)).as("n_rows") +:
      sumCols.flatMap(c => Seq(
        F.count(F.col(c)).as(s"cnt_$c"),
        F.sum(F.col(c)).as(s"sum_$c")))
    df.groupBy(keys.map(F.col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** `agg` (the [[aggregate]] of some snapshot) + a
    * [[Manifest.readChanges]] feed → the aggregate of the later
    * snapshot: inserts contribute +1/+x, deletes −1/−x, zero-count
    * groups drop, and a sum whose non-null count reaches zero returns
    * to NULL (exactly what a recompute produces). Cost ∝ |changes| +
    * |agg|, never the table. */
  def applyChanges(agg: DataFrame, changes: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "applyChanges needs at least one key")
    val sign = F.when(F.col("_change_type") === "insert", 1L)
      .otherwise(-1L)
    val deltaAggs = F.sum(sign).as("n_rows") +:
      // sum skips nulls on both sides: a changed row with a null
      // measure moves n_rows but neither cnt nor sum, matching
      // recompute
      sumCols.flatMap(c => Seq(
        F.sum(F.when(F.col(c).isNotNull, sign)).as(s"cnt_$c"),
        F.sum(sign * F.col(c)).as(s"sum_$c")))
    val delta = changes.groupBy(keys.map(F.col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val cols = "n_rows" +: sumCols.flatMap(c => Seq(s"cnt_$c", s"sum_$c"))
    val merged = agg.select((keys ++ cols).map(F.col): _*)
      .unionByName(delta.select((keys ++ cols).map(F.col): _*))
    val mergeAggs = F.sum(F.col("n_rows")).as("n_rows") +:
      sumCols.flatMap(c => Seq(
        F.sum(F.col(s"cnt_$c")).as(s"cnt_$c"),
        F.sum(F.col(s"sum_$c")).as(s"__rawsum_$c")))
    merged.groupBy(keys.map(F.col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      .select((keys.map(F.col) ++ (F.col("n_rows") +:
        sumCols.flatMap(c => Seq(
          // delta-only groups whose changes carried no non-null
          // measure sum to NULL, where recompute's count gives 0
          F.coalesce(F.col(s"cnt_$c"), F.lit(0L)).as(s"cnt_$c"),
          F.when(F.coalesce(F.col(s"cnt_$c"), F.lit(0L)) > 0,
            F.col(s"__rawsum_$c")).as(s"sum_$c"))))): _*)
      .filter(F.col("n_rows") > 0)
  }

  /** Convenience refresh: maintain version `v1`'s aggregate up to
    * `v2` purely from the change feed. Equals
    * `aggregate(readVersion(v2), …)` row for row. */
  def refreshAggregate(spark: org.apache.spark.sql.SparkSession,
      table: String, v1: Long, v2: Long, keys: Seq[String],
      sumCols: Seq[String]): DataFrame =
    applyChanges(
      aggregate(Manifest.readVersion(spark, table, v1), keys, sumCols),
      Manifest.readChanges(spark, table, v1, v2), keys, sumCols)

  /** Commit-metadata key on the AGGREGATE table recording the source
    * version its content reflects — the refresh watermark. */
  private val RefreshedKey = "refreshed_src_version"

  /** MATERIALIZED-VIEW refresh as a durable, idempotent job: keep a
    * manifested aggregate TABLE of `srcTable` up to date from the
    * change feed. First call materializes the full aggregate; later
    * calls read the watermark ([[RefreshedKey]]) from the aggregate's
    * own commit metadata, apply only the changes since, and land the
    * result as one atomic rewrite carrying the new watermark — so a
    * crash between refreshes loses nothing (the old snapshot + old
    * watermark still agree), re-running is a no-op when current, and
    * each refresh costs ∝ the commits being caught up, never the
    * source table. The scheduled-dashboard shape of [[applyChanges]].
    * Requires the watermark version to still be retained on the
    * source (vacuum within the refresh cadence ⇒ fails loudly, then
    * `fullRefresh = true` rematerializes). Returns the source version
    * now reflected. */
  def refreshMaterialized(spark: org.apache.spark.sql.SparkSession,
      srcTable: String, aggTable: String, keys: Seq[String],
      sumCols: Seq[String], fullRefresh: Boolean = false): Long = {
    // every read below is PINNED to the versions resolved here, and
    // the rewrite commits against the resolved aggregate version: a
    // concurrent refresher (or a src commit mid-refresh) then fails
    // loudly or lands as a later catch-up — never a silent
    // double-application of the same delta
    val cur = Manifest.currentSnapshot(spark, srcTable).getOrElse(
      sys.error(s"Incremental.refreshMaterialized: $srcTable has no " +
        "committed snapshot")).version
    val aggSnap = Manifest.currentSnapshot(spark, aggTable)
    val watermark =
      if (fullRefresh) None
      else aggSnap.flatMap(_.meta.get(RefreshedKey).map(_.toLong))
    watermark match {
      case Some(v0) if v0 == cur => cur // already current: no-op
      case Some(v0) =>
        require(Manifest.versions(spark, srcTable).contains(v0),
          s"Incremental.refreshMaterialized: watermark v$v0 of " +
            s"$srcTable is no longer retained (vacuumed inside the " +
            "refresh cadence) — rematerialize with fullRefresh = true")
        val next = applyChanges(
          Manifest.readVersion(spark, aggTable, aggSnap.get.version),
          Manifest.readChanges(spark, srcTable, v0, cur), keys, sumCols)
        Manifest.commitRewrite(spark, aggTable, next,
          meta = Map(RefreshedKey -> cur.toString),
          expected = aggSnap.map(_.version))
        cur
      case None =>
        val full = aggregate(
          Manifest.readVersion(spark, srcTable, cur), keys, sumCols)
        aggSnap match {
          case Some(a) =>
            Manifest.commitRewrite(spark, aggTable, full,
              meta = Map(RefreshedKey -> cur.toString),
              expected = Some(a.version))
          case None =>
            Manifest.create(spark, aggTable, full,
              meta = Map(RefreshedKey -> cur.toString))
        }
        cur
    }
  }

  /** Incremental JOIN-view maintenance — the delta-join rule
    * (Blakeley, Larson & Tompa, "Efficiently Updating Materialized
    * Views", SIGMOD 1986). For the inner-join view V = A ⋈ B, the
    * row-level change feed of V between (aV1, bV1) and (aV2, bV2)
    * decomposes as
    *
    *   ΔV  =  ΔA ⋈ B₂  ∪  A₁ ⋈ ΔB        (signs multiply through)
    *
    * — the first term joins A's feed against the NEW B, the second
    * joins the OLD A against B's feed, so every term is sized by a
    * DELTA, never by |A ⋈ B|. The old-side probe is the expensive
    * factor at 100 TB and is restricted to the delta's join keys:
    * a runtime-filterable semi-join shape by default, and — when the
    * probed version is the table's CURRENT snapshot, the key is one
    * column, and the delta's key set is driver-feasible — the Bloom
    * sidecar's file-level candidate restriction
    * ([[Manifest.readPointAny]]), which opens a handful of files
    * before any footer. Joins on NULL keys never match (SQL inner
    * join), matching the recompute.
    *
    * Output: the join's columns (`keys`, then A's non-key columns,
    * then B's) + `_change_type` ('insert' | 'delete'), NETTED — a row
    * rewritten to the same values cancels — and replicated to its
    * multiset multiplicity, so applying the feed to the old view
    * equals the new view as multisets (the LakehouseSpec property).
    * Cost: both terms shuffle on `keys` sized by the deltas; the
    * netting aggregate is feed-sized. */
  def joinChanges(spark: org.apache.spark.sql.SparkSession,
      tableA: String, tableB: String,
      aV1: Long, aV2: Long, bV1: Long, bV2: Long,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinChanges needs at least one key column")
    val dA = Manifest.readChanges(spark, tableA, aV1, aV2)
    val dB = Manifest.readChanges(spark, tableB, bV1, bV2)
    val clash = (dA.columns.toSet & dB.columns.toSet) --
      keys.toSet - "_change_type"
    require(clash.isEmpty,
      s"Incremental.joinChanges: non-key columns shared by both " +
        s"tables (${clash.toSeq.sorted.mkString(",")}) — rename them " +
        "apart; the view's columns must be unambiguous")
    val b2 = restrictToKeys(spark, tableB, bV2, dA, keys)
    val a1 = restrictToKeys(spark, tableA, aV1, dB, keys)
    def signed(df: DataFrame, tag: String) = df.withColumn(s"__s_$tag",
      F.when(F.col("_change_type") === "insert", 1L).otherwise(-1L))
      .drop("_change_type")
    // ΔA ⋈ B₂ (B₂ rows carry sign +1) ∪ A₁ ⋈ ΔB
    val t1 = signed(dA, "a").join(b2, keys)
      .withColumn("__sign", F.col("__s_a")).drop("__s_a")
    val t2 = a1.join(signed(dB, "b"), keys)
      .withColumn("__sign", F.col("__s_b")).drop("__s_b")
    val cols = t1.columns.filter(_ != "__sign").toSeq
    val both = t1.select((cols :+ "__sign").map(F.col): _*)
      .unionByName(t2.select((cols :+ "__sign").map(F.col): _*))
    // net per distinct row value, then replicate to |net| copies
    both.groupBy(cols.map(F.col): _*)
      .agg(F.sum(F.col("__sign")).as("__net"))
      .filter(F.col("__net") =!= 0L)
      .select((cols.map(F.col) :+
        F.explode(F.expr("sequence(1, abs(__net))")).as("__i") :+
        F.when(F.col("__net") > 0, "insert").otherwise("delete")
          .as("_change_type")): _*)
      .drop("__i")
  }

  /** Commit-metadata keys on the JOIN-view table recording the two
    * source versions its content reflects. */
  private val RefreshedAKey = "refreshed_a_version"
  private val RefreshedBKey = "refreshed_b_version"

  /** Durable incremental JOIN-view maintenance: keep a manifested
    * materialization of `A ⋈ B` current from the two tables' change
    * feeds. First call materializes the full join; later calls compute
    * the delta-join feed ([[joinChanges]]) since the view's own
    * watermarks and apply it with [[Manifest.applyDeltaMoR]] — deletes
    * become one delta-sized delete vector, inserts one appended
    * directory, BOTH in a single atomic commit carrying the new
    * watermarks. So each refresh costs ∝ the churn being caught up
    * (never |A|, |B|, or the view), a crash loses nothing (old
    * snapshot + old watermarks still agree), and re-running when
    * current is a no-op.
    *
    * `rowKeys` must uniquely identify VIEW rows (typically the fact
    * table's primary key): the feed's deletes are applied by masking
    * those keys, and masking a non-unique key would kill innocent
    * copies. Uniqueness of the incoming inserts is checked on the
    * frozen feed; the fold debt ([[Manifest.foldDeletes]]) is the
    * caller's maintenance schedule. Returns the (aVersion, bVersion)
    * now reflected. */
  def refreshMaterializedJoin(spark: org.apache.spark.sql.SparkSession,
      tableA: String, tableB: String, viewTable: String,
      keys: Seq[String], rowKeys: Seq[String],
      fullRefresh: Boolean = false): (Long, Long) = {
    require(rowKeys.nonEmpty,
      "refreshMaterializedJoin: rowKeys must identify view rows")
    val aCur = Manifest.currentSnapshot(spark, tableA).getOrElse(
      sys.error(s"refreshMaterializedJoin: $tableA has no snapshot")).version
    val bCur = Manifest.currentSnapshot(spark, tableB).getOrElse(
      sys.error(s"refreshMaterializedJoin: $tableB has no snapshot")).version
    val viewSnap = Manifest.currentSnapshot(spark, viewTable)
    val marks =
      if (fullRefresh) None
      else viewSnap.flatMap(s => for {
        a <- s.meta.get(RefreshedAKey); b <- s.meta.get(RefreshedBKey)
      } yield (a.toLong, b.toLong))
    marks match {
      case Some((a0, b0)) if a0 == aCur && b0 == bCur => (aCur, bCur)
      case Some((a0, b0)) =>
        require(Manifest.versions(spark, tableA).contains(a0) &&
          Manifest.versions(spark, tableB).contains(b0),
          s"refreshMaterializedJoin: watermark (v$a0, v$b0) no longer " +
            "retained (vacuumed inside the refresh cadence) — " +
            "rematerialize with fullRefresh = true")
        val wm = Map(RefreshedAKey -> aCur.toString,
          RefreshedBKey -> bCur.toString)
        val feed = joinChanges(spark, tableA, tableB,
          a0, aCur, b0, bCur, keys).cache()
        try {
          if (feed.limit(1).count() == 0) {
            // churn cancelled out (compactions, rewrites): advance the
            // watermarks with a metadata-only commit so the next
            // refresh is the cheap no-op
            val s = viewSnap.get
            Manifest.commit(spark, viewTable, s.version, s.paths,
              s.meta ++ wm)
          } else {
            val dels = feed.filter(F.col("_change_type") === "delete")
              .select(rowKeys.map(F.col): _*)
            val ins = feed.filter(F.col("_change_type") === "insert")
              .drop("_change_type")
            Manifest.applyDeltaMoR(spark, viewTable, dels, ins, rowKeys,
              meta = wm)
          }
        } finally { feed.unpersist(); () }
        (aCur, bCur)
      case None =>
        val full = Manifest.readVersion(spark, tableA, aCur)
          .join(Manifest.readVersion(spark, tableB, bCur), keys)
        val meta = Map(RefreshedAKey -> aCur.toString,
          RefreshedBKey -> bCur.toString)
        viewSnap match {
          case Some(s) => Manifest.commitRewrite(spark, viewTable, full,
            meta = meta, expected = Some(s.version))
          case None => Manifest.create(spark, viewTable, full, meta = meta)
        }
        (aCur, bCur)
    }
  }

  /** The old-side probe of [[joinChanges]], restricted to the delta's
    * join keys. Single-column keys with a driver-feasible delta key
    * set probe the CURRENT snapshot through the Bloom sidecar's
    * file-level restriction when the requested version IS current
    * (time-travel probes and wide keys take the semi-join; both are
    * exact — the semi-join re-filters rows either way). */
  private def restrictToKeys(spark: org.apache.spark.sql.SparkSession,
      table: String, v: Long, delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    val keyRows = delta.select(keys.map(F.col): _*).distinct()
    val base: DataFrame =
      if (keys.size == 1 &&
          Manifest.currentSnapshot(spark, table).exists(_.version == v)) {
        val cap = 10000
        val vals = keyRows.limit(cap + 1).collect()
          .map(_.get(0)).filter(_ != null).toSeq
        if (vals.nonEmpty && vals.size <= cap)
          Manifest.readPointAny(spark, table, keys.head, vals)
        else Manifest.readVersion(spark, table, v)
      } else Manifest.readVersion(spark, table, v)
    base.join(keyRows, keys, "left_semi")
  }
}
