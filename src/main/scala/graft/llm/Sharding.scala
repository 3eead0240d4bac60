package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Deterministic global shuffle + sharding of a finished training
  * mixture — the last step of a data pipeline: emit N shard files whose
  * contents AND row order are a pure function of row identity, so any
  * rerun (or any other engine) produces byte-identical training input,
  * and a data-loader bug can be bisected to a shard.
  *
  * Mechanism: shard = [[Splits.hashBucket]](id, shards) and an
  * intra-shard order key = [[Splits.hashUniform]](id) — md5-derived, so
  * the "shuffle" is reproducible everywhere, unlike `rand()` or
  * `repartition` which reorder on every run/retry. E[docs per shard] =
  * n/N with multinomial concentration (±O(√(n/N))) — at n ≫ N² the
  * imbalance is negligible, no global sort or size accounting needed.
  *
  * 100 TB posture: assignment is row-local; [[writeShards]] does ONE
  * range exchange on (shard, key) into `tasks` writers followed by a
  * partition-local sort, so a shard larger than one task's memory
  * splits across files while the CONCATENATED per-shard stream (files
  * in part-number order) stays in deterministic key order —
  * range-partition boundaries move run to run, the emitted stream does
  * not. [[shardStats]] is the audit face: per-shard counts, token
  * totals, and order endpoints, cheap enough to run on every emit and
  * SQL-replayable (q159's oracle).
  */
object Sharding {

  /** Input columns plus `shard` in [0, shards) and the intra-shard
    * order key `shuffle_key` in (0,1). Row-local, no shuffle. */
  def shardAssignments(df: DataFrame, idCol: Column, shards: Int): DataFrame = {
    require(shards > 0, s"shard count must be positive, got $shards")
    df.withColumn("shard", Splits.hashBucket(idCol, shards))
      .withColumn("shuffle_key", Splits.hashUniform(idCol))
  }

  /** Per-shard audit: (shard, n_docs, n_tokens, first_doc, last_doc,
    * key_sum). `first_doc`/`last_doc` are the order ENDPOINTS under the
    * deterministic (shuffle_key, id) order — together with `key_sum`
    * they pin the emitted stream, not just its membership. One
    * aggregation shuffle with N output rows. */
  def shardStats(df: DataFrame, idCol: Column, tokenCol: Column,
      shards: Int): DataFrame = {
    val ord = F.struct(F.col("shuffle_key"), idCol.as("id"))
    shardAssignments(df, idCol, shards)
      .groupBy("shard")
      .agg(
        F.count(F.lit(1)).as("n_docs"),
        F.sum(tokenCol.cast("long")).as("n_tokens"),
        F.min_by(idCol, ord).as("first_doc"),
        F.max_by(idCol, ord).as("last_doc"),
        F.round(F.sum(F.col("shuffle_key")), 6).as("key_sum"))
  }

  /** Emit `path/shard=K/part-*` parquet: each shard's concatenated
    * files (part-number order) hold its rows in (shuffle_key, id)
    * order. `tasks` sizes the write parallelism — use ≥ corpus size /
    * a-few-GB so no single sorter takes a whole shard; defaults to one
    * task per shard (small corpora). */
  def writeShards(df: DataFrame, idCol: Column, path: String, shards: Int,
      tasks: Int = 0): Unit = {
    val n = if (tasks > 0) tasks else shards
    shardAssignments(df, idCol, shards)
      .repartitionByRange(n, F.col("shard"), F.col("shuffle_key"), idCol)
      .sortWithinPartitions(F.col("shard"), F.col("shuffle_key"), idCol)
      .write.partitionBy("shard").mode("overwrite").parquet(path)
  }
}
