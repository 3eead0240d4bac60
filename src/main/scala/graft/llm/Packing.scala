package graft.llm

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Sequence packing for training batches: assign documents to
  * fixed-capacity token bins (context windows) so a trainer can
  * concatenate each bin into one sequence with minimal padding.
  *
  * Distributed shape: docs are range-partitioned by id and each
  * partition packs ITS OWN docs with first-fit over a bounded window of
  * open bins — genuine per-partition imperative state, so this is the
  * one operator family where `mapPartitions` is the right Spark tool
  * (no cross-partition coordination, one shuffle total, bin ids
  * namespaced by partition so they never collide). Packing quality is
  * within-partition first-fit (≥ ½ optimal by the classic bound);
  * cross-partition waste is at most one underfull bin per partition —
  * negligible when partitions hold thousands of docs, which is exactly
  * the 100 TB regime.
  */
object Packing {

  /** (doc_id, n_tokens, bin_id): every input doc exactly once.
    * Bins obey `fill ≤ maxTokens` unless a SINGLE doc exceeds the cap —
    * oversize docs get a bin of their own (the trainer's
    * truncate/chunk decision is out of scope here).
    *
    * `openBins` bounds per-partition packer state: first-fit scans the
    * most recent `openBins` still-open bins and retires the oldest
    * beyond that, keeping memory O(openBins) regardless of partition
    * size. */
  def packSequences(
      docs: DataFrame, id: Column, nTokens: Column,
      maxTokens: Int, partitions: Int, openBins: Int = 512): DataFrame = {
    require(maxTokens > 0 && partitions > 0 && openBins > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val sized = docs.select(id.cast("long").as("doc_id"),
        nTokens.cast("int").as("n_tokens"))
      .repartitionByRange(partitions, F.col("doc_id"))
      .sortWithinPartitions("doc_id")
    sized.as[(Long, Int)].mapPartitions { it =>
      val pid = TaskContext.getPartitionId().toLong
      var nextLocal = 0L
      // (binId, remaining), newest last; first-fit scans oldest-first
      val open = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      def newBin(): Long = { val b = (pid << 40) | nextLocal; nextLocal += 1; b }
      it.map { case (docId, rawN) =>
        val n = math.max(rawN, 0)
        val bin =
          if (n >= maxTokens) newBin() // oversize (or exact-fit) doc: own bin
          else {
            val i = open.indexWhere(_._2 >= n)
            if (i >= 0) {
              val (bid, rem) = open(i)
              if (rem - n == 0) open.remove(i) else open(i) = (bid, rem - n)
              bid
            } else {
              val bid = newBin()
              open += ((bid, maxTokens - n))
              if (open.length > openBins) open.remove(0)
              bid
            }
          }
        (docId, rawN, bin)
      }
    }.toDF("doc_id", "n_tokens", "bin_id")
  }
}
