package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Behavioral-sequence extraction: gap-sessionized per-user event
  * streams rendered as ordered action strings — the step that turns an
  * EVENTS table into a TRAINING corpus (sequence-model pretraining,
  * next-action prediction), bridging the engine's analytics side and
  * its data-pipeline side. One aggregation on (user, session_window):
  * Spark's session-window rewrite handles the gap merging, the ordered
  * action string comes from sorting the collected (ts, event_id, type)
  * structs — array_sort's lexicographic struct order makes ties
  * deterministic — so the emitted corpus is a pure function of the
  * events table. The output drops straight into [[TextAnalysis.chunks]]
  * / [[Packing]] with the sequence as the text.
  */
object Sessions {

  /** (user_id, session_start ms, n_events, seq) — one row per session,
    * `seq` = ">"-joined event types in (ts, event_id) order.
    *
    * Boundary convention (inherited from Spark's session_window, whose
    * windows are half-open [start, start+gap)): two events merge iff
    * the gap between them is STRICTLY LESS than `gap` — an event
    * exactly `gap` after its predecessor starts a NEW session. Any
    * oracle re-sessionizing with lag() must therefore split on
    * `gap >= INTERVAL`, not `>` (the q178 oracle does). */
  def sessionSequences(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(F.col("user_id"),
        F.session_window(F.col("ts"), gap).as("__w"))
      .agg(F.array_sort(F.collect_list(F.struct(
        F.col("ts"), F.col("event_id"), F.col("event_type")))).as("__evs"))
      .select(
        F.col("user_id"),
        F.unix_millis(F.col("__w.start")).as("session_start"),
        F.size(F.col("__evs")).as("n_events"),
        F.concat_ws(">",
          F.transform(F.col("__evs"), e => e.getField("event_type"))).as("seq"))
}
