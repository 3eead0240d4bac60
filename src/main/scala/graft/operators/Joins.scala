package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Relational join helpers beyond the cube surface (SURVEY §2.4 Joins:
  * the reference has no explicit join operators — dimension resolution is
  * the implicit one — but a complete engine exposes them). Thin,
  * Catalyst-native: semi/anti map to Spark's LeftSemi/LeftAnti, which
  * broadcast automatically when the right side is small.
  */
object Joins {
  /** Rows of `left` with at least one match in `right` (SQL EXISTS). */
  def semi(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** Rows of `left` with no match in `right` (SQL NOT EXISTS). */
  def anti(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** Broadcast inner equi-join against a small dimension table. */
  def dim(fact: DataFrame, dimTable: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame =
    fact.join(F.broadcast(dimTable), cond, joinType)
}
