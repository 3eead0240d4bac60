package graft.respond

import graft.parse.QueryParser.{Element, MetricKind, RootKind}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.{functions => F}

/** Response re-nesting — the response_builder.rb analogue (reference
  * lib/activecube/graphql/response_builder.rb). The compiled cube query
  * produces a FLAT DataFrame with "__"-joined column names; this module
  * reassembles the GraphQL selection shape:
  *
  *   - nested objects = `struct(children…)` (R3, sub_element :92-99)
  *   - aliases are already distinct columns, resolved statically at plan
  *     time (R4 — no runtime dispatch needed in Spark)
  *   - Boolean 1/0 conversion at the edge (R6, convert_type :12-19)
  *   - `__typename` emitted as a literal discriminator on unions (R8)
  *
  * Where the reference synthesizes Ruby classes per query shape and walks
  * rows reflectively (R1/R7, memoized :27-38), Spark does the same work
  * once inside the plan: the struct projection is compiled by Catalyst,
  * so re-nesting is codegen'd per batch, not per row.
  */
object Renest {

  /** Re-nest a compiled flat frame according to the parsed element tree. */
  def nest(df: DataFrame, root: Element, typeNameValue: String = ""): DataFrame = {
    require(root.kind == RootKind, "nest expects the root element")
    val cols = root.children.map(e => toColumn(e, typeNameValue))
    df.select(cols: _*)
  }

  private def toColumn(e: Element, tn: String): Column = {
    val c =
      if (e.name == "__typename") F.lit(tn)
      else if (e.isLeaf) convertType(F.col(e.flatName), e.typeName)
      else F.struct(e.children.map(toColumn(_, tn)): _*)
    c.as(e.outName)
  }

  /** Boolean stored as 1/0 (ClickHouse UInt8) → real boolean (R6). */
  private def convertType(c: Column, typeName: Option[String]): Column =
    typeName match {
      case Some("Boolean") => c === F.lit(1)
      case _ => c
    }

  /** Flat rows view: ordered column names + positional rows — the
    * reference's tabular result contract (`response.columns` /
    * `response.rows`, response_builder.rb:145,151; O20). */
  def tabular(df: DataFrame): (Seq[String], Seq[Row]) =
    (df.columns.toSeq, df.collect().toSeq)
}
