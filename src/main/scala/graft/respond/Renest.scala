package graft.respond

import graft.parse.QueryParser.{Discriminator, Element, MetricKind, RootKind}
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

  /** Re-nest a compiled flat frame according to the parsed element tree.
    * A union element (or root) carrying a discriminator resolves
    * `__typename` PER ROW (response_builder.rb:21-24 — the typename comes
    * from the runtime row); `typeNameValue` is the constant fallback for
    * unions without one. Elements marked `onType` are nulled on rows of
    * other union members — heterogeneous response shapes. */
  def nest(df: DataFrame, root: Element, typeNameValue: String = ""): DataFrame = {
    require(root.kind == RootKind, "nest expects the root element")
    validateDiscriminators(df, root)
    val tn = typeNameCol(root, typeNameValue)
    val cols = root.children.map(e => toColumn(e, tn, typeNameValue))
    df.select(cols: _*)
  }

  /** A discriminator's `on` must name a column of the compiled flat frame
    * — fail with the engine's own exception at nest time instead of a
    * Spark AnalysisException deep inside the projection. */
  private def validateDiscriminators(df: DataFrame, e: Element): Unit = {
    e.discriminator.foreach { d =>
      if (!df.columns.contains(d.on))
        throw new graft.model.CubeQueryException(
          s"discriminator 'on' column '${d.on}' is not a result column " +
            s"(have: ${df.columns.mkString(",")})")
    }
    e.children.foreach(validateDiscriminators(df, _))
  }

  /** The per-row typename Column for an element's children: a `when`
    * chain over the discriminating result column, else a constant. */
  private def typeNameCol(e: Element, fallback: String): Column =
    e.discriminator match {
      case Some(Discriminator(on, mapping, default)) =>
        mapping.foldRight(F.lit(if (default.nonEmpty) default else fallback)) {
          case ((value, typeName), rest) =>
            F.when(F.col(on) === F.lit(value), F.lit(typeName)).otherwise(rest)
        }
      case None => F.lit(fallback)
    }

  private def toColumn(e: Element, tn: Column, fallback: String): Column = {
    val c =
      if (e.name == "__typename") tn
      else if (e.isLeaf) convertType(F.col(e.flatName), e.typeName)
      else {
        val childTn = if (e.discriminator.isDefined) typeNameCol(e, fallback) else tn
        F.struct(e.children.map(toColumn(_, childTn, fallback)): _*)
      }
    val gated = e.onType match {
      case Some(t) => F.when(tn === F.lit(t), c)
      case None => c
    }
    gated.as(e.outName)
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
