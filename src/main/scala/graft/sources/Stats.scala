package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** ANALYZE-style table statistics — the warehouse maintenance pass
  * that feeds cost-based planning and data-skipping audits: per
  * column, row/null counts, exact and approximate distinct counts,
  * and the min/max envelope, in ONE aggregation pass over the table
  * (every column's stats are parallel aggregate expressions in the
  * same partial+final hash agg — the table is scanned once however
  * many columns are analyzed). Values are stringified so one frame
  * carries mixed column types.
  */
object Stats {

  def analyze(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "analyze needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        F.count(F.col(c)).as(s"__${c}_n"),
        F.count_distinct(F.col(c)).as(s"__${c}_ndv"),
        F.approx_count_distinct(F.col(c)).as(s"__${c}_andv"),
        F.min(F.col(c)).cast("string").as(s"__${c}_min"),
        F.max(F.col(c)).cast("string").as(s"__${c}_max"))
    }
    val total = F.count(F.lit(1)).as("__rows")
    val row = df.agg(total, aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__${c}_n`, `__${c}_ndv`, `__${c}_andv`, `__${c}_min`, `__${c}_max`"
    }.mkString(", ")
    row.select(F.col("__rows"), F.expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column, n_non_null, ndv, ndv_approx, min_s, max_s)"))
      .select(F.col("column"),
        F.col("__rows").as("n_rows"),
        (F.col("__rows") - F.col("n_non_null")).as("n_nulls"),
        F.col("ndv"), F.col("ndv_approx"),
        F.col("min_s"), F.col("max_s"))
  }
}
