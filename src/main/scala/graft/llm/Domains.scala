package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Web-corpus domain governance — the URL-level curation steps of the
  * C4/RefinedWeb family: parse out host/registered-domain/TLD/path
  * depth (row-local regex+split Column expressions, map-only at any
  * scale) and cap the number of documents any one domain contributes
  * (the anti-SEO-farm lever: without it a single template site can be
  * thousandths of the corpus).
  *
  * The registered domain is the last two host labels — deliberately
  * PSL-free (a public-suffix-list lookup is a broadcast join away, but
  * the OPERATOR shape is identical and the simple rule is exactly
  * SQL-replayable, which is what the oracle contract needs).
  */
object Domains {

  /** Host part of a URL (empty string when no scheme-host shape). */
  def host(url: Column): Column =
    F.regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)

  /** Registered domain = last two labels of the host ("a.b.site.com"
    * → "site.com"); hosts with a single label pass through. */
  def registeredDomain(url: Column): Column = {
    val labels = F.split(host(url), "\\.")
    F.concat_ws(".",
      F.slice(labels, F.greatest(F.size(labels) - 1, F.lit(1)),
        F.lit(2)))
  }

  /** Last host label ("com"). */
  def tld(url: Column): Column = F.element_at(F.split(host(url), "\\."), -1)

  /** Number of non-empty path segments after the host. */
  def pathDepth(url: Column): Column = {
    val path = F.regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]+(/[^?#]*)", 1)
    F.size(F.filter(F.split(path, "/"), s => s =!= ""))
  }

  /** Per-domain contribution cap: keep at most `n` docs per registered
    * domain, best-first by (orderCol DESC, id ASC) — deterministic
    * total order, the limit_by window shape (ONE shuffle on the
    * domain; skew bounded by the hottest domain like any window).
    * Returns the input plus `domain` and `kept`. */
  def capPerDomain(df: DataFrame, idCol: Column, urlCol: Column,
      orderCol: Column, n: Int): DataFrame = {
    require(n >= 1, s"cap must be >= 1, got $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(F.col("domain"))
      .orderBy(orderCol.desc, idCol.asc)
    df.withColumn("domain", registeredDomain(urlCol))
      .withColumn("kept", F.row_number().over(w) <= n)
  }
}
