package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup (CCNet/RefinedWeb class): a
  * web crawl sees the same page under many spellings — scheme/host case,
  * `www.` prefixes, default ports, tracking query parameters, parameter
  * order, trailing slashes, fragments. Canonicalizing before the URL
  * dedup pass is the cheapest dedup a corpus gets (pure per-row rewrite,
  * zero shuffle) and typically removes a double-digit percentage of a
  * crawl before any content hashing runs.
  *
  * The canonical form computed here:
  *   - scheme and host lowercased; only http/https accepted (others → null,
  *     the malformed-row-tolerance convention of the WKT scan)
  *   - a leading `www.` stripped from the host
  *   - default ports dropped (`:80` for http, `:443` for https); other
  *     ports kept
  *   - the fragment dropped
  *   - tracking parameters removed: any `utm_*` key plus the literal
  *     [[UrlCurate.defaultDropParams]] set; remaining parameters sorted
  *     byte-wise so order never splits a URL into two keys
  *   - trailing slashes stripped from the path (`/docs/` == `/docs`;
  *     a bare `/` path equals no path)
  *
  * Everything is composed from built-in codegen'd functions — the whole
  * canonicalization stays inside one WholeStageCodegen span; there is no
  * UDF and no custom expression to maintain. Bracketed IPv6 hosts (which
  * embed `:`) are out of scope and canonicalize with their port intact.
  */
object UrlCurate {

  /** Tracking keys dropped in addition to the `utm_*` prefix family.
    * The list is deliberately short and literal — callers with a site-
    * specific list pass their own. */
  val defaultDropParams: Seq[String] =
    Seq("gclid", "fbclid", "msclkid", "igshid", "mc_eid", "ref", "ref_src")

  /** Canonical form of `url` (null for non-http(s) or null input). */
  def canonicalizeUrl(url: Column,
                      dropParams: Seq[String] = defaultDropParams): Column = {
    // trim(...) strips only spaces; crawls carry tabs/newlines too
    val trimmed   = regexp_replace(url, "^\\s+|\\s+$", "")
    val scheme    = lower(substring_index(trimmed, "://", 1))
    val okScheme  = (instr(trimmed, "://") > 0) && scheme.isin("http", "https")
    // after the first "://", fragment dropped (substr is 1-based; an
    // over-long len is clamped, so length(trimmed) is a safe upper bound)
    val rest      = trimmed.substr(instr(trimmed, "://") + 3, length(trimmed))
    val noFrag    = substring_index(rest, "#", 1)
    val qpos      = instr(noFrag, "?")
    val hostPath  = when(qpos > 0, noFrag.substr(lit(1), qpos - 1)).otherwise(noFrag)
    val query     = when(qpos > 0, noFrag.substr(qpos + 1, length(noFrag)))
      .otherwise(lit(""))
    val slashPos  = instr(hostPath, "/")
    val hostPort  = lower(when(slashPos > 0, hostPath.substr(lit(1), slashPos - 1))
      .otherwise(hostPath))
    val rawPath   = when(slashPos > 0, hostPath.substr(slashPos, length(hostPath)))
      .otherwise(lit(""))
    val cpos      = instr(hostPort, ":")
    val host0     = when(cpos > 0, hostPort.substr(lit(1), cpos - 1)).otherwise(hostPort)
    val port      = when(cpos > 0, hostPort.substr(cpos + 1, length(hostPort)))
      .otherwise(lit(""))
    val host      = when(host0.startsWith("www."),
      host0.substr(lit(5), length(host0))).otherwise(host0)
    val keepPort  = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val portPart  = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))
    val path      = regexp_replace(rawPath, "/+$", "")
    val kept      = filter(split(query, "&"), p => {
      val key = lower(substring_index(p, "=", 1))
      (p =!= "") && !key.startsWith("utm_") && !key.isInCollection(dropParams)
    })
    val sortedQ   = array_join(array_sort(kept), "&")
    val queryPart = when(sortedQ === "", lit(""))
      .otherwise(concat(lit("?"), sortedQ))
    when(url.isNull || !okScheme || host === "", lit(null))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  /** Keep one row per canonical URL (the minimum `idCol`), adding
    * `url_canon`. Rows whose URL does not canonicalize (null canon) pass
    * through untouched — they are each their own key, and grouping them
    * under one null partition would both dedup unrelated junk together
    * and pile every malformed row onto one task.
    *
    * Same two-stage salted top-1 as [[HostCurate.capPerHost]], so one
    * viral URL appearing 10^8 times never serializes onto a single task:
    * stage 1 takes the min id within (canon, id-salt), stage 2 the min of
    * the ≤ `salts` survivors per canon. */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String,
                 salts: Int = 32,
                 dropParams: Seq[String] = defaultDropParams): DataFrame = {
    require(salts > 0, "dedupByUrl: salts must be positive")
    val withCanon = df.withColumn("url_canon",
      canonicalizeUrl(col(urlCol), dropParams))
    val keyed   = withCanon.where(col("url_canon").isNotNull)
      .withColumn("__salt", pmod(col(idCol), lit(salts.toLong)))
    val w1 = Window.partitionBy(col("url_canon"), col("__salt"))
      .orderBy(col(idCol))
    val w2 = Window.partitionBy(col("url_canon")).orderBy(col(idCol))
    keyed
      .withColumn("__r1", row_number().over(w1)).where(col("__r1") === 1)
      .withColumn("__r2", row_number().over(w2)).where(col("__r2") === 1)
      .drop("__salt", "__r1", "__r2")
      .unionByName(withCanon.where(col("url_canon").isNull))
  }
}
