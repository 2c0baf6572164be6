package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Creative-Commons license detection over raw page HTML — the crawl-lane
  * signal behind "permissive subset" corpus builds (C4/Dolma-class
  * pipelines keep or tag pages by the license their markup declares).
  * Detection is the standard marker: a creativecommons.org license or
  * publicdomain URL anywhere in the page (rel="license" links, footer
  * badges, RDFa) — presence-based, like the published pipelines; it
  * cannot verify the claim, only read it.
  *
  * Patterns are alternation-free and backreference-free (the
  * [[TextFunctions.EmailPattern]] contract) so Java regex (Spark) and RE2
  * (DuckDB) agree match-for-match, and the leftmost match wins in both —
  * a page declaring two licenses classifies by the first, pinned by spec
  * and oracle. Pure built-in column composition: scan-local, zero
  * shuffle, inside whole-stage codegen. */
object LicenseDetect {

  /** Group 1 = the license code path segment (by, by-sa, by-nc-sa, ...). */
  val CcLicensePattern = "creativecommons\\.org/licenses/([a-z][a-z-]*)[/\"]"
  val Cc0Pattern = "creativecommons\\.org/publicdomain/zero/"
  val PdMarkPattern = "creativecommons\\.org/publicdomain/mark/"

  /** License tag: `cc-<code>` (e.g. cc-by-nc-sa), `cc0`, `publicdomain`,
    * or `none`. Case-insensitive. Resolution is CLASS-priority, not
    * document order across classes: cc0 > publicdomain mark > licenses/
    * (a page declaring both CC0 and a licenses/ link tags cc0 wherever
    * each appears); within the licenses/ class the leftmost link wins.
    * Both rules are deterministic in Java regex and RE2 alike. */
  def detectLicense(html: Column): Column = {
    val h = lower(html)
    val cc = regexp_extract(h, CcLicensePattern, 1)
    when(h.rlike(Cc0Pattern), lit("cc0"))
      .when(h.rlike(PdMarkPattern), lit("publicdomain"))
      .when(cc =!= "", concat(lit("cc-"), cc))
      .otherwise(lit("none"))
  }

  /** The tags a permissive-subset build keeps: public domain plus the CC
    * variants without NC/ND restrictions. */
  def isPermissive(license: Column): Column =
    license.isin("cc0", "publicdomain", "cc-by", "cc-by-sa")
}
