package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Main-content extraction (jusText/readability/trafilatura class) — the
  * step between flat tag-stripping and a usable crawl corpus: navigation
  * bars, footers, cookie banners and link farms survive `strip_html`
  * (they ARE text) but poison a training corpus. The standard signal is
  * per-BLOCK link density + length: boilerplate blocks are short and
  * mostly links, content blocks are long and mostly prose.
  *
  * The parse is one kernel scan ([[graft.functions.HtmlBlockStats]]:
  * per-block collapsed text, char count, chars inside `<a>`); the POLICY
  * is pure relational algebra over that array — built-in filter/
  * transform/array_join, nothing to shuffle, and SQL-replayable from a
  * checkpointed block relation. Tune `minChars`/`maxLinkDensity` per
  * corpus; the defaults follow the jusText short-block and link-density
  * conventions. */
object Boilerplate {

  /** The kept-blocks predicate over one `html_blocks` struct. */
  def keepBlock(b: Column, minChars: Int, maxLinkDensity: Double): Column =
    (b.getField("n_chars") >= minChars) &&
      (b.getField("n_link_chars").cast("double") /
        greatest(b.getField("n_chars"), lit(1)).cast("double")
        <= maxLinkDensity)

  /** Adds `outCol`: the surviving blocks' text joined with newlines
    * (empty string when nothing survives — the caller's quality filter
    * drops those). */
  def extractMain(df: DataFrame, htmlCol: String, outCol: String = "main_text",
                  minChars: Int = 25,
                  maxLinkDensity: Double = 0.33): DataFrame = {
    require(minChars >= 0 && maxLinkDensity >= 0.0,
      "Boilerplate.extractMain: thresholds must be non-negative")
    df.withColumn(outCol,
      array_join(
        transform(
          filter(graft.functions.html_blocks(col(htmlCol)),
            b => keepBlock(b, minChars, maxLinkDensity)),
          b => b.getField("text")),
        "\n"))
  }
}
