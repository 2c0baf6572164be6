package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LicenseDetectSpec extends SparkTestBase {
  import spark.implicits._

  private def tag(html: String): String =
    Seq(html).toDF("h")
      .select(LicenseDetect.detectLicense(col("h"))).as[String].head()

  test("each license class detects from its standard markers") {
    assert(tag("""<a rel="license" href="https://creativecommons.org/licenses/by/4.0/">CC BY</a>""") == "cc-by")
    assert(tag("""<a href="http://creativecommons.org/licenses/by-nc-sa/3.0/deed.en">x</a>""") == "cc-by-nc-sa")
    assert(tag("""<a href="https://creativecommons.org/licenses/by-sa/4.0">y</a>""") == "cc-by-sa")
    // bare prose mention with no terminated path is not a marker
    assert(tag("see creativecommons.org/licenses/by") == "none")
    assert(tag("""<a href="https://creativecommons.org/publicdomain/zero/1.0/">CC0</a>""") == "cc0")
    assert(tag("""badge: creativecommons.org/publicdomain/mark/1.0/ here""") == "publicdomain")
    assert(tag("<html><body>all rights reserved</body></html>") == "none")
  }

  test("case-insensitive; leftmost licenses/ link wins; cc0 outranks licenses/") {
    assert(tag("""<A HREF="HTTPS://CREATIVECOMMONS.ORG/LICENSES/BY/4.0/">""") == "cc-by")
    assert(tag(
      """<a href="https://creativecommons.org/licenses/by/4.0/">first</a>
        |<a href="https://creativecommons.org/licenses/by-nc/4.0/">second</a>""".stripMargin)
      == "cc-by")
    assert(tag(
      """<a href="https://creativecommons.org/licenses/by-nc/4.0/">x</a>
        |<a href="https://creativecommons.org/publicdomain/zero/1.0/">cc0 too</a>""".stripMargin)
      == "cc0")
  }

  test("permissive set excludes NC/ND variants") {
    val tags = Seq("cc0", "publicdomain", "cc-by", "cc-by-sa",
      "cc-by-nc", "cc-by-nc-sa", "cc-by-nd", "none").toDF("t")
    val got = tags.select(col("t"), LicenseDetect.isPermissive(col("t")))
      .as[(String, Boolean)].collect().toMap
    assert(got.filter(_._2).keySet == Set("cc0", "publicdomain", "cc-by", "cc-by-sa"))
  }
}
