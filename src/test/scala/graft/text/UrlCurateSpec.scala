package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UrlCurateSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[Option[String]] =
    urls.toDF("url")
      .select(UrlCurate.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("canonicalizeUrl normalizes case, www, ports, params, slash, fragment") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/Docs/1/?utm_source=x&b=2&a=1#frag",
      "https://example.com/Docs/1?a=1&b=2&gclid=zzz",
      "http://example.com:80/",
      "http://example.com",
      "https://example.com:8443/x/",
      "  https://example.com/x \t",
      "https://www.example.com/x?utm_campaign=c&utm_medium=m",
      "https://example.com/a//",
      "https://example.com/?",
      "https://example.com/x?b=2&a=1&a=0"
    ) == Seq(
      Some("https://example.com/Docs/1?a=1&b=2"),
      Some("https://example.com/Docs/1?a=1&b=2"),
      Some("http://example.com"),
      Some("http://example.com"),
      Some("https://example.com:8443/x"),
      Some("https://example.com/x"),
      Some("https://example.com/x"),
      Some("https://example.com/a"),
      Some("https://example.com"),
      // duplicate keys are kept (value-distinct), sorted byte-wise
      Some("https://example.com/x?a=0&a=1&b=2")
    ))
  }

  test("non-http(s), empty-host, and null inputs canonicalize to null") {
    assert(canon("mailto:a@b.com", "ftp://example.com/x", "not a url",
      "https:///path", "")
      == Seq(None, None, None, None, None))
    assert(Seq[Option[String]](None).toDF("url")
      .select(UrlCurate.canonicalizeUrl(col("url"))).first().isNullAt(0))
  }

  test("path case is preserved; host case is not") {
    assert(canon("HTTP://EXAMPLE.COM/CaseSensitive/Path")
      == Seq(Some("http://example.com/CaseSensitive/Path")))
  }

  test("dedupByUrl keeps the min-id row per canonical URL, salted == reference") {
    val rows = (0L until 200L).map { i =>
      val spelling =
        if (i % 3 == 0) s"HTTPS://WWW.Site.COM:443/p/${i % 10}/?utm_x=1&q=${i % 4}"
        else s"https://site.com/p/${i % 10}?q=${i % 4}&fbclid=f$i"
      (i, spelling)
    }.toDF("doc_id", "url")
    val got = UrlCurate.dedupByUrl(rows, "url", "doc_id")
    // reference: plain groupBy-min over the canonical key
    val ref = rows.withColumn("c", UrlCurate.canonicalizeUrl(col("url")))
      .groupBy("c").agg(min("doc_id").as("doc_id"))
    // the (i%10, i%4) pair is determined by i%20 → 20 distinct canon keys
    assert(got.count() == 20)
    assert(got.select("doc_id").as[Long].collect().toSet ==
      ref.select("doc_id").as[Long].collect().toSet)
    // salted two-stage == single-stage for every salt width
    val got1 = UrlCurate.dedupByUrl(rows, "url", "doc_id", salts = 1)
    assert(got.select("doc_id", "url_canon").collect().toSet ==
      got1.select("doc_id", "url_canon").collect().toSet)
  }

  test("rows that do not canonicalize pass through, one row each") {
    val rows = Seq((1L, "junk"), (2L, "junk"), (3L, "https://a.com/x"),
      (4L, "https://a.com/x/")).toDF("doc_id", "url")
    val got = UrlCurate.dedupByUrl(rows, "url", "doc_id")
    assert(got.count() == 3) // both junk rows survive; the a.com pair dedups
    assert(got.where(col("url_canon").isNull).count() == 2)
    assert(got.where(col("url_canon") === "https://a.com/x")
      .select("doc_id").as[Long].head() == 3L)
  }
}
