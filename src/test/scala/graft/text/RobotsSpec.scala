package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private def rules(txt: String, agent: String = "graftbot"): DataFrame =
    Robots.parseRules(Seq(("h", txt)).toDF("host", "text"), "host", "text",
      agent)

  private def verdicts(txt: String, paths: Seq[String],
                       agent: String = "graftbot"): Map[String, Boolean] = {
    val urls = paths.zipWithIndex.map { case (p, i) => (i, "h", p) }
      .toDF("id", "host", "path")
    Robots.annotateAllowed(urls, "host", "path", rules(txt, agent))
      .select("path", "robots_allowed").as[(String, Boolean)]
      .collect().toMap
  }

  test("basic parse: groups, comments, unknown keys, case-insensitivity") {
    val txt =
      """# global rules
        |User-Agent: *
        |Disallow: /private/   # trailing comment
        |Crawl-delay: 10
        |ALLOW: /private/ok
        |Sitemap: https://h/sitemap.xml
        |""".stripMargin
    val r = rules(txt).orderBy("rule").collect()
    assert(r.map(x => (x.getString(1), x.getString(2))).toSeq ==
      Seq(("allow", "/private/ok"), ("disallow", "/private/")))
    val v = verdicts(txt, Seq("/private/x", "/private/ok", "/public"))
    assert(!v("/private/x") && v("/private/ok") && v("/public"))
  }

  test("longest match wins; allow beats disallow on equal length") {
    val txt =
      """User-agent: *
        |Disallow: /a/
        |Allow: /a/b/
        |Disallow: /a/b/c/
        |Disallow: /x
        |Allow: /x
        |""".stripMargin
    val v = verdicts(txt, Seq("/a/q", "/a/b/q", "/a/b/c/q", "/x/y", "/y"))
    assert(!v("/a/q") && v("/a/b/q") && !v("/a/b/c/q"))
    assert(v("/x/y"), "equal-length allow must win the tie")
    assert(v("/y"), "no matching rule means allowed")
  }

  test("named-agent records shadow every * record, even rule-free ones") {
    val shadowed =
      """User-agent: graftbot
        |Disallow: /only-for-us/
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    val v = verdicts(shadowed, Seq("/anything", "/only-for-us/x"))
    assert(v("/anything"), "star record must be ignored for a named agent")
    assert(!v("/only-for-us/x"))
    // RFC 9309 adjacency: a blank line does NOT terminate a record, so
    // user-agent lines separated only by blanks/comments merge into ONE
    // record — here graftbot and * share the Disallow
    val merged =
      """User-agent: graftbot
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(!verdicts(merged, Seq("/anything"))("/anything"),
      "blank-separated adjacent UA lines must merge per RFC 9309")
    // a named record with zero rules (terminated by EOF) is an explicit
    // allow-all that still shadows the * record
    val empty =
      """User-agent: *
        |Disallow: /
        |User-agent: graftbot
        |""".stripMargin
    assert(verdicts(empty, Seq("/anything"))("/anything"))
    // other agents still see the * record
    assert(!verdicts(shadowed, Seq("/anything"), agent = "otherbot")("/anything"))
  }

  test("consecutive user-agent lines share one record; union of named records") {
    val txt =
      """User-agent: graftbot
        |User-agent: otherbot
        |Disallow: /both/
        |User-agent: graftbot
        |Disallow: /second/
        |""".stripMargin
    val v = verdicts(txt, Seq("/both/x", "/second/x", "/free"))
    assert(!v("/both/x") && !v("/second/x") && v("/free"))
    val o = verdicts(txt, Seq("/both/x", "/second/x"), agent = "otherbot")
    assert(!o("/both/x") && o("/second/x"))
  }

  test("wildcards: * mid-pattern, $ anchor, LIKE metachars literal") {
    val txt =
      """User-agent: *
        |Disallow: /*.php$
        |Disallow: /tmp*/
        |Disallow: /lit%x
        |Disallow: /под_
        |""".stripMargin
    val v = verdicts(txt, Seq(
      "/a.php", "/a.php?q=1", "/deep/a.php",
      "/tmp123/f", "/tmp/", "/tmpx", "/lit%x1", "/litax", "/под_я", "/подZя"))
    assert(!v("/a.php") && v("/a.php?q=1") && !v("/deep/a.php"),
      "$ must anchor the end")
    assert(!v("/tmp123/f") && !v("/tmp/") && v("/tmpx"),
      "mid-pattern * spans any run incl. empty, but the tail must match")
    assert(!v("/lit%x1") && v("/litax"), "% in a rule is a literal")
    assert(!v("/под_я") && v("/подZя"), "_ in a rule is a literal")
  }

  test("empty disallow value is allow-all; pre-group rules dropped; no-colon noise") {
    val txt =
      """Disallow: /orphan/
        |User-agent: *
        |Disallow:
        |noise line without colon
        |Disallow: /real/
        |""".stripMargin
    assert(rules(txt).count() == 1, "only /real/ should compile to a rule")
    val v = verdicts(txt, Seq("/orphan/x", "/real/x", "/other"))
    assert(v("/orphan/x") && !v("/real/x") && v("/other"))
  }

  test("missing/null/empty robots and unknown host mean fully allowed") {
    val robots = Seq(("h1", "User-agent: *\nDisallow: /"), ("h2", null),
      ("h3", "")).toDF("host", "text")
    val r = Robots.parseRules(robots, "host", "text", "graftbot")
    val urls = Seq((1, "h1", "/x"), (2, "h2", "/x"), (3, "h3", "/x"),
      (4, "h-absent", "/x")).toDF("id", "host", "path")
    val v = Robots.annotateAllowed(urls, "host", "path", r)
      .select("id", "robots_allowed").as[(Int, Boolean)].collect().toMap
    assert(!v(1) && v(2) && v(3) && v(4))
    assert(Robots.filterAllowed(urls, "host", "path", r)
      .select("id").as[Int].collect().sorted.toSeq == Seq(2, 3, 4))
    assert(Robots.filterAllowed(urls, "host", "path", r).columns.toSeq ==
      urls.columns.toSeq, "filter form must preserve the projection")
  }

  test("agent token matching: first whitespace token, case-insensitive") {
    val txt =
      """User-agent: GraftBot/1.2 (crawler)
        |Disallow: /a
        |""".stripMargin
    // token is 'graftbot/1.2' — NOT our product token 'graftbot'
    assert(verdicts(txt, Seq("/a"))("/a"),
      "versioned token is not an exact product-token match")
    val exact = "User-agent: GRAFTBOT extra tokens\nDisallow: /a\n"
    assert(!verdicts(exact, Seq("/a"))("/a"))
    intercept[IllegalArgumentException] {
      Robots.parseRules(Seq(("h", "x")).toDF("host", "text"),
        "host", "text", "*")
    }
  }

  test("CRLF line endings and tab whitespace parse like LF/spaces") {
    // RFC 9309 lines end CRLF and the separator whitespace may be HTAB —
    // real web-served robots.txt is overwhelmingly CRLF
    val crlf = "User-agent:\tGraftBot\r\nDisallow:\t/private/\r\n" +
      "User-agent: *\r\nDisallow: /\r\n"
    val r = rules(crlf).collect()
    assert(r.map(x => (x.getString(1), x.getString(2))).toSeq ==
      Seq(("disallow", "/private/")),
      s"CRLF file must compile the named record's rule cleanly: ${r.toSeq}")
    val v = verdicts(crlf, Seq("/private/x", "/open"))
    assert(!v("/private/x") && v("/open"),
      "a CRLF robots.txt must not silently disable the filter")
  }

  test("precedence is octet length, not char length") {
    // disallow '/*я' is 4 octets (3 chars), allow '/ab' is 3 octets —
    // octet precedence blocks '/abя'; char-length would tie and allow
    val txt = "User-agent: *\nDisallow: /*я\nAllow: /ab\n"
    assert(!verdicts(txt, Seq("/abя"))("/abя"),
      "multi-byte rule must win by octet length")
    assert(verdicts(txt, Seq("/ab"))("/ab"),
      "the allow still governs paths the multi-byte rule doesn't match")
  }

  test("annotateAllowed guards an existing output column") {
    val urls = Seq((1, "h", "/x", true)).toDF("id", "host", "path",
      "robots_allowed")
    intercept[IllegalArgumentException] {
      Robots.annotateAllowed(urls, "host", "path", rules(""))
    }
  }
}
