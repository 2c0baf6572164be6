package graft.text

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck invariants for the URL canonicalization kernel, run
  * directly against the expression's eval (no Spark jobs): the
  * properties URL dedup rests on over randomly messy URLs. */
class UrlCanonPropertySpec extends AnyFunSuite {

  private val kernel = graft.functions.CanonicalizeUrl(
    Literal("x"), UrlCurate.defaultDropParams)
  private def canon(u: String): Option[String] =
    Option(kernel.canon(UTF8String.fromString(u))).map(_.toString)

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"$name: $res")
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HtTp", "HTTPS", "ftp", "mailto")
    www <- Gen.oneOf("", "www.", "WWW.")
    host <- Gen.oneOf("Example.COM", "a.b.example.org", "x", "")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    nSeg <- Gen.chooseNum(0, 3)
    segs <- Gen.listOfN(nSeg, Gen.alphaNumStr.map(_.take(5)))
    slash <- Gen.oneOf("", "/", "//")
    params <- Gen.listOf(Gen.oneOf("a=1", "b=2", "Key=V", "utm_x=9",
      "gclid=g1", "ref=r", "flag", ""))
    frag <- Gen.oneOf("", "#frag", "#")
    pad <- Gen.oneOf("", " ", "\t ")
  } yield {
    val path = if (segs.isEmpty) "" else segs.mkString("/", "/", "")
    val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
    s"$pad$scheme://$www$host$port$path$slash$q$frag$pad"
  }

  test("canonicalization is idempotent: canon(canon(u)) == canon(u)") {
    check("idempotent", Prop.forAll(urlGen) { u =>
      canon(u) match {
        case None => true
        case Some(c) => canon(c).contains(c)
      }
    })
  }

  test("canonical shape: http(s) scheme, no fragment, params sorted and tracking-free") {
    check("shape", Prop.forAll(urlGen) { u =>
      canon(u) match {
        case None => true
        case Some(c) =>
          val schemeOk = c.startsWith("http://") || c.startsWith("https://")
          val noFrag = !c.contains('#')
          val qs = c.indexOf('?') match {
            case -1 => Nil
            case i => c.substring(i + 1).split("&").toList
          }
          val sorted = qs == qs.sorted
          val clean = qs.forall { p =>
            val k = p.takeWhile(_ != '=').toLowerCase
            !k.startsWith("utm_") && !UrlCurate.defaultDropParams.contains(k)
          }
          schemeOk && noFrag && sorted && clean
      }
    })
  }

  test("null verdict is total: ftp/mailto/empty-host always null, http(s)+host never null") {
    check("nullability", Prop.forAll(urlGen) { u =>
      val t = u.trim
      val c = canon(u)
      val scheme = t.takeWhile(_ != ':').toLowerCase
      if (!t.contains("://")) c.isEmpty
      else if (scheme != "http" && scheme != "https") c.isEmpty
      else {
        val host = t.substring(t.indexOf("://") + 3)
          .takeWhile(ch => ch != '/' && ch != '?' && ch != '#')
          .takeWhile(_ != ':').toLowerCase.stripPrefix("www.")
        if (host.isEmpty) c.isEmpty else c.nonEmpty
      }
    })
  }
}
