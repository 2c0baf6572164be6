package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The vector/text expressions generate real code (no CodegenFallback) so
  * the ANN refine and document-scan stages stay inside whole-stage codegen.
  * Spark silently falls back to interpreted eval when generated code fails
  * to compile — this spec removes that escape hatch by pinning
  * `spark.sql.codegen.factoryMode` to CODEGEN_ONLY (janino errors then
  * throw), and asserts the generated results bit-match interpreted eval. */
class CodegenParitySpec extends SparkTestBase {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f), "the quick brown fox", Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 8L)),
      (2L, Seq(0.5f, -1.5f, 2.5f), Seq(-1.0f, 0.0f, 4.0f), "lorem ipsum dolor sit amet", Seq(5L, 6L, 7L, 8L), Seq(5L, 6L, 7L, 8L)),
      (3L, Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f), "", Seq(1L), Seq(2L)),
      (4L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f), "x", Seq(), Seq())
    ).toDF("id", "va", "vb", "txt", "sa", "sb")
  }

  private def results(mode: String): Seq[Row] = {
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try df.select(col("id"),
        cosine_similarity(col("va"), col("vb")).as("cos"),
        dot_product(col("va"), col("vb")).as("dot"),
        simhash64(col("txt")).as("sim"),
        rolling_hash64(col("txt")).as("roll"),
        seeded_hash64(col("txt"), lit(7L)).as("seeded"),
        sig_agreement(col("sa"), col("sb")).as("agree"),
        graft.functions.word_shingles(col("txt"), 2).as("ws"),
        graft.functions.word_shingles_all(col("txt"), 2).as("wsa"),
        graft.functions.affine_hash(rolling_hash64(col("txt")), 0x9e3779b97f4a7c15L | 1L, 12345L).as("aff"))
      .orderBy("id").collect().toSeq
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("generated code compiles and bit-matches interpreted eval") {
    val gen = results("CODEGEN_ONLY")
    val interp = results("NO_CODEGEN")
    assert(gen == interp)
    // spot-check semantics survived the rewrite
    val byId = gen.map(r => r.getLong(0) -> r).toMap
    assert(math.abs(byId(1L).getDouble(1) - 1.0) < 1e-12) // identical vectors
    assert(byId(1L).getDouble(2) == 14.0)                  // 1+4+9
    assert(byId(3L).isNullAt(1))                           // zero-norm -> null
    assert(byId(4L).isNullAt(1) && byId(4L).isNullAt(2))   // length mismatch
    assert(byId(2L).getInt(6) == 4)                        // all positions agree
    assert(byId(1L).getInt(6) == 2)                        // positions 1,3 agree
  }

  test("html_blocks: generated == interpreted") {
    import spark.implicits._
    val pages = Seq(
      "<nav><a>x</a></nav><p>prose block &amp; text</p>",
      "<p>a</p><script>var x;</script><p>b</p>", "", "plain").toDF("h")
    def res(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try pages.select(graft.functions.html_blocks(col("h"))).collect().toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val gen = res("CODEGEN_ONLY")
    assert(gen == res("NO_CODEGEN"))
  }

  test("canonicalize_url: generated == interpreted, null lanes included") {
    import spark.implicits._
    val urls = Seq("HTTPS://WWW.Ex.COM:443/a/?utm_x=1&b=2&a=1#f",
      "http://ex.com:80", "junk", null, "ftp://x.com/a",
      "https://ex.com/a//?z=1&y=2&gclid=g").toDF("url")
    def res(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try urls.select(graft.functions.canonicalize_url(col("url"))).collect().toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val gen = res("CODEGEN_ONLY")
    assert(gen == res("NO_CODEGEN"))
    assert(gen.map(r => Option(r.getString(0))) == Seq(
      Some("https://ex.com/a?a=1&b=2"), Some("http://ex.com"), None, None,
      None, Some("https://ex.com/a?y=2&z=1")))
  }

  private def geomDf = {
    import spark.implicits._
    Seq(
      (1L, "POLYGON((0 0,4 0,4 4,0 4,0 0))", "POLYGON((2 2,6 2,6 6,2 6,2 2))", 0.0, 0.0, 3.0, 4.0),
      (2L, "POLYGON((0 0,1 0,1 1,0 1,0 0))", "POLYGON((5 5,6 5,6 6,5 6,5 5))", 1.0, 1.0, 2.0, 2.0),
      (3L, "not a wkt", "POINT(1 1)", -1.0, -1.0, 1.0, 1.0),
      (4L, "LINESTRING(0 0,2 2)", "LINESTRING(0 2,2 0)", 0.5, 0.5, 2.5, 3.5)
    ).toDF("id", "wa", "wb", "x0", "y0", "x1", "y1")
  }

  private def geomResults(mode: String): Seq[Row] = {
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try geomDf.select(col("id"),
        st_astext(st_geomfromwkt(col("wa"))).as("roundtrip"),
        st_intersects(st_geomfromwkt(col("wa")), st_geomfromwkt(col("wb"))).as("inter"),
        st_envelope(st_geomfromwkt(col("wa"))).as("env"),
        st_area(st_geomfromwkt(col("wa"))).as("area"),
        st_distance(st_geomfromwkt(col("wa")), st_geomfromwkt(col("wb"))).as("dist"),
        st_jaccard(st_geomfromwkt(col("wa")), st_geomfromwkt(col("wb"))).as("jac"),
        st_astext(st_makebox(col("x0"), col("y0"), col("x1"), col("y1"))).as("box"),
        st_astext(st_point(col("x0"), col("y0"))).as("pt"),
        st_astext(st_makeline(col("x0"), col("y0"), col("x1"), col("y1"))).as("seg"),
        st_astext(st_union(st_geomfromwkt(col("wa")), st_geomfromwkt(col("wb")))).as("uni"),
        st_astext(st_buffer(st_geomfromwkt(col("wa")), lit(0.0))).as("buf"),
        st_npoints(st_geomfromwkt(col("wa"))).as("np"),
        st_astext(st_snaptogrid(st_geomfromwkt(col("wa")), lit(1.0))).as("snap"),
        hilbert(col("x0") / 10.0, col("y0") / 10.0, lit(8)).as("hv"),
        st_dwithin(st_geomfromwkt(col("wa")), st_geomfromwkt(col("wb")), lit(3.0)).as("dw"),
        st_distancesphere(st_point(col("x0"), col("y0")), st_point(col("x1"), col("y1"))).as("sph"))
      .orderBy("id").collect().toSeq
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("geometry expressions: generated code bit-matches interpreted eval") {
    val gen = geomResults("CODEGEN_ONLY")
    val interp = geomResults("NO_CODEGEN")
    assert(gen == interp)
    val byId = gen.map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).isNullAt(1))                 // malformed wkt -> null cascade
    assert(byId(1L).getBoolean(2))               // overlapping boxes intersect
    assert(!byId(2L).getBoolean(2))              // disjoint boxes
    assert(byId(1L).getDouble(4) == 16.0)        // 4x4 box area
    assert(byId(2L).getDouble(5) > 5.6)          // corner distance sqrt(32)
    assert(byId(1L).getDouble(6) == 4.0 / 28.0)  // rect jaccard exact
  }

  private def temporalResults(mode: String): Seq[Row] = {
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (1L, array(named_struct('start', 0L, 'end', 10L)),
        |      array(named_struct('start', 5L, 'end', 15L))),
        | (2L, array(named_struct('start', 0L, 'end', 10L)),
        |      array(named_struct('start', 2L, 'end', 3L), named_struct('start', 8L, 'end', 9L))),
        | (3L, array(named_struct('start', 0L, 'end', 1L)),
        |      array(named_struct('start', 5L, 'end', 6L))),
        | (4L, array(named_struct('start', 0L, 'end', 1L)),
        |      cast(array() as array<struct<start: bigint, end: bigint>>))
        |AS t(id, ia, ib)""".stripMargin)
    try df.select(col("id"),
        intervals_overlap(col("ia"), col("ib")).as("ov"),
        intervals_contain(col("ia"), col("ib")).as("ct"),
        intervals_mindist(col("ia"), col("ib")).as("md"))
      .orderBy("id").collect().toSeq
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("temporal interval expressions: generated code bit-matches interpreted eval") {
    val gen = temporalResults("CODEGEN_ONLY")
    val interp = temporalResults("NO_CODEGEN")
    assert(gen == interp)
    val byId = gen.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getBoolean(1) && !byId(1L).getBoolean(2) && byId(1L).getLong(3) == 0L)
    assert(byId(2L).getBoolean(2))               // both sub-intervals covered
    assert(byId(3L).getLong(3) == 4L)            // gap 5-1
    assert(byId(4L).isNullAt(3))                 // empty side -> null mindist
    assert(!byId(4L).getBoolean(2))              // empty right -> not contained
  }

  private def pipelineKernelResults(mode: String): Seq[Row] = {
    import spark.implicits._
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq(1L, 2L, 3L).foreach(bf.putLong)
    val merges = Seq(("t", "h"), ("th", "e"))
    val df = Seq(
      (1L, "the theme there", 1L, Seq(0, 5)),
      (2L, "a b c d e f", 2L, Seq[Int]()),
      (3L, "", 99L, Seq(0)),
      (4L, "x y", 3L, Seq(0, 1))
    ).toDF("id", "txt", "key", "starts")
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try df.select(col("id"),
        bpe_encode(col("txt"), merges).as("bpe"),
        bloom_contains_long(col("key"), bf).as("bloom"),
        remove_covered_tokens(col("txt"), col("starts"), 2).as("cut"),
        nfc_normalize(concat(col("txt"), lit("e\u0301"))).as("nfc"),
        char_shingles(col("txt"), 3).as("cs"),
        char_shingles_all(col("txt"), 3).as("csa"))
      .orderBy("id").collect().toSeq
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("round-9b kernels (bpe_encode / bloom / span cut): generated code bit-matches interpreted eval") {
    val gen = pipelineKernelResults("CODEGEN_ONLY")
    val interp = pipelineKernelResults("NO_CODEGEN")
    assert(gen == interp)
    val byId = gen.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getSeq[String](1) == Seq("the", " ", "the", "m", "e", " ", "the", "r", "e"))
    // true members always pass (no false negatives); row 3's non-member
    // value is mode-parity-checked above but not asserted (fp possible)
    assert(byId(1L).getBoolean(2) && byId(2L).getBoolean(2) && byId(4L).getBoolean(2))
    // tokens: [the, theme, there]; start 0 covers {0,1}, start 5 is out of
    // range -> only index 2 survives
    assert(byId(1L).getString(3) == "there")
    // combining acute composes onto the trailing 'e' appended to each text
    assert(byId(2L).getString(4).endsWith("f\u00e9"))
    // char shingles: "x y" -> ["x y"]; "" -> []; distinct vs all on repeats
    assert(byId(4L).getSeq[String](5) == Seq("x y"))
    assert(byId(3L).getSeq[String](5) == Seq.empty)
    assert(byId(1L).getSeq[String](6).length == "the theme there".length - 2)
    assert(byId(2L).getString(3) == "a b c d e f")
    assert(byId(3L).isNullAt(3))             // single empty token covered -> null
    assert(byId(4L).isNullAt(3))             // both tokens covered -> null
  }

  private def wordpieceResults(mode: String): Seq[Row] = {
    import spark.implicits._
    val vocab = Seq("hello", "world", "un", "##happ", "##ily", "a", "ab",
      "##b", "##c")
    val df = Seq(
      (1L, "hello world"),
      (2L, "unhappily xqz hello"),   // multi-piece + whole-word UNK
      (3L, ""),                       // empty text -> empty array
      (4L, "a ab abc"),               // greedy longest: abc -> ab ##c
      (5L, "hello  world"),           // double space: empty word skipped
      (6L, "abq")                     // fails mid-word -> whole word UNK
    ).toDF("id", "txt")
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try df.select(col("id"),
        wordpiece_encode(col("txt"), vocab).as("wp"))
      .orderBy("id").collect().toSeq
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("wordpiece_encode: generated code bit-matches interpreted eval") {
    val gen = wordpieceResults("CODEGEN_ONLY")
    val interp = wordpieceResults("NO_CODEGEN")
    assert(gen == interp)
    val byId = gen.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getSeq[String](1) == Seq("hello", "world"))
    // greedy longest-match-first with ## continuations; no-match word ->
    // single [UNK] (BERT semantics, not per-character fallback)
    assert(byId(2L).getSeq[String](1) ==
      Seq("un", "##happ", "##ily", "[UNK]", "hello"))
    assert(byId(3L).getSeq[String](1) == Seq.empty)
    assert(byId(4L).getSeq[String](1) == Seq("a", "ab", "ab", "##c"))
    assert(byId(5L).getSeq[String](1) == Seq("hello", "world"))
    // 'abq': bare 'ab' matches but '##q' doesn't -> whole word UNK, the
    // accumulated prefix pieces discarded
    assert(byId(6L).getSeq[String](1) == Seq("[UNK]"))
  }

  private def htmlResults(mode: String): Seq[Row] = {
    import spark.implicits._
    val df = Seq(
      (1L, "<p>a</p> <p>b</p>"),
      (2L, "<ScRiPt>var x = 1 < 2;</SCRIPT>kept"),
      (3L, "<style>p{}</style>x<styleless>y</styleless>z"),
      (4L, "&amp;lt; is literal, &lt; decodes, &bogus; stays"),
      (5L, "a < b and <unterminated forever"),
      (6L, "  \t\n lots   of\r\nspace  "),
      (7L, "<script>no close tag eats rest? no:</p>tail")
    ).toDF("id", "html")
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try df.select(col("id"), strip_html(col("html")).as("s"))
      .orderBy("id").collect().toSeq
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("strip_html: generated code bit-matches interpreted eval; kernel rules pinned") {
    val gen = htmlResults("CODEGEN_ONLY")
    assert(gen == htmlResults("NO_CODEGEN"))
    val byId = gen.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(1L) == "a b")
    // script block removed case-insensitively, content (with its '<') gone
    assert(byId(2L) == "kept")
    // style PREFIX match: <styleless> opens a block closed by </styleless>?
    // no — block close is the literal </style>, absent, so both styleless
    // tags fall through to plain tag removal (regex parity)
    assert(byId(3L) == "x y z")
    // one-pass entity decode: &amp;lt; -> literal "&lt;", unknown stays
    assert(byId(4L) == "&lt; is literal, < decodes, &bogus; stays")
    // '<' with no later '>' is literal text
    assert(byId(5L) == "a < b and <unterminated forever")
    assert(byId(6L) == "lots of space")
    // unclosed <script> degrades to tag removal, content kept
    assert(byId(7L) == "no close tag eats rest? no: tail")
  }
}
