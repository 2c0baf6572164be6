package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins the family-bench record channels (round-11 advice #3): the
  * `name\tvalue` TSV a child writes is the parent's primary parse, the
  * JSON regex is the legacy fallback, and malformed/zero-gate states fail
  * LOUDLY instead of silently re-running a whole family in-process. Pure
  * file/string tests — no SparkSession. */
class BenchRecordSpec extends AnyFunSuite {

  private def tmpTsv(content: String): String = {
    val p = Files.createTempFile("graft_bench_spec", ".tsv")
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("readGateTsv round-trips values and null lanes") {
    val path = tmpTsv("q_a\t1.234\nq_b\tnull\nq_c\t0.001\n")
    val got = Bench.readGateTsv(path).get
    assert(got == Seq("q_a" -> Some(1.234), "q_b" -> None, "q_c" -> Some(0.001)))
  }

  test("readGateTsv: missing file -> None (fallback lane); blank lines skipped") {
    assert(Bench.readGateTsv(
      Paths.get("/tmp/graft_bench_spec_nonexistent.tsv").toString).isEmpty)
    val path = tmpTsv("\nq_a\t2.0\n\n")
    assert(Bench.readGateTsv(path).get == Seq("q_a" -> Some(2.0)))
  }

  test("readGateTsv fails loudly on a malformed line, never parses to zero gates") {
    val path = tmpTsv("q_a\t1.0\nq_b 2.0\n") // space, not tab
    val e = intercept[IllegalStateException](Bench.readGateTsv(path))
    assert(e.getMessage.contains("bad gate-tsv line"))
  }

  test("parseQueries reads the emitRecord JSON shape, including nulls") {
    val line = """{"metric":"total","value":3.0,"unit":"sec",""" +
      """"queries":{"q_a":1.5,"q_b":null,"q_c":0.25},"failed":["q_b"],""" +
      """"load1m":0.5,"sf":"/x"}"""
    assert(Bench.parseQueries(line) ==
      Seq("q_a" -> Some(1.5), "q_b" -> None, "q_c" -> Some(0.25)))
  }

  test("frozen-envelope check: 1.5x + 0.5s bar, same-SF routing, new gates exempt") {
    // routing: only the two frozen SFs have floors; sf10 and sf0.01 don't
    assert(Bench.baselineEnvelopeFor("/root/testdata/sf0.1")
      .contains("tools/baseline_r14_sf01.tsv"))
    assert(Bench.baselineEnvelopeFor("/tmp/graft_sf1/")
      .contains("tools/baseline_r14_sf1.tsv"))
    assert(Bench.baselineEnvelopeFor("/tmp/graft_sf10").isEmpty)
    assert(Bench.baselineEnvelopeFor("/root/testdata/sf0.01").isEmpty)
    // the bar itself, against a synthetic envelope (cwd-relative tools/
    // path — run from the repo root like every Bench invocation)
    val env = Files.createTempFile("graft_baseline_spec", ".tsv")
    Files.write(env, "q_fast\t0.100\nq_big\t10.000\nq_sub\t0.200\n".getBytes)
    // monkey-path: exercise the core via readGateTsv + the same predicate
    val floor = Bench.readGateTsv(env.toString).get
      .collect { case (k, Some(v)) => k -> v }.toMap
    def violates(k: String, v: Double) =
      floor.get(k).exists(b => v > 1.5 * b && v - b > 0.5)
    assert(!violates("q_fast", 0.14)) // 1.4x, under ratio bar
    assert(!violates("q_sub", 0.6)) // 3x but sub-second delta: jitter class
    assert(violates("q_big", 16.0)) // 1.6x and +6s: real regression
    assert(!violates("q_new_gate", 99.0)) // no floor -> exempt
  }

  test("parseQueries on a drifted record parses to zero gates (the case the parent must reject)") {
    // field order drift: "failed" before "queries" breaks the legacy regex —
    // exactly why the TSV is the primary channel and the parent throws on a
    // clean-exit zero-gate parse
    val drifted = """{"metric":"total","failed":[],"queries":{"q_a":1.5}}"""
    assert(Bench.parseQueries(drifted).isEmpty)
  }
}
