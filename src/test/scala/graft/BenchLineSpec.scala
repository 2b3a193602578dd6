package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Growth guard for the driver-facing bench stdout line. The driver
  * tails the LAST 2000 chars of stdout: a longer line is decapitated
  * mid-object and its JSON parses as null (BENCH_r03, ~2900 chars),
  * silently blinding the perf gate. Pinning this at the CURRENT
  * catalog size turns "the catalog outgrew the line budget" from a
  * doc note into a red test. Pure string checks — no SparkSession. */
class BenchLineSpec extends AnyFunSuite {
  private val names = SparkEntry.queries.keys.toSeq.sorted
  private val mapper = new ObjectMapper()
  private val sf = "/root/testdata/sf0.1"

  private def uniform(v: Double, ok: Boolean = true) =
    names.map(n => (n, v, ok))
  /** The r6-judge-bench shape: ~1 s typical, a handful of multi-second
    * heavies (q95 8 s) — what a real healthy run hands compactLine. */
  private def realistic = names.zipWithIndex.map { case (n, i) =>
    (n, if (i % 20 == 0) 8.4 else 1.1, true)
  }

  test("compact line fits the 2000-char driver tail for every value profile") {
    val profiles = Seq(uniform(0.111), uniform(9.9), uniform(99.999),
      uniform(12345.6), realistic, uniform(1.0, ok = false))
    for (rs <- profiles) {
      val line = Bench.compactLine(rs, 7.3, sf)
      assert(line.length <= Bench.MaxLine,
        s"${line.length} chars > ${Bench.MaxLine}: ${line.take(120)}…")
      val node = mapper.readTree(line) // throws on malformed JSON
      assert(node.get("value").isNumber && node.get("unit").asText == "sec")
      assert(node.get("shared_builds").isNumber)
      assert(node.get("queries").isObject && node.get("failed").isArray)
      assert(node.get("sf").asText == sf)
    }
  }

  test("full per-query map survives at the current catalog size") {
    // Today a realistic run keeps EVERY entry in the stdout line (the
    // integer-seconds tier). When the catalog outgrows that (~210
    // entries at 1-digit values), the slowest-N tier takes over and
    // this fails: that is the signal to re-measure the budget — see
    // Bench.MaxLine — and consciously retire this assertion in favor
    // of the top-detail one below.
    val line = Bench.compactLine(realistic, 7.3, sf)
    val qs = mapper.readTree(line).get("queries")
    assert(qs.size == names.size,
      s"only ${qs.size} of ${names.size} entries kept: catalog outgrew " +
        "the full-map tiers")
  }

  test("the slowest queries keep detail even when the full map cannot fit") {
    for (rs <- Seq(uniform(99.999), uniform(12345.6))) {
      val line = Bench.compactLine(rs, 7.3, sf)
      val node = mapper.readTree(line)
      assert(node.get("queries").size == Bench.TopDetail,
        s"expected the ${Bench.TopDetail}-slowest tier, got " +
          s"${node.get("queries").size} entries in ${line.length} chars")
      assert(node.get("queries_dropped").asInt ==
        names.size - Bench.TopDetail)
      assert(node.get("queries_file").asText == "target/bench_full.json")
    }
  }

  test("a failed query is always named, whatever the tier") {
    for (v <- Seq(1.0, 12345.6)) { // full-map tier and top-N tier
      val rs = names.map(n => (n, v, n != "q01_pricing_summary"))
      val line = Bench.compactLine(rs, 7.3, sf)
      val failed = mapper.readTree(line).get("failed")
      assert(failed.size == 1 && failed.get(0).asText == "q01",
        s"failed list wrong in: ${line.takeRight(200)}")
    }
  }

  test("short keys are collision-free at the current catalog size") {
    val short = names.map(_.takeWhile(_ != '_'))
    assert(short.distinct.size == names.size,
      "prefix collision: compactLine would fall back to full names " +
        "and likely overflow the budget")
  }
}
