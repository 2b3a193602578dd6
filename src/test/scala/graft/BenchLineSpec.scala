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
      // catastrophic all-failed runs cap the failed list with an exact
      // overflow count instead of blowing the driver tail
      val nFailed = node.get("failed").size +
        Option(node.get("failed_dropped")).map(_.asInt).getOrElse(0)
      assert(nFailed == rs.count(!_._3),
        s"failed accounting wrong: ${line.takeRight(200)}")
    }
  }

  test("adaptive top tier: realistic profile keeps the slowest entries " +
      "with an exact drop accounting") {
    // The catalog (212 entries as of r8) outgrew every full-map tier —
    // the r7-designed tripwire fired. The contract is now: compact
    // line = largest slowest-N that fits + queries_dropped +
    // queries_file pointer; target/bench_full.json carries all
    // entries. This test pins that the kept set is (a) large enough to
    // carry the perf-diff signal, (b) exactly the slowest ones, and
    // (c) accounted: kept + dropped == catalog.
    val line = Bench.compactLine(realistic, 7.3, sf)
    val node = mapper.readTree(line)
    val qs = node.get("queries")
    assert(qs.size >= Bench.TopDetailFloor,
      s"only ${qs.size} entries kept (< ${Bench.TopDetailFloor}): the " +
        "budget is being wasted or the catalog outgrew even the " +
        "adaptive tier — re-measure Bench.MaxLine")
    assert(node.get("queries_dropped").asInt == names.size - qs.size)
    assert(node.get("queries_file").asText == "target/bench_full.json")
    // Every kept value must be >= every dropped value: the tier keeps
    // exactly the slowest, never an arbitrary subset.
    val keptKeys = {
      val it = qs.fieldNames()
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    val (keptVals, droppedVals) = realistic
      .partition { case (n, _, _) => keptKeys(n.takeWhile(_ != '_')) }
    assert(droppedVals.isEmpty ||
      keptVals.map(_._2).min >= droppedVals.map(_._2).max,
      "kept set must be the slowest-N: found a dropped entry slower " +
        "than a kept one")
    val heavies = realistic.filter(_._2 > 8.0)
    heavies.foreach { case (n, _, _) =>
      assert(qs.has(n.takeWhile(_ != '_')), s"heavy $n dropped") }
  }

  test("the slowest queries keep detail even at pathological values") {
    for (rs <- Seq(uniform(99.999), uniform(12345.6))) {
      val line = Bench.compactLine(rs, 7.3, sf)
      val node = mapper.readTree(line)
      val size = node.get("queries").size
      assert(size > 0 && size < names.size,
        s"expected a partial slowest-N tier, got $size entries in " +
          s"${line.length} chars")
      assert(node.get("queries_dropped").asInt == names.size - size)
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

  test("noise probes and retried map ride every tier within budget") {
    val probes = Seq(0.812, 12.437, 0.79)
    // a badly contended run: many entries tripped the 3× retry
    val manyRetries = names.take(25).map(n => (n, 17.3))
    for (rs <- Seq(uniform(1.1), uniform(99.999), realistic)) {
      val line = Bench.compactLine(rs, 7.3, sf, probes, manyRetries)
      assert(line.length <= Bench.MaxLine,
        s"${line.length} chars > ${Bench.MaxLine}")
      val node = mapper.readTree(line)
      val np = node.get("noise_probe_s")
      assert(np != null && np.isArray && np.size == 3 &&
        math.abs(np.get(1).asDouble - 12.437) < 0.51,
        s"noise_probe_s wrong in: ${line.take(300)}")
      val rt = node.get("retried")
      assert(rt != null && rt.isObject && rt.size == Bench.MaxRetriedShown,
        s"retried map wrong in: ${line.take(300)}")
      assert(node.get("retries_dropped").asInt ==
        manyRetries.size - Bench.MaxRetriedShown)
    }
    // absent when nothing was retried / probes disabled (spec inputs)
    val bare = mapper.readTree(Bench.compactLine(realistic, 7.3, sf))
    assert(bare.get("noise_probe_s") == null && bare.get("retried") == null)
  }

  test("standings file parses and covers the catalog") {
    val st = Bench.loadStandings()
    assert(st.nonEmpty, "tools/bench_standing.json missing or empty")
    st.values.foreach(v => assert(v > 0.0 && v < 3600.0))
    // every standing key must be a catalog entry (stale keys are
    // harmless to the retry rule but signal the file wasn't refreshed)
    val catalog = names.toSet
    val stale = st.keySet -- catalog
    assert(stale.isEmpty, s"stale standings: ${stale.mkString(", ")}")
  }

  test("short keys are collision-free at the current catalog size") {
    val short = names.map(_.takeWhile(_ != '_'))
    assert(short.distinct.size == names.size,
      "prefix collision: compactLine would fall back to full names " +
        "and likely overflow the budget")
  }
}
