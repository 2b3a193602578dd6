package graft

/** Every catalog query must build and execute at sf0.001 — catches a
  * broken entry before the driver's correctness gate does. */
class CatalogSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  Catalog.all.foreach { q =>
    test(s"${q.name} executes") {
      val n = q.build(spark, dir).count()
      assert(n >= 0)
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
    assert(qk.size === Catalog.all.size)
  }
}
