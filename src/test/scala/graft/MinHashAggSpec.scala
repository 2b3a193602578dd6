package graft

import graft.functions.{MinHashGroupSig, MinHashJaccard, MinHashSigAgg,
  MinHashSigMerge}
import org.apache.spark.sql.functions._

/** Contract for the group-level mergeable MinHash family: elementwise
  * minima over the shared permutation family, so — like HLL/CMS/Bloom
  * — the spec asserts BIT-IDENTITY across partitioning and rollup
  * grouping, plus the estimator contract: agreement/k tracks true
  * Jaccard within the binomial envelope, and merge IS the union's
  * signature (exactly, not approximately).
  */
class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private def keysDf(from: Long, until: Long, groups: Int = 1) =
    spark.range(from, until).select(col("id").as("key"),
      pmod(col("id"), lit(groups.toLong)).as("g"))

  private def sigBytes(df: org.apache.spark.sql.DataFrame, k: Int): Array[Byte] =
    df.agg(MinHashSigAgg(col("key"), k).as("s")).head().getAs[Array[Byte]](0)

  test("signature bytes are bit-identical across partitioning") {
    val base = keysDf(0, 2000)
    val ref = sigBytes(base, 64)
    for (parts <- Seq(1, 7, 32)) {
      val b = sigBytes(base.repartition(parts), 64)
      assert(java.util.Arrays.equals(ref, b), s"parts=$parts bytes differ")
    }
  }

  test("two-level merge rollup is bit-identical to one-level aggregation") {
    val df = keysDf(0, 2000, groups = 13)
    val oneLevel = sigBytes(df, 64)
    val twoLevel = df.groupBy("g")
      .agg(MinHashSigAgg(col("key"), 64).as("s"))
      .agg(MinHashSigMerge(col("s")).as("m"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(oneLevel, twoLevel))
    val rt = MinHashGroupSig.fromBytes(twoLevel).toBytes
    assert(java.util.Arrays.equals(oneLevel, rt))
  }

  test("merging two set signatures yields exactly the union's signature") {
    val a = sigBytes(keysDf(0, 1000), 64)
    val b = sigBytes(keysDf(500, 1500), 64)
    val union = sigBytes(keysDf(0, 1500), 64)
    val merged = Seq(a, b).toDF("s")
      .agg(MinHashSigMerge(col("s"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(union, merged))
  }

  test("jaccard estimate tracks true overlap within the binomial envelope") {
    // A = [0, 1000), B = [500, 1500): J = 500/1500 = 1/3.
    // k=256 -> se = sqrt(J(1-J)/k) ~ 0.029; 4 se ~ 0.12
    val a = MinHashGroupSig.fromBytes(sigBytes(keysDf(0, 1000), 256))
    val b = MinHashGroupSig.fromBytes(sigBytes(keysDf(500, 1500), 256))
    val est = a.jaccardEst(b)
    assert(math.abs(est - 1.0 / 3.0) < 0.12, s"est $est vs 1/3")
    // disjoint sets: J = 0 — estimator can only err upward via hash
    // collisions (P ~ k * n^2 / 2^31 here, allow a small slack)
    val c = MinHashGroupSig.fromBytes(sigBytes(keysDf(5000, 6000), 256))
    assert(a.jaccardEst(c) < 0.05, s"disjoint est ${a.jaccardEst(c)}")
    // identical sets: J = 1 exactly — signatures are equal
    val a2 = MinHashGroupSig.fromBytes(sigBytes(keysDf(0, 1000), 256))
    assert(a.jaccardEst(a2) == 1.0)
  }

  test("SQL registration matches the DataFrame API") {
    keysDf(0, 500, groups = 7).createOrReplaceTempView("mh_in")
    val viaSql = spark.sql("""
      SELECT graft_minhash_jaccard(m, m) AS self
      FROM (SELECT graft_minhash_group_merge(s) AS m
            FROM (SELECT g, graft_minhash_group(key, 64) AS s
                  FROM mh_in GROUP BY g))""").head().getDouble(0)
    assert(viaSql == 1.0)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash_group(key, CAST(g AS INT)) FROM mh_in GROUP BY g")
        .collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
  }

  test("corrupt stored signatures fail descriptively") {
    val good = sigBytes(keysDf(0, 100), 64)
    val short = intercept[IllegalArgumentException] {
      MinHashGroupSig.fromBytes(java.util.Arrays.copyOf(good, good.length - 5))
    }
    assert(short.getMessage.contains("corrupt"), short.getMessage)
    val vbad = good.clone(); vbad(0) = 9
    val ver = intercept[IllegalArgumentException] { MinHashGroupSig.fromBytes(vbad) }
    assert(ver.getMessage.contains("version"), ver.getMessage)
    // an out-of-range component (valid header) is caught too
    val cbad = good.clone()
    java.util.Arrays.fill(cbad, 5, 13, 0xff.toByte) // component 0 -> -1
    val ce = intercept[IllegalArgumentException] { MinHashGroupSig.fromBytes(cbad) }
    assert(ce.getMessage.contains("component"), ce.getMessage)
  }

  test("mixed-k signatures refuse to merge or compare") {
    val a = sigBytes(keysDf(0, 100), 64)
    val b = sigBytes(keysDf(0, 100), 32)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val e = intercept[Exception] {
      Seq(a, b).toDF("s").agg(MinHashSigMerge(col("s"))).collect()
    }
    assert(messages(e).exists(_.contains("different k")), e.getMessage)
    val e2 = intercept[Exception] {
      Seq((a, b)).toDF("x", "y")
        .select(MinHashJaccard(col("x"), col("y"))).collect()
    }
    assert(messages(e2).exists(_.contains("different k")), e2.getMessage)
  }

  test("non-bigint input fails at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("key").agg(MinHashSigAgg(col("key"), 64)).collect()
    }
    assert(e.getMessage.contains("bigint"), e.getMessage)
  }
}
