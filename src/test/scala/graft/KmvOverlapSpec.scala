package graft

import graft.operators.KmvOverlap
import org.apache.spark.sql.functions._

/** Accuracy + discrimination contract for the KMV overlap join: the
  * sketch estimates must track known overlaps (union within the
  * ~1/√k KMV envelope, Jaccard within its binomial envelope) AND
  * tell apart half-overlapping, fully-overlapping, and disjoint
  * pairs — the property an audience-overlap matrix is used for. The
  * value-exactness of the integer sketch state itself is covered by
  * the q103 DuckDB oracle.
  */
class KmvOverlapSpec extends SparkSpec {
  import spark.implicits._

  // Three groups with KNOWN set relations over 3000 keys:
  //   A = [0, 2000), B = [1000, 3000) → |A∩B| = 1000, J = 1/3
  //   C = [5000, 7000)               → disjoint from both
  private lazy val out = {
    val rows =
      (0L until 2000L).map(("A", _)) ++
      (1000L until 3000L).map(("B", _)) ++
      (5000L until 7000L).map(("C", _))
    // duplicate every row: the operator must distinct per group
    KmvOverlap.overlapMatrix((rows ++ rows).toDF("g", "key"),
        "g", "key", k = 256, withExact = true)
      .collect().map(r => (r.getAs[String]("group_a"),
        r.getAs[String]("group_b")) -> r).toMap
  }

  test("union estimates sit within the KMV error envelope") {
    // stderr ≈ |union|/√k = 6.25% at k=256; 4σ = 25%
    val expected = Map(("A", "B") -> 3000.0, ("A", "C") -> 4000.0,
      ("B", "C") -> 4000.0)
    expected.foreach { case (pair, exact) =>
      val est = out(pair).getAs[Double]("est_union")
      assert(math.abs(est / exact - 1.0) <= 0.25,
        s"$pair: est_union $est vs exact $exact")
    }
  }

  test("jaccard and intersection discriminate the three regimes") {
    val ab = out(("A", "B")); val ac = out(("A", "C")); val bc = out(("B", "C"))
    // J(A,B) = 1/3: binomial stderr √(J(1−J)/k) ≈ 3% at k=256; 4σ
    assert(math.abs(ab.getAs[Double]("est_jaccard") - 1.0 / 3) <= 0.12,
      s"J(A,B): $ab")
    assert(math.abs(ab.getAs[Double]("est_intersection") - 1000.0) <= 400,
      s"|A∩B|: $ab")
    assert(ab.getAs[Long]("n_inter_exact") === 1000L)
    // disjoint pairs: exact zero overlap, estimate (near-)zero —
    // and FAR below the overlapping pair (discrimination)
    Seq(ac, bc).foreach { r =>
      assert(r.getAs[Long]("n_inter_exact") === 0L)
      assert(r.getAs[Double]("est_jaccard") <= 0.05, s"disjoint: $r")
    }
    assert(ab.getAs[Double]("est_jaccard") >
      4 * math.max(ac.getAs[Double]("est_jaccard"),
        bc.getAs[Double]("est_jaccard")) + 0.1)
  }

  test("difference legs complete the set algebra within the envelope") {
    val ab = out(("A", "B")); val ac = out(("A", "C"))
    // |A\B| = |B\A| = 1000 exactly by construction
    Seq("est_only_a", "est_only_b").foreach { c =>
      val est = ab.getAs[Double](c)
      assert(math.abs(est / 1000.0 - 1.0) <= 0.45,
        s"$c: $est vs exact 1000 (difference of two estimates — widest envelope)")
    }
    // per-side cardinalities: |A| = |C| = 2000
    assert(math.abs(ac.getAs[Double]("est_a") / 2000.0 - 1.0) <= 0.25, s"$ac")
    assert(math.abs(ac.getAs[Double]("est_b") / 2000.0 - 1.0) <= 0.25, s"$ac")
    // disjoint pair: the difference legs ARE the sides (near-zero
    // intersection subtracted)
    assert(math.abs(ac.getAs[Double]("est_only_a") -
      ac.getAs[Double]("est_a")) <= 0.15 * 2000)
  }

  test("sketch state stays bounded at k") {
    out.values.foreach { r =>
      assert(r.getAs[Long]("k_used") <= 256L)
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("k_used"))
    }
  }

  test("null keys are ignored, never desync or crash the sketch") {
    val rows = Seq(("A", Some(1L)), ("A", Some(2L)), ("A", None),
      ("B", Some(1L)), ("B", None), ("C", None), ("C", None))
    val df = rows.toDF("g", "key")
    val r = KmvOverlap.overlapMatrix(df, "g", "key", k = 16,
      withExact = true).collect()
      .map(x => (x.getAs[String]("group_a"), x.getAs[String]("group_b")) -> x)
      .toMap
    // C has ONLY null keys -> empty set -> appears in no pair
    assert(r.keySet === Set(("A", "B")))
    val ab = r(("A", "B"))
    assert(ab.getAs[Long]("n_inter_exact") === 1L)
    assert(ab.getAs[Long]("n_shared") === 1L)
    assert(ab.getAs[Long]("k_used") === 2L) // |A∪B| = {1,2}, nulls gone
  }

  test("catalog q103 estimates track its own exact error report") {
    val rows = Catalog.byName("q103_kmv_overlap_join")
      .build(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // every estimate must be a sane magnitude vs the exact overlap
      // riding in the same row (loose 2× band at k=64 on tiny sets)
      val exact = r.getAs[Long]("n_inter_exact").toDouble
      val est = r.getAs[Double]("est_intersection")
      if (exact > 0)
        assert(est >= exact / 2 && est <= exact * 2,
          s"estimate far off its own error report: $r")
    }
  }
}
