package graft

import org.apache.spark.sql.functions._
import graft.ops.Audit

/** Benford first-digit audit: hand-computed digit shares and χ² terms,
  * grid completeness, non-positive/null exclusion, empty-input NULLs,
  * repartition invariance.
  */
class BenfordSpec extends SparkSpec {
  import spark.implicits._

  private def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong

  test("benford: hand case — exact shares, expectations, χ² terms (r15)") {
    // 1 appears 4×, 2 2×, 9 1× (and 19 starts with 1); zeros/negatives out
    val df = Seq(1L, 12L, 19L, 150L, 2L, 25L, 9L, 0L, -7L).toDF("v")
    val got = Audit.benford(df, $"v")
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 9, "all nine digits report")
    val n = 7.0
    def pExp(d: Int) = math.log10(1.0 + 1.0 / d)
    def chi(obs: Long, d: Int) = {
      val e = n * pExp(d)
      micro((obs - e) * (obs - e) / e)
    }
    assert(got(1) == ((1, 4L, micro(4 / n), micro(pExp(1)), chi(4, 1))))
    assert(got(2) == ((2, 2L, micro(2 / n), micro(pExp(2)), chi(2, 2))))
    assert(got(9) == ((9, 1L, micro(1 / n), micro(pExp(9)), chi(1, 9))))
    // unobserved digit: zero count, zero share, full χ² mass N·P_d
    assert(got(3)._2 == 0L && got(3)._3 == 0L &&
      got(3)._5 == micro(n * pExp(3)))
  }

  test("benford: empty / all-non-positive input reports NULL ratios, " +
      "never zero") {
    val rows = Audit.benford(Seq(0L, -3L).toDF("v"), $"v").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      assert(r.getLong(1) == 0L && r.isNullAt(2) && r.isNullAt(4))
    }
  }

  test("benford: a multiplicative corpus passes, a uniform one fails " +
      "(total χ² over 8 df)") {
    val rnd = new scala.util.Random(11)
    // multiplicative: exp of uniform spans decades → Benford-ish
    val mult = Seq.fill(5000)(math.exp(rnd.nextDouble() * 12).toLong + 1)
    val unif = Seq.fill(5000)(rnd.nextInt(900000).toLong + 100000)
    def chiTotal(xs: Seq[Long]) =
      Audit.benford(xs.toDF("v"), $"v")
        .agg(sum($"chi_micro")).head().getLong(0) / 1e6
    assert(chiTotal(mult) < 26.12, "multiplicative data ~ Benford")
    // uniform 6-digit values: first digits equidistributed — wildly off
    assert(chiTotal(unif) > 1000.0, "uniform data must fail the audit")
  }

  test("benford: repartition invariance on the real table") {
    val orders = graft.sources.Tables.orders(spark, sf())
    val cents = round($"o_totalprice" * 100).cast("long")
    val a = Audit.benford(orders, cents).collect().toSet
    val b = Audit.benford(orders.repartition(7), cents).collect().toSet
    assert(a == b && a.size == 9)
  }

  test("chiSquareAssociation: a deterministic mapping scores V = 1, an " +
      "exactly-independent table scores χ² = 0; hand case; single-level " +
      "column → NULL V (r16)") {
    import spark.implicits._
    // b = f(a), balanced: perfect association
    val dep = Seq(("x", "1"), ("x", "1"), ("y", "2"), ("y", "2"))
      .toDF("a", "b")
    val d = Audit.chiSquareAssociation(dep, "a", "b").collect().head
    assert(d.getLong(4) == 1000000L, s"V must be 1: $d")
    // product table: n_ij = r_i·c_j/N exactly → every term 0
    val ind = (for { a <- Seq("x", "y"); b <- Seq("1", "2", "3");
      _ <- 1 to 4 } yield (a, b)).toDF("a", "b")
    val i = Audit.chiSquareAssociation(ind, "a", "b").collect().head
    assert(i.getLong(3) == 0L && i.getLong(4) == 0L)
    // hand case: 2×2 [[3,1],[1,3]] → χ² = 2, V = √(2/8) = 0.5
    val hand = Seq.fill(3)(("x", "1")) ++ Seq(("x", "2")) ++
      Seq(("y", "1")) ++ Seq.fill(3)(("y", "2"))
    val h = Audit.chiSquareAssociation(hand.toDF("a", "b"), "a", "b")
      .collect().head
    assert(h.getLong(3) == 2000000000L && h.getLong(4) == 500000L, s"$h")
    // degenerate: one level on a side — V undefined, χ² still 0
    val degen = Seq(("x", "1"), ("x", "2")).toDF("a", "b")
    val g = Audit.chiSquareAssociation(degen, "a", "b").collect().head
    assert(g.isNullAt(4))
    // repartition invariance
    assert(Audit.chiSquareAssociation(hand.toDF("a", "b").repartition(5),
      "a", "b").collect().head == h)
    graft.util.Caches.releaseAll()
  }
}
