package graft

import org.apache.spark.sql.functions._
import graft.ops.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (String, Long)*) = rows.toDF("k", "v")

  test("psiDrift: identical slices score exactly 0; a shift scores big") {
    val ref = df((1L to 100L).map(i => ("a", i)): _*)
    val same = Drift.psiDrift(ref, ref, Seq("k"), "v", bins = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    // identical counts bin-for-bin → p = q in every bin → every term is
    // exactly 0 before quantization
    assert(same == Seq(("a", 100L, 100L, 0L)), s"got $same")
    // current shifted wholly outside the reference envelope clamps into
    // the top bin — a textbook "action" PSI (> 0.25 → > 250_000_000 nano)
    val shifted = df((1L to 100L).map(i => ("a", i + 1000L)): _*)
    val psi = Drift.psiDrift(ref, shifted, Seq("k"), "v", bins = 10)
      .select($"psi_nano").as[Long].head()
    assert(psi > 250000000L, s"wholesale shift must alarm, got $psi")
  }

  test("psiDrift: hand-computed two-bin case; cur-only keys drop; " +
      "constant reference defined") {
    // ref: 8×5, 2×15; cur reversed. bins=2 over envelope [5,15]: width 5
    // — value 5→bin0, value 15→raw bin 2, clamped into bin 1
    val ref = df((Seq.fill(8)(5L) ++ Seq.fill(2)(15L)).map(("a", _)) ++
      Seq(("const", 7L), ("const", 7L)): _*)
    val cur = df((Seq.fill(2)(5L) ++ Seq.fill(8)(15L)).map(("a", _)) ++
      Seq(("curonly", 1L)) ++ Seq(("const", 7L)): _*)
    val got = Drift.psiDrift(ref, cur, Seq("k"), "v", bins = 2)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // per bin: p = (c+0.5)/(n+1), smoothed; replicate exactly
    def psi(cr: Seq[Long], cc: Seq[Long], nR: Long, nC: Long): Long = {
      val terms = cr.zip(cc).map { case (a, b) =>
        val p = (a + 0.5) / (nR + 1.0); val q = (b + 0.5) / (nC + 1.0)
        math.floor((p - q) * math.log(p / q) * 1e9 + 0.5).toLong
      }
      terms.sum
    }
    assert(got("a") == ((10L, 10L, psi(Seq(8, 2), Seq(2, 8), 10, 10))))
    assert(!got.contains("curonly"), "keys with no reference drop out")
    // constant reference: all mass in bin 0 both sides → exactly 0
    assert(got("const") == ((2L, 1L,
      psi(Seq(2, 0), Seq(1, 0), 2, 1))))
  }

  test("ksDrift: identical → 0, disjoint → 1, hand case exact") {
    val ref = df((1L to 50L).map(i => ("a", i)): _*)
    assert(Drift.ksDrift(ref, ref, Seq("k"), "v")
      .select($"ks_micro").as[Long].head() == 0L)
    val far = df((1L to 50L).map(i => ("a", i + 100L)): _*)
    assert(Drift.ksDrift(ref, far, Seq("k"), "v")
      .select($"ks_micro").as[Long].head() == 1000000L)
    // hand case: ref {1,2,3,4}, cur {3,4,5,6} → D = 1/2 at v=2 (2/4 vs 0)
    val a = df(("h", 1L), ("h", 2L), ("h", 3L), ("h", 4L))
    val b = df(("h", 3L), ("h", 4L), ("h", 5L), ("h", 6L))
    val r = Drift.ksDrift(a, b, Seq("k"), "v")
      .as[(String, Long, Long, Long)].head()
    assert(r == (("h", 4L, 4L, 500000L)), s"got $r")
    // keys missing either slice drop out
    val lop = df(("only", 1L))
    assert(Drift.ksDrift(lop, df(("other", 1L)), Seq("k"), "v").isEmpty)
  }

  test("ksDrift and psiDrift are partitioning-invariant (exact-integer " +
      "accumulation)") {
    val ref = df((1L to 200L).map(i => ("a", i * 7 % 97)): _*)
    val cur = df((1L to 150L).map(i => ("a", i * 13 % 89 + 5)): _*)
    def runK(rp: Int) = Drift.ksDrift(ref.repartition(rp), cur.repartition(rp),
      Seq("k"), "v").select($"ks_micro").as[Long].head()
    def runP(rp: Int) = Drift.psiDrift(ref.repartition(rp), cur.repartition(rp),
      Seq("k"), "v").select($"psi_nano").as[Long].head()
    assert(runK(1) == runK(7) && runP(1) == runP(7))
  }

  // -------------------------------------------------------- JS divergence

  private def jsd(ref: Seq[(String, String)],
                  cur: Seq[(String, String)]): Map[String, (Long, Long, Long, Long)] =
    Drift.jsDrift(ref.toDF("k", "cat"), cur.toDF("k", "cat"), Seq("k"), "cat")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("jsDrift: identical distributions = exactly 0; disjoint = ln 2 " +
      "(r15)") {
    val same = Seq(("k", "a"), ("k", "a"), ("k", "b"))
    assert(jsd(same, same)("k") == ((3L, 3L, 2L, 0L)))
    val d = jsd(Seq(("k", "a")), Seq(("k", "b")))("k")
    // two disjoint categories: each side contributes ln 2 per unit mass
    assert(d._3 == 2L &&
      d._4 == math.floor(math.log(2.0) * 1e9 + 0.5).toLong)
  }

  test("jsDrift: hand case matches the closed form, with a one-sided " +
      "category finite") {
    // ref: a,a,b  cur: a,b,b,c — c is cur-only (raw KL would be infinite)
    val got = jsd(Seq(("k", "a"), ("k", "a"), ("k", "b")),
      Seq(("k", "a"), ("k", "b"), ("k", "b"), ("k", "c")))("k")
    def term(p: Double, q: Double): Double = {
      val m = (p + q) / 2.0
      val tp = if (p > 0) p * math.log(p / m) else 0.0
      val tq = if (q > 0) q * math.log(q / m) else 0.0
      math.floor((tp + tq) * 1e9 + 0.5)
    }
    val want = math.floor((term(2.0 / 3, 1.0 / 4) + term(1.0 / 3, 2.0 / 4) +
      term(0.0, 1.0 / 4)) / 2.0 + 0.5).toLong
    assert(got == ((3L, 4L, 3L, want)))
  }

  test("jsDrift: keys missing a slice drop; null categories excluded; " +
      "repartition invariance") {
    val ref = Seq(("k1", "a"), ("k2", "a"), ("k1", null.asInstanceOf[String]))
    val cur = Seq(("k1", "a"), ("k3", "a"))
    val got = jsd(ref, cur)
    assert(got.keySet == Set("k1") && got("k1") == ((1L, 1L, 1L, 0L)))
    val rnd = new scala.util.Random(3)
    val big = Seq.fill(2000)(("k", s"c${rnd.nextInt(30)}"))
    val bigCur = Seq.fill(2000)(("k", s"c${rnd.nextInt(40)}"))
    def run(rp: Int) = Drift.jsDrift(big.toDF("k", "cat").repartition(rp),
      bigCur.toDF("k", "cat").repartition(rp), Seq("k"), "cat")
      .select($"jsd_nano").as[Long].head()
    assert(run(1) == run(7))
  }

  test("jsDrift: bounded by ln 2 and symmetric") {
    val rnd = new scala.util.Random(9)
    val a = Seq.fill(500)(("k", s"c${rnd.nextInt(12)}"))
    val b = Seq.fill(300)(("k", s"c${rnd.nextInt(18)}"))
    val ab = jsd(a, b)("k")._4
    val ba = jsd(b, a)("k")._4
    assert(ab == ba, "JSD is symmetric")
    assert(ab >= 0 && ab <= math.ceil(math.log(2.0) * 1e9).toLong)
  }

  test("qqCompare: identical slices diff 0 everywhere; a constant shift " +
      "reports itself at every grid point; guards (r16)") {
    import graft.ops.Drift
    val rnd = new scala.util.Random(4)
    val base = Seq.fill(400)(rnd.nextInt(1000).toLong).toDF("v")
    val same = Drift.qqCompare(base, base, "v", points = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(same.length == 10 && same.forall(_._4 == 0L))
    assert(same.map(_._1).toSeq.sorted == (1 to 10).map(_ * 100L))
    val shifted = base.select((col("v") + 37L).as("v"))
    val sh = Drift.qqCompare(base, shifted, "v", points = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(sh.forall(_._4 == 37L), "a pure shift is 37 at every quantile")
    // hand case: 1..10 at the 4-point grid -> type-1 quantiles 3,5,8,10
    val ten = (1 to 10).map(_.toLong).toDF("v")
    val h = Drift.qqCompare(ten, ten, "v", points = 4)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(h.map(r => (r._1, r._2)).toSeq ==
      Seq((250L, 3L), (500L, 5L), (750L, 8L), (1000L, 10L)))
    intercept[IllegalArgumentException] {
      Drift.qqCompare(base, base, "v", points = 7)
    }
  }

  test("uTest: separated samples give CLES 1 and the closed-form z; " +
      "side swap mirrors; all-tied pool reports NULL z, CLES 1/2 (r16)") {
    import graft.ops.Drift
    def df(vs: Long*) = vs.map(v => ("k", v)).toDF("k", "v")
    val sep = Drift.uTest(df(1L, 2L), df(3L, 4L), Seq("k"), "v")
      .collect().head
    // U = 4 (every cur beats every ref) -> CLES = 1; no ties:
    // sigma^2 = (2*2/12)*(4+1) = 5/3, z = (4 - 2)/sqrt(5/3)
    assert(sep.getLong(3) == 1000000L)
    val wantZ = math.floor(2.0 / math.sqrt(5.0 / 3.0) * 1e6 + 0.5).toLong
    assert(sep.getLong(4) == wantZ, s"z: ${sep.getLong(4)} vs $wantZ")
    val swapped = Drift.uTest(df(3L, 4L), df(1L, 2L), Seq("k"), "v")
      .collect().head
    assert(swapped.getLong(3) == 0L && swapped.getLong(4) == -wantZ)
    val tied = Drift.uTest(df(5L, 5L), df(5L, 5L, 5L), Seq("k"), "v")
      .collect().head
    assert(tied.getLong(3) == 500000L && tied.isNullAt(4))
    // a key present in only one slice drops
    assert(Drift.uTest(df(1L), Seq(("other", 2L)).toDF("k", "v"),
      Seq("k"), "v").count() == 0L)
  }

  test("wasserstein1: a constant shift IS the distance; identical slices " +
      "0; hand case exact; single-value key kept at 0 (r16)") {
    import graft.ops.Drift
    def df(vs: Seq[Long]) = vs.map(("k", _)).toDF("k", "v")
    val rnd = new scala.util.Random(6)
    val base = Seq.fill(300)(rnd.nextInt(500).toLong)
    assert(Drift.wasserstein1(df(base), df(base), Seq("k"), "v")
      .collect().head.getLong(3) == 0L)
    // W1 between X and X + c is exactly c
    assert(Drift.wasserstein1(df(base), df(base.map(_ + 37L)), Seq("k"), "v")
      .collect().head.getLong(3) == 37000000L)
    // hand case: {0, 0} vs {1, 3} → CDF gaps 1 on [0,1), 1/2 on [1,3)
    // → W1 = 1 + 2·(1/2) = 2
    assert(Drift.wasserstein1(df(Seq(0L, 0L)), df(Seq(1L, 3L)),
      Seq("k"), "v").collect().head.getLong(3) == 2000000L)
    // both slices on ONE value: W1 defined and 0, the key is not dropped
    val one = Drift.wasserstein1(df(Seq(5L, 5L)), df(Seq(5L)),
      Seq("k"), "v").collect()
    assert(one.length == 1 && one.head.getLong(3) == 0L)
    // ungrouped face
    assert(Drift.wasserstein1(base.toDF("v"), base.map(_ + 7L).toDF("v"),
      Seq.empty, "v").collect().head.getLong(2) == 7000000L)
  }
}
