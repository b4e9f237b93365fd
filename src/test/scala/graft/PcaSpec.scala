package graft

import org.apache.spark.sql.functions._
import graft.ops.Pca

/** Covariance + power-iteration dominant direction: exact hand cases,
  * driver-side decimal replication, planted-axis recovery, analytic 2-D
  * convergence, degenerate guards, repartition invariance.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("covariance: exact 2-D hand case (r15)") {
    val df = Seq(Array(1.0f, 0.0f), Array(0.0f, 1.0f)).toDF("vec")
    val got = Pca.covariance(df, "vec")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.size == 4)
    assert(got((0L, 0L)) == ((2L, 0.25)) && got((1L, 1L)) == ((2L, 0.25)))
    assert(got((0L, 1L)) == ((2L, -0.25)) && got((1L, 0L)) == ((2L, -0.25)))
  }

  test("covariance: driver-side decimal replication on random floats; " +
      "repartition invariance") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(200)(Array.fill(6)(rnd.nextFloat() * 2 - 1))
    val df = rows.toDF("vec")
    val got = Pca.covariance(df, "vec")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    val n = rows.size
    for (i <- 0 until 6; j <- 0 until 6) {
      var sij = BigInt(0); var si = BigInt(0); var sj = BigInt(0)
      rows.foreach { v =>
        val (xi, xj) = (v(i).toDouble, v(j).toDouble)
        def pico(x: Double) = BigInt(math.floor(x * 1e12 + 0.5).toLong)
        sij += pico(xi * xj); si += pico(xi); sj += pico(xj)
      }
      val want = sij.toDouble / 1e12 / n -
        (si.toDouble / 1e12 / n) * (sj.toDouble / 1e12 / n)
      assert(got((i.toLong, j.toLong)) == want, s"cell ($i, $j)")
    }
    val re = Pca.covariance(df.repartition(7), "vec")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(re == got)
  }

  test("topDirection: analytic 2-D matrix converges to the dominant axis") {
    val cov = Seq((0L, 0L, 2.0), (0L, 1L, 0.0), (1L, 0L, 0.0), (1L, 1L, 0.5))
      .toDF("i", "j", "cov")
    val v = Pca.topDirection(cov, dim = 2)
      .as[(Long, Double)].collect().toMap
    // eigengap 4× per round, 8 rounds: v ≈ (1, ~1.5e-5)
    assert(math.abs(v(0L)) > 0.999999 && math.abs(v(1L)) < 1e-4)
    assert(math.abs(v(0L) * v(0L) + v(1L) * v(1L) - 1.0) < 1e-6, "unit norm")
  }

  test("topDirection + project: a planted dominant axis is recovered " +
      "from data, deterministically under repartitioning") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 300).map { id =>
      val a = rnd.nextGaussian() * 5
      (id.toLong, Array.tabulate(8)(k =>
        (if (k == 3) a else rnd.nextGaussian() * 0.1).toFloat))
    }
    val df = rows.toDF("vec_id", "vec")
    val dir = Pca.topDirection(Pca.covariance(df, "vec"), dim = 8)
    val v = dir.as[(Long, Double)].collect().toMap
    assert(math.abs(v(3L)) > 0.99, s"planted axis not found: $v")
    // projection scores follow the planted coefficient's ordering
    val proj = Pca.project(df, "vec_id", "vec", dir)
      .as[(Long, Double)].collect().toMap
    val byCoef = rows.sortBy(_._2(3)).map(_._1)
    val byProj = proj.toSeq.sortBy { case (id, p) =>
      if (v(3L) > 0) p else -p }.map(_._1)
    // rank correlation is near-perfect; just pin the extremes
    assert(byProj.take(3).toSet.subsetOf(byCoef.take(10).toSet))
    assert(byProj.takeRight(3).toSet.subsetOf(byCoef.takeRight(10).toSet))
    val dirRe = Pca.topDirection(
      Pca.covariance(df.repartition(9), "vec"), dim = 8)
      .as[(Long, Double)].collect().toMap
    assert(dirRe == v, "direction must be partitioning-invariant")
    graft.util.Caches.releaseAll()
  }

  test("dominantShare: analytic 2-D matrix — λ/trace = 0.8; zero matrix " +
      "NULL share (r15)") {
    val cov = Seq((0L, 0L, 2.0), (0L, 1L, 0.0), (1L, 0L, 0.0), (1L, 1L, 0.5))
      .toDF("i", "j", "cov")
    val dir = Pca.topDirection(cov, dim = 2)
    val r = Pca.dominantShare(cov, dir).collect().head
    // direction ≈ e_1 ⇒ λ ≈ 2, trace = 2.5, share ≈ 0.8
    assert(math.abs(r.getLong(0) / 1e9 - 2.0) < 1e-4)
    assert(r.getLong(1) == 2500000000L)
    assert(math.abs(r.getLong(2) - 800000L) < 100)
    val zero = Seq((0L, 0L, 0.0), (0L, 1L, 0.0), (1L, 0L, 0.0),
      (1L, 1L, 0.0)).toDF("i", "j", "cov")
    val z = Pca.dominantShare(zero, Pca.topDirection(zero, 2, 2))
      .collect().head
    assert(z.getLong(1) == 0L && z.isNullAt(2))
    graft.util.Caches.releaseAll()
  }

  test("removeDominant: hand case — the e₁ component vanishes; computed " +
      "direction leaves residuals orthogonal (r15)") {
    val dir = Seq((0L, 1.0), (1L, 0.0)).toDF("i", "v")
    val df = Seq((7L, Array(3.0f, 4.0f))).toDF("vec_id", "vec")
    val got = Pca.removeDominant(df, "vec_id", "vec", dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((7L, 0L, 0L), (7L, 1L, 4000000L)))
    // with the real dominant direction the corrected vectors are (near-)
    // orthogonal to it: dot(x', v) ≈ 0 for every row
    val rnd = new scala.util.Random(8)
    val rows = (1 to 100).map { id =>
      val a = rnd.nextGaussian() * 5
      (id.toLong, Array.tabulate(6)(k =>
        (if (k == 2) a else rnd.nextGaussian() * 0.05).toFloat))
    }
    val data = rows.toDF("vec_id", "vec")
    val d2 = Pca.topDirection(Pca.covariance(data, "vec"), dim = 6)
    val v = d2.as[(Long, Double)].collect().sortBy(_._1).map(_._2)
    val corrected = Pca.removeDominant(data, "vec_id", "vec", d2)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3 / 1e6)).toMap
    corrected.values.foreach { x =>
      val dot = x.zip(v).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) < 1e-3, s"residual not orthogonal: $dot")
    }
    graft.util.Caches.releaseAll()
  }

  test("native moment aggregate ≡ the exploded form bit-for-bit, on " +
      "random floats and under repartitioning (r16)") {
    val rnd = new scala.util.Random(31)
    val rows = Seq.fill(300)(Array.fill(8)(rnd.nextFloat() * 4 - 2))
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("vec").repartition(parts)
      val native = Pca.covariance(df, "vec")
        .as[(Long, Long, Long, Double)].collect().sorted.toSeq
      val exploded = Pca.covarianceExploded(df, "vec")
        .as[(Long, Long, Long, Double)].collect().sorted.toSeq
      assert(native == exploded,
        s"native diverged from the exploded anchor at parts=$parts")
    }
  }

  test("native moment aggregate: 128-bit accumulators survive sums past " +
      "the long range; ragged dims and null elements fail loudly (r16)") {
    // |xi·xj| = 9e6 (the stated per-term bound) → pico term 9e18, within
    // one long; THREE rows push the cell sum to 2.7e19 > 2^63 — the
    // regime the old long-path would have wrapped in, exact here
    val hot = Seq.fill(3)(Array(3000.0f, 3000.0f)).toDF("vec")
    val native = Pca.covariance(hot, "vec")
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val exploded = Pca.covarianceExploded(hot, "vec")
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(native == exploded && native.forall(_._4 == 0.0))
    val ragged = Seq(Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)).toDF("vec")
    val e = intercept[Exception] { Pca.covariance(ragged, "vec").collect() }
    assert(e.getMessage != null)
    val withNull = Seq(Seq[Option[Double]](Some(1.0), None)).toDF("vec")
    val e2 = intercept[Exception] { Pca.covariance(withNull, "vec").collect() }
    assert(e2.getMessage != null)
  }

  test("topDirection: zero matrix reports the zero vector, not a crash; " +
      "knob guards") {
    val cov = Seq((0L, 0L, 0.0), (0L, 1L, 0.0), (1L, 0L, 0.0), (1L, 1L, 0.0))
      .toDF("i", "j", "cov")
    val v = Pca.topDirection(cov, dim = 2, iters = 2)
      .as[(Long, Double)].collect().toMap
    assert(v.values.forall(_ == 0.0))
    intercept[IllegalArgumentException] { Pca.topDirection(cov, dim = 1) }
    intercept[IllegalArgumentException] { Pca.topDirection(cov, 2, iters = 0) }
    graft.util.Caches.releaseAll()
  }
}
