package graft

import org.apache.spark.sql.functions._
import graft.ops.Survival

/** Kaplan–Meier: textbook hand case with censoring, no-censoring
  * degeneration to the empirical curve, absorption at d = n, hygiene and
  * partitioning invariance.
  */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def km(rows: Seq[(Long, Boolean)]) =
    Survival.kaplanMeier(rows.toDF("dur", "event"), "dur", "event")
      .orderBy("t").as[(Long, Long, Long, Long)].collect().toSeq

  private def replicate(rows: Seq[(Long, Boolean)]): Seq[(Long, Long, Long, Long)] = {
    val byT = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, xs) => (t, xs.size.toLong, xs.count(_._2).toLong) }
    var cum = 0L; var dead = false
    val out = Seq.newBuilder[(Long, Long, Long, Long)]
    val totals = byT.map(_._2)
    byT.zipWithIndex.foreach { case ((t, all, d), i) =>
      val nRisk = totals.drop(i).sum
      if (d == nRisk && d > 0) dead = true
      else if (d > 0) cum += math.floor(
        math.log(1.0 - d.toDouble / nRisk) * 1e9 + 0.5).toLong
      if (d > 0) out += ((t, nRisk, d,
        if (dead) 0L
        else math.floor(math.exp(cum.toDouble / 1e9) * 1e6 + 0.5).toLong))
    }
    out.result()
  }

  test("kaplanMeier: textbook censored case — S = 0.8, 0.6, 0.3 at the " +
      "event times; censored times emit no rows (r15)") {
    val subj = Seq((1L, true), (2L, true), (3L, false), (4L, true),
      (5L, false))
    val got = km(subj)
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, 5L, 1L), (2L, 4L, 1L), (4L, 2L, 1L)))
    assert(got == replicate(subj))
    // the quantized curve sits within a micro of the analytic values
    val want = Seq(0.8, 0.6, 0.3)
    got.map(_._4).zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w * 1e6) <= 2, s"$g vs $w")
    }
  }

  test("kaplanMeier: no censoring ≈ the empirical survival fraction; " +
      "curve is monotone non-increasing") {
    val rnd = new scala.util.Random(12)
    val subj = Seq.fill(400)((rnd.nextInt(30).toLong, true))
    val got = km(subj)
    assert(got == replicate(subj))
    val n = subj.size.toDouble
    got.foreach { case (t, _, _, s) =>
      val frac = subj.count(_._1 > t) / n
      assert(math.abs(s - frac * 1e6) <= 5, s"t=$t: $s vs $frac")
    }
    assert(got.map(_._4) == got.map(_._4).sorted.reverse, "monotone")
  }

  test("kaplanMeier: everyone remaining dies → exact 0; all-censored → " +
      "empty; null/negative hygiene; repartition invariance") {
    val wipe = Seq((1L, true), (2L, true), (2L, true))
    assert(km(wipe).last._4 == 0L)
    assert(km(Seq((1L, false), (2L, false))).isEmpty)
    val messy = Seq((Some(1L), Some(true)), (None, Some(true)),
      (Some(2L), None), (Some(-3L), Some(true)), (Some(1L), Some(false)))
      .toDF("dur", "event")
    // only (1, true) and (1, false) survive the hygiene filters
    val clean = Survival.kaplanMeier(messy, "dur", "event").collect()
    assert(clean.length == 1 && clean.head.getLong(1) == 2L &&
      clean.head.getLong(2) == 1L)
    val rnd = new scala.util.Random(2)
    val big = Seq.fill(500)((rnd.nextInt(20).toLong, rnd.nextBoolean()))
    val a = km(big)
    val b = Survival.kaplanMeier(big.toDF("dur", "event").repartition(9),
      "dur", "event").orderBy("t")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(a == b && a == replicate(big))
  }
}
