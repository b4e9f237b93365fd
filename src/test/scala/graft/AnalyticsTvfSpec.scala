package graft

import org.apache.spark.sql.functions._
import graft.ops.{Drift, Eval, Frequency, Survival}

/** SQL faces of the analytics suite (graft_roc_auc / graft_calibration /
  * graft_drift_* / graft_kaplan_meier / graft_gini): every TVF must plan
  * the IDENTICAL tree the Scala surface plans — value equality here,
  * arity/literal guards, empty-key (ungrouped) convention.
  */
class AnalyticsTvfSpec extends SparkSpec {
  import spark.implicits._

  private def scoredView(): Unit = {
    val rnd = new scala.util.Random(5)
    Seq.fill(400)((rnd.nextInt(20).toDouble, rnd.nextBoolean()))
      .toDF("score", "label").createOrReplaceTempView("tvf_scored")
  }

  test("graft_roc_auc / graft_roc_curve / graft_calibration ≡ the Scala " +
      "surface (r16)") {
    scoredView()
    val t = spark.table("tvf_scored")
    assert(spark.sql(
        "SELECT * FROM graft_roc_auc('tvf_scored', 'score', 'label')")
      .collect().toSeq ==
      Eval.rocAuc(t, "score", "label").collect().toSeq)
    assert(spark.sql(
        "SELECT * FROM graft_roc_curve('tvf_scored', 'score', 'label')")
      .collect().toSet ==
      Eval.rocCurve(t, "score", "label").collect().toSet)
    assert(spark.sql(
        "SELECT * FROM graft_calibration('tvf_scored', 'score', 'label', 5)")
      .collect().toSet ==
      Eval.calibration(t, "score", "label", bins = 5).collect().toSet)
  }

  test("graft_drift_psi / _ks / _js ≡ the Scala surface, keyed and with " +
      "the empty-key (ungrouped) convention (r16)") {
    val rnd = new scala.util.Random(9)
    def slice(shift: Int) = Seq.fill(300)(
      ("g" + rnd.nextInt(2), (rnd.nextInt(50) + shift).toLong,
        "c" + rnd.nextInt(6))).toDF("k", "v", "cat")
    slice(0).createOrReplaceTempView("tvf_ref")
    slice(8).createOrReplaceTempView("tvf_cur")
    val (ref, cur) = (spark.table("tvf_ref"), spark.table("tvf_cur"))
    assert(spark.sql(
        "SELECT * FROM graft_drift_psi('tvf_ref', 'tvf_cur', 'k', 'v', 10)")
      .collect().toSet ==
      Drift.psiDrift(ref, cur, Seq("k"), "v", bins = 10).collect().toSet)
    assert(spark.sql(
        "SELECT * FROM graft_drift_ks('tvf_ref', 'tvf_cur', '', 'v')")
      .collect().toSet ==
      Drift.ksDrift(ref, cur, Seq.empty, "v").collect().toSet)
    assert(spark.sql(
        "SELECT * FROM graft_drift_js('tvf_ref', 'tvf_cur', 'k', 'cat')")
      .collect().toSet ==
      Drift.jsDrift(ref, cur, Seq("k"), "cat").collect().toSet)
  }

  test("graft_kaplan_meier / graft_gini ≡ the Scala surface; arity and " +
      "literal guards fail loudly (r16)") {
    val rnd = new scala.util.Random(3)
    Seq.fill(200)((rnd.nextInt(30).toLong + 1L, rnd.nextBoolean()))
      .toDF("dur", "event").createOrReplaceTempView("tvf_surv")
    assert(spark.sql(
        "SELECT * FROM graft_kaplan_meier('tvf_surv', 'dur', 'event')")
      .collect().toSet ==
      Survival.kaplanMeier(spark.table("tvf_surv"), "dur", "event")
        .collect().toSet)
    Seq(("a", 10L), ("b", 60L), ("c", 30L)).toDF("g", "m")
      .createOrReplaceTempView("tvf_gini")
    assert(spark.sql("SELECT * FROM graft_gini('tvf_gini', 'm')")
      .collect().toSeq ==
      Frequency.gini(spark.table("tvf_gini"), "m").collect().toSeq)
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_gini('tvf_gini')").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_roc_auc(tvf_scored, 'score', 'label')")
        .collect()
    }
  }
}
