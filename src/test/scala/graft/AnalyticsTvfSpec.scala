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

  test("round-16 TVF faces (pr_curve/log_loss/brier/kappas/chi2/u_test/" +
      "qq/anova/kruskal) ≡ the Scala surface (r16)") {
    import graft.ops.{Audit, Drift, Eval, Experiments}
    scoredView()
    val t = spark.table("tvf_scored")
    assert(spark.sql(
        "SELECT * FROM graft_pr_curve('tvf_scored', 'score', 'label')")
      .collect().toSet == Eval.prCurve(t, "score", "label").collect().toSet)
    assert(spark.sql(
        "SELECT * FROM graft_log_loss('tvf_scored', 'score', 'label')")
      .collect().toSeq == Eval.logLoss(t, "score", "label").collect().toSeq)
    val rnd = new scala.util.Random(21)
    Seq.fill(300)((rnd.nextDouble(), rnd.nextBoolean()))
      .toDF("score", "label").createOrReplaceTempView("tvf_prob")
    assert(spark.sql(
        "SELECT * FROM graft_brier('tvf_prob', 'score', 'label', 5)")
      .collect().toSeq == Eval.brierDecomposition(spark.table("tvf_prob"),
        "score", "label", bins = 5).collect().toSeq)
    Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"))
      .toDF("label", "predicted").createOrReplaceTempView("tvf_preds")
    assert(spark.sql(
        "SELECT * FROM graft_cohen_kappa('tvf_preds', 'label', 'predicted')")
      .collect().toSeq == Eval.cohenKappa(spark.table("tvf_preds"),
        "label", "predicted").collect().toSeq)
    Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "y"), (2L, "y"), (2L, "y"))
      .toDF("item", "cat").createOrReplaceTempView("tvf_votes")
    assert(spark.sql(
        "SELECT * FROM graft_fleiss_kappa('tvf_votes', 'item', 'cat')")
      .collect().toSeq == Eval.fleissKappa(spark.table("tvf_votes"),
        "item", "cat").collect().toSeq)
    Seq(("x", "1"), ("x", "2"), ("y", "1"), ("y", "2"))
      .toDF("a", "b").createOrReplaceTempView("tvf_ab")
    assert(spark.sql(
        "SELECT * FROM graft_chi2_assoc('tvf_ab', 'a', 'b')")
      .collect().toSeq == Audit.chiSquareAssociation(spark.table("tvf_ab"),
        "a", "b").collect().toSeq)
    Seq.fill(100)(("k", rnd.nextInt(40).toLong)).toDF("k", "v")
      .createOrReplaceTempView("tvf_r")
    Seq.fill(100)(("k", (rnd.nextInt(40) + 5).toLong)).toDF("k", "v")
      .createOrReplaceTempView("tvf_c")
    assert(spark.sql(
        "SELECT * FROM graft_u_test('tvf_r', 'tvf_c', 'k', 'v')")
      .collect().toSet == Drift.uTest(spark.table("tvf_r"),
        spark.table("tvf_c"), Seq("k"), "v").collect().toSet)
    assert(spark.sql(
        "SELECT * FROM graft_qq('tvf_r', 'tvf_c', 'v', 10)")
      .collect().toSet == Drift.qqCompare(spark.table("tvf_r"),
        spark.table("tvf_c"), "v", points = 10).collect().toSet)
    Seq.fill(120)((s"g${rnd.nextInt(3)}", rnd.nextInt(30).toLong))
      .toDF("arm", "v").createOrReplaceTempView("tvf_arms")
    assert(spark.sql(
        "SELECT * FROM graft_anova_f('tvf_arms', '', 'arm', 'v')")
      .collect().toSeq == Experiments.anovaF(spark.table("tvf_arms"),
        Seq.empty, "arm", "v").collect().toSeq)
    assert(spark.sql(
        "SELECT * FROM graft_kruskal_wallis('tvf_arms', '', 'arm', 'v')")
      .collect().toSeq == Experiments.kruskalWallis(spark.table("tvf_arms"),
        Seq.empty, "arm", "v").collect().toSeq)
  }

  test("graft_wasserstein / graft_bleu / graft_rouge ≡ the Scala " +
      "surface (r16)") {
    import graft.ops.{Drift, GenMetrics}
    val rnd = new scala.util.Random(33)
    Seq.fill(100)(("k", rnd.nextInt(50).toLong)).toDF("k", "v")
      .createOrReplaceTempView("tvf_w_r")
    Seq.fill(100)(("k", (rnd.nextInt(50) + 9).toLong)).toDF("k", "v")
      .createOrReplaceTempView("tvf_w_c")
    assert(spark.sql(
        "SELECT * FROM graft_wasserstein('tvf_w_r', 'tvf_w_c', 'k', 'v')")
      .collect().toSet == Drift.wasserstein1(spark.table("tvf_w_r"),
        spark.table("tvf_w_c"), Seq("k"), "v").collect().toSet)
    Seq((1L, "the quick brown fox", "the quick red fox"),
      (2L, "a b c d e", "a b c x y"))
      .toDF("id", "cand", "ref").createOrReplaceTempView("tvf_pairs")
    assert(spark.sql(
        "SELECT * FROM graft_bleu('tvf_pairs', 'id', 'cand', 'ref', 2)")
      .collect().toSet == GenMetrics.bleu(spark.table("tvf_pairs"),
        "id", "cand", "ref", maxN = 2).collect().toSet)
    assert(spark.sql(
        "SELECT * FROM graft_rouge('tvf_pairs', 'id', 'cand', 'ref', 2)")
      .collect().toSet == GenMetrics.rougeN(spark.table("tvf_pairs"),
        "id", "cand", "ref", n = 2).collect().toSet)
    assert(spark.sql(
        "SELECT * FROM graft_chrf('tvf_pairs', 'id', 'cand', 'ref')")
      .collect().toSet == GenMetrics.chrF(spark.table("tvf_pairs"),
        "id", "cand", "ref").collect().toSet)
    graft.util.Caches.releaseAll()
  }

  test("fleissKappa on a NON-constant panel: pbar averages over the " +
      "contributing (max-count) items only, kappa NULL (r16 review fix)") {
    import graft.ops.Eval
    // items: 1 has 3 raters (2 agree 'x' + 1 'y'), 2 has 2 raters — only
    // item 1 contributes; P_1 = (5 − 3)/(3·2) = 1/3, so pbar = 1/3, not
    // the n_items-diluted 1/6
    val votes = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "x"))
      .toDF("item", "cat")
    val r = Eval.fleissKappa(votes, "item", "cat").collect().head
    assert(!r.getBoolean(2), "panel is not constant")
    assert(r.isNullAt(5), "kappa undefined on an unequal panel")
    assert(r.getLong(3) == math.floor(
      math.floor(1.0 / 3.0 * 1e9 + 0.5) / 1e9 * 1e6 + 0.5).toLong,
      s"pbar must average over contributing items: $r")
    graft.util.Caches.releaseAll()
  }

  test("graft_sessionize / graft_funnel / graft_funnel_latency / " +
      "graft_retention / graft_growth ≡ the Scala surface (r17)") {
    import graft.ops.{Funnels, Sessionize}
    val rnd = new scala.util.Random(17)
    val types = Seq("view", "click", "purchase")
    Seq.fill(600)((rnd.nextInt(40).toLong,
        java.sql.Timestamp.valueOf(f"2024-01-${1 + rnd.nextInt(28)}%02d " +
          f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
        types(rnd.nextInt(3))))
      .toDF("user_id", "ts", "event_type")
      .createOrReplaceTempView("tvf_events")
    val ev = spark.table("tvf_events")
    assert(spark.sql(
        "SELECT * FROM graft_sessionize('tvf_events', 'user_id', 'ts', " +
          "21600)").collect().toSet ==
      Sessionize.sessionStats(ev, "user_id", "ts", gapSeconds = 21600L)
        .collect().toSet)
    assert(spark.sql(
        "SELECT * FROM graft_funnel('tvf_events', 'user_id', 'ts', " +
          "'event_type', 'view,click,purchase')").collect().toSet ==
      Funnels.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase")).collect().toSet)
    assert(spark.sql(
        "SELECT * FROM graft_funnel('tvf_events', 'user_id', 'ts', " +
          "'event_type', 'view,click,purchase', 86400)")
        .collect().toSet ==
      Funnels.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), Some(86400L)).collect().toSet)
    assert(spark.sql(
        "SELECT * FROM graft_funnel_latency('tvf_events', 'user_id', " +
          "'ts', 'event_type', 'view,click')").collect().toSet ==
      Funnels.funnelLatency(ev, "user_id", "ts", "event_type",
        Seq("view", "click")).collect().toSet)
    assert(spark.sql(
        "SELECT * FROM graft_retention('tvf_events', 'user_id', 'ts')")
        .collect().toSet ==
      Funnels.cohortRetention(ev, "user_id", "ts", "week").collect().toSet)
    assert(spark.sql(
        "SELECT * FROM graft_growth('tvf_events', 'user_id', 'ts', 'day')")
        .collect().toSet ==
      Funnels.growthAccounting(ev, "user_id", "ts", "day").collect().toSet)
    graft.util.Caches.releaseAll()
  }

  test("graft_bpe_tokens ≡ the Scala surface over a published merge " +
      "table (r17)") {
    import graft.ops.Bpe
    val docs = Seq((1L, "low low lower"), (2L, "newest low"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("tvf_bpe_docs")
    val root = graft.util.TempRoots.create("graft_tvfbpe") + "/merges"
    Bpe.publishMerges(spark, root, Bpe.trainMerges(docs, "text", 3))
    val merges = Bpe.loadMerges(spark, root)
    assert(spark.sql(
        s"SELECT * FROM graft_bpe_tokens('tvf_bpe_docs', 'doc_id', " +
          s"'text', '$root')").collect().toSet ==
      Bpe.bpeTokenCounts(docs, "doc_id", "text", merges).collect().toSet)
    graft.util.Caches.releaseAll()
  }

  test("graft_bpe_ids ≡ the Scala surface over a published merge table " +
      "(r18)") {
    import graft.ops.Bpe
    val docs = Seq((1L, "low low lower"), (2L, "newest low"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("tvf_bpeids_docs")
    val root = graft.util.TempRoots.create("graft_tvfbpeids") + "/merges"
    Bpe.publishMerges(spark, root, Bpe.trainMerges(docs, "text", 3))
    val merges = Bpe.loadMerges(spark, root)
    assert(spark.sql(
        s"SELECT * FROM graft_bpe_ids('tvf_bpeids_docs', 'doc_id', " +
          s"'text', '$root')").collect().toSet ==
      Bpe.encodeIds(docs, "doc_id", "text", merges).collect().toSet)
    graft.util.Caches.releaseAll()
  }

  test("graft_bpe_ids arity 5 serves the FIXED published vocabulary — " +
      "≡ encodeIdsWith, with out-of-vocabulary symbols as UnkId (r18)") {
    import graft.ops.Bpe
    val train = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val apply = Seq((9L, "low qat")).toDF("doc_id", "text")
    apply.createOrReplaceTempView("tvf_bpefix_docs")
    val root = graft.util.TempRoots.create("graft_tvfbpefix")
    Bpe.publishMerges(spark, root + "/merges",
      Bpe.trainMerges(train, "text", 2))
    val merges = Bpe.loadMerges(spark, root + "/merges")
    Bpe.publishVocab(spark, root + "/vocab",
      Bpe.corpusVocab(train, "text", merges))
    val got = spark.sql(
      s"SELECT * FROM graft_bpe_ids('tvf_bpefix_docs', 'doc_id', " +
        s"'text', '$root/merges', '$root/vocab')").collect().toSet
    assert(got == Bpe.encodeIdsWith(apply, "doc_id", "text", merges,
      Bpe.loadVocab(spark, root + "/vocab")).collect().toSet)
    assert(got.exists(_.getLong(2) == Bpe.UnkId),
      "the unseen word must surface as unk ids, not vanish")
    graft.util.Caches.releaseAll()
  }
}
