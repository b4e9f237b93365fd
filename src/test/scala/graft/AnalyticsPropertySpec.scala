package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.{Experiments, Funnels}

/** ScalaCheck invariants for the event-analytics operators: properties that
  * must hold on EVERY input, not just the oracle fixtures — funnel counts
  * can only shrink step over step, retention is a fraction of the cohort,
  * growth accounting must re-add to the independently-counted actives,
  * transition probabilities are conditional distributions.
  *
  * Raw ScalaCheck (Prop + Test.check) rather than a scalatest bridge: the
  * offline cache ships scalacheck itself, and a handful of samples per
  * property is the right budget when every sample runs Spark jobs.
  */
class AnalyticsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val types = Seq("view", "click", "buy", "err")

  /** (user, day, sec, type) tuples → events DF with a real timestamp. */
  private def eventsDF(rows: Seq[(Long, Int, Int, String)]): DataFrame =
    rows.zipWithIndex
      .map { case ((u, d, s, t), i) => (u, d, s, t, i.toLong) }
      .toDF("user_id", "day", "sec", "event_type", "event_id")
      .withColumn("ts", expr(
        "timestampadd(SECOND, sec, timestampadd(DAY, day, timestamp'2026-01-01 00:00:00'))"))
      .drop("day", "sec")

  private val genLog: Gen[Seq[(Long, Int, Int, String)]] = for {
    nUsers <- Gen.choose(1, 12)
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, nUsers.toLong - 1)
      d <- Gen.choose(0, 27)
      s <- Gen.choose(0, 86399)
      t <- Gen.oneOf(types)
    } yield (u, d, s, t))
  } yield rows

  private def check(name: String, p: Prop, samples: Int = 6): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(samples).withWorkers(1), p)
    assert(res.passed, s"$name: $res")
  }

  test("funnel: step counts never increase; conv is a fraction of step 1") {
    check("funnel", Prop.forAll(genLog) { rows =>
      val out = Funnels.funnel(eventsDF(rows), "user_id", "ts", "event_type",
          Seq("view", "click", "buy"))
        .orderBy("step").select("n_users", "conv")
        .as[(Long, Option[Double])].collect()
      graft.util.Caches.releaseAll()
      val counts = out.map(_._1)
      val monotone = counts.zip(counts.tail).forall { case (a, b) => b <= a }
      val convOk = out.forall { case (n, c) =>
        if (counts.head == 0) c.isEmpty
        else c.exists(v => v >= 0.0 && v <= 1.0 && math.abs(v - n.toDouble / counts.head) < 1e-9)
      }
      monotone && convOk
    })
  }

  test("cohortRetention: offset 0 is the full cohort; retention ≤ 1") {
    check("retention", Prop.forAll(genLog) { rows =>
      val out = Funnels.cohortRetention(eventsDF(rows), "user_id", "ts")
        .select($"period_offset", $"n_users", $"retention")
        .as[(Int, Long, Double)].collect()
      graft.util.Caches.releaseAll()
      out.nonEmpty &&
        out.forall { case (off, n, r) => r > 0.0 && r <= 1.0 + 1e-12 &&
          (off != 0 || math.abs(r - 1.0) < 1e-12) && n >= 1 }
    })
  }

  test("growthAccounting: new + retained + resurrected = independent actives") {
    check("growth", Prop.forAll(genLog) { rows =>
      val ev = eventsDF(rows)
      val out = Funnels.growthAccounting(ev, "user_id", "ts")
        .select($"period".cast("date").cast("string"), $"n_new", $"n_retained",
          $"n_resurrected")
        .as[(String, Long, Long, Long)].collect()
        .map { case (p, a, b, c) => p -> (a + b + c) }.toMap
      graft.util.Caches.releaseAll()
      // recompute actives straight from the log, no shared code path
      val actives = ev
        .select($"user_id", date_trunc("week", $"ts").cast("date").cast("string").as("w"))
        .distinct().groupBy("w").count()
        .as[(String, Long)].collect().toMap
      out.filter(_._2 > 0) == actives
    })
  }

  test("transitions: probabilities are a distribution per from_type") {
    check("transitions", Prop.forAll(genLog) { rows =>
      val ev = eventsDF(rows)
      val out = Funnels.transitions(ev, "user_id", "ts", "event_id", "event_type")
        .select($"from_type", $"n", $"p").as[(String, Long, Double)].collect()
      val nPairs = out.map(_._2).sum
      // every non-first event contributes exactly one lag pair
      val expectedPairs = rows.groupBy(_._1).values.map(_.size - 1).sum
      val perFrom = out.groupBy(_._1).values
      nPairs == expectedPairs &&
        perFrom.forall(g => math.abs(g.map(_._3).sum - 1.0) < 1e-9) &&
        out.forall { case (_, n, p) => p > 0.0 && p <= 1.0 && n >= 1 }
    })
  }

  test("welchT: exchanging the arms flips the sign of t and swaps the means") {
    check("welch", Prop.forAll(genLog) { rows =>
      val ev = eventsDF(rows).withColumn("v", $"event_id".cast("double") % 7)
      def run(arm: org.apache.spark.sql.Column) =
        Experiments.welchT(ev, Nil, arm, "v")
          .select($"n_a", $"n_b", $"mean_a", $"mean_b", $"t")
          .as[(Long, Long, Option[Double], Option[Double], Option[Double])].head()
      val a = run($"user_id" % 2 === 0)
      val b = run($"user_id" % 2 =!= 0)
      a._1 == b._2 && a._2 == b._1 && a._3 == b._4 && a._4 == b._3 &&
        ((a._5, b._5) match {
          case (Some(x), Some(y)) => math.abs(x + y) < 1e-9
          case (None, None) => true
          case _ => false
        })
    }, samples = 4)
  }

  test("containment dominates Jaccard and is bounded by 1 on every corpus (r15)") {
    import graft.ops.SetSimJoin
    val genDocs: Gen[Seq[(Long, String)]] = for {
      n <- Gen.choose(2, 12)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 20)
        toks <- Gen.listOfN(len, Gen.oneOf(
          "alpha", "beta", "gamma", "delta", "eps", "zeta"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    check("containment", Prop.forAll(genDocs) { docs =>
      val df = docs.toDF("doc_id", "text")
      val cont = SetSimJoin.containmentPairs(df, "doc_id", "text",
          shingleN = 2, threshold = 0.0 + 1e-9)
        .select("contained_id", "container_id", "containment")
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, c) => (a, b) -> c }.toMap
      val jac = SetSimJoin.jaccardPairs(df, "doc_id", "text",
          shingleN = 2, threshold = 0.0 + 1e-9)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      // for every Jaccard pair, BOTH directed containments exist and each
      // dominates the symmetric score: C(A→B) = |∩|/|A| ≥ |∩|/|∪| = J
      val dominated = jac.forall { case ((a, b), j) =>
        cont.get((a, b)).exists(c => c >= j - 1e-12 && c <= 1.0 + 1e-12) &&
          cont.get((b, a)).exists(c => c >= j - 1e-12 && c <= 1.0 + 1e-12)
      }
      val bounded = cont.values.forall(c => c > 0.0 && c <= 1.0 + 1e-12)
      graft.util.Caches.releaseAll()
      dominated && bounded
    }, samples = 4)
  }

  test("kmvOverlapMatrix never exceeds either slice's distinct count under k (r15)") {
    import graft.ops.Aggregates
    val genSlices: Gen[(Seq[Long], Seq[Long])] = for {
      na <- Gen.choose(1, 50)
      nb <- Gen.choose(1, 50)
      a <- Gen.listOfN(na, Gen.choose(0L, 60L))
      b <- Gen.listOfN(nb, Gen.choose(0L, 60L))
    } yield (a, b)
    check("overlap", Prop.forAll(genSlices) { case (a, b) =>
      // universe ≤ 61 distinct < k = 64 → the estimator is EXACT: it must
      // equal the true intersection on every draw
      val df = (a.map(("s1", _)) ++ b.map(("s2", _))).toDF("g", "v")
      val want = a.toSet.intersect(b.toSet).size.toDouble
      val got = Aggregates.kmvOverlapMatrix(df, "g", "v", k = 64)
        .head().getDouble(2)
      graft.util.Caches.releaseAll()
      got == want
    }, samples = 5)
  }

  test("rrfFuse totals: every output score is the exact sum of its rank terms (r15)") {
    import graft.ops.Retrieval
    val genRanks: Gen[(Seq[Long], Seq[Long])] = for {
      n1 <- Gen.choose(1, 10)
      n2 <- Gen.choose(1, 10)
      ids1 <- Gen.pick(n1, 0L to 14L)
      ids2 <- Gen.pick(n2, 0L to 14L)
    } yield (ids1.toSeq, ids2.toSeq)
    check("rrf", Prop.forAll(genRanks) { case (ids1, ids2) =>
      val r1 = ids1.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }
        .toDF("id", "rnk")
      val r2 = ids2.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }
        .toDF("id", "rnk")
      val got = Retrieval.rrfFuse(Seq(r1, r2), "id", "rnk", k0 = 60,
          topK = 50).as[(Long, Long)].collect().toMap
      val rank1 = ids1.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      val rank2 = ids2.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      val want = (ids1 ++ ids2).distinct.map { id =>
        val sc = rank1.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
          rank2.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
        id -> math.floor(sc * 1e6 + 0.5).toLong
      }.toMap
      got == want
    }, samples = 5)
  }

  test("drift invariants: PSI >= 0 with equality iff identical bins; " +
      "KS in [0,1] and role-symmetric (r15)") {
    import graft.ops.Drift
    val genSlices: Gen[(Seq[Long], Seq[Long])] = for {
      n1 <- Gen.choose(5, 40)
      n2 <- Gen.choose(5, 40)
      v1 <- Gen.listOfN(n1, Gen.choose(0L, 50L))
      v2 <- Gen.listOfN(n2, Gen.choose(0L, 80L))
    } yield (v1, v2)
    check("drift", Prop.forAll(genSlices) { case (v1, v2) =>
      val ref = v1.map(("k", _)).toDF("k", "v")
      val cur = v2.map(("k", _)).toDF("k", "v")
      // PSI is a sum of (p−q)·ln(p/q) terms, each ≥ 0 — nano-quantized
      // terms preserve the sign, so the sum can never go negative
      val psi = Drift.psiDrift(ref, cur, Seq("k"), "v", bins = 5)
        .select($"psi_nano").as[Long].head()
      // KS is a normalized max-gap: in [0, 1e6 micro] and symmetric in
      // which slice plays reference
      val kAB = Drift.ksDrift(ref, cur, Seq("k"), "v")
        .select($"ks_micro").as[Long].head()
      val kBA = Drift.ksDrift(cur, ref, Seq("k"), "v")
        .select($"ks_micro").as[Long].head()
      psi >= 0L && kAB >= 0L && kAB <= 1000000L && kAB == kBA
    }, samples = 5)
  }

  test("eval invariants: AUC label-flip anti-symmetry, AP within [0,1], " +
      "ROC curve monotone (r15)") {
    import graft.ops.Eval
    val genScored: Gen[Seq[(Double, Boolean)]] = for {
      n <- Gen.choose(8, 120)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0, 19).map(_ / 19.0)
        y <- Gen.oneOf(true, false)
      } yield (s, y))
      // force both classes present so AUC is defined
      withPos = (0.91, true) +: (0.13, false) +: rows
    } yield withPos
    check("auc/ap/curve", Prop.forAll(genScored) { rows =>
      val df = rows.toDF("score", "label")
      val flipped = rows.map { case (s, y) => (s, !y) }
        .toDF("score", "label")
      val a = Eval.rocAuc(df, "score", "label").head().getLong(2)
      val af = Eval.rocAuc(flipped, "score", "label").head().getLong(2)
      val ap = Eval.averagePrecision(df, "score", "label").head().getLong(2)
      val curve = Eval.rocCurve(df, "score", "label")
        .orderBy($"threshold".desc).select($"tp", $"fp")
        .as[(Long, Long)].collect()
      // flipping labels mirrors the rank statistic: AUC + AUC' = 1.
      // NOT exact in micro units: when AUC·1e6 lands exactly on a
      // half-integer (P·N a power of two with an odd tied-pair count),
      // floor(x + 0.5) rounds BOTH mirrored values up and the sum is
      // 1000001 — so the invariant is |a + a' − 1e6| ≤ 1 (ADVICE r15)
      (math.abs(a + af - 1000000L) <= 1L) &&
        a >= 0L && a <= 1000000L && ap >= 0L && ap <= 1000000L &&
        curve.map(_._1).sameElements(curve.map(_._1).sorted) &&
        curve.map(_._2).sameElements(curve.map(_._2).sorted)
    }, samples = 5)
  }

  test("concentration/drift invariants: gini within [0, (n−1)/n], JSD " +
      "within [0, ln 2] and symmetric (r15)") {
    import graft.ops.{Drift, Frequency}
    val genCounts: Gen[Seq[Long]] = for {
      n <- Gen.choose(2, 30)
      xs <- Gen.listOfN(n, Gen.choose(0L, 500L))
    } yield if (xs.sum == 0) xs.updated(0, 1L) else xs
    check("gini bounds", Prop.forAll(genCounts) { xs =>
      val g = Frequency.gini(
        xs.zipWithIndex.map { case (x, i) => (s"g$i", x) }.toDF("g", "m"),
        "m").head().getLong(2)
      g >= 0L && g <= math.round((xs.size - 1).toDouble / xs.size * 1e6)
    }, samples = 5)
    val genCats: Gen[(Seq[String], Seq[String])] = for {
      na <- Gen.choose(1, 80); nb <- Gen.choose(1, 80)
      a <- Gen.listOfN(na, Gen.choose(0, 9).map(i => s"c$i"))
      b <- Gen.listOfN(nb, Gen.choose(0, 14).map(i => s"c$i"))
    } yield (a, b)
    check("jsd bounds + symmetry", Prop.forAll(genCats) { case (a, b) =>
      def df(xs: Seq[String]) = xs.map(("k", _)).toDF("k", "cat")
      val ab = Drift.jsDrift(df(a), df(b), Seq("k"), "cat")
        .select($"jsd_nano").as[Long].head()
      val ba = Drift.jsDrift(df(b), df(a), Seq("k"), "cat")
        .select($"jsd_nano").as[Long].head()
      ab == ba && ab >= 0L &&
        ab <= math.ceil(math.log(2.0) * 1e9).toLong
    }, samples = 5)
  }

  test("r16 invariants: U-test CLES antisymmetry and bounds, F/H/chi2 " +
      "non-negative, kappa <= 1, BLEU/ROUGE within [0, 1]") {
    import graft.ops.{Audit, Drift, Eval, Experiments, GenMetrics}
    val genVals: Gen[(Seq[Long], Seq[Long])] = for {
      n1 <- Gen.choose(3, 40); n2 <- Gen.choose(3, 40)
      a <- Gen.listOfN(n1, Gen.choose(0L, 25L))
      b <- Gen.listOfN(n2, Gen.choose(5L, 30L))
    } yield (a, b)
    check("uTest", Prop.forAll(genVals) { case (a, b) =>
      def df(vs: Seq[Long]) = vs.map(("k", _)).toDF("k", "v")
      val ab = Drift.uTest(df(a), df(b), Seq("k"), "v").collect().head
      val ba = Drift.uTest(df(b), df(a), Seq("k"), "v").collect().head
      val clesOk = ab.getLong(3) >= 0L && ab.getLong(3) <= 1000000L &&
        math.abs(ab.getLong(3) + ba.getLong(3) - 1000000L) <= 1L
      val zOk = (ab.isNullAt(4) && ba.isNullAt(4)) ||
        math.abs(ab.getLong(4) + ba.getLong(4)) <= 1L
      clesOk && zOk
    }, samples = 5)
    val genArms: Gen[Seq[(String, Long)]] = for {
      k <- Gen.choose(2, 4)
      n <- Gen.choose(12, 60)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, k - 1); v <- Gen.choose(0L, 40L)
      } yield (s"g$g", v))
    } yield rows
    check("anova/kw", Prop.forAll(genArms) { rows =>
      val df = rows.toDF("arm", "v")
      val f = Experiments.anovaF(df, Seq.empty, "arm", "v").collect().head
      val h = Experiments.kruskalWallis(df, Seq.empty, "arm", "v")
        .collect().head
      (f.isNullAt(4) || f.getLong(4) >= 0L) &&
        f.getLong(2) >= -1L && f.getLong(3) >= 0L &&
        (h.isNullAt(2) || h.getLong(2) >= -1L)
    }, samples = 5)
    val genCat: Gen[Seq[(String, String)]] = for {
      n <- Gen.choose(10, 80)
      rows <- Gen.listOfN(n, for {
        a <- Gen.oneOf("x", "y", "z"); b <- Gen.oneOf("1", "2")
      } yield (a, b))
    } yield rows
    check("chi2/kappa", Prop.forAll(genCat) { rows =>
      val df = rows.toDF("a", "b")
      val c = Audit.chiSquareAssociation(df, "a", "b").collect().head
      val k = Eval.cohenKappa(df, "a", "b").collect().head
      graft.util.Caches.releaseAll()
      c.getLong(3) >= 0L &&
        (c.isNullAt(4) || (c.getLong(4) >= 0L && c.getLong(4) <= 1000000L)) &&
        (k.isNullAt(3) || k.getLong(3) <= 1000000L)
    }, samples = 5)
    val genTexts: Gen[Seq[(Long, String, String)]] = for {
      n <- Gen.choose(2, 10)
      rows <- Gen.listOfN(n, for {
        l1 <- Gen.choose(4, 15); l2 <- Gen.choose(4, 15)
        ws1 <- Gen.listOfN(l1, Gen.choose(0, 8))
        ws2 <- Gen.listOfN(l2, Gen.choose(0, 8))
      } yield (ws1.map("w" + _).mkString(" "), ws2.map("w" + _).mkString(" ")))
    } yield rows.zipWithIndex.map { case ((c, r), i) => (i.toLong, c, r) }
    check("bleu/rouge", Prop.forAll(genTexts) { rows =>
      val df = rows.toDF("id", "cand", "ref")
      val b = GenMetrics.bleu(df, "id", "cand", "ref").collect()
      val r = GenMetrics.rougeN(df, "id", "cand", "ref", 2).collect()
      graft.util.Caches.releaseAll()
      b.forall(x => (3 to 8).forall(i =>
        x.isNullAt(i) || (x.getLong(i) >= 0L && x.getLong(i) <= 1000000L))) &&
      r.forall(x => Seq(4, 5, 6).forall(i =>
        x.isNullAt(i) || (x.getLong(i) >= 0L && x.getLong(i) <= 1000000L)))
    }, samples = 4)
  }
}
