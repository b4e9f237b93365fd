package graft

import org.apache.spark.sql.functions._
import graft.ops.Eval

/** Classifier audit: hand-computed confusion algebra, hallucinated-class
  * surfacing, NULL-vs-0 ratio semantics, corpus-scale consistency.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("classReport: hand case — counts, ratios, hallucinated class, " +
      "NULL ratios (r15)") {
    // truth: 3 a, 2 b, 1 c. predictions: a→a,a,b; b→b,b; c→d (a class
    // the corpus never carries). NULL label rows are excluded.
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "b"),
      ("c", "d"),
      (null.asInstanceOf[String], "a")
    ).toDF("label", "predicted")
    val got = Eval.classReport(df, "label", "predicted").collect()
      .map(r => r.getString(0) -> r).toMap
    def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    // a: n_true 3, n_pred 2, tp 2 → p=1, r=2/3, f1=0.8
    val a = got("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) == ((3L, 2L, 2L)))
    assert(a.getLong(4) == 1000000L && a.getLong(5) == micro(2.0 / 3))
    assert(a.getLong(6) == micro(2 * 1.0 * (2.0 / 3) / (1.0 + 2.0 / 3)))
    // b: n_true 2, n_pred 3, tp 2 → p=2/3, r=1
    val b = got("b")
    assert((b.getLong(1), b.getLong(2), b.getLong(3)) == ((2L, 3L, 2L)))
    // c: predicted never → precision NULL (no predictions), recall 0
    val c = got("c")
    assert((c.getLong(1), c.getLong(2), c.getLong(3)) == ((1L, 0L, 0L)))
    assert(c.isNullAt(4) && c.getLong(5) == 0L && c.isNullAt(6))
    // d: HALLUCINATED class — zero support, precision 0, recall NULL
    val d = got("d")
    assert((d.getLong(1), d.getLong(2), d.getLong(3)) == ((0L, 1L, 0L)))
    assert(d.getLong(4) == 0L && d.isNullAt(5) && d.isNullAt(6))
    assert(got.size == 4)
    graft.util.Caches.releaseAll()
  }

  test("calibration: hand-computed bins, top-bin clamp, ECE term (r15)") {
    val df = Seq(
      (0.05, false), (0.08, true),            // bin 0: conf .065, acc .5
      (0.95, true), (0.97, true), (0.99, false), // bin 9: conf .97, acc 2/3
      (1.0, true)                             // exactly 1.0 clamps to bin 9
    ).toDF("score", "label")
    val got = Eval.calibration(df, "score", "label", bins = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val b0 = got(0L)
    assert((b0.getLong(1), b0.getLong(2)) == ((2L, 1L)))
    assert(b0.getLong(3) == micro(0.065) && b0.getLong(4) == micro(0.5))
    assert(b0.getLong(5) == micro(math.abs(0.5 - 0.065)))
    val b9 = got(9L)
    assert((b9.getLong(1), b9.getLong(2)) == ((4L, 3L)),
      "score 1.0 must clamp into the top bin")
    val conf9 = (0.95 + 0.97 + 0.99 + 1.0) / 4
    assert(b9.getLong(3) == micro(conf9) && b9.getLong(4) == micro(0.75))
    // empty bins absent; only the two populated bins report
    assert(got.keySet == Set(0L, 9L))
    // partitioning-invariant (decimal score sums)
    val rep = Eval.calibration(df.repartition(5), "score", "label", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rep == got.view.mapValues(_.getLong(3)).toMap)
  }

  test("classReport consistency on the real corpus: supports sum to the " +
      "labeled row count on BOTH axes; tp bounded by both") {
    import graft.functions.{TextFunctions => TF}
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val preds = docs.select($"doc_id", $"lang",
      TF.langId(TF.tokens($"text"),
        Seq("en" -> Seq("the", "a"), "data" -> Seq("data", "table")))
        .as("predicted"))
    val rep = Eval.classReport(preds, "lang", "predicted").collect()
    val n = preds.filter($"lang".isNotNull && $"predicted".isNotNull).count()
    assert(rep.map(_.getLong(1)).sum == n, "supports partition the corpus")
    assert(rep.map(_.getLong(2)).sum == n, "predictions partition it too")
    rep.foreach { r =>
      assert(r.getLong(3) <= math.min(r.getLong(1), r.getLong(2)),
        s"tp bounded: $r")
    }
    graft.util.Caches.releaseAll()
  }

  // ------------------------------------------------------------- ROC-AUC

  private def auc(rows: Seq[(Double, Boolean)]): Option[Long] = {
    val df = rows.toDF("score", "label")
    val r = Eval.rocAuc(df, "score", "label").collect().head
    if (r.isNullAt(2)) None else Some(r.getLong(2))
  }

  test("rocAuc: hand cases — perfect, random-ties, 3-of-4 pairs (r15)") {
    // perfect separation
    assert(auc(Seq((0.9, true), (0.8, true), (0.7, false), (0.1, false)))
      .contains(1000000L))
    // one tied pair only → AUC 1/2
    assert(auc(Seq((0.5, true), (0.5, false))).contains(500000L))
    // pairs: (.8,.6)✓ (.8,.2)✓ (.4,.6)✗ (.4,.2)✓ → 3/4
    assert(auc(Seq((0.8, true), (0.4, true), (0.6, false), (0.2, false)))
      .contains(750000L))
  }

  test("rocAuc: degenerate corpora (single-class) report NULL, not 0") {
    assert(auc(Seq((0.9, true), (0.1, true))).isEmpty)
    assert(auc(Seq((0.9, false), (0.1, false))).isEmpty)
  }

  test("rocAuc: differential vs brute-force pair counting, with ties") {
    val rnd = new scala.util.Random(4242)
    val rows = Seq.fill(400)(
      (math.floor(rnd.nextDouble() * 20) / 20.0, rnd.nextBoolean()))
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val want = math.floor(wins / (pos.size.toDouble * neg.size) * 1e6 + 0.5)
      .toLong
    assert(auc(rows).contains(want))
  }

  test("rocAuc: partitioning invariance") {
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(500)((rnd.nextDouble(), rnd.nextBoolean()))
      .toDF("score", "label")
    val a = Eval.rocAuc(df, "score", "label").collect().head
    val b = Eval.rocAuc(df.repartition(13), "score", "label").collect().head
    assert(a == b)
  }

  test("rocCurve: hand case — thresholds sweep (0,0)→(1,1), exact counts") {
    val df = Seq((0.8, true), (0.4, true), (0.6, false), (0.2, false))
      .toDF("score", "label")
    val got = Eval.rocCurve(df, "score", "label")
      .orderBy($"threshold".desc)
      .select("threshold", "tp", "fp", "tpr_micro", "fpr_micro")
      .as[(Double, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0.8, 1L, 0L, 500000L, 0L),
      (0.6, 1L, 1L, 500000L, 500000L),
      (0.4, 2L, 1L, 1000000L, 500000L),
      (0.2, 2L, 2L, 1000000L, 1000000L)))
  }

  test("rocCurve ≡ rocAuc: trapezoid area under the curve matches the " +
      "rank statistic") {
    val rnd = new scala.util.Random(99)
    val rows = Seq.fill(300)(
      (math.floor(rnd.nextDouble() * 10) / 10.0, rnd.nextInt(3) == 0))
    val df = rows.toDF("score", "label")
    val curve = Eval.rocCurve(df, "score", "label")
      .orderBy("threshold").select("tp", "fp")
      .as[(Long, Long)].collect().toSeq.reverse // ascending fp sweep
    val p = rows.count(_._2).toDouble
    val n = rows.size - p
    val pts = ((0L, 0L) +: curve).map { case (tp, fp) => (fp / n, tp / p) }
    val area = pts.sliding(2).map { case Seq((x0, y0), (x1, y1)) =>
      (x1 - x0) * (y0 + y1) / 2.0 }.sum
    val want = math.floor(area * 1e6 + 0.5).toLong
    assert(auc(rows).contains(want))
  }

  // -------------------------------------------------------- Platt scaling

  test("plattFit: separable data fits a steep positive slope and cuts " +
      "NLL far below the coin-flip ln 2; driver Newton replicate (r15)") {
    val rnd = new scala.util.Random(21)
    val rows = Seq.fill(600) {
      val s = math.floor(rnd.nextDouble() * 40) / 40.0
      (s, rnd.nextDouble() < (if (s > 0.5) 0.95 else 0.05))
    }
    val got = Eval.plattFit(rows.toDF("score", "label"), "score", "label")
      .collect().head
    assert(got.getLong(2) > 2000000L, s"slope must be steep: $got")
    assert(got.getLong(4) < math.log(2.0) * 1e9 / 2, s"nll: $got")
    // full driver replicate of the quantized Newton
    val grain = rows.groupBy(_._1).toSeq.map { case (s, xs) =>
      (s, xs.size.toLong, xs.count(_._2).toLong) }
    def nanoSum(f: ((Double, Long, Long)) => Double): Double =
      grain.map(t => math.floor(f(t) * 1e9 + 0.5).toLong).sum / 1e9
    var (a, b) = (0.0, 0.0)
    def pOf(s: Double) = {
      val sig = 1.0 / (1.0 + math.exp(-(a * s + b)))
      math.min(math.max(sig, 1e-15), 1.0 - 1e-15)
    }
    for (_ <- 1 to 8) {
      val g1 = nanoSum { case (s, n, y) => pOf(s) * n - y }
      val g2 = nanoSum { case (s, n, y) => s * (pOf(s) * n - y) }
      val h11 = nanoSum { case (s, n, _) => n * pOf(s) * (1.0 - pOf(s)) }
      val h12 = nanoSum { case (s, n, _) => s * (n * pOf(s) * (1.0 - pOf(s))) }
      val h22 = nanoSum { case (s, n, _) =>
        s * s * (n * pOf(s) * (1.0 - pOf(s))) }
      val det = h11 * h22 - h12 * h12
      if (math.abs(det) > 1e-12) {
        def clip(x: Double) = math.min(math.max(x, -1.0), 1.0)
        val na = a - clip((g2 * h11 - g1 * h12) / det)
        val nb = b - clip((g1 * h22 - g2 * h12) / det)
        a = na; b = nb
      }
    }
    assert(got.getLong(2) == math.floor(a * 1e6 + 0.5).toLong)
    assert(got.getLong(3) == math.floor(b * 1e6 + 0.5).toLong)
    val nll = nanoSum { case (s, n, y) =>
      -(y * math.log(pOf(s)) + (n - y) * math.log(1.0 - pOf(s))) }
    assert(got.getLong(4) ==
      math.floor(nll * 1e9 / rows.size + 0.5).toLong)
    graft.util.Caches.releaseAll()
  }

  test("plattFit: single-class input converges without a crash (clamped " +
      "probabilities); repartition invariance; knob guard") {
    val onesided = Seq.fill(50)((0.3, true)) ++ Seq.fill(30)((0.8, true))
    val r = Eval.plattFit(onesided.toDF("score", "label"), "score", "label")
      .collect().head
    assert(r.getLong(1) == 80L && r.getLong(4) >= 0L)
    val rnd = new scala.util.Random(14)
    val rows = Seq.fill(300)(
      (math.floor(rnd.nextDouble() * 20) / 20.0, rnd.nextBoolean()))
    val x = Eval.plattFit(rows.toDF("score", "label"), "score", "label")
      .collect().head
    val y = Eval.plattFit(rows.toDF("score", "label").repartition(9),
      "score", "label").collect().head
    assert(x == y)
    intercept[IllegalArgumentException] {
      Eval.plattFit(rows.toDF("score", "label"), "score", "label", iters = 0)
    }
    graft.util.Caches.releaseAll()
  }

  // ------------------------------------------------------ ranking metrics

  test("rankMetrics: hand case — MRR, NDCG with an unretrieved best doc, " +
      "p@k, recall (r15)") {
    val runs = Seq((1L, "A", 1L), (1L, "B", 2L), (1L, "C", 3L), (1L, "D", 4L))
      .toDF("q", "doc", "rnk")
    val qrels = Seq((1L, "B", 2.0), (1L, "D", 1.0), (1L, "E", 3.0))
      .toDF("q", "doc", "rel")
    val r = Eval.rankMetrics(runs, qrels, "q", "doc", "rnk", "rel", k = 4)
      .collect().head
    def nano(x: Double) = math.floor(x * 1e9 + 0.5)
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val dcg = nano(2.0 / log2(3.0)) + nano(1.0 / log2(5.0))
    val idcg = nano(3.0 / log2(2.0)) + nano(2.0 / log2(3.0)) +
      nano(1.0 / log2(4.0))
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 500000L, "MRR: first hit at rank 2")
    assert(r.getLong(4) == math.floor(dcg / idcg * 1e6 + 0.5).toLong)
    assert(r.getLong(5) == 500000L, "p@4 = 2/4")
    assert(r.getLong(6) == math.floor(2.0 / 3 * 1e6 + 0.5).toLong)
  }

  test("rankMetrics: perfect ranking scores NDCG 1; judgment-free query " +
      "reports NULL ndcg/recall, zero MRR; hits beyond k ignored") {
    val runs = Seq((1L, "A", 1L), (1L, "B", 2L),
      (2L, "X", 1L), (2L, "Y", 2L),
      (3L, "P", 1L), (3L, "Q", 2L), (3L, "R", 3L)).toDF("q", "doc", "rnk")
    val qrels = Seq((1L, "A", 3.0), (1L, "B", 1.0),
      (3L, "R", 1.0)).toDF("q", "doc", "rel")
    val got = Eval.rankMetrics(runs, qrels, "q", "doc", "rnk", "rel", k = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(4) == 1000000L, "best-first run is NDCG 1")
    val q2 = got(2L)
    assert(q2.getLong(1) == 0L && q2.getLong(3) == 0L &&
      q2.isNullAt(4) && q2.isNullAt(6))
    // q3's only relevant doc sits at rank 3 > k=2: no hits at the cut
    val q3 = got(3L)
    assert(q3.getLong(2) == 0L && q3.getLong(3) == 0L && q3.getLong(4) == 0L)
  }

  test("rankMetrics: repartition invariance") {
    val rnd = new scala.util.Random(13)
    val runs = (for (q <- 1 to 20; r <- 1 to 10)
      yield (q.toLong, s"d${rnd.nextInt(50)}-$q-$r", r.toLong))
      .toDF("q", "doc", "rnk")
    val qrels = (for (q <- 1 to 20; d <- 1 to 30)
      yield (q.toLong, s"d$d-$q-${rnd.nextInt(10) + 1}",
        rnd.nextInt(3).toDouble)).distinct.toDF("q", "doc", "rel")
    val a = Eval.rankMetrics(runs, qrels, "q", "doc", "rnk", "rel", 10)
      .collect().toSet
    val b = Eval.rankMetrics(runs.repartition(7), qrels.repartition(5),
      "q", "doc", "rnk", "rel", 10).collect().toSet
    assert(a == b)
  }

  // --------------------------------------------------- average precision

  private def ap(rows: Seq[(Double, Boolean)]): Option[Long] = {
    val r = Eval.averagePrecision(rows.toDF("score", "label"),
      "score", "label").collect().head
    if (r.isNullAt(2)) None else Some(r.getLong(2))
  }

  test("averagePrecision: hand cases — perfect, interleaved, tie block " +
      "(r15)") {
    // perfect ranking → AP 1
    assert(ap(Seq((0.9, true), (0.8, true), (0.2, false)))
      .contains(1000000L))
    // ranking pos,neg,pos: terms 1·(1/1) + 1·(2/3) → AP = 5/6 ≈ 833333µ
    assert(ap(Seq((0.9, true), (0.5, false), (0.4, true)))
      .contains(833333L))
    // one tie block of 1 pos + 1 neg → AP = 1·(1/2)/1 = 0.5
    assert(ap(Seq((0.5, true), (0.5, false))).contains(500000L))
  }

  test("averagePrecision: no positives → NULL; all positives → 1") {
    assert(ap(Seq((0.9, false), (0.1, false))).isEmpty)
    assert(ap(Seq((0.9, true), (0.1, true))).contains(1000000L))
  }

  test("averagePrecision: differential vs a driver-side block replay, " +
      "and repartition invariance") {
    val rnd = new scala.util.Random(31)
    val rows = Seq.fill(500)(
      (math.floor(rnd.nextDouble() * 15) / 15.0, rnd.nextInt(4) == 0))
    val p = rows.count(_._2).toDouble
    val blocks = rows.groupBy(_._1).toSeq.sortBy(-_._1)
    var cumTp = 0L; var cumN = 0L; var acc = 0.0
    blocks.foreach { case (_, b) =>
      val posAt = b.count(_._2)
      cumTp += posAt; cumN += b.size
      acc += math.floor(posAt * (cumTp.toDouble / cumN) * 1e9 + 0.5) / 1e9
    }
    val want = math.floor(acc / p * 1e6 + 0.5).toLong
    assert(ap(rows).contains(want))
    val df = rows.toDF("score", "label").repartition(11)
    assert(Eval.averagePrecision(df, "score", "label").collect().head
      .getLong(2) == want)
  }

  test("prCurve: hand case — exact counts and rates per threshold, " +
      "recall monotone along the sweep (r16)") {
    val df = Seq((0.9, true), (0.8, false), (0.8, true), (0.5, false),
      (0.3, true)).toDF("score", "label")
    val got = Eval.prCurve(df, "score", "label")
      .orderBy($"threshold".desc)
      .as[(Double, Long, Long, Long, Long)].collect()
    // threshold 0.9: tp=1 fp=0 → P=1.0 R=1/3; 0.8: tp=2 fp=1; 0.5: tp=2
    // fp=2; 0.3: tp=3 fp=2
    assert(got.toSeq == Seq(
      (0.9, 1L, 0L, 1000000L, 333333L),
      (0.8, 2L, 1L, 666667L, 666667L),
      (0.5, 2L, 2L, 500000L, 666667L),
      (0.3, 3L, 2L, 600000L, 1000000L)))
    val recalls = got.map(_._5)
    assert(recalls.sameElements(recalls.sorted))
    // positives-free corpus: recall NULL, precision still defined
    val neg = Seq((0.9, false), (0.1, false)).toDF("score", "label")
    assert(Eval.prCurve(neg, "score", "label").collect()
      .forall(r => r.isNullAt(4) && !r.isNullAt(3)))
  }

  test("brierDecomposition: perfect scorer → 0; constant base-rate " +
      "scorer → brier = uncertainty, resolution 0; identity holds on a " +
      "mixed corpus within binning error (r16)") {
    val perfect = Seq((1.0, true), (0.0, false), (1.0, true), (0.0, false))
      .toDF("score", "label")
    val p = Eval.brierDecomposition(perfect, "score", "label").collect().head
    assert(p.getLong(2) == 0L && p.getLong(3) == 0L)
    // constant 0.5 on a 50/50 corpus: brier = 0.25 = uncertainty, rel 0
    val const = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
      .toDF("score", "label")
    val c = Eval.brierDecomposition(const, "score", "label").collect().head
    assert(c.getLong(2) == 250000000L && c.getLong(3) == 0L &&
      c.getLong(4) == 0L && c.getLong(5) == 250000000L)
    val rnd = new scala.util.Random(17)
    val mixed = Seq.fill(500) {
      val s = rnd.nextDouble(); (s, rnd.nextDouble() < s)
    }.toDF("score", "label")
    val m = Eval.brierDecomposition(mixed, "score", "label").collect().head
    val (brier, rel, res, unc) =
      (m.getLong(2), m.getLong(3), m.getLong(4), m.getLong(5))
    // Murphy identity up to within-bin variance (binning error ≤ ~1/bins²)
    assert(math.abs(brier - (rel - res + unc)) < 15000000L,
      s"decomposition off: $brier vs ${rel - res + unc}")
    // repartition invariance on every reported value
    assert(Eval.brierDecomposition(mixed.repartition(7), "score", "label")
      .collect().head == m)
  }

  test("logLoss: near-perfect scorer ≈ 0; constant 0.5 = ln 2; certainty " +
      "on the wrong side clamps finite (r16)") {
    val good = Seq((1.0, true), (0.0, false)).toDF("score", "label")
    // clamp leaves -ln(1 - 1e-15) ≈ 1e-15 → 0 nanos
    assert(Eval.logLoss(good, "score", "label").collect().head
      .getLong(2) == 0L)
    val const = Seq((0.5, true), (0.5, false), (0.5, true))
      .toDF("score", "label")
    assert(Eval.logLoss(const, "score", "label").collect().head
      .getLong(2) == math.floor(math.log(2.0) * 1e9 + 0.5).toLong)
    val wrong = Seq((0.0, true)).toDF("score", "label")
    val w = Eval.logLoss(wrong, "score", "label").collect().head.getLong(2)
    assert(w > 0L && w == math.floor(-math.log(1e-15) * 1e9 + 0.5).toLong)
  }

  test("cohenKappa: perfect agreement κ = 1; a constant predictor κ = 0; " +
      "hand case matches the closed form (r16)") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a"))
      .toDF("label", "predicted")
    assert(Eval.cohenKappa(perfect, "label", "predicted").collect().head
      .getLong(3) == 1000000L)
    val const = Seq(("a", "a"), ("b", "a"), ("a", "a"), ("b", "a"))
      .toDF("label", "predicted")
    assert(Eval.cohenKappa(const, "label", "predicted").collect().head
      .getLong(3) == 0L)
    // hand case: po = 3/5, pe = (3*3 + 2*2)/25 = 13/25
    val hand = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "a"))
      .toDF("label", "predicted")
    val h = Eval.cohenKappa(hand, "label", "predicted").collect().head
    val (po, pe) = (3.0 / 5.0, 13.0 / 25.0)
    assert(h.getLong(1) == 600000L && h.getLong(2) == 520000L)
    assert(h.getLong(3) ==
      math.floor((po - pe) / (1.0 - pe) * 1e6 + 0.5).toLong)
    // both sides constant and equal: pe = 1 → NULL, not 0/0
    val degen = Seq(("a", "a"), ("a", "a")).toDF("label", "predicted")
    assert(Eval.cohenKappa(degen, "label", "predicted").collect().head
      .isNullAt(3))
    graft.util.Caches.releaseAll()
  }
}
