package graft

import org.apache.spark.sql.functions._
import graft.ops.{Outliers, Sampling, Scd2, Windows}

/** SCD2 intervals, Tukey-fence outliers, per-key quotas, max drawdown. */
class TemporalOutlierSpec extends SparkSpec {
  import spark.implicits._

  test("scd2 intervals tile the timeline per key, half-open, one current row") {
    val log = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 15L, "x")
    ).toDF("k", "ts", "v")
    val out = Scd2.intervals(log, Seq("k"), "ts", tieBreak = Seq("v"))
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(out == Set(
      (1L, "a", 10L, Some(20L), false),
      (1L, "b", 20L, Some(30L), false),
      (1L, "c", 30L, None, true),
      (2L, "x", 15L, None, true)))
  }

  test("scd2 ties in one tick stay total via the tie-break column") {
    val log = Seq((1L, 10L, "a"), (1L, 10L, "b")).toDF("k", "ts", "v")
    val out = Scd2.intervals(log, Seq("k"), "ts", tieBreak = Seq("v"))
      .select("v", "valid_to", "is_current")
      .as[(String, Option[Long], Boolean)].collect().toSet
    // "a" gets the zero-length interval, "b" wins the instant and is current
    assert(out == Set(("a", Some(10L), false), ("b", None, true)))
  }

  test("tagIqr flags exactly the values outside the fences") {
    // 20 inliers 1..20 and one far spike per side
    val vals = ((1 to 20).map(_.toDouble) ++ Seq(-1000.0, 1000.0))
    val df = vals.toDF("v").withColumn("g", lit("all"))
    val flagged = Outliers.tagIqr(df, Seq("g"), "v")
      .filter(col("is_outlier")).select("v").as[Double].collect().toSet
    assert(flagged == Set(-1000.0, 1000.0))
  }

  test("approx IQR path: fences within tolerance of exact, flags identical away from the band") {
    // Differential over real skewed data (price×qty, the q89 column): the
    // approx_percentile sketch at the default accuracy must land each fence
    // within 2% of the exact IQR span, and every row farther than that band
    // from BOTH exact fences must get the same flag either way — i.e. the
    // approx path can only ever disagree inside the sketch's error band.
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .withColumn("gross", $"l_extendedprice" * $"l_quantity")
    val approxFences = Outliers
      .tagIqr(li, Seq("l_returnflag"), "gross", approx = true)
      .select($"l_returnflag", $"lo".as("lo_a"), $"hi".as("hi_a")).distinct()
    val both = Outliers.tagIqr(li, Seq("l_returnflag"), "gross")
      .join(broadcast(approxFences), "l_returnflag")
    val fenceRows = both.select("l_returnflag", "lo", "hi", "lo_a", "hi_a")
      .distinct().collect()
    assert(fenceRows.length == 3)
    fenceRows.foreach { r =>
      val span = r.getDouble(2) - r.getDouble(1)
      assert(span > 0)
      assert(math.abs(r.getDouble(3) - r.getDouble(1)) <= 0.02 * span,
        s"lo fence drift too large: $r")
      assert(math.abs(r.getDouble(4) - r.getDouble(2)) <= 0.02 * span,
        s"hi fence drift too large: $r")
    }
    val band = ($"hi" - $"lo") * 0.02
    val away = both.filter(abs($"gross" - $"lo") > band && abs($"gross" - $"hi") > band)
    assert(away.count() > 0, "band must not swallow the whole table")
    val mismatches = away
      .filter(($"gross" < $"lo_a" || $"gross" > $"hi_a") =!= $"is_outlier")
      .count()
    assert(mismatches == 0, s"$mismatches flags differ away from the fence band")
  }

  test("quotaPerKey caps each key, passes small keys through, and is stable") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val got = Sampling.quotaPerKey(docs, Seq("source"), "doc_id", 10)
    val counts = got.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ <= 10))
    // keys under quota keep every row
    val small = Sampling.quotaPerKey(docs.limit(5), Seq("source"), "doc_id", 10)
    assert(small.count() == 5)
    // membership is repartition-stable
    val a = got.select("doc_id").as[Long].collect().toSet
    val b = Sampling.quotaPerKey(docs.repartition(13), Seq("source"), "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("maxDrawdown finds the deepest peak-to-trough fall") {
    // peak 100 → trough 60 (dd −0.4), later peak 120 → 90 (dd −0.25)
    val px = Seq((1L, 1L, 100.0), (1L, 2L, 80.0), (1L, 3L, 60.0),
      (1L, 4L, 120.0), (1L, 5L, 90.0),
      (2L, 1L, 50.0), (2L, 2L, 55.0) // monotone up: drawdown 0
    ).toDF("k", "t", "v")
    val out = Windows.maxDrawdown(px, Seq("k"), Seq(col("t")), "v")
      .as[(Long, Double, Double)].collect().toMap2
    assert(out(1L) == ((-0.4, 120.0)))
    assert(out(2L) == ((0.0, 55.0)))
  }

  test("tagRobustZ flags spikes, survives zero MAD, guards the division") {
    // 20 inliers + two far spikes: MAD is driven by the inliers, spikes flag
    val vals = ((1 to 20).map(_.toDouble) ++ Seq(-1000.0, 1000.0))
    val df = vals.toDF("v").withColumn("g", lit("all"))
    val flagged = Outliers.tagRobustZ(df, Seq("g"), "v")
      .filter(col("is_outlier")).select("v").as[Double].collect().toSet
    assert(flagged == Set(-1000.0, 1000.0))
    // the approx sketch path flags the same spikes
    val approxFlagged = Outliers.tagRobustZ(df, Seq("g"), "v", approx = true)
      .filter(col("is_outlier")).select("v").as[Double].collect().toSet
    assert(approxFlagged == Set(-1000.0, 1000.0))
    // ≥50% identical values → MAD 0 → null score, nothing flagged, no throw
    val flat = (Seq.fill(10)(5.0) ++ Seq(5.0, 9.0)).toDF("v")
      .withColumn("g", lit("all"))
    val out = Outliers.tagRobustZ(flat, Seq("g"), "v")
    assert(out.filter(col("is_outlier")).count() == 0)
    assert(out.filter(col("robust_z").isNotNull).count() == 0)
  }

  test("mixToBudget: fractions follow the token totals, samples nest across budgets") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val tok = graft.functions.TextFunctions.tokenCount(col("text"))
    val totals = docs.groupBy("lang")
      .agg(sum(tok.cast("long")).as("tot"))
      .as[(String, Long)].collect().toMap
    val small = Sampling.mixToBudget(docs, "lang", "doc_id", tok,
      Map("en" -> 0.6, "zh" -> 0.4), targetTokens = 5000L)
    val big = Sampling.mixToBudget(docs, "lang", "doc_id", tok,
      Map("en" -> 0.6, "zh" -> 0.4), targetTokens = 20000L)
    // kept tokens per source land near the weighted budget (binomial noise)
    val kept = small.groupBy("lang").agg(sum(tok.cast("long")).as("k"))
      .as[(String, Long)].collect().toMap
    for ((langName, w) <- Seq("en" -> 0.6, "zh" -> 0.4)) {
      val want = math.min(w * 5000L, totals(langName).toDouble)
      assert(math.abs(kept.getOrElse(langName, 0L) - want) <= want * 0.5 + 200,
        s"$langName kept ${kept.get(langName)} vs target $want")
    }
    // unweighted sources are dropped entirely (default = 0)
    assert(small.filter(!col("lang").isin("en", "zh")).count() == 0)
    // nesting: the smaller budget's membership is a subset of the larger's
    val smallIds = small.select("doc_id").as[Long].collect().toSet
    val bigIds = big.select("doc_id").as[Long].collect().toSet
    assert(smallIds.subsetOf(bigIds))
  }

  test("winsorize clamps into the percentile band, keeps every row") {
    // values 1..20 plus two spikes; p05/p95 band swallows the spikes
    val vals = ((1 to 20).map(_.toDouble) ++ Seq(-1000.0, 1000.0))
    val df = vals.toDF("v").withColumn("g", lit("all"))
    val out = Outliers.winsorize(df, Seq("g"), "v", lo = 0.05, hi = 0.95)
    assert(out.count() == vals.length) // nothing dropped
    val (plo, phi) = out.agg(min($"v_w"), max($"v_w"))
      .as[(Double, Double)].head()
    // clamp bounds are the exact p05/p95 of the data (DuckDB-parity
    // percentile), and everything inside the band is untouched
    assert(out.filter($"v" >= plo && $"v" <= phi && $"v_w" =!= $"v").count() == 0)
    assert(out.filter($"v" === -1000.0).select("v_w").as[Double].head() == plo)
    assert(out.filter($"v" === 1000.0).select("v_w").as[Double].head() == phi)
    // approx path: same clamp semantics relative to its own band
    val approx = Outliers.winsorize(df, Seq("g"), "v", lo = 0.05, hi = 0.95,
      approx = true)
    assert(approx.count() == vals.length)
    assert(approx.agg(max($"v_w")).as[Double].head() < 1000.0)
  }

  test("scoreDocs: boilerplate scores lower than unique prose, bigram counts right") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),  // fully predictable
      (2L, "the quick brown fox jumps high"), // every bigram unique
      (3L, "x")                               // sub-bigram: no score row
    ).toDF("doc_id", "text")
    val out = graft.ops.LmStats.scoreDocs(docs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "bits_per_bigram")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 5 && out(2L)._1 == 5)
    assert(out(1L)._2 < out(2L)._2,
      s"repetitive doc must be more predictable: $out")
    graft.util.Caches.releaseAll()
  }

  test("scoreDocsAgainst: cross-corpus novelty with two-level backoff (r15)") {
    // ref bigrams: (a,b)×2, (b,c)×2, (c,a)×1 — V = |{b,c,a}| = 3
    val ref = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),  // seen pair:        p = 2.5/3.5
      (2L, "x y"),  // unseen CONTEXT:   p = 0.5/1.5 = 1/3 (uniform)
      (3L, "a z")   // seen context, unseen successor: p = 0.5/3.5 — the
                    // two-level backoff: c1=2 must join even when the
                    // (w1,w2) pair misses
    ).toDF("doc_id", "text")
    val out = graft.ops.LmStats.scoreDocsAgainst(docs, "doc_id", "text",
        ref, "text")
      .select("doc_id", "n_bigrams", "bits_per_bigram")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def bits(p: Double): Double =
      math.round(-math.log(p) / math.log(2.0) * 1e12) / 1e12
    def r6(x: Double): Double = math.round(x * 1e6) / 1e6
    assert(out(1L) == ((1L, r6(bits(2.5 / 3.5)))))
    assert(out(2L) == ((1L, r6(bits(0.5 / 1.5)))))
    assert(out(3L) == ((1L, r6(bits(0.5 / 3.5)))), s"got ${out(3L)}")
    // novelty orders: in-distribution < uniform-unseen < ... and the
    // seen-context unseen-successor is the MOST surprising here (its
    // denominator carries the context mass)
    assert(out(1L)._2 < out(2L)._2 && out(2L)._2 < out(3L)._2)
    graft.util.Caches.releaseAll()
  }

  test("charEntropy: analytic truths, both junk tails flagged (r15)") {
    val docs = Seq(
      (1L, "aaaaaaaa"),              // one symbol: H = 0
      (2L, "abcdefgh"),              // 8 distinct once each: H = ln 8
      (3L, "aabb"),                  // two symbols, even: H = ln 2
      (4L, "the cat sat on the mat") // natural-ish: between the tails
    ).toDF("doc_id", "text")
    val out = graft.ops.LmStats.charEntropy(docs, "doc_id", "text")
      .select("doc_id", "n_chars", "entropy_micro")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def micro(h: Double): Long = math.floor(h * 1e6 + 0.5).toLong
    assert(out(1L) == ((8L, 0L)))
    assert(out(2L) == ((8L, micro(math.log(8.0)))))
    assert(out(3L) == ((4L, micro(math.log(2.0)))))
    // natural text sits well above the repetitive tail (0); the
    // random-blob tail is a RELATIVE property — a doc approaching
    // uniform-over-alphabet for its length maxes out, as doc 2 does
    assert(out(1L)._2 < out(4L)._2, s"natural above repetitive: $out")
    // partitioning cannot move the decimal-accumulated term sum
    val big = spark.range(1000)
      .selectExpr("id % 7 AS doc_id",
        "concat(repeat('x', CAST(id % 13 AS INT)), ' word ', CAST(id AS STRING)) AS text")
    val a = graft.ops.LmStats.charEntropy(big, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = graft.ops.LmStats.charEntropy(big.repartition(11), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("bigram conditionals: counts exact, P(.|w1) sums to 1") {
    val docs = Seq("a b a c", "a b").toDF("text")
    val out = graft.ops.LmStats.bigramConditionals(docs, "text", minCount = 1L)
      .select("w1", "w2", "c12", "c1", "p")
      .as[(String, String, Long, Long, Double)].collect()
    val byPair = out.map(r => (r._1, r._2) -> r).toMap
    assert(byPair(("a", "b")) == (("a", "b", 2L, 3L, 2.0 / 3)))
    assert(byPair(("a", "c")) == (("a", "c", 1L, 3L, 1.0 / 3)))
    assert(byPair(("b", "a")) == (("b", "a", 1L, 1L, 1.0)))
    // conditionals are a distribution per context
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-12)
    }
  }

  test("keepRepresentative keeps the best row per group plus all singletons") {
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L), // group A: 2 wins (longer, then min id)
      (4L, 5L),                        // singleton
      (5L, 9L), (6L, 1L)               // group B: 5 wins
    ).toDF("doc_id", "n_chars")
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("id", "component")
    val kept = graft.ops.Dedup.keepRepresentative(docs, comp, "doc_id",
        Seq(col("n_chars").desc, col("doc_id")))
      .select("component", "doc_id", "group_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(kept == Set((1L, 2L, 3L), (4L, 4L, 1L), (5L, 5L, 2L)))
    // a docs table whose key is literally named "id" must resolve cleanly
    // against the components frame's own "id" column
    val docsId = docs.withColumnRenamed("doc_id", "id")
    val keptId = graft.ops.Dedup.keepRepresentative(docsId, comp, "id",
        Seq(col("n_chars").desc, col("id")))
      .select("component", "id", "group_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(keptId == kept)
    // reserved output names are rejected, not clobbered
    intercept[IllegalArgumentException] {
      graft.ops.Dedup.keepRepresentative(docs.withColumn("component", lit(0L)),
        comp, "doc_id", Seq(col("doc_id")))
    }
  }

  test("edge cases: empty/single-row inputs and constant series") {
    // SCD2 on empty input: empty output, schema intact
    val emptyLog = Seq.empty[(Long, Long, String)].toDF("k", "ts", "v")
    val scd = Scd2.intervals(emptyLog, Seq("k"), "ts")
    assert(scd.count() == 0)
    assert(scd.columns.toSet ==
      Set("k", "ts", "v", "valid_from", "valid_to", "is_current"))
    // single-row group: fences collapse to the value, nothing is flagged
    val one = Seq((42.0, "g")).toDF("v", "g")
    assert(Outliers.tagIqr(one, Seq("g"), "v").filter(col("is_outlier")).count() == 0)
    // single observation: drawdown 0, peak = the value
    val dd = Windows.maxDrawdown(Seq((1L, 1L, 7.0)).toDF("k", "t", "v"),
      Seq("k"), Seq(col("t")), "v").as[(Long, Double, Double)].head()
    assert(dd == ((1L, 0.0, 7.0)))
    // constant paired series: zero variance → NULL corr, not a crash (ANSI)
    val flat = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("b", 1L, 5.0), ("b", 2L, 5.0))
      .toDF("k", "b", "v")
    val corr = graft.ops.Aggregates.pairwiseCorr(flat, "k", col("b"), "v")
      .select("corr").collect()
    assert(corr.length == 1 && corr.head.isNullAt(0))
    // sub-bigram docs contribute nothing
    assert(graft.ops.LmStats.bigramConditionals(
      Seq("one", "").toDF("text"), "text", 1L).count() == 0)
  }

  private implicit class Tup3Ops[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
