package graft

import org.apache.spark.sql.functions._
import graft.ops.{Funnels, Indicators, Joins, Profile}

/** Hand-checkable semantics for the event-analytics and indicator
  * operators (funnel, cohort retention, Bollinger, RSI, TF-IDF, fuzzy
  * pairs). The sf0.01 oracle gate proves engine parity; these pin the
  * DEFINITIONS on inputs small enough to verify by hand.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String, Long)*) =
    rows.toDF("user_id", "ts", "event_type", "event_id")
      .withColumn("ts", $"ts".cast("timestamp"))

  test("funnel: strict-after ordering, drop-off monotone, conv vs step 1") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 1),
      (1L, "2024-01-01 11:00:00", "click", 2),
      (1L, "2024-01-01 12:00:00", "purchase", 3),   // full path
      (2L, "2024-01-01 10:00:00", "view", 4),
      (2L, "2024-01-01 09:00:00", "click", 5),      // click BEFORE view: no advance
      (3L, "2024-01-02 08:00:00", "view", 6),
      (3L, "2024-01-02 09:00:00", "click", 7),      // stops at click
      (4L, "2024-01-03 08:00:00", "click", 8))      // never viewed
    val out = Funnels.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step")
      .select($"step", $"step_name", $"n_users", $"conv")
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1, "view", 3L, 1.0),
      (2, "click", 2L, 2.0 / 3.0),
      (3, "purchase", 1L, 1.0 / 3.0)))
  }

  test("funnelTimes wide + within-window gate + latency percentiles") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 1),
      (1L, "2024-01-01 10:30:00", "click", 2),   // 30 min after view
      (2L, "2024-01-01 10:00:00", "view", 3),
      (2L, "2024-01-01 12:00:00", "click", 4))   // 2 h after view
    val wide = Funnels.funnelTimes(events, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .orderBy("user_id")
      .select($"user_id", $"t_1".cast("string"), $"t_2".cast("string"))
      .as[(Long, String, String)].collect().toSeq
    assert(wide == Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:30:00"),
      (2L, "2024-01-01 10:00:00", "2024-01-01 12:00:00")))
    // within 1h: user 2's click is too late → t_2 null, count drops
    val gated = Funnels.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click"), withinSeconds = Some(3600L))
      .orderBy("step").select($"n_users").as[Long].collect().toSeq
    assert(gated == Seq(2L, 1L))
    // latency: deltas 1800s and 7200s → p50 = 4500 (midpoint), n = 2
    val lat = Funnels.funnelLatency(events, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .select($"step", $"n_users", $"p50_s").as[(Int, Long, Double)].head()
    assert(lat == ((2, 2L, 4500.0)))
  }

  test("funnel: boundary tie (same timestamp) does not advance the step") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 1),
      (1L, "2024-01-01 10:00:00", "click", 2)) // tie → not strictly after
    val out = Funnels.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click")).orderBy("step")
      .select($"n_users").as[Long].collect().toSeq
    assert(out == Seq(1L, 0L))
  }

  test("cohortRetention: offsets are whole weeks, retention vs offset 0") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 1),  // cohort week of Jan 1 (Monday)
      (1L, "2024-01-10 10:00:00", "view", 2),  // week offset 1
      (1L, "2024-01-16 10:00:00", "view", 3),  // week offset 2
      (2L, "2024-01-03 10:00:00", "view", 4),  // same cohort
      (2L, "2024-01-09 10:00:00", "view", 5),  // offset 1
      (3L, "2024-01-08 10:00:00", "view", 6))  // next cohort, only offset 0
    val out = Funnels.cohortRetention(events, "user_id", "ts", "week")
      .orderBy("cohort", "period_offset")
      .select(date_format($"cohort", "yyyy-MM-dd"), $"period_offset",
        $"n_users", $"retention")
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 0, 2L, 1.0),
      ("2024-01-01", 1, 2L, 1.0),
      ("2024-01-01", 2, 1L, 0.5),
      ("2024-01-08", 0, 1L, 1.0)))
  }

  test("bollinger: full-window bands only; hand-checked mean/sd; flat sd=0") {
    val bars = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0), (1L, 4L, 4.0),
        (2L, 1L, 5.0), (2L, 2L, 5.0), (2L, 3L, 5.0))
      .toDF("k", "seq", "v")
    val out = Indicators.bollinger(bars, Seq("k"), Seq(col("seq")), "v",
        n = 3, width = 2.0)
      .orderBy("k", "seq")
      .select($"k", $"seq", $"mid", $"sd", $"upper", $"lower")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    // k=1: windows [1,2,3] and [2,3,4] → mean 2/3, sample sd 1
    assert(out(0) == (1L, 1L, None, None, None, None))
    assert(out(1) == (1L, 2L, None, None, None, None))
    assert(out(2) == (1L, 3L, Some(2.0), Some(1.0), Some(4.0), Some(0.0)))
    assert(out(3) == (1L, 4L, Some(3.0), Some(1.0), Some(5.0), Some(1.0)))
    // k=2: constant series → sd exactly 0 (clamped identity, no NaN)
    assert(out(6) == (2L, 3L, Some(5.0), Some(0.0), Some(5.0), Some(5.0)))
  }

  test("rsi: pure up=100, pure down=0, mixed hand value, flat=null") {
    val bars = Seq(
      (1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0),   // up, up → 100
      (2L, 1L, 3.0), (2L, 2L, 2.0), (2L, 3L, 1.0),   // down, down → 0
      (3L, 1L, 1.0), (3L, 2L, 4.0), (3L, 3L, 3.0),   // +3, −1 → 75
      (4L, 1L, 2.0), (4L, 2L, 2.0), (4L, 3L, 2.0))   // flat → null
      .toDF("k", "seq", "v")
    val out = Indicators.rsi(bars, Seq("k"), Seq(col("seq")), "v", n = 2)
      .orderBy("k", "seq").select($"k", $"seq", $"rsi")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(out.filter(_._2 < 3).forall(_._3.isEmpty)) // warmup rows: no rsi
    assert(out(2) == (1L, 3L, Some(100.0)))
    assert(out(5) == (2L, 3L, Some(0.0)))
    assert(out(8) == (3L, 3L, Some(75.0)))
    assert(out(11) == (4L, 3L, None))
  }

  test("profile: typed min/max routing, null and distinct counts") {
    val df = Seq(
      (Some(1L), Some("b"), Some("2024-01-02 00:00:00")),
      (Some(5L), None, Some("2024-03-01 12:00:00")),
      (None, Some("a"), None))
      .toDF("n", "s", "t").withColumn("t", $"t".cast("timestamp"))
    val out = Profile.profile(df).orderBy("col_name").collect()
    val Array(n, s, t) = out
    assert(n.getAs[String]("col_name") == "n" && n.getAs[Long]("n_rows") == 3 &&
      n.getAs[Long]("n_nulls") == 1 && n.getAs[Long]("n_distinct") == 2 &&
      n.getAs[Double]("min_num") == 1.0 && n.getAs[Double]("max_num") == 5.0 &&
      n.isNullAt(n.fieldIndex("min_str")))
    assert(s.getAs[String]("min_str") == "a" && s.getAs[String]("max_str") == "b" &&
      s.isNullAt(s.fieldIndex("min_num")) && s.getAs[Long]("n_nulls") == 1)
    // timestamps profile as epoch micros (a cast, not a string format):
    // 2024-01-02 00:00:00 UTC = 1 704 153 600 s
    assert(t.getAs[Double]("min_num") == 1.7041536e15)
  }

  test("sequenceMatch: order, anchors, and negation semantics") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 1),
      (1L, "2024-01-01 11:00:00", "purchase", 2),   // v then p, no e → match
      (2L, "2024-01-01 10:00:00", "error", 3),
      (2L, "2024-01-01 11:00:00", "purchase", 4),   // e before p → no match
      (3L, "2024-01-01 10:00:00", "view", 5),       // no purchase at all
      (4L, "2024-01-01 10:00:00", "purchase", 6),   // p immediately → match
      (4L, "2024-01-01 11:00:00", "error", 7))      // error AFTER p is fine
    val out = Funnels.sequenceMatch(events, "user_id", "ts", "event_id",
        "event_type", "^[^e]*p")
      .orderBy("user_id").select($"user_id", $"seq", $"n_events")
      .as[(Long, String, Int)].collect().toSeq
    assert(out == Seq((1L, "vp", 2), (4L, "pe", 2)))
  }

  test("fuzzyPairs: blocked compare only, distance band respected") {
    val names = Seq(
      (1L, "red widget"), (2L, "bed widget"), (3L, "blue widget"),
      (4L, "red gadget"), (5L, "red widget"))
      .toDF("id", "name")
    val out = Joins.fuzzyPairs(names, "id", "name",
        element_at(split(col("name"), " "), -1), maxDist = 3)
      .orderBy("id_a", "id_b")
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Int)].collect().toSeq
    // (1,2) red/bed dist 1; (2,3) bed/blue dist 3; (2,5) dist 1;
    // red/blue is dist 4 → (1,3),(3,5) out; (4,*) different block;
    // (1,5) identical → dist 0 excluded by minDist=1
    assert(out == Seq((1L, 2L, 1), (2L, 3L, 3), (2L, 5L, 1)))
  }

  test("bandJoinGrid ≡ broadcast bandJoin, including boundary values") {
    val fact = Seq(0.0, 9.99, 10.0, 19.5, 25.0, 39.9, 40.0, 99.9, 100.0, 150.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val bands = Seq(("b0", 0.0, 10.0), ("b1", 10.0, 40.0), ("b4", 40.0, 100.0))
      .toDF("band", "lo", "hi")
    // cellWidth deliberately NOT aligned with band edges
    val grid = graft.ops.Joins.bandJoinGrid(fact, bands, col("v"),
        col("lo"), col("hi"), cellWidth = 7.0)
      .select($"id", $"band").as[(Long, String)].collect().toSet
    val bcast = graft.ops.Joins.bandJoin(fact, bands, col("v"),
        col("lo"), col("hi"))
      .select($"id", $"band").as[(Long, String)].collect().toSet
    assert(grid == bcast)
    // half-open semantics: 100.0 and 150.0 match nothing; 40.0 is in b4
    assert(!grid.exists(p => p._1 == 8 || p._1 == 9))
    assert(grid.contains((6L, "b4")))
  }

  test("intervalJoinGrid: exact overlap pairs, no duplicates across cells") {
    val a = Seq((1L, 0.0, 10.0), (2L, 5.0, 25.0), (3L, 30.0, 31.0))
      .toDF("a_id", "as_", "ae")
    val b = Seq((10L, 9.0, 12.0), (11L, 24.0, 40.0), (12L, 10.0, 11.0))
      .toDF("b_id", "bs", "be")
    // cellWidth 3 → interval (2) spans 8 cells, pair (2,11) shares several
    val out = graft.ops.Joins.intervalJoinGrid(a, b, "as_", "ae", "bs", "be",
        cellWidth = 3.0)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toList
    // naive oracle: ls < re && rs < le, half-open
    val expected = for {
      (ai, s1, e1) <- Seq((1L, 0.0, 10.0), (2L, 5.0, 25.0), (3L, 30.0, 31.0))
      (bi, s2, e2) <- Seq((10L, 9.0, 12.0), (11L, 24.0, 40.0), (12L, 10.0, 11.0))
      if s1 < e2 && s2 < e1
    } yield (ai, bi)
    assert(out.sorted == expected.sorted.toList) // == also proves NO dup emits
    // half-open: interval 1 = [0,10) does NOT meet 12 = [10,11)
    assert(!out.contains((1L, 12L)))
  }

  test("equalFrequency: quartile bins populated evenly, ties go up") {
    val df = (1 to 8).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = graft.ops.Binning.equalFrequency(df, Seq("g"), "v", nBins = 4)
      .orderBy("v").select($"v", $"bin").as[(Double, Int)].collect().toSeq
    // fences at p25/p50/p75 of 1..8 = (2.75, 4.5, 6.25) → 2 values per bin
    assert(out.map(_._2) == Seq(0, 0, 1, 1, 2, 2, 3, 3))
    // a value exactly ON a fence starts the next bin
    val tied = graft.ops.Binning.equalFrequency(
      Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)).toDF("g", "v"), Seq("g"), "v", 2)
      .filter($"v" === 2.0).select($"bin").as[Int].head()
    assert(tied == 1) // p50 of {1,2,3} is exactly 2.0 → bin 1
  }

  test("null handling: null value gets null bin; null in window kills band") {
    val df = Seq(("g", Some(1.0)), ("g", Some(2.0)), ("g", Some(3.0)),
      ("g", Some(4.0)), ("g", None)).toDF("g", "v")
    val bins = graft.ops.Binning.equalFrequency(df, Seq("g"), "v", 2)
      .filter($"v".isNull).select($"bin").as[Option[Int]].collect().toSeq
    assert(bins == Seq(None)) // not silently bin 0
    val bars = Seq((1L, 1L, Some(1.0)), (1L, 2L, None), (1L, 3L, Some(3.0)),
      (1L, 4L, Some(4.0)), (1L, 5L, Some(5.0)))
      .toDF("k", "seq", "v")
    val bands = graft.ops.Indicators.bollinger(bars, Seq("k"), Seq(col("seq")),
        "v", n = 3).orderBy("seq").select($"mid").as[Option[Double]].collect()
    // windows containing the null row (seq 2..4) must not claim full bands
    assert(bands(1).isEmpty && bands(2).isEmpty && bands(3).isEmpty)
    assert(bands(4).contains(4.0)) // first clean full window: {3,4,5}
  }

  test("equalFrequency: approx path bins agree away from fences") {
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val exact = graft.ops.Binning.equalFrequency(df, Seq("g"), "v", 4)
      .select($"v", $"bin".as("b_exact"))
    val approx = graft.ops.Binning.equalFrequency(df, Seq("g"), "v", 4,
        approx = true, accuracy = 10000)
      .select($"v", $"bin".as("b_approx"))
    val disagree = exact.join(approx, "v")
      .filter($"b_exact" =!= $"b_approx")
      .select($"v", $"b_exact", $"b_approx")
      .as[(Double, Int, Int)].collect().toSeq
    // the sketch returns a DATA value per fence (exact interpolates), so
    // only rows hugging a fence may shift — and only to the ADJACENT bin
    assert(disagree.size <= 5, disagree.toString)
    assert(disagree.forall(d => math.abs(d._2 - d._3) == 1), disagree.toString)
    val fences = Seq(250.75, 500.5, 750.25) // exact quartiles of 1..1000
    assert(disagree.forall(d => fences.exists(f => math.abs(d._1 - f) < 2)),
      disagree.toString)
  }

  test("growthAccounting: classes and the self-auditing identity") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 1),  // w1: new
      (1L, "2024-01-08 10:00:00", "view", 2),  // w2: retained
      (1L, "2024-01-22 10:00:00", "view", 3),  // w4: resurrected (skipped w3)
      (2L, "2024-01-01 11:00:00", "view", 4),  // w1: new; churned at w2
      (3L, "2024-01-08 11:00:00", "view", 5))  // w2: new; churned at w3
    val out = Funnels.growthAccounting(events, "user_id", "ts", "week")
      .orderBy("period")
      .select(date_format($"period", "yyyy-MM-dd"),
        $"n_new", $"n_retained", $"n_resurrected", $"n_churned")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 2L, 0L, 0L, 0L),
      ("2024-01-08", 1L, 1L, 0L, 1L),  // u3 new, u1 retained, u2 churned
      ("2024-01-15", 0L, 0L, 0L, 2L),  // u1 and u3 churn; nobody active
      ("2024-01-22", 0L, 0L, 1L, 0L))) // u1 resurrects; horizon adds no churn
  }

  test("transitions: conditional probabilities per from-state sum to 1") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 1),
      (1L, "2024-01-01 11:00:00", "click", 2),
      (1L, "2024-01-01 12:00:00", "view", 3),
      (2L, "2024-01-01 10:00:00", "view", 4),
      (2L, "2024-01-01 11:00:00", "click", 5),
      (2L, "2024-01-01 12:00:00", "purchase", 6),
      (3L, "2024-01-01 09:00:00", "view", 7)) // single event: no transition
    val out = Funnels.transitions(events, "user_id", "ts", "event_id",
        "event_type")
      .orderBy("from_type", "to_type")
      .select($"from_type", $"to_type", $"n", $"p")
      .as[(String, String, Long, Double)].collect().toSeq
    // view→click twice; click→view and click→purchase once each
    assert(out == Seq(
      ("click", "purchase", 1L, 0.5),
      ("click", "view", 1L, 0.5),
      ("view", "click", 2L, 1.0)))
    // no cross-user transition: user 3's lone view produced nothing
    assert(out.map(_._3).sum == 4L)
  }

  test("welchT: hand-checked statistic and degenerate-arm guards") {
    val df = Seq(
      ("g", true, 1.0), ("g", true, 2.0), ("g", true, 3.0),
      ("g", false, 2.0), ("g", false, 4.0),
      ("h", true, 5.0), ("h", false, 1.0), ("h", false, 2.0), // 1-row arm
      ("k", true, 7.0), ("k", true, 7.0),
      ("k", false, 7.0), ("k", false, 7.0))                   // zero variance
      .toDF("g", "arm", "v")
    val out = graft.ops.Experiments.welchT(df, Seq("g"), $"arm", "v")
      .orderBy("g")
      .select($"g", $"n_a", $"n_b", $"mean_a", $"mean_b", $"t")
      .as[(String, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    // g: means 2 vs 3, vars 1 vs 2 → t = -1/sqrt(1/3 + 1) = -0.866025
    assert(out(0) == ("g", 3L, 2L, Some(2.0), Some(3.0), Some(-0.866025)))
    // h: treatment arm has 1 row → t undefined, means still reported
    assert(out(1) == ("h", 1L, 2L, Some(5.0), Some(1.5), None))
    // k: both arms constant → zero standard error → t null, not Infinity
    assert(out(2) == ("k", 2L, 2L, Some(7.0), Some(7.0), None))
  }

  test("kmeansStep: members move to the nearest centroid, means exact") {
    val corpus = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 2.0f)),   // cluster near origin
      (3L, Array(10.0f, 10.0f)), (4L, Array(10.0f, 12.0f))) // cluster far
      .toDF("vec_id", "embedding")
    val cents = Seq((100L, Array(1.0f, 1.0f)), (200L, Array(9.0f, 9.0f)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.kmeansStep(corpus, cents)
      .orderBy("centroid_id", "i")
      .select($"centroid_id", $"i", $"mean_v", $"n_members")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(out == Seq(
      (100L, 0L, 0.0, 2L), (100L, 1L, 1.0, 2L),   // mean of (0,0),(0,2)
      (200L, 0L, 10.0, 2L), (200L, 1L, 11.0, 2L))) // mean of (10,10),(10,12)
  }

  test("audit: planted violations fire every check; clean data reports 0") {
    import graft.ops.Audit
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk") // 9 orphan; null ignored
    assert(Audit.fkOrphans(child, "fk", parent, "pk")
      .as[Long].collect().toSeq == Seq(9L))
    val dups = Seq(1L, 1L, 1L, 2L).toDF("k") // 2 excess rows for key 1
    assert(Audit.duplicateKeyCount(dups, Seq("k")).as[Long].head() == 2L)
    assert(Audit.duplicateKeyCount(parent, Seq("pk")).as[Long].head() == 0L)
    // null predicate counts as a violation, not a silent pass
    val vals = Seq(Some(5.0), Some(-1.0), None).toDF("v")
    assert(Audit.violationCount(vals, $"v" > 0).as[Long].head() == 2L)
    val rep = Audit.report(Seq(
        "a" -> Audit.duplicateKeyCount(dups, Seq("k")),
        "b" -> Audit.violationCount(vals, $"v" > 0)))
      .as[(String, Long)].collect().toSeq
    assert(rep == Seq(("a", 2L), ("b", 2L)))
  }

  test("reconcile: order/partitioning-invariant digest; drift localizes to its group") {
    import graft.ops.Audit
    val a = Seq((1L, "g1", "x"), (2L, "g1", "y"), (3L, "g2", "z"),
      (4L, "g2", null.asInstanceOf[String])).toDF("id", "g", "v")
    // same content, different order and partitioning → reconciles clean
    val b = a.orderBy($"id".desc).repartition(7)
    assert(Audit.reconcile(a, b, Seq("g"), Seq("id", "v")).isEmpty)
    // null value vs empty string vs missing column must NOT collide
    val bEmpty = a.withColumn("v", when($"id" === 4, lit("")).otherwise($"v"))
    val drift = Audit.reconcile(a, bEmpty, Seq("g"), Seq("id", "v"))
      .select("g").as[String].collect().toSeq
    assert(drift == Seq("g2"), "null->empty drift must surface, only in g2")
    // a dropped row changes BOTH n_rows and digest in its group only
    val bMissing = a.filter($"id" =!= 1)
    val r = Audit.reconcile(a, bMissing, Seq("g"), Seq("id", "v"))
      .select($"g", $"n_rows_a", $"n_rows_b").as[(String, Long, Long)]
      .collect().toSeq
    assert(r == Seq(("g1", 2L, 1L)))
    // a group absent on one side entirely surfaces with null counts
    val bNoG2 = a.filter($"g" =!= "g2")
    val gone = Audit.reconcile(a, bNoG2, Seq("g"), Seq("id", "v"))
      .select($"g", $"n_rows_b".isNull).as[(String, Boolean)].collect().toSeq
    assert(gone == Seq(("g2", true)))
  }

  test("macd: hand-checked recursion; signal folds unrounded macd values") {
    val bars = Seq((1L, 1L, 10.0), (1L, 2L, 16.0), (1L, 3L, 10.0))
      .toDF("k", "seq", "v")
    val out = graft.ops.Indicators.macd(bars, Seq("k"), Seq("seq"), "v")
      .orderBy("seq").select($"macd", $"signal")
      .as[(Double, Double)].collect().toSeq
    // fast (α=.25): 10, 11.5, 11.125 ; slow (α=.0625): 10, 10.375, 10.3515625
    // macd: 0, 1.125, 0.7734375 ; signal (α=.5): 0, 0.5625, 0.66796875
    assert(out == Seq((0.0, 0.0), (1.125, 0.5625), (0.773438, 0.667969)))
    // first row of every key is the seed — macd 0, signal 0
    val multi = graft.ops.Indicators.macd(
      bars.union(Seq((2L, 1L, 99.0)).toDF("k", "seq", "v")),
      Seq("k"), Seq("seq"), "v")
    assert(multi.filter($"k" === 2).select($"macd").as[Double].head() == 0.0)
  }

  test("rollingBeta: slope recovered on linear series, null on flat x") {
    val lin = (1 to 8).map(i => (1L, i.toLong, i.toDouble, 2.0 * i + 3))
    val flat = (1 to 8).map(i => (2L, i.toLong, 5.0, i.toDouble))
    val df = (lin ++ flat).toDF("k", "seq", "x", "y")
    val out = graft.ops.Indicators.rollingBeta(df, Seq("k"), Seq(col("seq")),
      "x", "y", n = 5)
      .select($"k", $"seq", $"beta").as[(Long, Long, Option[Double])]
      .collect().map { case (k, s, b) => ((k, s), b) }.toMap
    // y = 2x + 3 → beta exactly 2 once the window fills (seq >= 5)
    (5L to 8L).foreach(s => assert(out((1L, s)).contains(2.0)))
    (1L to 4L).foreach(s => assert(out((1L, s)).isEmpty, "partial window"))
    // zero-variance x never divides
    (1L to 8L).foreach(s => assert(out((2L, s)).isEmpty))
  }

  test("rollingCorr: ±1 on linear series, null on constant side") {
    val up = (1 to 6).map(i => (1L, i.toLong, i.toDouble, i.toDouble + 1))
    val anti = (1 to 6).map(i => (2L, i.toLong, i.toDouble, -i.toDouble))
    val const = (1 to 6).map(i => (3L, i.toLong, i.toDouble, 5.0))
    val df = (up ++ anti ++ const).toDF("k", "seq", "x", "y")
    val out = graft.ops.Indicators.rollingCorr(df, Seq("k"), Seq(col("seq")),
        "x", "y", n = 3)
      .filter($"seq" >= 3).orderBy("k", "seq")
      .select($"k", $"corr").as[(Long, Option[Double])].collect().toSeq
    assert(out.filter(_._1 == 1L).forall(_._2.contains(1.0)))
    assert(out.filter(_._1 == 2L).forall(_._2.contains(-1.0)))
    assert(out.filter(_._1 == 3L).forall(_._2.isEmpty)) // zero variance side
  }

  test("topPaths: common journeys ranked, ties broken by path") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 1),
      (1L, "2024-01-01 11:00:00", "purchase", 2),
      (2L, "2024-01-01 10:00:00", "view", 3),
      (2L, "2024-01-01 11:00:00", "purchase", 4),
      (3L, "2024-01-01 10:00:00", "view", 5),
      (4L, "2024-01-01 10:00:00", "click", 6))
    val out = Funnels.topPaths(events, "user_id", "ts", "event_id",
        "event_type", k = 2)
      .select($"seq", $"n_users", $"rnk").as[(String, Long, Int)]
      .collect().toSeq
    // "vp" walked twice wins; "c" and "v" tie at 1 → "c" first alphabetically
    assert(out == Seq(("vp", 2L, 1), ("c", 1L, 2)))
  }

  test("cuped: covariate variance removed, effect preserved, zero-var safe") {
    import graft.ops.Experiments
    // y = x + 1·treatment (+ deterministic wiggle): x explains most variance
    val units = (1 to 40).map { i =>
      val x = (i % 10).toDouble * 3
      val arm = i % 2 == 0
      (i.toLong, arm, x, x + (if (arm) 1.0 else 0.0) + (i % 3) * 0.1)
    }.toDF("u", "arm", "x", "y")
    val adj = Experiments.cuped(units, Nil, "y", "x")
    val tRaw = Experiments.welchT(units, Nil, $"arm", "y")
      .select($"t").as[Option[Double]].head().get
    val tCuped = Experiments.welchT(adj, Nil, $"arm", "y_cuped")
      .select($"t").as[Option[Double]].head().get
    assert(math.abs(tCuped) > math.abs(tRaw),
      s"CUPED must tighten the test: raw $tRaw vs cuped $tCuped")
    // the effect itself is untouched: arm-mean gap stays ~1.0
    val gap = Experiments.welchT(adj, Nil, $"arm", "y_cuped")
      .select($"mean_a" - $"mean_b").as[Double].head()
    assert(math.abs(gap - 1.0) < 0.15, s"effect drifted: $gap")
    // constant covariate → theta 0 → adjustment is a no-op
    val flat = units.withColumn("x", lit(5.0))
    val noop = Experiments.cuped(flat, Nil, "y", "x")
      .filter($"y_cuped" =!= $"y").count()
    assert(noop == 0)
  }

  test("twap: duration-weighted, burst-resistant, carries to bucket end") {
    // price 10 for the first 6h (00:00→06:00), then a 100-tick worth 18h:
    // twap = (10·6 + 100·18)/24 = 77.5 — a naive mean would say 55
    val ticks = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 10.0),
      (1L, "2024-01-01 06:00:00", 2L, 100.0))
      .toDF("k", "ts", "seq", "px").withColumn("ts", $"ts".cast("timestamp"))
    val out = graft.ops.Indicators.twap(ticks, "k", "ts", "px", "seq")
      .select($"twap", $"n_ticks").as[(Double, Long)].head()
    assert(out == ((77.5, 2L)))
    // a 1000-tick burst at one instant gets zero weight per superseded tick
    val burst = (1 to 5).map(i =>
        (2L, "2024-01-01 00:00:00", i.toLong, 999.0)) :+
      ((2L, "2024-01-01 00:00:01", 9L, 10.0))
    val out2 = graft.ops.Indicators.twap(
        burst.toDF("k", "ts", "seq", "px")
          .withColumn("ts", $"ts".cast("timestamp")),
        "k", "ts", "px", "seq")
      .select($"twap").as[Double].head()
    // 999 held for 1s of 86400 → twap ≈ 10, burst contributes almost nothing
    assert(out2 < 11.0, s"burst dominated: $out2")
  }

  test("maxUnderwater: island detection, span, and never-dipped zero") {
    val bars = Seq(
      // peak 10, under for 3 obs (2h span), recover, under 1 obs
      (1L, "2024-01-01 00:00:00", 1L, 10.0),
      (1L, "2024-01-01 01:00:00", 2L, 5.0),
      (1L, "2024-01-01 02:00:00", 3L, 7.0),
      (1L, "2024-01-01 03:00:00", 4L, 9.0),
      (1L, "2024-01-01 04:00:00", 5L, 11.0), // new peak ends the island
      (1L, "2024-01-01 05:00:00", 6L, 8.0),
      // monotone climber: never underwater
      (2L, "2024-01-01 00:00:00", 7L, 1.0),
      (2L, "2024-01-01 01:00:00", 8L, 2.0))
      .toDF("k", "ts", "seq", "v").withColumn("ts", $"ts".cast("timestamp"))
    val out = graft.ops.Windows.maxUnderwater(bars, Seq("k"), "ts", "seq", "v")
      .orderBy("k")
      .select($"k", $"max_underwater_n", $"max_underwater_us")
      .as[(Long, Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      (1L, 3L, Some(2L * 3600 * 1000000)), // 01:00→03:00 island
      (2L, 0L, None)))
  }

  test("funnel/cohort: empty input yields empty (no division by zero)") {
    val none = ev()
    assert(Funnels.funnel(none, "user_id", "ts", "event_type",
      Seq("view", "click")).filter($"n_users" > 0).count() == 0)
    assert(Funnels.cohortRetention(none, "user_id", "ts").count() == 0)
  }

  test("concentration: shares sum to 1, cum monotone, top bin dominates") {
    // 20 units: one whale worth as much as the rest combined
    val units = ((1 to 19).map(i => (i.toLong, 10.0)) :+ (20L, 190.0))
      .toDF("u", "rev")
    val out = graft.ops.Binning.concentration(units, "rev", nBins = 4)
      .orderBy("bin")
      .select($"bin", $"n_units", $"share", $"cum_share")
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(out.map(_._2).sum == 20L)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-6)
    assert(out.last._4 == 1.0)
    assert(out.map(_._4) == out.map(_._4).sorted) // cumulative is monotone
    assert(out.last._3 > 0.5, "whale bin must dominate the share")
  }

  test("TopKAgg: ties, floor, partitioning independence, ≡ window top-k") {
    import graft.functions.expressions.TopKAgg
    // ordered-output semantics: floor drop, tie goes to smaller id
    val tiny = Seq((5.0, 10L), (7.0, 20L), (5.0, 5L), (3.0, 1L), (7.0, 15L))
      .toDF("v", "id")
      .agg(TopKAgg.topK(col("v"), col("id"), 3).as("top"))
      .select(explode($"top").as("t")).select($"t.score", $"t.id")
      .as[(Double, Long)].collect().toSeq
    assert(tiny == Seq((7.0, 15L), (7.0, 20L), (5.0, 5L))) // 5.0@10 fell off; tie id asc
    // distributed: identical under different partitionings, ≡ window form
    val rows = (1 to 500).map(i => ((i % 7).toString, i.toLong, (i % 83).toDouble))
    def viaAgg(parts: Int) = rows.toDF("g", "id", "v").repartition(parts)
      .groupBy("g").agg(TopKAgg.topK(col("v"), col("id"), 5).as("top"))
      .select($"g", explode($"top").as("t"))
      .select($"g", $"t.score", $"t.id")
      .as[(String, Double, Long)].collect().toSet
    val viaWindow = graft.ops.Windows.topNPerKey(
        rows.toDF("g", "id", "v"), Seq("g"),
        Seq(col("v").desc, col("id")), 5)
      .select($"g", $"v", $"id").as[(String, Double, Long)].collect().toSet
    assert(viaAgg(2) == viaAgg(13))
    assert(viaAgg(13) == viaWindow)
  }

  test("TopKAgg generalizes to (decimal, string) and rejects unorderable types") {
    import graft.functions.expressions.TopKAgg
    // decimal scores + string ids, exercised through a real shuffle: must
    // match the window formulation exactly (same ordering, same ties)
    val df = (1 to 400).map { i =>
      ((i % 5).toString, f"id_${i % 97}%03d", BigDecimal(i % 61) / 100)
    }.toDF("g", "id", "v").withColumn("v", $"v".cast("decimal(10,2)"))
    val viaAgg = df.repartition(11)
      .groupBy("g").agg(TopKAgg.topK(col("v"), col("id"), 4).as("top"))
      .select($"g", explode($"top").as("t"))
      .select($"g", $"t.score", $"t.id")
      .as[(String, BigDecimal, String)].collect().toSet
    val viaWindow = graft.ops.Windows.topNPerKey(
        df, Seq("g"), Seq(col("v").desc, col("id")), 4)
      .select($"g", $"v", $"id").as[(String, BigDecimal, String)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
    // unorderable score type (map) fails analysis, not execution
    val bad = Seq((1, Map("a" -> 1), 2L)).toDF("g", "m", "id")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.groupBy("g").agg(TopKAgg.topK(col("m"), col("id"), 2)).collect()
    }
  }

  test("library-user cache scoping: releaseAll drops every funnel-pinned block") {
    // guards the library-user path: an operator that pins intermediates via
    // Caches must leave NOTHING live after releaseAll — not just in
    // Bench/Verify, whose between-query hygiene also calls clearCache()
    spark.catalog.clearCache()
    graft.util.Caches.releaseAll()
    val sc = spark.sparkContext
    // Earlier suites in this JVM may have left localCheckpoint blocks that
    // only the ContextCleaner (post-GC) reclaims — out of scope here, where
    // the subject is blocks the FUNNEL queries pin. Drop them so the final
    // emptiness assert measures this test's queries, not GC timing.
    sc.getPersistentRDDs.values.foreach(_.unpersist(true))
    SparkEntry.queries("q105_funnel")(spark, sf()).count()
    SparkEntry.queries("q118_funnel_latency")(spark, sf()).count()
    assert(sc.getPersistentRDDs.nonEmpty,
      "funnel step tables should be pinned while the result is consumed")
    graft.util.Caches.releaseAll()
    assert(sc.getPersistentRDDs.isEmpty,
      s"releaseAll left live cached blocks: ${sc.getPersistentRDDs.keySet}")
  }

  test("every round-8 analytics operator survives an empty input") {
    import graft.ops._
    val noEvents = ev()
    val noBars = Seq.empty[(Long, Long, Double)].toDF("k", "seq", "v")
    val noTicks = Seq.empty[(Long, String, Long, Double)]
      .toDF("k", "ts", "seq", "px").withColumn("ts", $"ts".cast("timestamp"))
    assert(Indicators.bollinger(noBars, Seq("k"), Seq(col("seq")), "v", 3).count() == 0)
    assert(Indicators.rsi(noBars, Seq("k"), Seq(col("seq")), "v", 3).count() == 0)
    assert(Indicators.rollingCorr(noBars.withColumn("v2", $"v"),
      Seq("k"), Seq(col("seq")), "v", "v2", 3).count() == 0)
    assert(Indicators.twap(noTicks, "k", "ts", "px", "seq").count() == 0)
    assert(Binning.equalFrequency(noBars, Seq("k"), "v", 4).count() == 0)
    assert(Windows.maxUnderwater(noTicks.withColumnRenamed("px", "v"),
      Seq("k"), "ts", "seq", "v").count() == 0)
    assert(Funnels.growthAccounting(noEvents, "user_id", "ts").count() == 0)
    assert(Funnels.transitions(noEvents, "user_id", "ts", "event_id",
      "event_type").count() == 0)
    assert(Funnels.topPaths(noEvents, "user_id", "ts", "event_id",
      "event_type", 5).count() == 0)
    assert(Funnels.funnelLatency(noEvents, "user_id", "ts", "event_type",
      Seq("view", "click")).filter($"n_users" > 0).count() == 0)
    // global (no-group) welchT on empty input: one row, everything null-safe
    val t = Experiments.welchT(noBars.withColumn("arm", lit(true)),
      Nil, $"arm", "v").select($"n_a", $"t")
      .as[(Long, Option[Double])].head()
    assert(t == ((0L, None)))
  }

  test("anovaF: two separated arms match the closed form; one arm / " +
      "zero within-variance are NULL; k-arm F agrees with a driver " +
      "replicate (r16)") {
    import graft.ops.Experiments
    // arms {1,2} vs {5,6}: SSB = 16, SSW = 1, F = (16/1)/(1/2) = 32
    val ab = Seq(("a", 1L), ("a", 2L), ("b", 5L), ("b", 6L))
      .toDF("arm", "v")
    val r = Experiments.anovaF(ab, Seq.empty, "arm", "v").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 16000000L && r.getLong(3) == 1000000L)
    assert(r.getLong(4) == 32000000L, s"F: $r")
    // single arm: F undefined
    assert(Experiments.anovaF(ab.filter($"arm" === "a"), Seq.empty,
      "arm", "v").collect().head.isNullAt(4))
    // identical constant arms: SSW = 0 -> NULL (infinite separation
    // guard fires only when SSB > 0; here both are 0 -> still NULL)
    val const = Seq(("a", 3L), ("a", 3L), ("b", 3L), ("b", 3L))
      .toDF("arm", "v")
    assert(Experiments.anovaF(const, Seq.empty, "arm", "v")
      .collect().head.isNullAt(4))
    // 3 arms vs driver replicate
    val rnd = new scala.util.Random(8)
    val data = Seq.tabulate(300)(i =>
      (s"g${i % 3}", (rnd.nextInt(50) + 10 * (i % 3)).toLong))
    val got = Experiments.anovaF(data.toDF("arm", "v"), Seq.empty,
      "arm", "v").collect().head
    val byArm = data.groupBy(_._1).view.mapValues(_.map(_._2.toDouble))
    val ex = byArm.values.map(vs => {
      val s = vs.sum; math.floor(s * s / vs.size * 1e6 + 0.5) / 1e6
    }).sum
    val n = data.size.toDouble; val stot = data.map(_._2.toDouble).sum
    val q = data.map(x => x._2.toDouble * x._2).sum
    val ssb = ex - stot * stot / n
    val ssw = math.max(q - ex, 0.0)
    val f = (ssb / 2.0) / (ssw / (n - 3.0))
    assert(got.getLong(4) == math.floor(f * 1e6 + 0.5).toLong)
  }

  test("kruskalWallis: separated pair matches the closed form H = 2.4; " +
      "all-tied pool NULL; rank test ignores a monotone transform (r16)") {
    import graft.ops.Experiments
    val ab = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("arm", "v")
    val r = Experiments.kruskalWallis(ab, Seq.empty, "arm", "v")
      .collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 2400000L, s"H: $r")
    val tied = Seq(("a", 7L), ("a", 7L), ("b", 7L)).toDF("arm", "v")
    assert(Experiments.kruskalWallis(tied, Seq.empty, "arm", "v")
      .collect().head.isNullAt(2))
    // H is rank-based: squaring the (positive) values changes nothing
    val rnd = new scala.util.Random(12)
    val data = Seq.tabulate(200)(i =>
      (s"g${i % 2}", (rnd.nextInt(30) + 5 * (i % 2) + 1).toLong))
    val h1 = Experiments.kruskalWallis(data.toDF("arm", "v"), Seq.empty,
      "arm", "v").collect().head.getLong(2)
    val h2 = Experiments.kruskalWallis(
      data.map { case (a, v) => (a, v * v) }.toDF("arm", "v"), Seq.empty,
      "arm", "v").collect().head.getLong(2)
    assert(h1 == h2, s"monotone transform moved H: $h1 vs $h2")
  }
}
