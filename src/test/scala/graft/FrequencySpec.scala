package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.MisraGries
import graft.ops.Frequency

/** Heavy hitters: exact threshold semantics, Misra–Gries sketch
  * guarantees, and the sketched pipeline's exactness (round 9).
  */
class FrequencySpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("heavyHitters: strict n/k threshold, nulls excluded") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d"))
      .toDF("x") // n = 10
    // k=3: threshold cnt*3 > 10 → a (15) yes, b (9) NO — strict inequality
    val hh = Frequency.heavyHitters(df, col("x"), 3)
      .as[(String, Long)].collect().toSet
    assert(hh == Set(("a", 5L)))
    // nulls don't count toward n and never appear as items
    val withNulls = df.union(Seq.fill(6)(null.asInstanceOf[String]).toDF("x"))
    assert(Frequency.heavyHitters(withNulls, col("x"), 3)
      .as[(String, Long)].collect().toSet == Set(("a", 5L)))
  }

  test("Misra-Gries guarantees: underestimate within n/(cap+1), superset of true HH") {
    val cap = 4
    val truth = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val n = truth.values.sum
    val est = docs.repartition(7) // force multi-partition merge path
      .agg(MisraGries.mgTopK(col("lang"), cap).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item").as("item"), col("e.est_cnt").as("est"))
      .as[(String, Long)].collect().toMap
    assert(est.size <= cap)
    val eps = n.toDouble / (cap + 1)
    est.foreach { case (item, e) =>
      val t = truth(item)
      assert(e <= t, s"$item overestimated: $e > $t")
      assert(e >= t - eps, s"$item under floor: $e < $t - $eps")
    }
    // every item with true count > n/(cap+1) must be present
    truth.filter(_._2 > eps).keys.foreach(item =>
      assert(est.contains(item), s"true heavy hitter $item missing"))
  }

  test("MG guarantees hold regardless of partitioning (merge-order invariance of the BOUNDS)") {
    // planted skew over a high-cardinality tail: one item at ~20%, rest unique
    val base = spark.range(0, 4000)
      .select(when(col("id") % 5 === 0, lit("hot"))
        .otherwise(concat(lit("u"), col("id"))).as("x"))
    val truthHot = 800L
    val n = 4000L
    for (parts <- Seq(1, 3, 16)) {
      val cap = 9
      val est = base.repartition(parts)
        .agg(MisraGries.mgTopK(col("x"), cap).as("s"))
        .select(explode(col("s")).as("e"))
        .select(col("e.item"), col("e.est_cnt")).as[(String, Long)]
        .collect().toMap
      val eps = n.toDouble / (cap + 1) // 400
      assert(est.contains("hot"), s"parts=$parts lost the hot item")
      assert(est("hot") <= truthHot && est("hot") >= truthHot - eps,
        s"parts=$parts hot estimate ${est("hot")} outside [${truthHot - eps}, $truthHot]")
    }
  }

  test("sketched pipeline is EXACTLY the exact answer (superset + verify)") {
    val exact = Frequency.heavyHitters(docs, col("lang"), 8)
      .as[(String, Long)].collect().toSet
    assert(exact.nonEmpty)
    val sketched = Frequency.heavyHittersSketched(docs, col("lang"), 8, 32)
      .as[(String, Long)].collect().toSet
    assert(sketched == exact)
    // and on the planted high-cardinality set, under several partitionings
    val base = spark.range(0, 4000)
      .select(when(col("id") % 5 === 0, lit("hot"))
        .otherwise(concat(lit("u"), col("id") % 1500)).as("x"))
    val e2 = Frequency.heavyHitters(base, col("x"), 4)
      .as[(String, Long)].collect().toSet
    for (parts <- Seq(2, 11)) {
      val s2 = Frequency.heavyHittersSketched(base.repartition(parts),
        col("x"), 4, 16).as[(String, Long)].collect().toSet
      assert(s2 == e2, s"parts=$parts sketched $s2 != exact $e2")
    }
  }

  test("mg_topk per group: the MG bounds hold independently inside each group") {
    val base = spark.range(0, 3000)
      .select((col("id") % 3).cast("string").as("g"),
        when(col("id") % 5 < 2, concat(lit("hot"), col("id") % 3))
          .otherwise(concat(lit("u"), col("id"))).as("x"))
    val cap = 6
    val perGroup = base.repartition(8)
      .groupBy("g").agg(MisraGries.mgTopK(col("x"), cap).as("s"))
      .select(col("g"), explode(col("s")).as("e"))
      .select(col("g"), col("e.item"), col("e.est_cnt"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val truth = base.groupBy("g", "x").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    (0 to 2).map(_.toString).foreach { g =>
      val n = truth(g).values.sum           // 1000 per group
      val eps = n.toDouble / (cap + 1)
      val hot = s"hot$g"                    // 400 per group > eps ≈ 143
      assert(perGroup(g).contains(hot), s"group $g lost its heavy hitter")
      val e = perGroup(g)(hot)
      assert(e <= truth(g)(hot) && e >= truth(g)(hot) - eps,
        s"group $g estimate $e outside bounds")
    }
  }

  test("per-group sketched pipeline is EXACTLY the per-group exact answer (r10)") {
    // per-group skew: each group has its own hot item + a long unique tail
    val base = spark.range(0, 6000)
      .select((col("id") % 4).cast("string").as("g"),
        when(col("id") % 3 < 2, concat(lit("hot"), col("id") % 4))
          .otherwise(concat(lit("u"), col("id"))).as("x"))
    val exact = Frequency.heavyHittersByKey(base, Seq("g"), col("x"), 5)
      .as[(String, String, Long)].collect().toSet
    assert(exact.nonEmpty)
    for (parts <- Seq(1, 8)) {
      val sk = Frequency.heavyHittersSketchedByKey(base.repartition(parts),
        Seq("g"), col("x"), 5, 20).as[(String, String, Long)].collect().toSet
      assert(sk == exact, s"parts=$parts sketched $sk != exact $exact")
    }
    // per-language token heavy hitters on the corpus (the q140 shape)
    val toks = docs.select(col("lang"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val e2 = Frequency.heavyHittersByKey(toks, Seq("lang"), col("tok"), 40)
      .as[(String, String, Long)].collect().toSet
    val s2 = Frequency.heavyHittersSketchedByKey(toks, Seq("lang"), col("tok"), 40, 160)
      .as[(String, String, Long)].collect().toSet
    assert(e2 == s2 && e2.nonEmpty)
  }

  test("capacity below k-1 is rejected (guarantee would be lost)") {
    intercept[IllegalArgumentException] {
      Frequency.heavyHittersSketched(docs, col("lang"), k = 8, capacity = 5)
    }
  }

  test("mg_topk rejects BINARY and nested items at analysis time (ADVICE r9)") {
    // Array[Byte] has identity equals/hashCode — identical binary items
    // would never merge counts and the superset guarantee would silently
    // break. Must fail analysis, not return wrong results.
    val bin = spark.range(0, 10).select(col("id").cast("string").cast("binary").as("b"))
    val binErr = intercept[org.apache.spark.sql.AnalysisException] {
      bin.agg(MisraGries.mgTopK(col("b"), 4)).collect()
    }
    assert(binErr.getMessage.toLowerCase.contains("binary"))
    val nested = spark.range(0, 10).select(array(col("id")).as("a"))
    intercept[org.apache.spark.sql.AnalysisException] {
      nested.agg(MisraGries.mgTopK(col("a"), 4)).collect()
    }
    // ...and the documented workaround works: hash the column first (skewed
    // input — an all-unique stream legitimately drains an MG sketch)
    val skewed = spark.range(0, 100)
      .select(when(col("id") % 2 === 0, lit("hot")).otherwise(col("id").cast("string"))
        .cast("binary").as("b"))
    val hashed = skewed.agg(MisraGries.mgTopK(xxhash64(col("b")), 4).as("s"))
      .select(explode(col("s")).as("e")).count()
    assert(hashed > 0)
  }

  test("burstiness: metronome ≈ 0, Poisson-ish ≈ 1, bursts ≫ 1") {
    import java.sql.Date
    def day(i: Int) = Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // metronome: exactly 3/day for 10 days → variance 0 → fano 0
    val metro = (0 until 10).flatMap(i => Seq.fill(3)(("m", day(i))))
    // burst: 20 events on one day, 1 on each of 9 others
    val burst = Seq.fill(20)(("b", day(0))) ++ (1 until 10).map(i => ("b", day(i)))
    val got = Frequency.burstiness(
        (metro ++ burst).toDF("user_id", "d"), Seq("user_id"), col("d"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("m") == (("m", 10L, 30L, 0L)))
    // burst moments: n=10, S=29, Q=409 → fano = (10·409 − 841)/(10·29)
    val want = math.floor((10.0 * 409 - 841) * 1e6 / 290.0 + 0.5).toLong
    assert(got("b") == (("b", 10L, 29L, want)))
    assert(got("b")._4 > 1000000L) // ≫ 1 in micro units
  }

  // ------------------------------------------------------------ gini/zipf

  test("gini: even mix = 0, total concentration = (n−1)/n, hand case " +
      "exact; zero mass NULL; tie-order invariant (r15)") {
    import graft.ops.Frequency
    def g(xs: Seq[Long]) = Frequency.gini(
      xs.zipWithIndex.map { case (x, i) => (s"g$i", x) }.toDF("g", "m"), "m")
      .collect().head
    assert(g(Seq(25L, 25L, 25L, 25L)).getLong(2) == 0L)
    assert(g(Seq(0L, 0L, 0L, 100L)).getLong(2) == 750000L)
    // [1,2,3,4]: Σ(2i−1)x = 50, n·T = 40 → G = 10/40
    assert(g(Seq(4L, 2L, 1L, 3L)).getLong(2) == 250000L)
    assert(g(Seq(0L, 0L)).isNullAt(2))
    // ties: permuting equal values cannot move the statistic
    val tied = Seq(5L, 5L, 5L, 20L)
    val a = g(tied).getLong(2)
    val df = tied.zipWithIndex.map { case (x, i) => (s"g$i", x) }
      .toDF("g", "m").repartition(7)
    assert(Frequency.gini(df, "m").collect().head.getLong(2) == a)
  }

  test("zipfFit: an exact c·r = C law fits α = 1 with R² ≈ 1; flat " +
      "counts degenerate; driver-side moment differential (r15)") {
    import graft.ops.Frequency
    // counts {12, 6, 4, 3}: count · rank = 12 exactly → α = 1 line
    val law = Seq(("a", 12L), ("b", 6L), ("c", 4L), ("d", 3L))
      .toDF("item", "n")
    val r = Frequency.zipfFit(law, "item", "n", topN = 4).collect().head
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getLong(1) - 1000000L) < 10, s"alpha: $r")
    assert(r.getLong(2) > 999990L, s"r2: $r")
    // flat: zero y-variance → NULL r2, zero slope
    val flat = Seq(("a", 5L), ("b", 5L), ("c", 5L)).toDF("item", "n")
    val f = Frequency.zipfFit(flat, "item", "n", topN = 3).collect().head
    assert(f.getLong(1) == 0L && f.isNullAt(2))
    // random differential vs a BigInt replay of the nano-moment algebra
    val rnd = new scala.util.Random(3)
    val items = (1 to 60).map(i => (s"w$i", rnd.nextInt(5000).toLong + 1))
    val got = Frequency.zipfFit(items.toDF("item", "n"), "item", "n",
      topN = 25).collect().head
    val top = items.sortBy { case (it, n) => (-n, it) }.take(25)
    def nano(x: Double) = BigInt(math.floor(x * 1e9 + 0.5).toLong)
    val xs = top.indices.map(i => nano(math.log((i + 1).toDouble)))
    val ys = top.map(t => nano(math.log(t._2.toDouble)))
    val n = BigInt(25)
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val syy = ys.map(a => a * a).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val r2 = (n * sxy - sx * sy).toDouble * (n * sxy - sx * sy).toDouble /
      ((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    assert(got.getLong(0) == 25L)
    assert(got.getLong(1) == math.floor(-slope * 1e6 + 0.5).toLong)
    assert(got.getLong(2) == math.floor(r2 * 1e6 + 0.5).toLong)
    intercept[IllegalArgumentException] {
      Frequency.zipfFit(flat, "item", "n", topN = 2)
    }
  }

  test("heapsFit: linear vocab growth fits β = 1; constant vocab " +
      "degenerates; driver differential incl. checkpoints (r15)") {
    import graft.ops.Frequency
    // every doc brings exactly 3 NEW tokens → V(n) = 3n, β = 1
    val linear = (1 to 64).map(i =>
      (i.toLong, s"w${i}a w${i}b w${i}c")).toDF("doc_id", "text")
    val r = Frequency.heapsFit(linear, "doc_id", "text").collect().head
    assert(r.getLong(0) == 64L)
    assert(math.abs(r.getLong(2) - 1000000L) < 10, s"beta: $r")
    assert(r.getLong(3) > 999990L, s"r2: $r")
    // constant vocabulary: V(n) flat → zero y-variance, NULL r2, beta 0
    val const = (1 to 32).map(i => (i.toLong, "same tokens here"))
      .toDF("doc_id", "text")
    val c = Frequency.heapsFit(const, "doc_id", "text").collect().head
    assert(c.getLong(2) == 0L && c.isNullAt(3))
    // random corpus: replicate first-occurrence + checkpoints + moments
    val rnd = new scala.util.Random(6)
    val docs = (1 to 100).map(i =>
      (i.toLong, Seq.fill(8)(s"t${rnd.nextInt(150)}").mkString(" ")))
    val got = Frequency.heapsFit(docs.toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    val first = scala.collection.mutable.Map[String, Int]()
    docs.foreach { case (id, t) =>
      t.split("\\s+").foreach(tok =>
        if (!first.contains(tok)) first(tok) = id.toInt)
    }
    val n = 100
    val cps = ((1 to math.floor(math.log(n) / math.log(2)).toInt)
      .map(k => math.min(math.pow(2.0, k).toLong, n)) :+ n.toLong).distinct
    def nano(x: Double) = BigInt(math.floor(x * 1e9 + 0.5).toLong)
    val pts = cps.map(cp =>
      (nano(math.log(cp.toDouble)),
        nano(math.log(first.values.count(_ <= cp).toDouble))))
    val m = BigInt(pts.size)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (m * sxy - sx * sy).toDouble / (m * sxx - sx * sx).toDouble
    assert(got.getLong(1) == pts.size.toLong)
    assert(got.getLong(2) == math.floor(beta * 1e6 + 0.5).toLong)
    // doc-rank order is a pure function of orderCol: repartition-stable
    val re = Frequency.heapsFit(docs.toDF("doc_id", "text").repartition(7),
      "doc_id", "text").collect().head
    assert(re == got)
  }

  test("heapsFit doc ranking is shard-bounded: the doc-grain window is " +
      "partitioned (no corpus-wide single-partition sort), ranks match " +
      "the global sort on sparse/clustered/huge ids (r16)") {
    import graft.ops.Frequency
    // the doc-grain window must carry a partition key now — the only
    // unpartitioned windowspec left is the ≤64-row shard-offset one
    val plan = Frequency.heapsFit(
      (1 to 50).map(i => (i.toLong, s"w$i")).toDF("doc_id", "text"),
      "doc_id", "text").queryExecution.analyzed.toString
    assert(plan.contains("windowspecdefinition(__shard"),
      s"doc window lost its shard partitioning:\n$plan")
    // rank equality vs the plain global sort, on id distributions that
    // stress the equal-width sharding: sparse with a huge outlier,
    // clustered runs, negatives
    for (ids <- Seq(
        Seq(5L, 7L, 9L, 1000000000000L, -3L, 0L, 12L),
        (1 to 200).map(_.toLong * 3 + 1000000L),
        Seq(Long.MinValue / 4, -1L, 1L, Long.MaxValue / 4))) {
      val docs = ids.map(i => (i, s"tok$i")).toDF("doc_id", "text")
      val a = Frequency.heapsFit(docs, "doc_id", "text").collect().head
      val b = Frequency.heapsFit(docs.repartition(5), "doc_id", "text")
        .collect().head
      assert(a == b, s"repartition changed the fit on ids=$ids")
      assert(a.getLong(0) == ids.size.toLong)
    }
  }
}
