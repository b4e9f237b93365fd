package graft

import org.apache.spark.sql.functions._

import graft.ops.{Quantize, Similarity}
import graft.sources.Tables

/** Product quantization: code validity and partitioning invariance, the
  * Lloyd trainer's non-increasing objective, ADC scores against a driver
  * reference, and PQ-vs-exact ranking sanity on the real embeddings.
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf("0.01"))
  private val cb = Quantize.seededCodebooks(m = 4, k = 8, subDim = 16, seed = 7)

  test("codes are in [0, k) and invariant under repartitioning") {
    val a = Quantize.encode(emb, "embedding", cb)
      .select($"vec_id", $"code").as[(Long, Seq[Int])].collect().toMap
    assert(a.values.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
    val b = Quantize.encode(emb.repartition(13), "embedding", cb)
      .select($"vec_id", $"code").as[(Long, Seq[Int])].collect().toMap
    assert(a == b)
  }

  test("Lloyd iterations never increase quantization error; training beats the seed") {
    val mse0 = Quantize.quantizationMse(emb, "embedding", cb)
    val cb1 = Quantize.trainCodebooks(emb, "embedding", cb, iters = 1)
    val mse1 = Quantize.quantizationMse(emb, "embedding", cb1)
    val cb3 = Quantize.trainCodebooks(emb, "embedding", cb, iters = 3)
    val mse3 = Quantize.quantizationMse(emb, "embedding", cb3)
    assert(mse1 <= mse0 && mse3 <= mse1)
    assert(mse3 < mse0, "three Lloyd steps must strictly improve on a random seed")
  }

  test("ADC scores equal a driver-side reference computation") {
    val coded = Quantize.encode(emb, "embedding", cb)
    val out = Quantize.adcTopK(coded, emb.filter($"vec_id" < 3),
        "vec_id", "embedding", cb, topK = 500)
      .select($"query_id", $"nn_id", $"score")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    val codes = coded.select($"vec_id", $"code").as[(Long, Seq[Int])]
      .collect().toMap
    out.foreach { case ((qid, nid), s) =>
      val q = vecs(qid).map(_.toDouble)
      val expected = (0 until 4).map { j =>
        val cent = cb(j)(codes(nid)(j))
        (0 until 16).map(d => q(j * 16 + d) * cent(d)).sum
      }.sum
      assert(math.abs(s - expected) < 2e-6,
        s"query $qid nn $nid: $s vs $expected")
    }
    assert(out.nonEmpty)
  }

  test("IVF-PQ scores agree with flat ADC; results stay inside probed cells") {
    val centroids = emb.filter($"vec_id" < 8)
    val queries = emb.filter($"vec_id" >= 10 && $"vec_id" <= 14)
    val out = Quantize.ivfPqTopK(emb, centroids, queries, cb, nprobe = 3, topK = 5)
      .select($"query_id", $"nn_id", $"centroid_id", $"score")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    // flat ADC over the whole corpus: same codes, same LUT — every IVF-PQ
    // score must match the flat score for that (query, neighbor) pair
    val flat = Quantize.adcTopK(Quantize.encode(emb, "embedding", cb),
        queries, "vec_id", "embedding", cb, topK = 499)
      .select($"query_id", $"nn_id", $"score").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    out.foreach { case (q, n, _, s) => assert(flat((q, n)) == s) }
    // membership: each neighbor's cell is one of the query's probed cells
    val cells = graft.ops.Similarity.ivfAssign(emb, centroids)
      .select($"vec_id", $"centroid_id").as[(Long, Long)].collect().toMap
    out.foreach { case (_, n, cell, _) => assert(cells(n) == cell) }
  }

  test("residual encoding (IVFADC) beats raw-vector codes on clustered data") {
    // The honest test of WHY residuals exist: on a corpus with real cluster
    // structure (8 centers + 5% noise — the regime IVF is built for; the
    // raw sf embeddings are near-random unit vectors where no coarse
    // quantizer explains any variance), raw-vector codes collapse every
    // cluster member to the center's code (zero within-cell resolution),
    // while residual codes spend all their bits on the within-cell detail.
    // Both paths use the SAME seeded init and 3 Lloyd iterations over
    // their respective inputs, and probe ALL cells so the comparison
    // isolates quantization quality from routing.
    val bases = emb.filter($"vec_id" < 8)
    val baseVecs = bases.select($"vec_id".as("j"),
      $"embedding".cast("array<double>").as("base"))
    val clustered = emb.withColumn("j", $"vec_id" % 8)
      .join(broadcast(baseVecs), "j")
      .select($"vec_id", zip_with($"base",
        $"embedding".cast("array<double>"),
        (b, a) => b + lit(0.05) * a).as("embedding"))
    val seedBook = Quantize.seededCodebooks(m = 4, k = 8, subDim = 16, seed = 7)
    val cbRaw = Quantize.trainCodebooks(clustered, "embedding", seedBook, iters = 3)
    val ce = bases.select($"vec_id".as("centroid_id"),
      $"embedding".cast("array<double>").as("__tce"))
    val resDf = Similarity.ivfAssign(clustered, bases)
      .join(broadcast(ce), "centroid_id")
      .select($"vec_id", zip_with($"embedding".cast("array<double>"),
        $"__tce", (a, b) => a - b).as("embedding"))
    val cbRes = Quantize.trainCodebooks(resDf, "embedding", seedBook, iters = 3)
    val queries = clustered.filter($"vec_id" >= 100 && $"vec_id" < 110)
    // exact INNER-PRODUCT ground truth (both PQ paths approximate IP)
    val q = queries.select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__ip").desc, col("nn_id"))
    val exact = clustered.select($"vec_id".as("nn_id"), $"embedding".as("ne"))
      .join(broadcast(q), col("nn_id") =!= col("query_id"))
      .withColumn("__ip",
        graft.functions.VectorFunctions.dot(col("ne"), col("qe")))
      .withColumn("rnk", row_number().over(w)).filter($"rnk" <= 10)
      .select($"query_id", $"nn_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(out: org.apache.spark.sql.DataFrame): Double = {
      val got = out.select($"query_id", $"nn_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (qid, nn) =>
        nn.intersect(got.getOrElse(qid, Set.empty)).size.toDouble / nn.size
      }.sum / exact.size
    }
    val rawR = recallOf(
      Quantize.ivfPqTopK(clustered, bases, queries, cbRaw, nprobe = 8, topK = 10))
    val resR = recallOf(
      Quantize.ivfPqResidualTopK(clustered, bases, queries, cbRes,
        nprobe = 8, topK = 10))
    assert(resR > rawR,
      s"residual recall ($resR) must beat raw-vector recall ($rawR)")
  }

  test("seededRotation is orthonormal and replayable; rotate preserves IPs") {
    val r = Quantize.seededRotation(16, seed = 11)
    for (i <- 0 until 16; j <- 0 until 16) {
      val d = (0 until 16).map(k => r(i)(k) * r(j)(k)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-12, s"rows $i,$j: dot = $d")
    }
    // same seed regenerates bit-identically (the oracle-replay contract)
    val r2 = Quantize.seededRotation(16, seed = 11)
    assert(r.flatten.toSeq == r2.flatten.toSeq)
    // R preserves inner products (orthogonality, fp-tight)
    val df = Seq((1L, (1 to 16).map(_.toDouble)),
      (2L, (1 to 16).map(i => (17 - i).toDouble))).toDF("id", "v")
    val rot = df.select($"id", Quantize.rotate($"v", r).as("v"))
    def ip(d: org.apache.spark.sql.DataFrame): Double = {
      val m = d.as[(Long, Seq[Double])].collect().toMap
      m(1L).zip(m(2L)).map { case (a, b) => a * b }.sum
    }
    assert(math.abs(ip(rot) - ip(df)) < 1e-8)
  }

  test("OPQ rotation lifts quality at the same bit budget (anisotropic corpus)") {
    // energy concentrated in the FIRST subspace: unrotated PQ wastes 3 of
    // its 4 codebooks on near-zero subvectors; the seeded orthogonal
    // rotation spreads the energy so every subspace carries signal. Both
    // paths train from the SAME seed with the same Lloyd budget.
    val scaleExpr = expr("transform(cast(embedding as array<double>), " +
      "(x, i) -> x * (CASE WHEN i < 16 THEN 4.0D ELSE 0.25D END))")
    val aniso = emb.select($"vec_id", scaleExpr.as("embedding"))
    val seedBook = Quantize.seededCodebooks(m = 4, k = 8, subDim = 16, seed = 7)
    val rot = Quantize.seededRotation(64, seed = 11)
    val rotated = aniso.select($"vec_id",
      Quantize.rotate($"embedding", rot).as("embedding"))
    val cbRaw = Quantize.trainCodebooks(aniso, "embedding", seedBook, iters = 3)
    val cbRot = Quantize.trainCodebooks(rotated, "embedding", seedBook, iters = 3)
    val mseRaw = Quantize.quantizationMse(aniso, "embedding", cbRaw)
    val mseRot = Quantize.quantizationMse(rotated, "embedding", cbRot)
    // rotation is orthogonal, so both MSEs measure the SAME geometry
    assert(mseRot < mseRaw,
      s"rotated-space MSE ($mseRot) must beat raw-space MSE ($mseRaw)")
  }

  test("OPQ recall >= residual IVFADC recall on the anisotropic clustered corpus") {
    val bases0 = emb.filter($"vec_id" < 8)
    val baseVecs = bases0.select($"vec_id".as("j"),
      $"embedding".cast("array<double>").as("base"))
    val scale = "(x, i) -> x * (CASE WHEN i < 16 THEN 4.0D ELSE 0.25D END)"
    val clustered = emb.withColumn("j", $"vec_id" % 8)
      .join(broadcast(baseVecs), "j")
      .select($"vec_id", expr("transform(zip_with(base, " +
        s"cast(embedding as array<double>), (b, a) -> b + 0.05D * a), $scale)")
        .as("embedding"))
    val bases = bases0.select($"vec_id",
      expr(s"transform(cast(embedding as array<double>), $scale)")
        .as("embedding"))
    val seedBook = Quantize.seededCodebooks(m = 4, k = 8, subDim = 16, seed = 7)
    val rot = Quantize.seededRotation(64, seed = 11)
    val ce = bases.select($"vec_id".as("centroid_id"),
      $"embedding".cast("array<double>").as("__tce"))
    val resDf = Similarity.ivfAssign(clustered, bases)
      .join(broadcast(ce), "centroid_id")
      .select($"vec_id", zip_with($"embedding".cast("array<double>"),
        $"__tce", (a, b) => a - b).as("embedding"))
    val rotResDf = resDf.select($"vec_id",
      Quantize.rotate($"embedding", rot).as("embedding"))
    val cbRes = Quantize.trainCodebooks(resDf, "embedding", seedBook, iters = 3)
    val cbOpq = Quantize.trainCodebooks(rotResDf, "embedding", seedBook, iters = 3)
    val queries = clustered.filter($"vec_id" >= 100 && $"vec_id" < 110)
    val q = queries.select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__ip").desc, col("nn_id"))
    val exact = clustered.select($"vec_id".as("nn_id"), $"embedding".as("ne"))
      .join(broadcast(q), col("nn_id") =!= col("query_id"))
      .withColumn("__ip",
        graft.functions.VectorFunctions.dot(col("ne"), col("qe")))
      .withColumn("rnk", row_number().over(w)).filter($"rnk" <= 10)
      .select($"query_id", $"nn_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(out: org.apache.spark.sql.DataFrame): Double = {
      val got = out.select($"query_id", $"nn_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (qid, nn) =>
        nn.intersect(got.getOrElse(qid, Set.empty)).size.toDouble / nn.size
      }.sum / exact.size
    }
    val resR = recallOf(Quantize.ivfPqResidualTopK(
      clustered, bases, queries, cbRes, nprobe = 8, topK = 10))
    val opqR = recallOf(Quantize.ivfPqOpqTopK(
      clustered, bases, queries, cbOpq, rot, nprobe = 8, topK = 10))
    assert(opqR >= resR,
      s"OPQ recall ($opqR) must not trail residual recall ($resR)")
    assert(opqR > 0.1, s"OPQ recall ($opqR) must be well above chance")
  }

  test("training tightens the ADC approximation; recall beats chance (ANN sanity)") {
    // The synthetic embeddings are near-random UNIT vectors: top-10-of-500
    // neighbors are noise-driven, so absolute recall is capped for ANY
    // quantizer (a 64-bit numpy PQ measures ~0.3 here). The invariants
    // that do hold: (1) Lloyd-trained books approximate the true inner
    // product strictly better than the seeded books, (2) recall@10 is
    // well above the 10/500 = 0.02 chance floor.
    val cbBig = Quantize.seededCodebooks(m = 8, k = 16, subDim = 8, seed = 7)
    val trained = Quantize.trainCodebooks(emb, "embedding", cbBig, iters = 3)
    val queries = emb.filter($"vec_id" < 10)
    def approxErr(book: Array[Array[Array[Double]]]): Double = {
      val coded = Quantize.encode(emb, "embedding", book)
      val adc = Quantize.adcTopK(coded, queries, "vec_id", "embedding", book,
          topK = 499)
        .select($"query_id", $"nn_id", $"score").as[(Long, Long, Double)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
      val vecs = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
        .collect().toMap.view.mapValues(_.map(_.toDouble).toArray).toMap
      adc.map { case ((q, n), s) =>
        val t = vecs(q).zip(vecs(n)).map { case (a, b) => a * b }.sum
        math.abs(s - t)
      }.sum / adc.size
    }
    val (seededErr, trainedErr) = (approxErr(cbBig), approxErr(trained))
    assert(trainedErr < seededErr,
      s"training must tighten ADC: $trainedErr vs $seededErr")
    val pq = Quantize.adcTopK(Quantize.encode(emb, "embedding", trained),
        queries, "vec_id", "embedding", trained, topK = 10)
      .select($"query_id", $"nn_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select($"query_id", $"nn_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.map { case (q, nn) =>
      nn.intersect(pq.getOrElse(q, Set.empty)).size.toDouble / nn.size
    }.sum / exact.size
    assert(recall > 0.06, s"recall@10 = $recall (chance = 0.02)")
  }

  test("SQ8: codes bounded, reconstruction within half a step, deterministic") {
    import graft.ops.Quantize
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val (mins, maxs) = Quantize.sqTrain(emb, "embedding", 64)
    assert(mins.zip(maxs).forall { case (mn, mx) => mn <= mx })
    val coded = emb.select($"vec_id",
      $"embedding".cast("array<double>").as("e"),
      Quantize.sqCode($"embedding", mins, maxs).as("code"))
    val rows = coded.select($"code").collect()
    assert(rows.forall(_.getSeq[Int](0).forall(c => c >= 0 && c <= 255)))
    // dequantization error per dim <= span/510 (+ float slack): the
    // quantizer's defining bound
    val maxSpan = mins.zip(maxs).map { case (mn, mx) => mx - mn }.max
    val err = coded.select(org.apache.spark.sql.functions.aggregate(
        org.apache.spark.sql.functions.zip_with($"e",
          Quantize.sqDecode($"code", mins, maxs),
          (x, d) => org.apache.spark.sql.functions.abs(x - d)),
        org.apache.spark.sql.functions.lit(0.0),
        (a, x) => org.apache.spark.sql.functions.greatest(a, x)).as("me"))
      .agg(org.apache.spark.sql.functions.max($"me")).head().getDouble(0)
    assert(err <= maxSpan / 510.0 + 1e-9, s"reconstruction err $err")
    // deterministic under repartition
    val a = Quantize.sqTopK(coded.select($"vec_id", $"code"),
      emb.filter($"vec_id" < 3), "vec_id", "code", "embedding",
      mins, maxs, 3).collect().toSet
    val b = Quantize.sqTopK(coded.repartition(7).select($"vec_id", $"code"),
      emb.filter($"vec_id" < 3), "vec_id", "code", "embedding",
      mins, maxs, 3).collect().toSet
    assert(a == b && a.size == 9)
  }
}
