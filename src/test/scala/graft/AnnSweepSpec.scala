package graft

import org.apache.spark.sql.functions._
import graft.model.AnnSweep
import graft.ops.Quantize

/** The recall/cost selection sweep: shape, the refined-≥-stage-1 recall
  * law (exact reranking of a candidate superset can only add ground-truth
  * members), candidate-bounded float rows, and the probed-fraction cost
  * accounting that makes a rung CHOOSABLE.
  */
class AnnSweepSpec extends SparkSpec {
  import spark.implicits._

  test("recallCostSweep: 10 rows (5 rungs × ±refine); refined recall ≥ " +
      "stage-1 per rung; float rows 0 without refine and " +
      "candidate-bounded with; code bytes count the probed fraction for " +
      "the IVF variants and the full corpus for flat/SQ8") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val cb = Quantize.seededCodebooks(m = 4, k = 8, subDim = 16, seed = 7)
    val rot = Quantize.seededRotation(64, seed = 11)
    val (mins, maxs) = Quantize.sqTrain(emb, "embedding", 64)
    val out = AnnSweep.recallCostSweep(emb, emb.filter($"vec_id" < 3),
      cb, emb.filter($"vec_id" < 8), nprobe = 2, rot, mins, maxs,
      k = 4, refine = 3).collect()
    assert(out.length == 10, out.mkString("; "))
    val byKey = out.map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    for (rung <- Seq("flat_adc", "ivfpq", "ivfpq_res", "ivfpq_opq",
        "sq8")) {
      val s1 = byKey((rung, 1L))
      val s3 = byKey((rung, 3L))
      assert(s3.getAs[Long]("recall_micro") >=
        s1.getAs[Long]("recall_micro"),
        s"$rung: refine lowered recall — $s1 vs $s3")
      assert(s1.getAs[Long]("float_rows") == 0L)
      // distinct candidate ids ≤ nQ·k·refine = 3·4·3
      val fr = s3.getAs[Long]("float_rows")
      assert(fr > 0L && fr <= 36L, s"$rung float_rows $fr")
      assert(s1.getAs[Long]("n_eval") == 12L)
      assert(s1.getAs[Long]("recall_micro") <= 1000000L &&
        s1.getAs[Long]("hits") <= 12L)
    }
    val n = emb.count()
    assert(byKey(("flat_adc", 1L)).getAs[Long]("code_bytes") == n * 4)
    assert(byKey(("sq8", 1L)).getAs[Long]("code_bytes") == n * 64)
    val ivfBytes = byKey(("ivfpq", 1L)).getAs[Long]("code_bytes")
    assert(ivfBytes > 0 && ivfBytes < n * 4,
      s"IVF must scan the probed FRACTION: $ivfBytes vs full ${n * 4}")
    // the three IVF variants share the routing → identical scan bytes
    assert(byKey(("ivfpq_res", 1L)).getAs[Long]("code_bytes") == ivfBytes)
    assert(byKey(("ivfpq_opq", 1L)).getAs[Long]("code_bytes") == ivfBytes)
  }

  test("recallCostSweep under TRAINED codebooks: Lloyd refinement " +
      "changes recall, never cost — byte columns are data-layout facts, " +
      "identical seeded vs trained — and every sweep law still holds") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val seeded = Quantize.seededCodebooks(m = 4, k = 8, subDim = 16,
      seed = 7)
    val trained = Quantize.trainCodebooks(emb, "embedding", seeded,
      iters = 2)
    assert(Quantize.quantizationMse(emb, "embedding", trained) <=
      Quantize.quantizationMse(emb, "embedding", seeded),
      "Lloyd must descend the quantization objective")
    val rot = Quantize.seededRotation(64, seed = 11)
    val (mins, maxs) = Quantize.sqTrain(emb, "embedding", 64)
    def sweep(cb: Array[Array[Array[Double]]]) =
      AnnSweep.recallCostSweep(emb, emb.filter($"vec_id" < 3), cb,
        emb.filter($"vec_id" < 8), nprobe = 2, rot, mins, maxs,
        k = 4, refine = 3).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val s = sweep(seeded)
    val t = sweep(trained)
    assert(t.size == 10)
    for (key <- t.keys) {
      // cost columns are layout facts: corpus rows × code width and the
      // probed-cell fraction do not depend on codebook VALUES
      assert(t(key).getAs[Long]("code_bytes") ==
        s(key).getAs[Long]("code_bytes"), s"$key bytes moved")
      if (key._2 > 1L)
        assert(t(key).getAs[Long]("recall_micro") >=
          t((key._1, 1L)).getAs[Long]("recall_micro"),
          s"$key refined < stage-1 under trained books")
    }
    // NO cross-codebook recall assertion on purpose: whether trained
    // books beat seeded on a given eval slice is an empirical outcome
    // (one-hit granularity at this size — the SweepProbe receipt in
    // SCALE.md shows a refined rung moving BOTH directions), not a law.
    // The laws are the byte equality and the within-codebook dominance
    // above; comparing seeded vs trained is what the sweep table is FOR.
  }

  test("selectRung: qualifies at the recall floor, prices float rows, " +
      "ranks by total bytes with deterministic ties, and returns zero " +
      "rows when no rung qualifies") {
    val sweep = Seq(
      ("flat_adc", 1L, 2L, 10L, 200000L, 2000L, 0L),
      ("flat_adc", 3L, 4L, 10L, 400000L, 2000L, 70L),
      ("ivfpq", 1L, 1L, 10L, 100000L, 800L, 0L),
      ("sq8", 1L, 9L, 10L, 900000L, 32000L, 0L)
    ).toDF("rung", "refine", "hits", "n_eval", "recall_micro",
      "code_bytes", "float_rows")
    val out = AnnSweep.selectRung(sweep, targetRecallMicro = 200000L,
      floatRowBytes = 512L).orderBy("choice_rank").collect()
    // ivfpq (10%) fails the floor; costs: flat_adc/1 = 2000,
    // sq8/1 = 32000, flat_adc/3 = 2000 + 70·512 = 37840
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(3),
      r.getLong(4))).toList == List(
      ("flat_adc", 1L, 2000L, 1L),
      ("sq8", 1L, 32000L, 2L),
      ("flat_adc", 3L, 37840L, 3L)), out.mkString("; "))
    assert(AnnSweep.selectRung(sweep, 950000L, 512L).count() == 0L,
      "no rung meets 95% — the empty table IS the answer")
  }
}
