package graft

import org.apache.spark.sql.functions._
import graft.model.AnnIndex
import graft.ops.Quantize

/** Persisted ANN artifacts: publish→load roundtrip exactness, the
  * corpus-float-free / training-free serving plan, retrain-as-new-version
  * time travel, and serve ≡ in-plan ADC.
  */
class AnnArtifactSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() = graft.util.TempRoots.create("graft_annspec")

  test("publishCodebooks → loadCodebooks is an exact roundtrip; metadata " +
      "lands in the version dir; guards reject ragged books (r16)") {
    val cb = Quantize.seededCodebooks(m = 3, k = 4, subDim = 8, seed = 11)
    val root = freshRoot() + "/books"
    val vdir = AnnIndex.publishCodebooks(spark, root, cb,
      extraMeta = Map("seed" -> "11"))
    val back = AnnIndex.loadCodebooks(spark, root)
    assert(back.length == cb.length)
    for (j <- cb.indices; c <- cb(j).indices)
      assert(back(j)(c).sameElements(cb(j)(c)),
        s"centroid ($j, $c) did not roundtrip")
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(vdir, "_ann_index.json")), "UTF-8")
    assert(meta.contains("\"kind\":\"pq_codebooks\"") &&
      meta.contains("\"m\":\"3\"") && meta.contains("\"seed\":\"11\""))
    intercept[IllegalArgumentException] {
      AnnIndex.publishCodebooks(spark, freshRoot() + "/bad",
        Array(Array(Array(1.0, 2.0)), Array(Array(1.0))))
    }
  }

  test("retrain publishes a NEW version: readCurrent serves the retrain, " +
      "loadCodebooksAt time-travels to the frozen index (r16)") {
    val root = freshRoot() + "/books"
    val v0 = Quantize.seededCodebooks(m = 2, k = 4, subDim = 8, seed = 1)
    val v1 = Quantize.seededCodebooks(m = 2, k = 4, subDim = 8, seed = 2)
    AnnIndex.publishCodebooks(spark, root, v0)
    AnnIndex.publishCodebooks(spark, root, v1)
    assert(AnnIndex.loadCodebooks(spark, root)(0)(0)
      .sameElements(v1(0)(0)))
    assert(AnnIndex.loadCodebooksAt(spark, root, 0)(0)(0)
      .sameElements(v0(0)(0)))
  }

  test("serveAdcTopK ≡ in-plan adcTopK over the same books, and the probe " +
      "plan reads ZERO corpus floats and runs ZERO training scans (r16)") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val cb = Quantize.seededCodebooks(m = 4, k = 8, subDim = 16, seed = 7)
    val root = freshRoot()
    AnnIndex.publishCodebooks(spark, root + "/books", cb)
    AnnIndex.publishCodes(spark, root + "/codes",
      Quantize.encode(emb, "embedding", cb), "vec_id")
    val queries = emb.filter($"vec_id" < 5)
    val served = AnnIndex.serveAdcTopK(spark, root + "/books",
      root + "/codes", queries, "vec_id", "embedding", topK = 5)
    val inPlan = Quantize.adcTopK(Quantize.encode(emb, "embedding", cb),
      queries, "vec_id", "embedding", cb, topK = 5)
    assert(served.collect().toSet == inPlan.collect().toSet)
    // plan pins: the corpus-sized scan is the CODES table (vec_id + code
    // only); the embedding column appears ONLY under the broadcast query
    // side, and no aggregate (training) node exists anywhere
    val plan = served.queryExecution.executedPlan.toString
    val codesScans = plan.linesIterator
      .filter(l => l.contains("Location") && l.contains("/codes")).toSeq
    assert(codesScans.nonEmpty, s"no codes-table scan in the plan:\n$plan")
    val codesSchema = plan.linesIterator
      .filter(_.contains("ReadSchema")).filter(_.contains("code")).toSeq
    assert(codesSchema.nonEmpty && codesSchema.forall(!_.contains("embedding")),
      s"the codes scan must not read floats:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("ObjectHashAggregate"),
      s"serving must not train (no aggregates in the probe plan):\n$plan")
  }

  test("publishIvfPqCodes + serveIvfPqTopK ≡ in-plan ivfPqTopK; the " +
      "plan prunes to the probed cells and reads zero corpus floats (r16)") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val cb = Quantize.seededCodebooks(m = 4, k = 8, subDim = 16, seed = 7)
    val root = freshRoot()
    AnnIndex.publishCodebooks(spark, root + "/books", cb)
    val cents = emb.filter($"vec_id" < 8)
    AnnIndex.publishIvfPqCodes(spark, root + "/codes", emb, cents, cb)
    val queries = emb.filter($"vec_id" >= 10 && $"vec_id" <= 12)
    val served = AnnIndex.serveIvfPqTopK(spark, root + "/codes",
      root + "/books", cents, queries, nprobe = 2, topK = 4)
    val inPlan = Quantize.ivfPqTopK(emb, cents, queries, cb,
      nprobe = 2, topK = 4)
    assert(served.collect().toSet == inPlan.collect().toSet)
    // plan pins: the codes scan carries the static cell filter (partition
    // pruning), reads no embedding column, and no aggregate (assignment/
    // training) appears anywhere in the probe plan
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("centroid_id"), plan)
    val codesSchema = plan.linesIterator
      .filter(_.contains("ReadSchema")).filter(_.contains("code")).toSeq
    assert(codesSchema.nonEmpty && codesSchema.forall(!_.contains("embedding")),
      s"the codes scan must not read floats:\n$plan")
    assert(!plan.contains("HashAggregate") &&
      !plan.contains("ObjectHashAggregate"),
      s"serving must not assign or train:\n$plan")
  }

  test("residual (IVFADC) artifact mode ≡ in-plan ivfPqResidualTopK; a " +
      "build/serve flag mismatch is a visible score shift, not silence " +
      "(r16)") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val cb = Quantize.seededCodebooks(m = 4, k = 8, subDim = 16, seed = 7)
    val root = freshRoot()
    AnnIndex.publishCodebooks(spark, root + "/books", cb)
    val cents = emb.filter($"vec_id" < 8)
    AnnIndex.publishIvfPqCodes(spark, root + "/codes", emb, cents, cb,
      residual = true)
    val queries = emb.filter($"vec_id" >= 10 && $"vec_id" <= 12)
    val served = AnnIndex.serveIvfPqTopK(spark, root + "/codes",
      root + "/books", cents, queries, nprobe = 2, topK = 4,
      residual = true).collect().toSet
    val inPlan = Quantize.ivfPqResidualTopK(emb, cents, queries, cb,
      nprobe = 2, topK = 4).collect().toSet
    assert(served == inPlan)
    // mismatched serve flag scores WITHOUT the coarse term — different
    // numbers, never a silent equality
    val mismatched = AnnIndex.serveIvfPqTopK(spark, root + "/codes",
      root + "/books", cents, queries, nprobe = 2, topK = 4,
      residual = false).collect().toSet
    assert(mismatched != served)
  }
}
