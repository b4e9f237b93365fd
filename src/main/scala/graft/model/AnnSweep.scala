package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}
import graft.ops.{Quantize, Similarity}

/** Recall/cost SELECTION sweep over the ANN compression ladder (r18) —
  * the operational loop the served ladder was missing: every rung
  * (flat ADC, IVF-PQ, SQ8; each with and without exact refine) serves
  * correctly, but nothing measured which rung meets a target recall at
  * what byte cost. One call emits, per (rung, refine), recall@k against
  * the EXACT inner-product top-k plus the two physical cost numbers a
  * capacity decision runs on:
  *
  *  - `code_bytes`  — quantized bytes the rung's stage-1 scan reads
  *    (flat/SQ8: one code per corpus row; IVF: only the probed cells'
  *    rows — the nprobe/nlist fraction, counted exactly);
  *  - `float_rows`  — full-precision rows stage 2 re-reads (0 without
  *    refine; the DISTINCT candidate ids with — what the static-IN
  *    pushdown physically fetches).
  *
  * Everything is exact integer algebra over replayable ranks (hits are
  * id-set intersections; recall is a micro-floored ratio of longs), so
  * the whole table is DuckDB-oracle-checkable — no float thresholds.
  * All scoring reuses the pinned [[graft.ops.Quantize]] serving shapes;
  * ties break (score DESC, nn_id) everywhere, so the candidate sets are
  * deterministic cross-engine.
  *
  * SCALE: an offline evaluation job. The only all-pairs leg is the exact
  * ground truth over the EVALUATION query set — |queries| is bounded by
  * contract (a labeled benchmark slice, not production traffic), so the
  * GT join is |corpus|·|queries| dots with the queries broadcast, the
  * [[Similarity.bruteForceTopK]] class. Candidate refine joins hash on
  * the bounded candidate-id set. Nothing here collects.
  */
object AnnSweep {

  /** Sweep the three quantized layouts at refine ∈ {1 (stage-1 only),
    * `refine`} against the exact top-`k` ground truth.
    *
    * @param corpus    (vec_id, embedding) float corpus
    * @param queries   the labeled evaluation slice (vec_id, embedding);
    *                  self-matches are excluded on every rung and in the
    *                  ground truth
    * @param codebooks PQ codebooks for the flat-ADC and IVF-PQ rungs
    * @param centroids coarse cells for the IVF rung
    * @param sqMins    SQ8 per-dimension bounds ([[Quantize.sqTrain]])
    * @return (rung, refine, hits, n_eval, recall_micro, code_bytes,
    *         float_rows) — 6 rows
    */
  def recallCostSweep(corpus: DataFrame, queries: DataFrame,
                      codebooks: Array[Array[Array[Double]]],
                      centroids: DataFrame, nprobe: Int,
                      sqMins: Array[Double], sqMaxs: Array[Double],
                      k: Int, refine: Int): DataFrame = {
    require(k >= 1 && refine >= 2,
      "recallCostSweep: k ≥ 1 and refine ≥ 2 (refine = 1 is reported " +
        "as the stage-1 row of each rung)")
    val spark = corpus.sparkSession
    val m = codebooks.length
    val dim = sqMins.length

    val fl = corpus.select(col("vec_id").as("nn_id"),
      col("embedding").cast("array<double>").as("__ve"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("__qe"))
    val wK = Window.partitionBy("query_id")
      .orderBy(col("__s").desc, col("nn_id"))

    // EXACT inner-product top-k — the labeled ground truth every rung's
    // recall reads against (the metric the quantized scores approximate)
    val exact = fl.join(broadcast(q), col("nn_id") =!= col("query_id"))
      .withColumn("__s", VF.dot(col("__qe"), col("__ve")))
      .withColumn("rnk", row_number().over(wK)).filter(col("rnk") <= k)
      .select("query_id", "nn_id")

    // stage-1 candidate lists at k·refine — the pinned serving shapes;
    // rnk ≤ k of the same list IS the unrefined rung (identical ranking)
    val coded = Quantize.encode(corpus, "embedding", codebooks)
      .select(col("vec_id"), col("code"))
    val adcKr = Quantize.adcTopK(coded, queries, "vec_id", "embedding",
        codebooks, k * refine)
      .select(col("query_id"), col("nn_id"), col("rnk"))
    val ivfKr = Quantize.ivfPqTopK(corpus, centroids, queries, codebooks,
        nprobe, k * refine)
      .select(col("query_id"), col("nn_id"), col("rnk"))
    val sqCoded = corpus.select(col("vec_id"),
      Quantize.sqCode(col("embedding"), sqMins, sqMaxs).as("code"))
    val sqKr = Quantize.sqTopK(sqCoded, queries, "vec_id", "code",
        "embedding", sqMins, sqMaxs, k * refine)
      .select(col("query_id"), col("nn_id"), col("rnk"))

    // stage-2 exact rerank of a candidate list (in-plan join form — the
    // eval twin of AnnIndex.exactRefine's static-IN serve path)
    def refined(cands: DataFrame): DataFrame =
      fl.join(broadcast(cands.select("query_id", "nn_id")), Seq("nn_id"))
        .join(broadcast(q), Seq("query_id"))
        .withColumn("__s", VF.dot(col("__qe"), col("__ve")))
        .withColumn("__r", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(col("__s").desc, col("nn_id"))))
        .filter(col("__r") <= k)
        .select("query_id", "nn_id")

    // shared 1-row stats frames (cross-joined into every output row)
    val nQ = queries.agg(count(lit(1)).as("n_q"))
    val nCorpus = corpus.agg(count(lit(1)).as("n_corpus"))
    // rows the IVF probe physically scans: codes in the UNION of probed
    // cells — the partition-pruning fraction, counted exactly
    val cent = centroids.select(col("vec_id").as("centroid_id"),
      col("embedding").as("cent_emb"),
      VF.dot(col("embedding"), col("embedding")).as("c2"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("qdist"), col("centroid_id"))
    val probedCells = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        VF.dot(col("embedding"), col("embedding")).as("a2"))
      .crossJoin(broadcast(cent))
      .withColumn("qdist", col("a2") + col("c2") -
        lit(2.0) * VF.dot(col("q_emb"), col("cent_emb")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select("centroid_id").distinct()
    val ivfRows = Similarity.ivfAssign(corpus, centroids)
      .select(col("centroid_id"))
      .join(broadcast(probedCells), Seq("centroid_id"))
      .agg(count(lit(1)).as("ivf_rows"))

    val zeroFloat = spark.range(1).select(lit(0L).as("float_rows"))
    def floatRowsOf(cands: DataFrame): DataFrame =
      cands.select("nn_id").distinct()
        .agg(count(lit(1)).cast("long").as("float_rows"))

    def row(rung: String, refineN: Int, served: DataFrame,
            codeBytes: Column, fr: DataFrame): DataFrame =
      served.select("query_id", "nn_id")
        .join(exact, Seq("query_id", "nn_id"))
        .agg(count(lit(1)).as("hits"))
        .crossJoin(nQ).crossJoin(nCorpus).crossJoin(ivfRows).crossJoin(fr)
        .select(lit(rung).as("rung"), lit(refineN.toLong).as("refine"),
          col("hits").cast("long").as("hits"),
          (col("n_q") * lit(k.toLong)).cast("long").as("n_eval"),
          floor(col("hits").cast("double") /
            (col("n_q") * lit(k.toLong)).cast("double") * lit(1e6)
            + lit(0.5)).cast("long").as("recall_micro"),
          codeBytes.cast("long").as("code_bytes"),
          col("float_rows").cast("long").as("float_rows"))

    val mB = lit(m.toLong)
    val dimB = lit(dim.toLong)
    row("flat_adc", 1, adcKr.filter(col("rnk") <= k),
        col("n_corpus") * mB, zeroFloat)
      .unionAll(row("flat_adc", refine, refined(adcKr),
        col("n_corpus") * mB, floatRowsOf(adcKr)))
      .unionAll(row("ivfpq", 1, ivfKr.filter(col("rnk") <= k),
        col("ivf_rows") * mB, zeroFloat))
      .unionAll(row("ivfpq", refine, refined(ivfKr),
        col("ivf_rows") * mB, floatRowsOf(ivfKr)))
      .unionAll(row("sq8", 1, sqKr.filter(col("rnk") <= k),
        col("n_corpus") * dimB, zeroFloat))
      .unionAll(row("sq8", refine, refined(sqKr),
        col("n_corpus") * dimB, floatRowsOf(sqKr)))
  }
}
