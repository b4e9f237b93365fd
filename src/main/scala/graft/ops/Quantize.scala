package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the memory-compression leg of the ANN
  * stack: a d-dim vector splits into `m` subvectors, each quantized to one
  * of `k` per-subspace centroids, so the corpus is stored as m small codes
  * (m·log₂k bits) instead of d floats, and approximate distances are
  * computed from a per-query lookup table without touching the original
  * vectors (ADC — asymmetric distance computation). At 100 TB of
  * embeddings this is the difference between scanning codes (bytes/vector)
  * and scanning floats (KB/vector); compose with the IVF cell router
  * ([[Similarity]]) for IVF-PQ, the standard billion-scale layout.
  *
  * Everything here is expression-only (native [[VF.dot]] + slices over
  * literal centroid arrays — codegen'd, no UDFs, no shuffle for encode or
  * scoring beyond the final top-k), and deterministic: seeded codebooks
  * regenerate bit-identically engine-side and oracle-side (the same
  * replay-the-RNG-inline-literals scheme as the LSH hyperplanes), and the
  * Lloyd trainer's per-iteration reduction is numerically fixed-order.
  */
object Quantize {

  /** Deterministic seeded codebooks: `m × k` centroids of `subDim` dims,
    * 3-decimal values in (-1, 1) from a per-(subspace, centroid) RNG
    * stream — replayable literally by a SQL oracle. A real deployment
    * refines them with [[trainCodebooks]]; the seeded book is the
    * deterministic init (k-means++ would be the quality upgrade).
    */
  def seededCodebooks(m: Int, k: Int, subDim: Int,
                      seed: Int): Array[Array[Array[Double]]] =
    Array.tabulate(m, k) { (j, c) =>
      val rnd = new scala.util.Random(seed.toLong * 1000003 + j * 131 + c)
      Array.fill(subDim)(math.rint((rnd.nextDouble() * 2 - 1) * 1e3) / 1e3)
    }

  private def subCol(vec: Column, j: Int, subDim: Int): Column =
    slice(vec, j * subDim + 1, subDim)

  /** Squared-distance-to-centroid, argmin-equivalent form: `‖x‖²` is
    * constant across the k candidates of one subspace, so the comparison
    * key is `-2·x·c + c·c` — two dot products, both mirrored symbolically
    * by `list_dot_product` on the oracle side (identical left-to-right
    * folds → identical doubles → identical argmins).
    */
  private def distKey(sub: Column, cent: Array[Double]): Column = {
    val c = typedLit(cent.toSeq)
    lit(-2.0) * VF.dot(sub, c) + VF.dot(c, c)
  }

  /** Append an m-byte PQ `code` column (int array, values in [0, k)) for
    * `vecCol`. Pure projection — zero shuffle; ties in the argmin take the
    * LOWEST centroid index on both engines (first match of the min).
    */
  def encode(df: DataFrame, vecCol: String,
             codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val subDim = codebooks(0)(0).length
    val v = col(vecCol).cast("array<double>")
    val codes = codebooks.zipWithIndex.map { case (book, j) =>
      val dists = array(book.map(c => distKey(subCol(v, j, subDim), c)): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    df.withColumn("code", array(codes: _*))
  }

  /** Per-row ADC score: Σⱼ lutⱼ[codeⱼ], where lutⱼ holds the k dot
    * products of the query's j-th subvector with subspace j's centroids.
    * SHARED by the flat and IVF serving paths — this is the expression
    * the q160/q161 oracles replay (CASE-selected `list_dot_product`s), so
    * its fold order and indexing must never diverge between them.
    */
  private[graft] def adcScore(qe: Column, code: Column,
                       codebooks: Array[Array[Array[Double]]]): Column = {
    val subDim = codebooks(0)(0).length
    codebooks.zipWithIndex.map { case (book, j) =>
      val lut = array(book.map(c =>
        VF.dot(subCol(qe, j, subDim), typedLit(c.toSeq))): _*)
      element_at(lut, code.getItem(j) + 1)
    }.reduce(_ + _)
  }

  /** The per-QUERY ADC lookup table — subspace j's m·k sub-dot products
    * as `array<array<double>>`, computed ON THE BROADCAST QUERY SIDE so
    * each (query, corpus-row) pair pays m element_at lookups instead of
    * re-deriving all m·k·subDim multiplies per pair (ADC's textbook
    * precomputation, Jégou et al. 2011 §III.C; r18 perf). Values are the
    * SAME dots [[adcScore]] built inline — [[adcScoreLut]]'s fold is
    * IEEE-identical to adcScore's, so every oracle replay stands.
    */
  private[graft] def adcLut(qe: Column,
                            codebooks: Array[Array[Array[Double]]]): Column = {
    val subDim = codebooks(0)(0).length
    array(codebooks.zipWithIndex.map { case (book, j) =>
      array(book.map(c =>
        VF.dot(subCol(qe, j, subDim), typedLit(c.toSeq))): _*)
    }: _*)
  }

  /** [[adcScore]] reading [[adcLut]]'s precomputed tables: the identical
    * left-folded Σ_j lut\[j\]\[code_j\] sum (same addends, same order —
    * bit-equal to the inline form).
    */
  private[graft] def adcScoreLut(lut: Column, code: Column, m: Int): Column =
    (0 until m).map(j =>
      element_at(element_at(lut, j + 1), code.getItem(j) + 1)).reduce(_ + _)

  /** ADC top-k: score every PQ-coded corpus row against every query by
    * summing, per subspace, the dot product of the query's subvector with
    * the centroid the code names — the corpus' original vectors are never
    * read. One broadcast of the (tiny) query set against the coded corpus,
    * per-query ROW_NUMBER cut; scores are approximate (quantized-corpus)
    * inner products, ranked (score desc, id) for determinism.
    *
    * @return (query_id, nn_id, score [rounded 6dp], rnk)
    */
  def adcTopK(codedCorpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, codebooks: Array[Array[Array[Double]]],
              topK: Int): DataFrame = {
    // the ADC LUT rides the broadcast query row — m·k sub-dots once per
    // query, m lookups per pair (values ≡ the inline adcScore form)
    val q = queries.select(col(idCol).as("query_id"),
      adcLut(col(vecCol).cast("array<double>"), codebooks).as("__lut"))
    val score = adcScoreLut(col("__lut"), col("code"), codebooks.length)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__s").desc, col(idCol))
    codedCorpus.select(col(idCol), col("code"))
      .join(broadcast(q), col(idCol) =!= col("query_id"))
      .withColumn("__s", score)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col(idCol).as("nn_id"),
        round(col("__s"), 6).as("score"), col("rnk").cast("long").as("rnk"))
  }

  /** IVF-PQ serving — the standard billion-scale ANN layout, composed
    * from the two halves this library already pins separately: the corpus
    * is routed into coarse cells ([[Similarity.ivfAssign]] — broadcast
    * centroids, the corpus never shuffles) and stored as PQ CODES; a query
    * probes its `nprobe` nearest cells and ranks ONLY those cells' codes
    * by ADC — so query cost is (probed fraction of corpus) × (bytes of
    * codes), neither a full scan nor a float read. Deterministic end to
    * end (all ties break on ids), hence oracle-checkable.
    *
    * @return (query_id, nn_id, centroid_id, score [ADC, 6dp], rnk)
    */
  def ivfPqTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
                codebooks: Array[Array[Array[Double]]],
                nprobe: Int, topK: Int): DataFrame =
    ivfServe(corpus, centroids, queries, codebooks, nprobe, topK,
      residual = false, rotation = None)

  /** IVF-PQ with RESIDUAL encoding — true IVFADC (Jégou et al. 2011,
    * §V.A): each corpus vector is stored as the PQ code of its residual
    * `v − c(cell)` rather than of `v` itself. Residuals concentrate near
    * the origin (the coarse quantizer has already explained the
    * between-cell variance), so the same m·log₂k code bits spend their
    * resolution on the within-cell detail — the accuracy step that makes
    * IVF-PQ competitive at high compression, and what [[ivfPqTopK]]'s
    * raw-vector variant leaves on the table (QuantizeSpec pins residual
    * recall ≥ raw recall on the synthetic corpus).
    *
    * Inner-product scoring decomposes exactly:
    * `q·v = q·c + q·(v−c) ≈ q·c + adc(q, code(v−c))` — one extra dot
    * against the (already-broadcast) probed centroid per (query, cell),
    * nothing per corpus row. Same plan shape as [[ivfPqTopK]]: broadcast
    * centroids route the corpus without shuffling it, codes are the only
    * per-row storage, queries broadcast against probed cells only.
    * Deterministic end to end (residual subtraction is element-wise IEEE,
    * mirrored exactly by the oracle's `list_transform` replay; all ties
    * break on ids).
    *
    * @return (query_id, nn_id, centroid_id, score [q·c + ADC, 6dp], rnk)
    */
  def ivfPqResidualTopK(corpus: DataFrame, centroids: DataFrame,
                        queries: DataFrame,
                        codebooks: Array[Array[Array[Double]]],
                        nprobe: Int, topK: Int): DataFrame =
    ivfServe(corpus, centroids, queries, codebooks, nprobe, topK,
      residual = true, rotation = None)

  /** ONE serving pipeline for the three IVF-PQ variants — raw codes,
    * residual codes (IVFADC), and OPQ-rotated residual codes. The
    * cell-routing, probe, ADC and top-k plumbing is identical across
    * them (a tie-break or parenthesization fix must land exactly once);
    * the variants differ ONLY in what gets coded (v, v−c, or R·(v−c))
    * and whether scores carry the coarse q·c term with a rotated ADC
    * query. Expression shapes are pinned — the q161/q167/q178 oracles
    * replay them literally.
    */
  private def ivfServe(corpus: DataFrame, centroids: DataFrame,
                       queries: DataFrame,
                       codebooks: Array[Array[Array[Double]]],
                       nprobe: Int, topK: Int,
                       residual: Boolean,
                       rotation: Option[Array[Array[Double]]]): DataFrame = {
    require(rotation.isEmpty || residual,
      "ivfServe: rotation applies to residual coding")
    val assigned = Similarity.ivfAssign(corpus, centroids)
      .select(col("vec_id").as("nn_id"), col("embedding"), col("centroid_id"))
    val toCode =
      if (!residual) assigned.withColumn("__in",
        col("embedding").cast("array<double>"))
      else {
        val centVecs = centroids.select(col("vec_id").as("centroid_id"),
          col("embedding").cast("array<double>").as("__ce"))
        val res = assigned.join(broadcast(centVecs), "centroid_id")
          .withColumn("__res",
            zip_with(col("embedding").cast("array<double>"), col("__ce"),
              (a, b) => a - b))
        rotation.fold(res.withColumn("__in", col("__res")))(r =>
          res.withColumn("__in", rotate(col("__res"), r)))
      }
    val coded = encode(toCode, "__in", codebooks)
      .select(col("nn_id"), col("centroid_id"), col("code"))
    val cent = centroids.select(col("vec_id").as("centroid_id"),
      col("embedding").as("cent_emb"),
      VF.dot(col("embedding"), col("embedding")).as("c2"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("qdist"), col("centroid_id"))
    val probes0 = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        VF.dot(col("embedding"), col("embedding")).as("a2"))
      .crossJoin(broadcast(cent))
      .withColumn("qdist",
        col("a2") + col("c2") - lit(2.0) * VF.dot(col("q_emb"), col("cent_emb")))
      .withColumn("pr", row_number().over(wProbe)).filter(col("pr") <= nprobe)
    // the ADC LUT rides the broadcast probe rows — m·k sub-dots once per
    // (query[, probed cell]), m lookups per pair (≡ the inline form)
    val probes =
      if (!residual)
        probes0.select(col("query_id"),
          adcLut(col("q_emb").cast("array<double>"), codebooks).as("__lut"),
          col("centroid_id"))
      else {
        // q·c once per (query, probed cell) — the residual decomposition's
        // coarse term, shipped with the (tiny) probe set; under rotation
        // the ADC query rotates too ((R·q)·(R·res) = q·res, orthogonality)
        val base = probes0.select(col("query_id"), col("centroid_id"),
          VF.dot(col("q_emb"), col("cent_emb")).as("__qdotc"),
          col("q_emb").cast("array<double>").as("__qe0"))
        rotation.fold(base.withColumn("__qe", col("__qe0")))(r =>
          base.withColumn("__qe", rotate(col("__qe0"), r)))
          .select(col("query_id"), col("centroid_id"), col("__qdotc"),
            adcLut(col("__qe"), codebooks).as("__lut"))
      }
    // grouping pinned: (qdotc +) left-folded ADC terms, matching the
    // oracle's parenthesization so the doubles agree to the last ulp
    val adc = adcScoreLut(col("__lut"), col("code"), codebooks.length)
    val score = if (residual) col("__qdotc") + adc else adc
    val wK = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__s").desc, col("nn_id"))
    coded.join(broadcast(probes), "centroid_id")
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("__s", score)
      .withColumn("rnk", row_number().over(wK)).filter(col("rnk") <= topK)
      .select(col("query_id"), col("nn_id"), col("centroid_id"),
        round(col("__s"), 6).as("score"), col("rnk").cast("long").as("rnk"))
  }

  /** Seeded random ORTHOGONAL rotation — the rotation leg of optimized
    * product quantization (Ge et al., "Optimized Product Quantization for
    * Approximate Nearest Neighbor Search", CVPR 2013: a rotation R makes
    * the PQ subspace split respect the data rather than the raw
    * coordinate order; the seeded-random variant is the paper's RR
    * baseline, which already captures most of the win when codebooks are
    * re-trained in the rotated space, because it spreads anisotropic
    * energy evenly across subspaces). Deterministic modified Gram-Schmidt
    * over a seeded Gaussian matrix: rows are orthonormal, regenerate
    * bit-identically from the seed, and inline literally into a SQL
    * oracle — the same replay scheme as [[seededCodebooks]].
    */
  def seededRotation(dim: Int, seed: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed.toLong * 7778777 + 13)
    val a = Array.fill(dim, dim)(rnd.nextGaussian())
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < i) {
        var d = 0.0
        var k = 0
        while (k < dim) { d += a(i)(k) * a(j)(k); k += 1 }
        k = 0
        while (k < dim) { a(i)(k) -= d * a(j)(k); k += 1 }
        j += 1
      }
      var n = 0.0
      var k = 0
      while (k < dim) { n += a(i)(k) * a(i)(k); k += 1 }
      n = math.sqrt(n)
      k = 0
      while (k < dim) { a(i)(k) /= n; k += 1 }
      i += 1
    }
    a
  }

  /** `R·v` as a pure projection: one [[VF.dot]] per output dimension
    * against a literal rotation row — codegen'd, no shuffle, and each
    * fold mirrored exactly by the oracle's `list_dot_product`.
    */
  def rotate(vec: Column, r: Array[Array[Double]]): Column =
    array(r.map(row => VF.dot(vec, typedLit(row.toSeq))): _*)

  /** OPQ-rotated residual IVF-PQ — [[ivfPqResidualTopK]] with the
    * rotation applied to the residuals before coding. Orthogonality keeps
    * the scoring decomposition exact:
    * `q·v = q·c + q·res = q·c + (R·q)·(R·res) ≈ q·c + adc(R·q, code(R·res))`
    * — so the ONLY extra work is d dots per corpus row at ENCODE time
    * (write-side, once) and d dots per query (broadcast-side, tiny); the
    * serving plan shape is unchanged: broadcast centroids route the
    * corpus without shuffling it, codes are the only per-row storage,
    * queries probe `nprobe` cells. Same-seed codebooks over rotated
    * residuals spend their bits on evenly-spread energy, which is where
    * the recall lift at a fixed bit budget comes from (QuantizeSpec pins
    * it on an anisotropic corpus).
    *
    * @return (query_id, nn_id, centroid_id, score [q·c + ADC, 6dp], rnk)
    */
  def ivfPqOpqTopK(corpus: DataFrame, centroids: DataFrame,
                   queries: DataFrame,
                   codebooks: Array[Array[Array[Double]]],
                   rotation: Array[Array[Double]],
                   nprobe: Int, topK: Int): DataFrame =
    ivfServe(corpus, centroids, queries, codebooks, nprobe, topK,
      residual = true, rotation = Some(rotation))

  /** Refine seeded codebooks with `iters` Lloyd iterations over the
    * corpus — per-subspace k-means trained in ONE distributed pass per
    * iteration for all m subspaces at once: explode to (subspace, subvec)
    * rows, assign by the same argmin expression [[encode]] uses, reduce
    * per (subspace, centroid) to per-dimension sums + counts (a single
    * map-side-combined hash aggregate; `m·k` result rows — driver
    * metadata, like the IVF trainer), recompute means driver-side. An
    * emptied centroid keeps its previous position (the deterministic
    * choice; a production k-means++ reseed would inject data dependence).
    * Quantization error is non-increasing per iteration — pinned by the
    * spec.
    */
  def trainCodebooks(df: DataFrame, vecCol: String, init: Array[Array[Array[Double]]],
                     iters: Int): Array[Array[Array[Double]]] = {
    val m = init.length
    val subDim = init(0)(0).length
    val v = col(vecCol).cast("array<double>")
    val subs = df.select(posexplode(array((0 until m).map(j =>
        subCol(v, j, subDim)): _*)).as(Seq("j", "sub")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var books = init.map(_.map(_.clone()))
      (1 to iters).foreach { _ =>
        val assigned = subs.withColumn("c",
          (0 until m).map(j => (j, {
            val dists = array(books(j).map(c => distKey(col("sub"), c)): _*)
            (array_position(dists, array_min(dists)) - 1).cast("int")
          })).foldLeft(lit(-1)) { case (acc, (j, code)) =>
            when(col("j") === j, code).otherwise(acc)
          })
        val aggCols = count(lit(1)).as("n") +: (0 until subDim).map(d =>
          sum(element_at(col("sub"), d + 1)).as(s"s$d"))
        // m·k result rows — driver METADATA, streamed (not collect()ed,
        // the same contract as rowLevelPlan's per-file counts)
        val it = assigned.groupBy("j", "c")
          .agg(aggCols.head, aggCols.tail: _*)
          .toLocalIterator()
        val next = books.map(_.map(_.clone()))
        while (it.hasNext) {
          val r = it.next()
          val (j, c, n) = (r.getInt(0), r.getInt(1), r.getLong(2))
          if (n > 0L)
            next(j)(c) = Array.tabulate(subDim)(d =>
              r.getDouble(r.fieldIndex(s"s$d")) / n)
        }
        books = next
      }
      books
    } finally subs.unpersist(false)
  }

  /** Mean squared quantization error of `codebooks` over the corpus — the
    * objective Lloyd descends; exposed for the trainer's invariant test
    * and for codebook-quality monitoring.
    */
  def quantizationMse(df: DataFrame, vecCol: String,
                      codebooks: Array[Array[Array[Double]]]): Double = {
    val subDim = codebooks(0)(0).length
    val v = col(vecCol).cast("array<double>")
    val err = codebooks.zipWithIndex.map { case (book, j) =>
      val sub = subCol(v, j, subDim)
      val dists = array(book.map { c =>
        val cl = typedLit(c.toSeq)
        // true squared distance here (not the argmin-equivalent key):
        // ‖x‖² − 2x·c + ‖c‖²
        VF.dot(sub, sub) - lit(2.0) * VF.dot(sub, cl) + VF.dot(cl, cl)
      }: _*)
      array_min(dists)
    }.reduce(_ + _)
    df.agg(avg(err)).head().getDouble(0)
  }

  // ------------------------------------------------------------ SQ8 (V9)

  /** Train per-dimension SCALAR quantization bounds (SQ8): the [min, max]
    * envelope of every dimension over the corpus — ONE posexplode
    * aggregate, `dim` rows to the driver, broadcast back as literals. The
    * family member PQ does not cover: 4× compression (1 byte/dim vs
    * float32) with NO codebook training, the standard first rung of the
    * vector-compression ladder (Faiss's SQ8) before PQ's subspace codes.
    * Deterministic: exact min/max of the same doubles in any engine.
    */
  def sqTrain(corpus: DataFrame, vecCol: String,
              dim: Int): (Array[Double], Array[Double]) = {
    val bounds = corpus
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("__d", "__x")))
      .groupBy("__d").agg(min("__x").as("mn"), max("__x").as("mx"))
      .collect()
    require(bounds.length == dim,
      s"sqTrain: corpus vectors have ${bounds.length} dims, expected $dim")
    val mins = new Array[Double](dim)
    val maxs = new Array[Double](dim)
    bounds.foreach { r =>
      mins(r.getInt(0)) = r.getDouble(1)
      maxs(r.getInt(0)) = r.getDouble(2)
    }
    (mins, maxs)
  }

  /** SQ8 encode: `c_d = floor(255·(x_d − min_d)/span_d + 0.5)` clamped to
    * [0, 255] (`floor(x+0.5)` — an explicit rounding both engines define
    * identically; a constant dimension codes 0). `array<int>` codes —
    * the byte-level storage a parquet INT column dictionary-compresses to
    * ~1 byte/dim.
    */
  def sqCode(vec: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val spans = mins.zip(maxs).map { case (mn, mx) =>
      if (mx > mn) mx - mn else 0.0 }
    zip_with(
      zip_with(vec.cast("array<double>"), typedLit(mins.toSeq),
        (x, mn) => x - mn),
      typedLit(spans.toSeq),
      (d, s) => when(s === 0.0, lit(0)).otherwise(
        least(greatest(floor(d * 255.0 / s + 0.5), lit(0.0)), lit(255.0))
          .cast("int")))
  }

  /** Dequantized vector from SQ8 codes: `min_d + c_d·span_d/255`. */
  def sqDecode(code: Column, mins: Array[Double],
               maxs: Array[Double]): Column = {
    val spans = mins.zip(maxs).map { case (mn, mx) =>
      if (mx > mn) mx - mn else 0.0 }
    zip_with(
      zip_with(code, typedLit(spans.toSeq),
        (c, s) => c.cast("double") * s / 255.0),
      typedLit(mins.toSeq), (x, mn) => x + mn)
  }

  /** SQ8 brute-force top-k: queries (full precision) score against the
    * DEQUANTIZED corpus codes — the asymmetric form, like ADC. The corpus
    * scan reads codes only (a quarter of the float bytes); the bounds are
    * plan-time literals, so the whole score is one codegen'd projection
    * and the only shuffle is the final per-query top-k.
    *
    * @return (query_id, nn_id, score [6dp], rnk) — q160's serving shape.
    */
  def sqTopK(codedCorpus: DataFrame, queries: DataFrame, idCol: String,
             codeCol: String, queryVecCol: String,
             mins: Array[Double], maxs: Array[Double], k: Int): DataFrame = {
    // dequantize ON THE CORPUS SIDE, once per row — the decoded vector
    // depends only on the corpus row, and inlining it under the dot made
    // every (corpus, query) pair re-run the zip_with decode (r18 perf;
    // identical values, so the scores are bit-equal)
    val scored = codedCorpus
      .select(col(idCol).as("nn_id"),
        sqDecode(col(codeCol), mins, maxs).as("__dv"))
      .crossJoin(broadcast(queries.select(col(idCol).as("query_id"),
        col(queryVecCol).cast("array<double>").as("qe"))))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        VF.dot(col("qe"), col("__dv")).as("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("s").desc, col("nn_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("nn_id"), round(col("s"), 6).as("score"),
        col("rnk"))
  }
}
