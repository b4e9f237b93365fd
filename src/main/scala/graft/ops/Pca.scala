package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spectral embedding analytics: exact covariance and dominant-direction
  * extraction — the diagnosis pass before quantization/whitening
  * ([[Quantize]]) and the "is there one axis explaining this corpus"
  * readout (anisotropy is THE known failure mode of sentence-embedding
  * spaces: a dominant direction that swamps cosine similarity).
  *
  * Everything is deterministic and oracle-replayable: moment sums
  * accumulate in DECIMAL (partitioning cannot reorder them), the power
  * iteration runs a FIXED number of rounds from a FIXED start vector, and
  * every within-round sum nano-quantizes its terms before adding (the
  * [[Drift.psiDrift]] commuting-integer pattern) — so two engines
  * replaying the same rounds produce bit-identical directions.
  */
object Pca {

  /** Exact covariance matrix of a `dim`-wide embedding column, raw-moment
    * form `C_ij = S_ij/n − (S_i/n)·(S_j/n)` — all three moment sums exact
    * from ONE aggregate, the divisions and multiply a fixed IEEE tree per
    * cell.
    *
    * Moments quantize per row to PICO-grain (1e-12) longs INSIDE codegen
    * and sum as DECIMAL(38,0). `floor(p·1e12 + 0.5)` is numerically the
    * `cast(DECIMAL(38,12))` it replaces — both round to the nearest
    * 1e-12, and a dyadic double can never sit ON a tie — but it keeps the
    * per-row work in double registers instead of allocating a BigDecimal
    * per product: measured 23 s → ~2 s over 20M pair rows at sf0.1.
    * Contract: |x_i·x_j| ≤ 9e6 (pico-scaled must fit a long) — embedding
    * coordinates are O(1); loudly out of range for general ledgers.
    *
    * Scale shape (r16): ONE native moment aggregate
    * ([[graft.functions.expressions.CovMomentsAgg]]) walks each vector
    * once inside a single buffer — d²/2 multiply+floor+add on primitive
    * long arrays per row, NO intermediate (i, j, xᵢ, xⱼ) rows — and the
    * shuffle carries one buffer per map partition. The moments are the
    * SAME pico-quantized integer sums the previous chained-posexplode
    * form accumulated (now in signed 128-bit hi/lo pairs, which also
    * removes that form's implicit ~9e6-row overflow headroom bound), so
    * every derived cell is bit-identical and q233/q234/q235 replay
    * unchanged; [[covarianceExploded]] keeps the row-expansion form as
    * the differential anchor. The corpus never shuffles.
    *
    * @return (i, j, n, cov) — d² rows, `cov` the raw double (feed to
    *         [[topDirection]]); micro-quantize for storage/compare
    */
  def covariance(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val upper = df.filter(v.isNotNull)
      .agg(graft.functions.expressions.CovMomentsAgg.covMoments(v).as("__m"))
      .select(explode(col("__m")).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"), col("c.n").as("n"),
        col("c.sij").as("__sij"), col("c.si").as("__si"),
        col("c.sj").as("__sj"))
    derive(upper)
  }

  /** The pre-r16 chained-posexplode covariance — identical output, d²
    * expanded rows per input row in the mapper. Kept as the differential
    * anchor for the native moment aggregate (PcaSpec pins equality) and
    * as the formulation an engine without imperative aggregates would
    * replay.
    */
  def covarianceExploded(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    def pico(c: Column) = floor(c * lit(1e12) + lit(0.5)).cast("long").cast(Dec0)
    // symmetry: generate and aggregate the UPPER TRIANGLE only (the
    // second posexplode slices from i), then mirror the off-diagonal
    // cells — halves both generate and aggregate work; the mirrored
    // cell's value is bit-identical (multiplication commutes)
    val pairs = df.filter(v.isNotNull)
      .select(posexplode(v).as(Seq("i", "xi")), v.as("__v"))
      .select(col("i"), col("xi"),
        posexplode(slice(col("__v"), col("i") + lit(1),
          size(col("__v")) - col("i"))).as(Seq("jr", "xj")))
    derive(pairs
      .groupBy(col("i").cast("long").as("i"),
        (col("i") + col("jr")).cast("long").as("j"))
      .agg(count(lit(1)).as("n"),
        sum(pico(col("xi") * col("xj"))).as("__sij"),
        sum(pico(col("xi"))).as("__si"),
        sum(pico(col("xj"))).as("__sj")))
  }

  /** Upper-triangle moment cells (i, j, n, __sij, __si, __sj) → the full
    * d² covariance table. ONE fixed IEEE tree per cell, shared by both
    * moment producers so the arithmetic can never fork.
    */
  private def derive(upper: DataFrame): DataFrame = {
    def cell(si: Column, sj: Column) =
      (col("__sij").cast("double") / lit(1e12) / col("n").cast("double") -
        (si.cast("double") / lit(1e12) / col("n").cast("double")) *
          (sj.cast("double") / lit(1e12) / col("n").cast("double")))
        .as("cov")
    upper.select(col("i"), col("j"), col("n"),
        cell(col("__si"), col("__sj")))
      .unionByName(upper.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("n"),
          cell(col("__sj"), col("__si"))))
  }

  private val Dec0 =
    org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

  /** Dominant eigendirection of a covariance TABLE by fixed-round power
    * iteration: `v ← C·v / ‖C·v‖`, `iters` rounds from the uniform unit
    * start `1/√d`. Fixed rounds + fixed start + nano-quantized in-round
    * sums = deterministic and replayable; convergence is geometric in the
    * eigengap, 8 rounds resolve any clearly-dominant axis (the use case —
    * a near-tied top pair has no stable "the" direction to report).
    * A start vector orthogonal to the dominant axis is measure-zero and
    * cannot persist under the quantized arithmetic.
    *
    * Scale shape: the matrix is d² rows — BOUNDED METADATA by contract
    * (the SQ8 per-dim-bounds class: a 64-dim space is 4 096 cells at any
    * corpus size), so the iteration collects it ONCE and runs driver-side
    * in the exact arithmetic below. The distributed alternative (8 rounds
    * × join + aggregate + lineage cut over a 4 096-row table) was
    * measured at ~3 s of fixed per-round scheduling overhead PER ROUND at
    * sf0.1 — 25 s for arithmetic a driver loop does in microseconds; the
    * corpus-scale work lives entirely in [[covariance]]'s one scan.
    *
    * Arithmetic (mirrored by the q234 oracle's unrolled CTEs): per round,
    * `w_i = Σ_j floor(C_ij·v_j·1e9 + 0.5) / 1e9` (Long-summed — integer
    * addition commutes), `‖w‖ = sqrt(Σ floor(w_i²·1e9 + 0.5) / 1e9)`,
    * `v_i = w_i/‖w‖` (all-zero matrix → zero vector, never a crash).
    *
    * @return (i, v_i) — the unit direction, raw doubles
    */
  def topDirection(cov: DataFrame, dim: Int, iters: Int = 8): DataFrame = {
    require(dim >= 2, s"topDirection: dim must be >= 2, got $dim")
    require(iters >= 1, s"topDirection: iters must be >= 1, got $iters")
    val cells = cov.select(col("i").cast("long"), col("j").cast("long"),
      col("cov").cast("double")).collect()
    val idx = cells.map(_.getLong(0)).distinct.sorted
    val pos = idx.zipWithIndex.toMap
    val d = idx.length
    val m = Array.ofDim[Double](d, d)
    cells.foreach { r =>
      for (pi <- pos.get(r.getLong(0)); pj <- pos.get(r.getLong(1)))
        m(pi)(pj) = r.getDouble(2)
    }
    def nano(x: Double): Long = math.floor(x * 1e9 + 0.5).toLong
    var v = Array.fill(d)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d) { pi =>
        var acc = 0L
        var pj = 0
        while (pj < d) { acc += nano(m(pi)(pj) * v(pj)); pj += 1 }
        acc.toDouble / 1e9
      }
      val nrm = math.sqrt(w.map(x => nano(x * x)).sum.toDouble / 1e9)
      v = w.map(x => if (nrm == 0.0) 0.0 else x / nrm)
    }
    val spark = cov.sparkSession
    import spark.implicits._
    idx.zip(v).toSeq.toDF("i", "v")
  }

  /** Variance share of a (unit) direction: the Rayleigh quotient `vᵀCv`
    * over `trace(C)` — "how much of the space is this one axis", the
    * anisotropy number ([[topDirection]]'s direction with share ≈ 1 means
    * cosine similarity is measuring mostly that axis). Terms nano-floor
    * before summing (commuting-integer discipline), exact long nanos out,
    * ONE division for the share; an all-zero matrix reports NULL share.
    *
    * Scale shape: two aggregates over the d² matrix table — corpus-free.
    *
    * @return one row: (lambda_nano, trace_nano, share_micro)
    */
  def dominantShare(cov: DataFrame, direction: DataFrame): DataFrame = {
    def nano(term: Column) =
      sum(floor(term * lit(1e9) + lit(0.5)).cast("long"))
    val vi = direction.select(col("i"), col("v").as("__vi"))
    val vj = direction.select(col("i").as("j"), col("v").as("__vj"))
    val lam = cov.join(vi, Seq("i")).join(vj, Seq("j"))
      .agg(nano(col("cov") * col("__vi") * col("__vj")).as("lambda_nano"))
    val tr = cov.filter(col("i") === col("j"))
      .agg(nano(col("cov")).as("trace_nano"))
    lam.crossJoin(broadcast(tr))
      .select(col("lambda_nano"), col("trace_nano"),
        floor(when(col("trace_nano") === 0, lit(null))
          .otherwise(col("lambda_nano").cast("double") /
            col("trace_nano").cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("share_micro"))
  }

  /** All-but-the-top embedding correction (Mu & Viswanath 2018): remove
    * the dominant direction from every vector, `x' = x − (x·v)·v` — the
    * standard anisotropy fix that restores cosine contrast when
    * [[dominantShare]] says one axis is swamping the space. The direction
    * assembles into ONE broadcast array row; per-row work is a single
    * native dot plus d multiply-subtracts in codegen — one corpus scan,
    * no shuffle.
    *
    * Output at (id, dimension) grain, micro-quantized — array columns
    * stringify engine-specifically (the [[Similarity.kmeansStep]]
    * per-dimension discipline); reassemble downstream with
    * `array_sort(collect_list(struct(i, …)))`.
    *
    * @return (idCol, i, v_micro)
    */
  def removeDominant(df: DataFrame, idCol: String, vecCol: String,
                     direction: DataFrame): DataFrame = {
    val dir = direction
      .agg(array_sort(collect_list(struct(col("i"), col("v")))).as("__s"))
      .select(transform(col("__s"), s => s.getField("v")).as("__dir"))
    val v = col(vecCol).cast("array<double>")
    df.filter(v.isNotNull)
      .crossJoin(broadcast(dir))
      .withColumn("__proj",
        graft.functions.VectorFunctions.dot(v, col("__dir")))
      .select(col(idCol), posexplode(zip_with(v, col("__dir"),
        (x, dv) => x - col("__proj") * dv)).as(Seq("i", "__x")))
      .select(col(idCol), col("i").cast("long").as("i"),
        floor(col("__x") * lit(1000000.0) + lit(0.5)).cast("long")
          .as("v_micro"))
  }

  /** Per-vector projection onto a direction TABLE (e.g. [[topDirection]]'s
    * output): the direction assembles into ONE broadcast array row, the
    * score is a single native left-to-right dot per corpus row — one scan,
    * no corpus shuffle. The de-biasing / outlier-axis score ("how much of
    * this vector is the dominant direction").
    *
    * @return df's idCol plus `proj` (raw double)
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
              direction: DataFrame): DataFrame = {
    val dir = direction
      .agg(array_sort(collect_list(struct(col("i"), col("v")))).as("__s"))
      .select(transform(col("__s"), s => s.getField("v")).as("__dir"))
    df.filter(col(vecCol).isNotNull)
      .crossJoin(broadcast(dir))
      .select(col(idCol),
        graft.functions.VectorFunctions.dot(
          col(vecCol).cast("array<double>"), col("__dir")).as("proj"))
  }
}
