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

  private val Dec12 =
    org.apache.spark.sql.types.DataTypes.createDecimalType(38, 12)

  /** Exact covariance matrix of a `dim`-wide embedding column, raw-moment
    * form `C_ij = S_ij/n − (S_i/n)·(S_j/n)` — all three sums exact
    * DECIMAL from ONE aggregate, the two divisions and one multiply a
    * fixed IEEE tree per cell.
    *
    * Scale shape: the chained posexplode expands each row to d² (i, j)
    * products IN the mapper, and the hash aggregate's partial combine
    * collapses them to d² accumulators per task BEFORE the shuffle — the
    * exchange carries d² rows per task, never corpus×d². (The expansion
    * is mapper CPU, the [[Similarity.kmeansStep]] corpus×d contract one
    * power higher; a native moment aggregate would cut that constant and
    * is the upgrade path if profiles demand.) The corpus never shuffles.
    *
    * @return (i, j, n, cov) — d² rows, `cov` the raw double (feed to
    *         [[topDirection]]); micro-quantize for storage/compare
    */
  def covariance(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val pairs = df.filter(v.isNotNull)
      .select(posexplode(v).as(Seq("i", "xi")), v.as("__v"))
      .select(col("i"), col("xi"), posexplode(col("__v")).as(Seq("j", "xj")))
    pairs.groupBy(col("i").cast("long").as("i"), col("j").cast("long").as("j"))
      .agg(count(lit(1)).as("n"),
        sum((col("xi") * col("xj")).cast(Dec12)).as("__sij"),
        sum(col("xi").cast(Dec12)).as("__si"),
        sum(col("xj").cast(Dec12)).as("__sj"))
      .select(col("i"), col("j"), col("n"),
        (col("__sij").cast("double") / col("n").cast("double") -
          (col("__si").cast("double") / col("n").cast("double")) *
            (col("__sj").cast("double") / col("n").cast("double")))
          .as("cov"))
  }

  /** Dominant eigendirection of a covariance TABLE by fixed-round power
    * iteration: `v ← C·v / ‖C·v‖`, `iters` rounds from the uniform unit
    * start `1/√d`. Fixed rounds + fixed start + nano-quantized in-round
    * sums = deterministic and replayable; convergence is geometric in the
    * eigengap, 8 rounds resolve any clearly-dominant axis (the use case —
    * a near-tied top pair has no stable "the" direction to report).
    * A start vector orthogonal to the dominant axis is measure-zero and
    * cannot persist under the quantized arithmetic.
    *
    * Scale shape: `iters` rounds of one join + one aggregate over the d²
    * MATRIX table — corpus-free; run [[covariance]] once, iterate on its
    * tiny output.
    *
    * @return (i, v_i) — the unit direction, raw doubles
    */
  def topDirection(cov: DataFrame, dim: Int, iters: Int = 8): DataFrame = {
    require(dim >= 2, s"topDirection: dim must be >= 2, got $dim")
    require(iters >= 1, s"topDirection: iters must be >= 1, got $iters")
    val c = graft.util.Caches.cache(
      cov.select(col("i"), col("j"), col("cov"))).toDF
    def nanoSum(term: Column) =
      sum(floor(term * lit(1e9) + lit(0.5)).cast("long")).cast("double") / lit(1e9)
    var v = c.select(col("i")).distinct()
      .select(col("i"), lit(1.0 / math.sqrt(dim.toDouble)).as("v"))
    for (_ <- 1 to iters) {
      val w = c.join(v.withColumnRenamed("i", "j"), Seq("j"))
        .groupBy(col("i")).agg(nanoSum(col("cov") * col("v")).as("w"))
      val nrm = w.agg(sqrt(nanoSum(col("w") * col("w"))).as("__nrm"))
      // per-round lineage cut (the pageRank discipline) — without it the
      // iterated join/aggregate plan nests geometrically and the plan
      // STRING alone outgrows the heap by round ~6
      v = w.crossJoin(broadcast(nrm))
        .select(col("i"),
          when(col("__nrm") === 0.0, lit(0.0))
            .otherwise(col("w") / col("__nrm")).as("v"))
        .localCheckpoint(true)
    }
    v
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
