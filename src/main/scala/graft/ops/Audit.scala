package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-integrity audits — the declarative constraint checks (dbt tests /
  * Great Expectations) a warehouse runs after every load: foreign-key
  * orphans, key uniqueness, null rates, range violations. (The
  * reference's load path already worries about exactly this — its
  * anti-join dedup insert, /root/reference/loading.py:159-169, is a
  * uniqueness constraint enforced by hand; this generalizes the idea to
  * a gateable report.) Each check is a
  * tiny declarative plan returning violations, composable into one
  * (check, n_violations) report the pipeline can gate on.
  *
  * Scale shape: orphan checks are left-anti joins on the key (broadcast
  * when the parent key set fits, shuffle otherwise — Catalyst's call);
  * uniqueness and null/range checks are single map-side-combinable
  * aggregates. Nothing materializes violation ROWS unless the caller asks
  * ([[fkOrphans]] returns them for triage; the count wrappers don't).
  */
object Audit {

  /** Child rows whose non-null `childKey` has no match in
    * `parent.parentKey` — the rows a real FK constraint would reject.
    */
  def fkOrphans(child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")

  /** Count of rows IN EXCESS of one per key (0 = key is unique). */
  def duplicateKeyCount(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("n"))

  /** Count of rows violating an arbitrary row predicate (nulls in
    * `expected` count as violations — an unknown is not a pass).
    */
  def violationCount(df: DataFrame, expected: Column): DataFrame =
    df.agg(sum(when(coalesce(expected, lit(false)), 0L).otherwise(1L)).as("n"))
      .select(coalesce(col("n"), lit(0L)).as("n"))

  /** Assemble named checks into one (check, n_violations) report. Each
    * check DataFrame must be a single-row single-long-column count (what
    * the helpers above return, or `fkOrphans(...).agg(count)`).
    */
  def report(checks: Seq[(String, DataFrame)]): DataFrame =
    checks.map { case (name, df) =>
      df.select(lit(name).as("check"), col(df.columns.head).as("n_violations"))
    }.reduce(_ unionByName _)

  /** Order-independent content digest per group — the migration/
    * replication reconciliation primitive: run the SAME digest on both
    * sides of a copy (different engine, different cluster, different day)
    * and compare (n_rows, content_digest) per group instead of moving
    * 100 TB twice. The row hash is the first 60 bits of md5 over a
    * canonical encoding (field separator U+0001, null marker U+0000 —
    * distinguishable from empty strings and from column shifts);
    * the group digest SUMS row hashes into a decimal(38,0), so it is
    * insensitive to row order and partitioning, map-side combinable, and
    * bit-reproducible by any engine with md5 (mirrored verbatim in the
    * q134 DuckDB oracle — that PASS is two engines agreeing on 60k
    * digests).
    *
    * Columns are digested via CAST(... AS STRING); give float/double
    * columns an explicit rounding/cast upstream (engines disagree on
    * float-to-string spelling; integers, strings, dates, timestamps and
    * decimals are spelled identically).
    *
    * Scale shape: one projection + one hash aggregate — the cheapest
    * possible full-table pass; group by a partition-grained key so a
    * mismatch localizes the re-copy.
    */
  def tableDigest(df: DataFrame, groupCols: Seq[String],
                  digestCols: Seq[String]): DataFrame = {
    val canonical = concat_ws("\u0001",
      digestCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val rowHash = conv(substring(md5(canonical), 1, 15), 16, 10)
      .cast("decimal(38,0)")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(rowHash).as("content_digest"))
  }

  /** Compare two tables by group digest: one row per group where the
    * sides disagree (missing on either side counts as a mismatch, n_rows
    * null on the absent side). Empty result = tables reconcile.
    */
  def reconcile(a: DataFrame, b: DataFrame, groupCols: Seq[String],
                digestCols: Seq[String]): DataFrame = {
    val da = tableDigest(a, groupCols, digestCols)
      .withColumnsRenamed(Map("n_rows" -> "n_rows_a", "content_digest" -> "digest_a"))
    val db = tableDigest(b, groupCols, digestCols)
      .withColumnsRenamed(Map("n_rows" -> "n_rows_b", "content_digest" -> "digest_b"))
    da.join(db, groupCols, "full_outer")
      .filter(!(col("n_rows_a") <=> col("n_rows_b")) ||
        !(col("digest_a") <=> col("digest_b")))
  }

  /** Benford first-digit audit (Newcomb 1881 / Benford 1938) — the classic
    * forensic screen on financial amounts (the reference's domain):
    * naturally-occurring multiplicative quantities put digit d first with
    * probability `log10(1 + 1/d)`; fabricated or truncated data does not.
    * One row per digit 1–9 with observed count/share, the Benford
    * expectation, and the per-digit χ² term `(n_d − N·P_d)² / (N·P_d)` —
    * the total χ² (8 df) is one sum the caller takes, so the digits stay
    * inspectable (the calibration-bin convention).
    *
    * The first digit comes from the INTEGER measure's decimal string —
    * integers format identically in every engine, unlike float
    * `log10`-binning, which jitters at power-of-10 boundaries. Callers
    * pass an exact integral measure (money as cents — the house `Num`
    * discipline); non-positive and null measures are excluded (Benford is
    * about significant digits of positive magnitudes).
    *
    * Determinism: counts exact; the nine `P_d` are inlined double
    * literals (no runtime `log10`); each reported ratio/term is a fixed
    * IEEE tree, micro-quantized. Empty input reports n = 0 with NULL
    * ratios, never 0 — "nothing to audit" is not "digit never observed".
    *
    * Scale shape: ONE digit-grain aggregate (9 groups, map-side
    * combinable) + a 9-row literal grid join; the measure column is the
    * only thing read.
    *
    * @return (digit, n, p_obs_micro, p_exp_micro, chi_micro)
    */
  def benford(df: DataFrame, measure: Column): DataFrame = {
    val obs = df
      .filter(measure.isNotNull && measure.cast("long") > 0)
      .select(substring(measure.cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val grid = (1 to 9).map { d =>
      struct(lit(d).as("digit"), lit(math.log10(1.0 + 1.0 / d)).as("p_exp"))
    }
    val digits = obs.sparkSession.range(1).select(
      explode(array(grid: _*)).as("__g"))
      .select(col("__g.digit").as("digit"), col("__g.p_exp").as("p_exp"))
    val tot = obs.agg(coalesce(sum(col("n")), lit(0L)).as("__n"))
    def micro(c: Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    digits.join(obs, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        col("p_exp"), col("__n"))
      .select(col("digit"), col("n"),
        micro(when(col("__n") === 0, lit(null))
          .otherwise(col("n").cast("double") / col("__n").cast("double")),
          "p_obs_micro"),
        micro(col("p_exp"), "p_exp_micro"),
        micro(when(col("__n") === 0, lit(null)).otherwise {
          val e = col("__n").cast("double") * col("p_exp")
          (col("n").cast("double") - e) * (col("n").cast("double") - e) / e
        }, "chi_micro"))
  }

  private val Dec38 =
    org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

  /** Pearson chi-square test of independence between two categorical
    * columns, with Cramér's V — the "are these two attributes entangled"
    * audit (label vs source, language vs license, split vs topic) run
    * before a stratified sample or a leakage claim is trusted:
    * `χ² = Σ_ij (n_ij − e_ij)²/e_ij`, `e_ij = r_i·c_j/N`,
    * `V = √(χ²/(N·(min(R,C)−1)))` — the [0, 1] effect size χ²'s raw
    * magnitude hides.
    *
    * Exact-count core: the contingency cells, both margins and N come
    * from ONE (a, b) aggregate; the COMPLETE R×C grid (absent cells owe
    * their (0−e)²/e = e term) forms by crossing the margins — the
    * bounded-cardinality contract (categorical columns, not ids).
    * Expected counts are fixed IEEE trees of exact integers (r·c forms
    * in DECIMAL first — margin products pass Long at corpus scale);
    * per-cell terms NANO-floor before the decimal sum. Degenerate
    * min(R,C) = 1 reports NULL V (no association is measurable), never 0.
    *
    * @return one row: (n, n_a, n_b, chi2_nano, cramers_v_micro)
    */
  def chiSquareAssociation(df: DataFrame, colA: String,
                           colB: String): DataFrame = {
    val cells = graft.util.Caches.cache(
      df.filter(col(colA).isNotNull && col(colB).isNotNull)
        .groupBy(col(colA).as("__a"), col(colB).as("__b"))
        .agg(count(lit(1)).as("__nij"))).toDF
    val ra = cells.groupBy(col("__a")).agg(sum(col("__nij")).as("__r"))
    val cb = cells.groupBy(col("__b")).agg(sum(col("__nij")).as("__c"))
    val tot = ra.agg(sum(col("__r")).as("__n"),
      count(lit(1)).as("n_a"))
      .crossJoin(cb.agg(count(lit(1)).as("n_b")))
    val grid = ra.crossJoin(cb)
      .join(cells, Seq("__a", "__b"), "left")
      .crossJoin(broadcast(tot))
    val e = (col("__r").cast(Dec38) * col("__c").cast(Dec38)).cast("double") /
      col("__n").cast("double")
    val d = coalesce(col("__nij"), lit(0L)).cast("double") - e
    // GLOBAL aggregate + crossJoin, not a groupBy on the scalar totals:
    // an empty/all-null input must still honour the one-row contract
    // (n NULL, counts 0, χ² 0) instead of vanishing (review fix r16)
    val chi = grid.select(
        floor(d * d / e * lit(1e9) + lit(0.5)).cast("long").cast(Dec38)
          .as("__t"))
      .agg(coalesce(sum(col("__t")), lit(0).cast(Dec38)).as("__chi"))
    tot.crossJoin(chi)
      .select(col("__n").as("n"), col("n_a"), col("n_b"),
        // the sum of nano-longs is an exact integer already — cast, don't
        // re-round through double (precision ends at 2^53 there)
        col("__chi").cast("long").as("chi2_nano"),
        floor(when(least(col("n_a"), col("n_b")) <= 1, lit(null))
          .otherwise(sqrt((col("__chi").cast("double") / lit(1e9)) /
            (col("__n").cast("double") *
              (least(col("n_a"), col("n_b")).cast("double") - lit(1.0)))))
          * lit(1000000.0) + lit(0.5)).cast("long").as("cramers_v_micro"))
  }
}
