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
}
