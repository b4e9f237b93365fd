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
}
