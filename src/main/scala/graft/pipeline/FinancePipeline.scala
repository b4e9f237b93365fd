package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Cleaning, Dedup, Joins}

/** The reference pipeline (extract → transform → load,
  * /root/reference/dag_script.py:51) recomposed as pure
  * DataFrame → DataFrame stages inside ONE engine — no CSV handoffs, no flag
  * file, no external anti-join.
  *
  * Stage mapping:
  *  - enrich:   Ticker→Company broadcast lookup (extraction.py:85-94)
  *  - mergeIncrement: union history+delta, keep-last per (Ticker, Date)
  *    (extraction.py:97-109) — precedence made explicit (delta wins).
  *  - standardize: rename / cast / calendar / fill / key
  *    (transformation.py:57-94)
  *  - loadIncrement: anti-join append (loading.py:141-176)
  */
object FinancePipeline {

  val rawRename = Map("Stock Splits" -> "stock_splits")

  val casts: Map[String, DataType] = Map(
    "Open" -> DoubleType, "High" -> DoubleType, "Low" -> DoubleType,
    "Close" -> DoubleType, "Volume" -> LongType,
    "Dividends" -> DoubleType, "stock_splits" -> DoubleType)

  /** Reference fidelity: fail fast on empty input
    * (transformation.py:52-54, loading.py:111-113) — but via `df.isEmpty`
    * (a limit-1 job), not the reference's full `count()` scan or the
    * `rdd.isEmpty()` RDD deoptimization.
    */
  def requireNonEmpty(df: DataFrame, stage: String): DataFrame = {
    require(!df.isEmpty, s"[$stage] empty input — aborting, as the reference DAG does")
    df
  }

  def enrich(bars: DataFrame, companies: DataFrame): DataFrame =
    Joins.broadcastLookup(bars, companies, Seq("Ticker"))

  /** Union history with a delta batch and keep the freshest row per
    * (Ticker, Date). `sourceRank`: higher wins (delta > history), then any
    * residual tie broken by the highest Volume — an explicit total order
    * where pandas relied on physical row position (extraction.py:105).
    */
  def mergeIncrement(history: DataFrame, delta: DataFrame): DataFrame = {
    val tagged = Dedup.unionAll(Seq(
      history.withColumn("__src", lit(0)), delta.withColumn("__src", lit(1))))
    Dedup.keepLast(tagged, Seq("Ticker", "Date"),
      Seq(col("__src").desc, col("Volume").desc)).drop("__src")
  }

  def standardize(df: DataFrame): DataFrame = {
    val renamed = Cleaning.renameColumns(df, rawRename)
    val cast = Cleaning.castColumns(
      renamed.withColumn("Date", to_date(col("Date"))), casts)
    val withCal = Cleaning.withCalendar(cast, "Date")
    val filled = Cleaning.fillDefaults(withCal)
    filled.withColumn("id", Cleaning.deterministicId(col("Ticker"), col("Date")))
      .select("id", "Date", "Year", "Month", "Day", "Quarter", "Weekday",
        "Ticker", "Company", "Open", "High", "Low", "Close", "Volume",
        "Dividends", "stock_splits")
  }

  /** New-rows-only increment against the serving table, keyed by the
    * deterministic id (the reference keys this on
    * monotonically_increasing_id — nondeterministic across reruns, see
    * SURVEY.md §4; (Ticker, Date) via the hash id is the logical key).
    */
  def loadIncrement(staging: DataFrame, target: DataFrame): DataFrame =
    Dedup.newRows(staging, target, Seq("id"))

  /** Typed surface: the standardized table as Dataset[Bar] (compile-time
    * field checks downstream), plus a typed derivation example.
    */
  def asBars(standardized: DataFrame)(
      implicit enc: org.apache.spark.sql.Encoder[graft.model.Bar])
      : org.apache.spark.sql.Dataset[graft.model.Bar] =
    standardized.as[graft.model.Bar]

  /** Per-ticker daily returns over the typed Dataset — lag-1 window. */
  def dailyReturns(bars: org.apache.spark.sql.Dataset[graft.model.Bar])(
      implicit enc: org.apache.spark.sql.Encoder[graft.model.BarReturn])
      : org.apache.spark.sql.Dataset[graft.model.BarReturn] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("Ticker").orderBy("Date")
    bars.toDF()
      .withColumn("prevClose", lag(col("Close"), 1).over(w))
      .withColumn("ret",
        when(col("prevClose").isNotNull && col("prevClose") =!= 0.0,
          col("Close") / col("prevClose") - 1.0))
      .select("Ticker", "Date", "Close", "prevClose", "ret")
      .as[graft.model.BarReturn]
  }
}
