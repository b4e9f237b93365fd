package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Caches

/** Event-log product analytics: ordered funnels and cohort retention — the
  * two queries every event pipeline (reference domain: per-entity time
  * series, /root/reference/extraction.py:105) grows once events carry a
  * user id. Both are exact and oracle-checkable.
  *
  * FUNNEL: "of users who did step 1, how many then did step 2 AFTER it,
  * then step 3 after that …". Each step is a keyed min-timestamp aggregate
  * joined to the previous step's reach table — k small shuffles on the user
  * key, never a per-user event array, so an entity with millions of events
  * costs the same as one with ten. The step tables are persisted (tracked
  * by [[Caches]]) because the final count union re-reads every prefix.
  *
  * RETENTION: users bucketed by their first-activity period (the cohort),
  * counted per (cohort, periods-since-cohort). One distinct shuffle + one
  * keyed aggregate; the events table is never joined to itself.
  *
  * Scale shape: both operators reduce the event log to user-period /
  * user-step grain in their FIRST aggregate; everything after runs on
  * user-cardinality data. At 100 TB the only big shuffles are those first
  * aggregates, both map-side combinable.
  */
object Funnels {

  /** Per-user funnel step times, WIDE: one row per step-1 reacher with
    * `t_1 … t_k` — `t_i` is the user's first time completing steps 1..i in
    * order (strictly after `t_{i-1}`), null once they drop off. The shared
    * core of [[funnel]] (counts) and funnel-LATENCY analyses (deltas
    * between the columns are per-user conversion times).
    *
    * @param withinSeconds optional max gap: step i must land within this
    *                      many seconds of t_{i-1} (the "converted within
    *                      an hour" variant); None = unbounded
    */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String],
                  withinSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val slim = events.select(col(userCol).as("__u"), col(tsCol).as("__t"),
      col(typeCol).as("__e"))
    // reach(i): (user, first time the user completed steps 0..i in order)
    val reach = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val stepEvents = slim.filter(col("__e") === step).drop("__e")
        val qualified = prev match {
          case None => stepEvents
          case Some(r) =>
            val gate = withinSeconds match {
              case Some(w) => col("__t") > col("__prev") &&
                col("__t") <= col("__prev") + expr(s"INTERVAL $w SECOND")
              case None => col("__t") > col("__prev")
            }
            stepEvents.join(r.select(col("__u"), col("__t").as("__prev")), Seq("__u"))
              .filter(gate)
        }
        Some(Caches.cache(
          qualified.groupBy("__u").agg(min(col("__t")).as("__t"))).toDF)
    }.flatten
    reach.zipWithIndex.map { case (r, i) =>
      r.select(col("__u"), col("__t").as(s"t_${i + 1}"))
    }.reduce((acc, r) => acc.join(r, Seq("__u"), "left"))
      .withColumnRenamed("__u", userCol)
  }

  /** Ordered-funnel step counts.
    *
    * A user reaches step i when they have an event of `steps(i)` STRICTLY
    * after their first qualifying time for step i−1 (the standard
    * "first-touch" funnel; ties on the boundary don't advance). Counts
    * come from ONE aggregate over the [[funnelTimes]] wide table.
    *
    * @return one row per step: (step, step_name, n_users,
    *         conv — fraction of step-1 reachers still present)
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             withinSeconds: Option[Long] = None): DataFrame = {
    val wide = funnelTimes(events, userCol, tsCol, typeCol, steps, withinSeconds)
    val counts = wide.agg(
      count(col("t_1")).as("__n_1"),
      (2 to steps.size).map(i => count(col(s"t_$i")).as(s"__n_$i")): _*)
    // one row per step via explode of TYPED literals — step names are data,
    // never SQL text (a quote in a step name must not become a parse error
    // or an expression injection)
    val stepRows = array(steps.indices.map(i =>
      struct(lit(i + 1).as("step"), lit(steps(i)).as("step_name"),
        col(s"__n_${i + 1}").as("n_users"))): _*)
    counts.select(explode(stepRows).as("__r"), col("__n_1").as("__n0"))
      .select(col("__r.step").as("step"), col("__r.step_name").as("step_name"),
        col("__r.n_users").as("n_users"), col("__n0"))
      .withColumn("conv", when(col("__n0") === 0, lit(null).cast("double"))
        .otherwise(col("n_users").cast("double") / col("__n0")))
      .drop("__n0")
  }

  /** Funnel latency: for each ADJACENT step pair, the distribution of
    * per-user conversion time (seconds between first-reach times) among
    * users who completed the pair — the "how long does the funnel take"
    * readout next to [[funnel]]'s "how many make it".
    *
    * Exact percentiles (interpolated, ≡ DuckDB `quantile_cont`); the
    * seconds value is an exact-integer µs difference over 1e6 — one
    * double division, engine-stable.
    *
    * @return (step, step_name, n_users, p50_s, p90_s) for steps 2..k
    */
  def funnelLatency(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String],
                    withinSeconds: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, "funnelLatency needs at least two steps")
    val wide = Caches.cache(funnelTimes(events, userCol, tsCol, typeCol,
      steps, withinSeconds)).toDF
    (2 to steps.size).map { i =>
      val d = (unix_micros(col(s"t_$i").cast("timestamp")) -
        unix_micros(col(s"t_${i - 1}").cast("timestamp"))).cast("double") / 1e6
      wide.filter(col(s"t_$i").isNotNull)
        .agg(count(lit(1)).as("n_users"),
          round(percentile(d, lit(0.5)), 6).as("p50_s"),
          round(percentile(d, lit(0.9)), 6).as("p90_s"))
        .select(lit(i).as("step"), lit(steps(i - 1)).as("step_name"),
          col("n_users"), col("p50_s"), col("p90_s"))
    }.reduce(_ unionByName _)
  }

  /** Cohort retention: users grouped by first-activity period, counted per
    * periods-since-cohort offset.
    *
    * @param unit Spark `date_trunc` unit; "week" and "month" are the
    *             conventional grains. Offsets are exact integers because
    *             both endpoints are truncated to the same grain.
    * @return (cohort, period_offset, n_users, retention) — retention is
    *         n_users over the cohort's offset-0 size (offset 0 always
    *         exists: the first-activity period is itself an activity).
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      unit: String = "week"): DataFrame = {
    val perPeriod = unit match {
      case "week"  => 7
      case "day"   => 1
      case other   => throw new IllegalArgumentException(
        s"cohortRetention supports day/week offsets, got '$other'")
    }
    val activity = Caches.cache(
      events.select(col(userCol).as("__u"),
        date_trunc(unit, col(tsCol)).as("__w")).distinct()).toDF
    val cohorts = activity.groupBy("__u").agg(min(col("__w")).as("__c"))
    val ret = Caches.cache(
      activity.join(cohorts, Seq("__u"))
        .groupBy(col("__c").as("cohort"),
          (datediff(col("__w"), col("__c")) / perPeriod).cast("int").as("period_offset"))
        .agg(count(lit(1)).as("n_users"))).toDF
    val base = ret.filter(col("period_offset") === 0)
      .select(col("cohort"), col("n_users").as("__n0"))
    ret.join(base, Seq("cohort"))
      .withColumn("retention", col("n_users").cast("double") / col("__n0"))
      .drop("__n0")
  }

  /** First-order Markov transition table over the event stream:
    * P(next event type | current) from per-entity ordered lag pairs — the
    * "what do users do next" table behind next-action prediction, UX path
    * auditing, and anomaly detection (a transition whose probability
    * collapses release-over-release is a broken flow).
    *
    * Scale shape: one window shuffle by entity for the lag, one hash
    * aggregate on (from, to) — type²-bounded output — and a window sum
    * over `from` for the conditionals (exact longs; the single division
    * is engine-stable). The event-string fold of [[sequenceMatch]] is NOT
    * used here: lag windows need no per-entity materialization.
    *
    * @return (from_type, to_type, n, p) with Σ p = 1 per from_type
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  tiebreakCol: String, typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(tsCol, tiebreakCol)
    events
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("from_type")))
  }

  /** Growth accounting: decompose each period's active users into
    * NEW (first-ever activity), RETAINED (also active the previous
    * period), RESURRECTED (active before, but not the previous period) —
    * plus CHURNED, attributed to the period AFTER the user's last active
    * one (capped at the data's final period, so the horizon doesn't
    * manufacture churn). The identity
    * `active(w) = new + retained + resurrected` and
    * `churned(w) = active(w−1) − retained(w)` makes the output
    * self-auditing.
    *
    * Scale shape: like [[cohortRetention]], the log collapses to distinct
    * user-period grain first; everything after — first-period aggregate,
    * previous-period self-join, churn anti-join — runs on that reduced
    * table, keyed by user. The per-period counts are group-cardinality
    * small.
    *
    * @return (period, n_new, n_retained, n_resurrected, n_churned) —
    *         zero-filled where a class is empty
    */
  def growthAccounting(events: DataFrame, userCol: String, tsCol: String,
                       unit: String = "week"): DataFrame = {
    val days = unit match {
      case "week" => 7
      case "day"  => 1
      case other  => throw new IllegalArgumentException(
        s"growthAccounting supports day/week periods, got '$other'")
    }
    val act = Caches.cache(
      events.select(col(userCol).as("__u"),
        date_trunc(unit, col(tsCol)).as("__w")).distinct()).toDF
    val first = act.groupBy("__u").agg(min(col("__w")).as("__fw"))
    val shifted = act.select(col("__u"),
      (col("__w") + expr(s"INTERVAL $days DAY")).as("__w"),
      lit(true).as("__prev"))
    val maxW = act.agg(max(col("__w")).as("__mw"))
    val status = act.join(first, Seq("__u"))
      .join(shifted, Seq("__u", "__w"), "left")
      .groupBy(col("__w").as("period"))
      .agg(
        sum(when(col("__w") === col("__fw"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("__w") =!= col("__fw") && col("__prev"), 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("__w") =!= col("__fw") && col("__prev").isNull, 1L).otherwise(0L))
          .as("n_resurrected"))
    val churned = shifted.join(act, Seq("__u", "__w"), "left_anti")
      .crossJoin(broadcast(maxW))
      .filter(col("__w") <= col("__mw"))
      .groupBy(col("__w").as("period"))
      .agg(count(lit(1)).as("n_churned"))
    status.join(churned, Seq("period"), "full_outer")
      .select(col("period"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** MATCH_RECOGNIZE-lite: find entities whose ORDERED event-type sequence
    * matches a regex. Each entity's events collapse to one character per
    * event (via `encode`, e.g. first letter of the type) in (ts, tiebreak)
    * order; the pattern then runs ONCE per entity on that compact string —
    * funnels with alternation, negation, and quantifiers ("purchase before
    * any error" = `^[^e]*p`) that the step-join form of [[funnel]] cannot
    * express.
    *
    * Scale shape: one shuffle by entity; each entity's sequence
    * materializes as a string on one task — the same bounded-per-entity
    * contract as sessionization or [[Windows.ema]] (events-per-user scale,
    * not corpus scale). Keep the regex in the portable intersection of
    * Java regex and RE2 (character classes, anchors, quantifiers,
    * alternation — no backreferences or lookaround) so engines agree.
    *
    * @param encode event-type → single-character projection
    * @return matching entities: (userCol, seq, n_events)
    */
  def sequenceMatch(events: DataFrame, userCol: String, tsCol: String,
                    tiebreakCol: String, typeCol: String,
                    pattern: String,
                    encode: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                      c => substring(c, 1, 1)): DataFrame =
    sequences(events, userCol, tsCol, tiebreakCol, typeCol, encode)
      .filter(col("seq").rlike(pattern))

  /** Per-entity ordered event sequence as a compact string — the shared
    * encoding behind [[sequenceMatch]] (regex filter) and [[topPaths]]
    * (frequency). Bounded-per-entity contract (see [[sequenceMatch]]).
    *
    * @return (userCol, seq, n_events)
    */
  def sequences(events: DataFrame, userCol: String, tsCol: String,
                tiebreakCol: String, typeCol: String,
                encode: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                  c => substring(c, 1, 1)): DataFrame =
    events.groupBy(col(userCol))
      .agg(array_sort(collect_list(struct(
        col(tsCol).as("__t"), col(tiebreakCol).as("__k"),
        encode(col(typeCol)).as("__c")))).as("__s"))
      .select(col(userCol),
        concat_ws("", transform(col("__s"), x => x.getField("__c"))).as("seq"),
        size(col("__s")).as("n_events"))

  /** Top-k user journeys: the most common full event paths and how many
    * entities walked each — the "what do people actually do" table next
    * to [[transitions]]' one-step view. Total-ordered (count desc, path
    * asc), so the top-k is deterministic.
    *
    * Scale shape: the [[sequences]] entity shuffle, then a path-keyed
    * aggregate (map-side combinable; path cardinality ≪ entity count in
    * any real product) and one global top-k as `orderBy(...).limit(k)` —
    * planned as TakeOrderedAndProject (plan-pinned in PlanSpec), so every
    * map partition forwards at most k rows and no global sort or
    * single-partition window over the full path table ever runs. The rank
    * column is computed AFTER the limit, over k rows.
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               tiebreakCol: String, typeCol: String, k: Int): DataFrame = {
    require(k >= 1, s"topPaths needs k >= 1, got $k")
    val topK = sequences(events, userCol, tsCol, tiebreakCol, typeCol)
      .groupBy("seq").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("seq"))
      .limit(k)
    // row_number over the ≤k surviving rows — bounded by construction
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_users").desc, col("seq"))
    topK.withColumn("rnk", row_number().over(w))
  }
}
