package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, StringType, TimestampType}

import graft.sources.Layout

/** Plain-SQL READS of graft tables — the last piece of the by-name story:
  * after `CREATE TABLE graft.orders …`, a SQL-first user writes
  *
  * {{{
  * SELECT * FROM graft.orders
  * SELECT * FROM graft.orders VERSION AS OF 3
  * SELECT * FROM graft.orders TIMESTAMP AS OF '2026-01-01 00:00:00'
  * SELECT … FROM graft.a JOIN graft.b ON …        -- relations compose
  * }}}
  *
  * without reaching for the `graft_table(…)` TVF (which remains the
  * explicit-path/power form — AS OF by arbitrary expression, etc.).
  *
  * A resolution rule, not a catalog: the unclaimed `[graft, x]`
  * `UnresolvedRelation` (exactly the shape the DML rule keys on) rewrites
  * to the SAME logical plan `Layout.readCurrent` produces — deletion
  * vectors, column mapping, stats/bloom skipping and manifest pruning all
  * apply identically, and `RelationTimeTravel` maps onto
  * `readVersion`/`readAsOf` (version numbers, typed date/timestamp
  * literals, or wall-clock strings read in the SESSION time zone).
  *
  * Ordering contract: this rule is injected AFTER [[GraftDml.GraftDmlRule]]
  * and never rewrites a DML statement's TARGET relation (tracked by node
  * identity — a read-rewritten target would silently turn `DELETE FROM
  * graft.x` into a scan); every OTHER graft relation resolves, including
  * the sources of non-graft-target DML (`INSERT INTO parquet_t SELECT …
  * FROM graft.x`). Graft-target DML captures its source plans unresolved
  * and they re-enter analysis at command RUN time, where this rule
  * resolves any graft relations THEY reference (`MERGE … USING graft.y`,
  * `WHERE id IN (SELECT … FROM graft.z)`).
  */
object GraftRead {

  private def graftIdent(r: UnresolvedRelation): Option[String] =
    if (r.multipartIdentifier.length == 2 &&
        r.multipartIdentifier.head.equalsIgnoreCase(GraftDml.Namespace))
      Some(r.multipartIdentifier(1))
    else None

  /** The relation under a DML statement's TARGET (through aliases) — the
    * one node this rule must never rewrite (it belongs to the DML rule;
    * a read-rewritten target would turn `DELETE FROM graft.x` into a
    * scan). Only the TARGET is protected: a non-graft-target DML whose
    * SOURCE reads a graft table (`INSERT INTO parquet_t SELECT … FROM
    * graft.x`) must still resolve here — blanket whole-plan inertness
    * broke exactly that (review fix).
    */
  private def targetRelOf(plan: LogicalPlan): Option[UnresolvedRelation] =
    plan match {
      case SubqueryAlias(_, child) => targetRelOf(child)
      case r: UnresolvedRelation => Some(r)
      case _ => None
    }

  case class GraftReadRule(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val protectedTargets =
        java.util.Collections.newSetFromMap(
          new java.util.IdentityHashMap[UnresolvedRelation, java.lang.Boolean]())
      plan.foreach {
        case d: DeleteFromTable => targetRelOf(d.table).foreach(protectedTargets.add)
        case u: UpdateTable => targetRelOf(u.table).foreach(protectedTargets.add)
        case m: MergeIntoTable =>
          targetRelOf(m.targetTable).foreach(protectedTargets.add)
        case i: InsertIntoStatement =>
          targetRelOf(i.table).foreach(protectedTargets.add)
        case _ =>
      }
      plan.resolveOperatorsUp {
        case tt: RelationTimeTravel =>
          tt.relation match {
            case r: UnresolvedRelation if !protectedTargets.contains(r) =>
              graftIdent(r).map(x => travel(x, tt)).getOrElse(tt)
            case _ => tt
          }
        case r: UnresolvedRelation if !protectedTargets.contains(r) =>
          graftIdent(r).map { x =>
            Layout.readCurrent(spark, GraftPaths.resolve(spark, x))
              .queryExecution.logical
          }.getOrElse(r)
      }
    }

    private def travel(ident: String, tt: RelationTimeTravel): LogicalPlan = {
      val root = GraftPaths.resolve(spark, ident)
      val zone = graft.util.WallClock.sessionZone(spark)
      val df = (tt.version, tt.timestamp) match {
        case (Some(v), _) =>
          // toIntOption also bounds the range — an all-digit string past
          // Int.MaxValue must refuse with THIS message, not a raw
          // NumberFormatException (review fix)
          val n = v.toIntOption.getOrElse(throw new IllegalArgumentException(
            s"graft SQL read: VERSION AS OF takes a version number, got '$v'"))
          Layout.readVersion(spark, root, n)
        case (_, Some(Literal(days: Int, DateType))) =>
          Layout.readAsOf(spark, root,
            java.time.LocalDate.ofEpochDay(days.toLong).atStartOfDay(zone)
              .toInstant.toEpochMilli)
        case (_, Some(Literal(us: Long, TimestampType))) =>
          Layout.readAsOf(spark, root, Math.floorDiv(us, 1000L))
        case (_, Some(Literal(s: org.apache.spark.unsafe.types.UTF8String,
            StringType))) =>
          // wall-clock AS OF in the SESSION zone — graft_table's contract
          Layout.readAsOf(spark, root,
            graft.util.WallClock.millis(s.toString, zone))
        case (_, ts) => throw new IllegalArgumentException(
          s"graft SQL read: TIMESTAMP AS OF takes a date/timestamp/string " +
            s"literal, got $ts")
      }
      df.queryExecution.logical
    }
  }
}
