package graft.load

import org.apache.spark.sql.{DataFrame, SaveMode}

/** S6/S7: JDBC sink with the reference's tuning
  * (/root/reference/loading.py:129-151): batched inserts of 1000 rows,
  * rewriteBatchedStatements, explicit write parallelism = connection budget
  * (the reference repartitions to 4, /root/reference/loading.py:116).
  *
  * No PostgreSQL exists in this environment; the full write path (DDL,
  * batched inserts, append-new idempotence) is integration-tested against
  * embedded Derby (JdbcSpec), and the options map is the PostgreSQL
  * contract.
  */
object JdbcLoad {

  def options(url: String, table: String, user: String, password: String,
              batchSize: Int = 1000,
              driver: String = "org.postgresql.Driver"): Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table,
    "user" -> user,
    "password" -> password,
    "batchsize" -> batchSize.toString,
    "rewriteBatchedStatements" -> "true",
    "driver" -> driver)

  /** Overwrite load (reference full-history path, loading.py:129-137). */
  def overwrite(df: DataFrame, opts: Map[String, String], connections: Int = 4): Unit =
    df.repartition(connections).write.format("jdbc").options(opts)
      .mode(SaveMode.Overwrite).save()

  /** Append load of *new rows only* — the staging + NOT EXISTS insert
    * (loading.py:141-176) collapsed into one Spark plan: anti-join inside
    * the engine, append the survivors. Idempotent under reruns.
    */
  def appendNew(staging: DataFrame, target: DataFrame, keys: Seq[String],
                opts: Map[String, String], connections: Int = 4): Unit =
    graft.ops.Dedup.newRows(staging, target, keys)
      .repartition(connections).write.format("jdbc").options(opts)
      .mode(SaveMode.Append).save()
}
