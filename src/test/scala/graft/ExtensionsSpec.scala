package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftExtensions

/** The extension-registered SQL surface: dot_product callable from pure SQL
  * in a session built withExtensions(new GraftExtensions).
  *
  * Test JVMs share one SparkContext across suites, so this creates a NEW
  * SparkSession (extensions apply at session construction) over the shared
  * context and restores the previous default afterwards — never stop() here,
  * that would kill every other suite's session.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("dot_product is callable from SQL via GraftExtensions") {
    val base = SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = spark.sql(
        "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .head().getDouble(0)
      assert(r == 32.0)
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .createOrReplaceTempView("emb_ext")
      val n = spark.sql(
        "SELECT dot_product(embedding, embedding) AS n2 FROM emb_ext LIMIT 5")
        .collect()
      assert(n.length == 5 && n.forall(_.getDouble(0) > 0))
      // hyperplane_buckets: SQL call agrees with the column-level API
      val sqlB = spark.sql(
        "SELECT vec_id, hyperplane_buckets(embedding, 6, 2, 64) AS b FROM emb_ext")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val colB = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(org.apache.spark.sql.functions.col("vec_id"),
          graft.functions.expressions.HyperplaneBuckets(
            org.apache.spark.sql.functions.col("embedding"), 6, 2, 64).as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(sqlB == colB && sqlB.nonEmpty)
      // bloom sketch pair: build over a key set, probe as a scalar subquery
      spark.sql("SELECT bloom_filter_agg(xxhash64(id), 100L) AS bf FROM range(0, 50)")
        .createOrReplaceTempView("bf_ext")
      val hits = spark.sql(
        """SELECT id FROM range(0, 1000) t
           WHERE might_contain((SELECT bf FROM bf_ext), xxhash64(id))""")
        .collect().map(_.getLong(0)).toSet
      // no false negatives; false positives bounded far under the full range
      assert((0L until 50L).toSet.subsetOf(hits) && hits.size < 500)
      // native aggregates from SQL: top_k bounded aggregate...
      val tk = spark.sql(
        """SELECT t.id AS winner FROM (SELECT top_k(id * 10, id, 2) AS tops
             FROM range(0, 100)) LATERAL VIEW explode(tops) AS t""")
        .collect().map(_.getLong(0)).toSet
      assert(tk == Set(99L, 98L))
      // ema_scan: SQL call runs the same recursion as the column API
      val es = spark.sql("SELECT ema_scan(array(1.0D, 2.0D, 3.0D), 0.5D) AS e")
        .head().getSeq[Double](0)
      assert(es == Seq(1.0, 1.5, 2.25))
      // ...and the mg_topk heavy-hitters sketch (hot item must surface)
      val mg = spark.sql(
        """SELECT s.item FROM (SELECT mg_topk(CASE WHEN id % 2 = 0 THEN 'hot'
             ELSE CAST(id AS STRING) END, 5) AS sk FROM range(0, 1000))
           LATERAL VIEW explode(sk) AS s""")
        .collect().map(_.getString(0))
      assert(mg.contains("hot"))
      // graft_table: pure-SQL access to a versioned layout — live and
      // time-traveled reads, through deletion vectors and renames
      import spark.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft_tvf").toString
      graft.sources.Layout.initVersionedManifest(
        Seq((1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0))
          .toDF("id", "part", "v").coalesce(1), root, Seq("part"))
      graft.sources.Layout.deleteVersionedRows(spark, root,
        org.apache.spark.sql.functions.col("id") === 2L)
      graft.sources.Layout.renameColumn(spark, root, "v", "price")
      val live = spark.sql(
        s"SELECT id, price FROM graft_table('$root') ORDER BY id")
        .as[(Long, Double)].collect().toSeq
      assert(live == Seq((1L, 10.0), (3L, 30.0)))
      val v0 = spark.sql(
        s"SELECT count(*) AS n FROM graft_table('$root', 0)")
        .head().getLong(0)
      assert(v0 == 3L)
      // composes with ordinary SQL (joins, aggregates, pushed filters)
      val agg = spark.sql(
        s"""SELECT part, sum(price) AS s FROM graft_table('$root')
            WHERE price > 5 GROUP BY part ORDER BY part""")
        .as[(String, Double)].collect().toSeq
      assert(agg == Seq(("p1", 10.0), ("p2", 30.0)))
      // graft_history: the operation ledger from pure SQL
      val ops = spark.sql(
        s"""SELECT version, operation FROM graft_history('$root')
            ORDER BY version""").as[(Int, String)].collect().toSeq
      assert(ops == Seq((0, "CREATE"), (1, "DELETE ROWS"), (2, "RENAME COLUMN")))
      // graft_vacuum_plan: price a retention change from pure SQL —
      // keep=1 dooms v0's manifest and v1's sidecar-only leftovers;
      // nothing is deleted by asking
      val doomed = spark.sql(
        s"""SELECT count(*) AS files, sum(bytes) AS bytes
            FROM graft_vacuum_plan('$root', 1)""").head()
      assert(doomed.getLong(0) > 0L && doomed.getLong(1) > 0L)
      assert(spark.sql(s"SELECT count(*) FROM graft_table('$root')")
        .head().getLong(0) == 2L, "dry run must not touch the table")
      // r14 scan/screen functions from pure SQL
      val hs = spark.sql(
        "SELECT holt_scan(array(10.0D, 20.0D), 0.5D, 0.5D)[1].level AS l")
        .head().getDouble(0)
      assert(hs == 15.0) // 0.5·20 + 0.5·(10 + 0)
      val cs = spark.sql(
        "SELECT cusum_scan(array(2.0D, -5.0D, 1.0D)) AS c")
        .head().getSeq[Double](0)
      assert(cs == Seq(2.0, 0.0, 1.0))
      val fe = spark.sql(
        "SELECT frame_energy(CAST('xxxxyyyy' AS BINARY), 4) AS e")
        .head().getSeq[Long](0)
      assert(fe == Seq(4 * 64L, 4 * 49L)) // x=120→−8², y=121→−7²
      val mc = spark.sql(
        "SELECT multi_contains('ushers walk', 'he', 'she', 'hers', 'nope') AS h")
        .head().getSeq[String](0)
      assert(mc == Seq("he", "she", "hers"))
      // perceptual prints agree with the column API on a real payload
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .createOrReplaceTempView("docs_ext")
      val sqlHash = spark.sql(
        """SELECT doc_id, a_hash(encode(text, 'UTF-8')) AS a,
             d_hash(encode(text, 'UTF-8')) AS d
           FROM docs_ext WHERE length(text) >= 65 LIMIT 5""")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(sqlHash.length == 5)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
