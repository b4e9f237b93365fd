package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Keep-last semantics (extraction.py:105), anti-join idempotence
  * (loading.py:159-176), union; plus seeded randomized properties.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("keepLast keeps exactly the highest-precedence row per key") {
    val df = Seq(
      ("A", 1, 10, "old"), ("A", 1, 20, "new"), ("A", 2, 5, "only"),
      ("B", 1, 7, "x"), ("B", 1, 7, "x2")
    ).toDF("k1", "k2", "prec", "tag")
    val out = Dedup.keepLast(df, Seq("k1", "k2"),
      Seq(col("prec").desc, col("tag").desc))
    val got = out.orderBy("k1", "k2").as[(String, Int, Int, String)].collect().toSeq
    assert(got == Seq(("A", 1, 20, "new"), ("A", 2, 5, "only"), ("B", 1, 7, "x2")))
  }

  test("keepLast is idempotent") {
    val df = Seq(("A", 1, 1), ("A", 2, 2), ("A", 3, 3), ("B", 9, 1))
      .toDF("k", "prec", "v")
    val once = Dedup.keepLast(df, Seq("k"), Seq(col("prec").desc))
    val twice = Dedup.keepLast(once, Seq("k"), Seq(col("prec").desc))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("newRows twice appends nothing new (load idempotence)") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val staging = Seq((2L, "b2"), (3L, "c")).toDF("id", "v")
    val delta = Dedup.newRows(staging, target, Seq("id"))
    assert(delta.as[(Long, String)].collect().toSet == Set((3L, "c")))
    val afterLoad = target.unionByName(delta)
    val again = Dedup.newRows(staging, afterLoad, Seq("id"))
    assert(again.isEmpty)
  }

  test("unionAll is column-name based, not positional") {
    val a = Seq((1, "x")).toDF("n", "s")
    val b = Seq(("y", 2)).toDF("s", "n")
    val u = Dedup.unionAll(Seq(a, b)).orderBy("n").as[(Int, String)].collect().toSeq
    assert(u == Seq((1, "x"), (2, "y")))
  }

  test("property: dedup row count = distinct key count (randomized, seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val pairs = List.fill(60)((rnd.nextInt(10), rnd.nextInt(1000)))
      val df = pairs.toDF("k", "prec")
      val d = Dedup.keepLast(df, Seq("k"), Seq(col("prec").desc, col("k")))
      assert(d.count() == pairs.map(_._1).distinct.size)
    }
  }
}
