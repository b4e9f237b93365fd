package graft

import graft.ops.AsOfJoin

/** As-of backward join semantics: inclusive <=, per-key carry, null when no
  * prior right row.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward attaches latest right row at or before left time") {
    val left = Seq((1, 10L, "p1"), (1, 20L, "p2"), (2, 5L, "p3"))
      .toDF("k", "t", "ltag")
    val right = Seq((1, 10L, "r@10"), (1, 15L, "r@15"), (1, 25L, "r@25"),
      (2, 9L, "r2@9")).toDF("k", "rt", "payload")
    val out = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("payload"))
      .orderBy("k", "t")
      .select("k", "t", "ltag", "asof_payload")
      .as[(Int, Long, String, Option[String])].collect().toSeq
    assert(out == Seq(
      (1, 10L, "p1", Some("r@10")), // inclusive: equal time matches
      (1, 20L, "p2", Some("r@15")), // latest <= 20
      (2, 5L, "p3", None)           // right exists only at t=9 > 5
    ))
  }

  test("null payload on the matched row stays null (no stale resurrection)") {
    // rt=18 is the as-of match; its payload is null. A naive per-column
    // last(ignoreNulls) would resurrect "old" from rt=5 — must not.
    val left = Seq((1, 20L, "p")).toDF("k", "t", "ltag")
    val right = Seq((1, 5L, Some("old")), (1, 18L, Option.empty[String]))
      .toDF("k", "rt", "payload")
    val out = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("payload")).head()
    assert(out.isNullAt(out.fieldIndex("asof_payload")))
  }

  test("tolerance nulls out stale matches") {
    import org.apache.spark.sql.functions.lit
    val left = Seq((1, 20L, "p")).toDF("k", "t", "ltag")
    val right = Seq((1, 15L, "r@15")).toDF("k", "rt", "payload")
    val loose = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("payload"),
      tolerance = Some(lit(10L))).head()
    assert(loose.getAs[String]("asof_payload") == "r@15")
    val tight = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("payload"),
      tolerance = Some(lit(3L))).head()
    assert(tight.isNullAt(tight.fieldIndex("asof_payload")))
  }

  test("left rows with no right key at all get nulls") {
    val left = Seq((7, 1L, "x")).toDF("k", "t", "ltag")
    val right = Seq((8, 1L, "y")).toDF("k", "rt", "payload")
    val out = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("payload"))
    assert(out.count() == 1)
    assert(out.head().isNullAt(out.head().fieldIndex("asof_payload")))
  }
}
