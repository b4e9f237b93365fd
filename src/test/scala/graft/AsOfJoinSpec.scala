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

  test("forward attaches earliest right row at or after left time") {
    val left = Seq((1, 10L, "p1"), (1, 20L, "p2"), (2, 5L, "p3"))
      .toDF("k", "t", "ltag")
    val right = Seq((1, 10L, "r@10"), (1, 15L, "r@15"), (1, 25L, "r@25"),
      (2, 3L, "r2@3")).toDF("k", "rt", "payload")
    val out = AsOfJoin.forward(left, right, "k", "t", "rt", Seq("payload"))
      .orderBy("k", "t")
      .select("k", "t", "ltag", "asof_payload")
      .as[(Int, Long, String, Option[String])].collect().toSeq
    assert(out == Seq(
      (1, 10L, "p1", Some("r@10")), // inclusive: equal time matches
      (1, 20L, "p2", Some("r@25")), // earliest >= 20
      (2, 5L, "p3", None)           // right exists only at t=3 < 5
    ))
  }

  test("forward tolerance nulls out matches too far ahead") {
    import org.apache.spark.sql.functions.lit
    val left = Seq((1, 10L, "p")).toDF("k", "t", "ltag")
    val right = Seq((1, 17L, "r@17")).toDF("k", "rt", "payload")
    val loose = AsOfJoin.forward(left, right, "k", "t", "rt", Seq("payload"),
      tolerance = Some(lit(10L))).head()
    assert(loose.getAs[String]("asof_payload") == "r@17")
    val tight = AsOfJoin.forward(left, right, "k", "t", "rt", Seq("payload"),
      tolerance = Some(lit(3L))).head()
    assert(tight.isNullAt(tight.fieldIndex("asof_payload")))
  }

  test("forward ≡ backward on time-reversed data") {
    // negate times on both sides: the earliest following row becomes the
    // latest preceding one, so the two directions must agree exactly
    val left = Seq((1, 10L), (1, 13L), (1, 20L), (2, 7L)).toDF("k", "t")
    val right = Seq((1, 9L, 1.0), (1, 14L, 2.0), (1, 21L, 3.0), (2, 7L, 4.0))
      .toDF("k", "rt", "v")
    import org.apache.spark.sql.functions.col
    val fwd = AsOfJoin.forward(left, right, "k", "t", "rt", Seq("v"))
      .select("k", "t", "asof_v")
      .as[(Int, Long, Option[Double])].collect().toSet
    val bwd = AsOfJoin.backward(
        left.withColumn("t", -col("t")),
        right.withColumn("rt", -col("rt")), "k", "t", "rt", Seq("v"))
      .select((-col("t")).as("t"), col("k"), col("asof_v"))
      .select("k", "t", "asof_v")
      .as[(Int, Long, Option[Double])].collect().toSet
    assert(fwd == bwd)
  }

  test("left rows with no right key at all get nulls") {
    val left = Seq((7, 1L, "x")).toDF("k", "t", "ltag")
    val right = Seq((8, 1L, "y")).toDF("k", "rt", "payload")
    val out = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("payload"))
    assert(out.count() == 1)
    assert(out.head().isNullAt(out.head().fieldIndex("asof_payload")))
  }
}
