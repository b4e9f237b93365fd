package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.SubstringDedup
import graft.functions.TextFunctions

/** Exact-substring duplication spans (Lee et al. 2022 mark phase):
  * hand-built corpora with known repeated regions, interval-union island
  * semantics, in-document repeats, and the hash-vs-text marking
  * differential on the real test corpus.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("cross-document repeat marks the shared span in both docs") {
    val shared = (1 to 5).map(i => s"tok$i").mkString(" ")
    val d = docs(
      1L -> s"alpha beta $shared gamma delta",
      2L -> s"$shared other words here entirely")
    val out = SubstringDedup.duplicatedSpans(d, "doc_id", "text", gramLen = 5)
      .orderBy("doc_id").collect()
    // doc 1: tokens = alpha beta tok1..tok5 gamma delta (9 tokens); the
    // only repeated 5-gram is tok1..tok5 at pos 2 → one span of 5 tokens
    assert(out.toSeq == Seq(
      Row(1L, 9L, 1L, 1L, 5L, 0.555556),
      Row(2L, 9L, 1L, 1L, 5L, 0.555556)))
  }

  test("overlapping windows merge into one maximal span") {
    // a 7-token region repeated verbatim → three overlapping 5-gram hits
    // per doc (pos, pos+1, pos+2) that must union into ONE 7-token span
    val region = (1 to 7).map(i => s"r$i").mkString(" ")
    val d = docs(
      1L -> s"x1 x2 $region y1 y2",
      2L -> s"z1 $region w1 w2 w3")
    val out = SubstringDedup.duplicatedSpans(d, "doc_id", "text", gramLen = 5)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((1L, 3L, 1L, 7L), (2L, 3L, 1L, 7L)))
  }

  test("disjoint repeats stay separate islands; unique docs drop out") {
    val a = (1 to 5).map(i => s"a$i").mkString(" ")
    val b = (1 to 5).map(i => s"b$i").mkString(" ")
    val d = docs(
      1L -> s"$a gap1 gap2 gap3 $b",        // both repeated regions, a gap
      2L -> s"$a only here",
      3L -> s"$b lives here too",
      4L -> "wholly unique text with no repeats at all")
    val out = SubstringDedup.duplicatedSpans(d, "doc_id", "text", gramLen = 5)
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId.keySet == Set(1L, 2L, 3L))
    assert(byId(1L).getLong(3) == 2L && byId(1L).getLong(4) == 10L)
    assert(byId(2L).getLong(3) == 1L && byId(2L).getLong(4) == 5L)
  }

  test("adjacent (touching) islands union into one contiguous span") {
    // two 5-grams at pos 0 and pos 5 in doc 1: [0,5) + [5,10) = [0,10)
    val p = (1 to 5).map(i => s"p$i").mkString(" ")
    val q = (1 to 5).map(i => s"q$i").mkString(" ")
    val d = docs(1L -> s"$p $q tail1 tail2",
      2L -> s"$p filler9 fill8", 3L -> s"$q more7 fill6")
    val out = SubstringDedup.duplicatedSpans(d, "doc_id", "text", gramLen = 5)
      .filter($"doc_id" === 1L).collect()
    assert(out.map(r => (r.getLong(3), r.getLong(4))).toSeq == Seq((1L, 10L)))
  }

  test("in-document repeat counts like a cross-document one") {
    val m = (1 to 6).map(i => s"m$i").mkString(" ")
    val d = docs(1L -> s"$m bridge $m")
    val out = SubstringDedup.duplicatedSpans(d, "doc_id", "text", gramLen = 6)
      .collect()
    // both occurrences marked: spans [0,6) and [7,13)
    assert(out.map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((2L, 2L, 12L)))
  }

  test("docs shorter than the gram length never mark") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "")
    assert(SubstringDedup.duplicatedSpans(d, "doc_id", "text", 5).isEmpty)
  }

  test("hash marking == text marking on the real corpus (collision guard)") {
    val d = sources.Tables.documents(spark, sf("0.01"))
    val byHash = SubstringDedup.dupPositions(d, "doc_id", "text", 20)
    // same pipeline with the gram TEXT as the grouping key
    val toked = d.select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("toks"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 20L)
      .select(col("doc_id"), col("n_tokens"), col("toks"),
        explode(sequence(lit(0L), col("n_tokens") - 20)).as("pos"))
      .select(col("doc_id"), col("n_tokens"), col("pos"),
        array_join(slice(col("toks"), (col("pos") + 1).cast("int"), lit(20)), " ")
          .as("gram"))
    val dupText = toked.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
    val byText = toked.join(dupText, "gram")
      .select(col("doc_id"), col("n_tokens"), col("pos"))
    assert(byHash.exceptAll(byText).isEmpty && byText.exceptAll(byHash).isEmpty)
    assert(byHash.count() > 0)
  }

  test("removeSpans excises every marked token region (all copies)") {
    val shared = (1 to 5).map(i => s"tok$i").mkString(" ")
    val d = docs(
      1L -> s"alpha beta $shared gamma delta",
      2L -> s"$shared other words here entirely",
      3L -> "completely unique text with no repeats at all")
    val out = SubstringDedup.removeSpans(d, "doc_id", "text", gramLen = 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 9L, 4L, "alpha beta gamma delta"),
      (2L, 9L, 4L, "other words here entirely"),
      (3L, 8L, 8L, "completely unique text with no repeats at all")))
  }

  test("removeSpans drops overlapping-window regions as one maximal cut") {
    val region = (1 to 7).map(i => s"r$i").mkString(" ")
    val d = docs(
      1L -> s"x1 x2 $region y1 y2",
      2L -> s"z1 $region w1 w2 w3")
    val out = SubstringDedup.removeSpans(d, "doc_id", "text", gramLen = 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 11L, 4L, "x1 x2 y1 y2"),
      (2L, 11L, 4L, "z1 w1 w2 w3")))
  }

  test("removeSpans agrees with duplicatedSpans coverage accounting") {
    val d = sources.Tables.documents(spark, sf("0.01"))
    val removed = SubstringDedup.removeSpans(d, "doc_id", "text", gramLen = 20)
      .select(col("doc_id"), (col("n_tokens") - col("n_kept")).as("cut"))
      .filter(col("cut") > 0)
    val marked = SubstringDedup.duplicatedSpans(d, "doc_id", "text", gramLen = 20)
      .select(col("doc_id"), col("n_dup_tokens").as("cut"))
    assert(removed.exceptAll(marked).isEmpty &&
      marked.exceptAll(removed).isEmpty)
    assert(marked.count() > 0)
  }
}
