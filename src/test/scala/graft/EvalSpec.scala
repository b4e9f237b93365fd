package graft

import org.apache.spark.sql.functions._
import graft.ops.Eval

/** Classifier audit: hand-computed confusion algebra, hallucinated-class
  * surfacing, NULL-vs-0 ratio semantics, corpus-scale consistency.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("classReport: hand case — counts, ratios, hallucinated class, " +
      "NULL ratios (r15)") {
    // truth: 3 a, 2 b, 1 c. predictions: a→a,a,b; b→b,b; c→d (a class
    // the corpus never carries). NULL label rows are excluded.
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "b"),
      ("c", "d"),
      (null.asInstanceOf[String], "a")
    ).toDF("label", "predicted")
    val got = Eval.classReport(df, "label", "predicted").collect()
      .map(r => r.getString(0) -> r).toMap
    def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    // a: n_true 3, n_pred 2, tp 2 → p=1, r=2/3, f1=0.8
    val a = got("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) == ((3L, 2L, 2L)))
    assert(a.getLong(4) == 1000000L && a.getLong(5) == micro(2.0 / 3))
    assert(a.getLong(6) == micro(2 * 1.0 * (2.0 / 3) / (1.0 + 2.0 / 3)))
    // b: n_true 2, n_pred 3, tp 2 → p=2/3, r=1
    val b = got("b")
    assert((b.getLong(1), b.getLong(2), b.getLong(3)) == ((2L, 3L, 2L)))
    // c: predicted never → precision NULL (no predictions), recall 0
    val c = got("c")
    assert((c.getLong(1), c.getLong(2), c.getLong(3)) == ((1L, 0L, 0L)))
    assert(c.isNullAt(4) && c.getLong(5) == 0L && c.isNullAt(6))
    // d: HALLUCINATED class — zero support, precision 0, recall NULL
    val d = got("d")
    assert((d.getLong(1), d.getLong(2), d.getLong(3)) == ((0L, 1L, 0L)))
    assert(d.getLong(4) == 0L && d.isNullAt(5) && d.isNullAt(6))
    assert(got.size == 4)
    graft.util.Caches.releaseAll()
  }

  test("calibration: hand-computed bins, top-bin clamp, ECE term (r15)") {
    val df = Seq(
      (0.05, false), (0.08, true),            // bin 0: conf .065, acc .5
      (0.95, true), (0.97, true), (0.99, false), // bin 9: conf .97, acc 2/3
      (1.0, true)                             // exactly 1.0 clamps to bin 9
    ).toDF("score", "label")
    val got = Eval.calibration(df, "score", "label", bins = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val b0 = got(0L)
    assert((b0.getLong(1), b0.getLong(2)) == ((2L, 1L)))
    assert(b0.getLong(3) == micro(0.065) && b0.getLong(4) == micro(0.5))
    assert(b0.getLong(5) == micro(math.abs(0.5 - 0.065)))
    val b9 = got(9L)
    assert((b9.getLong(1), b9.getLong(2)) == ((4L, 3L)),
      "score 1.0 must clamp into the top bin")
    val conf9 = (0.95 + 0.97 + 0.99 + 1.0) / 4
    assert(b9.getLong(3) == micro(conf9) && b9.getLong(4) == micro(0.75))
    // empty bins absent; only the two populated bins report
    assert(got.keySet == Set(0L, 9L))
    // partitioning-invariant (decimal score sums)
    val rep = Eval.calibration(df.repartition(5), "score", "label", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rep == got.view.mapValues(_.getLong(3)).toMap)
  }

  test("classReport consistency on the real corpus: supports sum to the " +
      "labeled row count on BOTH axes; tp bounded by both") {
    import graft.functions.{TextFunctions => TF}
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val preds = docs.select($"doc_id", $"lang",
      TF.langId(TF.tokens($"text"),
        Seq("en" -> Seq("the", "a"), "data" -> Seq("data", "table")))
        .as("predicted"))
    val rep = Eval.classReport(preds, "lang", "predicted").collect()
    val n = preds.filter($"lang".isNotNull && $"predicted".isNotNull).count()
    assert(rep.map(_.getLong(1)).sum == n, "supports partition the corpus")
    assert(rep.map(_.getLong(2)).sum == n, "predictions partition it too")
    rep.foreach { r =>
      assert(r.getLong(3) <= math.min(r.getLong(1), r.getLong(2)),
        s"tp bounded: $r")
    }
    graft.util.Caches.releaseAll()
  }
}
