package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.MultiContains

/** Aho–Corasick multi-pattern search: differential vs per-pattern
  * contains on random text, failure-link cases (overlapping and nested
  * patterns), declaration-order output, null/empty semantics, and
  * codegen/interpreted agreement.
  */
class MultiContainsSpec extends SparkSpec {
  import spark.implicits._

  private def hits(text: String, pats: Seq[String]): Seq[String] =
    Seq(Option(text)).toDF("t")
      .select(MultiContains(col("t"), pats).as("h"))
      .as[Seq[String]].head()

  test("overlapping and nested patterns: failure links fire mid-match") {
    // "ushers" is the canonical AC example: she/he/hers all end inside it
    val pats = Seq("he", "she", "his", "hers")
    assert(hits("ushers", pats) == Seq("he", "she", "hers"))
    // a failed long match must still surface the short suffix pattern
    assert(hits("shis", pats) == Seq("his"))
    assert(hits("xyz", pats) == Seq.empty)
  }

  test("declaration order, distinct hits, substring (not word) semantics") {
    val pats = Seq("data", "at", "base")
    assert(hits("database", pats) == Seq("data", "at", "base"))
    // repeated occurrences report once
    assert(hits("at at at", pats) == Seq("at"))
  }

  test("differential vs per-pattern contains on random text") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd "
    val pats = Seq("ab", "bca", "cd", "aaa", "d c", "abcd")
    for (_ <- 1 to 200) {
      val text = Seq.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val want = pats.filter(text.contains(_))
      assert(hits(text, pats) == want, s"text='$text'")
    }
  }

  test("null text is null; construction refusals are loud") {
    val out = Seq((1, Option("abc")), (2, None: Option[String]))
      .toDF("id", "t")
      .select(col("id"), MultiContains(col("t"), Seq("b")).as("h"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(out(1) == Seq("b") && out(2) == null)
    intercept[IllegalArgumentException] { MultiContains(col("t"), Seq.empty) }
    intercept[IllegalArgumentException] { MultiContains(col("t"), Seq("a", "")) }
    intercept[IllegalArgumentException] { MultiContains(col("t"), Seq("a", "a")) }
  }

  test("codegen and interpreted paths agree") {
    val pats = Seq("the", "he", "stream", "data")
    val df = Seq("the upstream dataset he said").toDF("t")
    def run() =
      df.select(MultiContains(col("t"), pats).as("h")).as[Seq[String]].head()
    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(viaCodegen == interp)
    assert(viaCodegen == Seq("the", "he", "stream", "data"))
  }

  test("a 500-pattern list still walks the text once (no N-scan blowup)") {
    val pats = (1 to 500).map(i => s"needle$i")
    val text = ("hay " * 20000) + "needle437 end"
    // substring semantics: needle437 carries its prefixes 4 and 43 too
    val got = hits(text, pats)
    assert(got == Seq("needle4", "needle43", "needle437"))
  }

  test("multibyte UTF-8: the byte walk matches exactly, never mid-codepoint") {
    // 'é' is 0xC3 0xA9, 'ü' is 0xC3 0xBC — shared lead byte; '中' is 3
    // bytes; '🙂' is 4. UTF-8 self-synchronization means a byte-level
    // automaton can only match at codepoint boundaries — pinned here
    // against lookalike prefixes and a differential vs contains.
    val pats = Seq("café", "cafü", "中文", "🙂!", "naïve")
    assert(hits("le café de la 中文 zone 🙂! ok", pats) ==
      Seq("café", "中文", "🙂!"))
    assert(hits("cafü only", pats) == Seq("cafü"))
    assert(hits("cafe plain ascii", pats) == Seq.empty)
    // differential on a mixed corpus
    val corpus = Seq("naïve café", "中文🙂!", "ascii only", "ü中é",
      "🙂!🙂!café", "naïve vs naïve")
    corpus.foreach { t =>
      assert(hits(t, pats) == pats.filter(t.contains(_)),
        s"differential mismatch on '$t'")
    }
  }
}
