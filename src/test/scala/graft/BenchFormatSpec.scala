package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the two properties the driver's bench capture depends on (it parses
  * ONE JSON line out of the last ~2000 chars of output): the headline line
  * must be valid bare JSON and must fit the tail window with every
  * registered query present. A query rename that collides two qNN short
  * keys, or enough new queries to overflow the window, fails here instead
  * of silently producing another "parsed": null BENCH file.
  */
class BenchFormatSpec extends AnyFunSuite {

  test("bench JSON line parses, is single-line, and fits the 2 KB tail") {
    // realistic magnitudes: most queries are sub-second, so ms values are
    // 3 digits — the representative width for the window-fit assertion
    val results = SparkEntry.queries.keys.map(_ -> 0.1234).toSeq
    val line = Bench.jsonLine(results, "/root/testdata/sf0.1")
    assert(!line.contains("\n"), "headline must be a single line")
    // registry order must survive into the JSON line (ADVICE r9: a .toMap
    // here once turned artifact diffs into hash-order noise)
    val keyOrder = results.map(_._1.takeWhile(_ != '_'))
    // the representation is whichever tier fits — q-prefixed keys, the
    // deterministic stripped form, or (from 200 registered queries even
    // 3-digit-ms values overflow the stripped map) keep-slowest with a
    // loud "dropped":n; whatever printed must be a registry-order
    // SUBSEQUENCE and the tier accounting is asserted on `node` below
    val inLine = "\"(q\\d+)\":".r.findAllMatchIn(line).map(_.group(1)).toSeq
    val inLineStripped = "\"(\\d+)\":".r.findAllMatchIn(
      line.substring(line.indexOf("queries"))).map("q" + _.group(1)).toSeq
    val printed = if (inLine.nonEmpty) inLine else inLineStripped
    assert(printed == keyOrder.filter(printed.toSet),
      "per-query keys must print in registry order")
    // margin vs the driver's tail capture: the r9 artifact proves the
    // window is EXACTLY 2000 chars and ends with this line + "\n" (the
    // headline is the final bytes of output — nothing prints after it),
    // so the hard constraint is line ≤ 1999. 50 chars of slack guards a
    // stray trailing CR or a wider-than-usual total. Values are integer
    // milliseconds since r11 (~11 chars/query); if even that outgrows the
    // window, jsonLine deterministically drops the "q" key prefix — both
    // representations must satisfy this bound.
    assert(line.length < 1950, s"line is ${line.length} chars; driver tail is exactly 2000")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("qunit").asText() == "ms")
    assert(math.abs(node.get("value").asDouble() - 0.1234 * results.size) < 1e-3)
    val qs = node.get("queries")
    val droppedHere =
      if (node.has("dropped")) node.get("dropped").asInt() else 0
    assert(qs.size() + droppedHere == SparkEntry.queries.size,
      "kept + dropped must account for every registered query " +
        "(and qNN short keys must stay unique across the registry)")
    val it = qs.fieldNames()
    while (it.hasNext) {
      val k = it.next()
      assert(k.matches("q?\\d+"), s"unexpected short key $k")
      assert(qs.get(k).asLong() == 123L, s"$k: ${qs.get(k)}") // 0.1234 s -> 123 ms
    }
    // pathological widths (every query multi-second -> 4-digit ms): the
    // line must still fit and parse. At the current registry size that
    // lands in the FINAL tier — keep-slowest with a loud "dropped":n —
    // whose accounting must add up; a smaller registry would keep the
    // full stripped map. Either way nothing silently truncates.
    val wide = Bench.jsonLine(SparkEntry.queries.keys.map(_ -> 1.2345).toSeq,
      "/root/testdata/sf0.1")
    assert(wide.length < 1950, s"fallback line is ${wide.length} chars")
    val wnode = new com.fasterxml.jackson.databind.ObjectMapper().readTree(wide)
    val dropped =
      if (wnode.has("dropped")) wnode.get("dropped").asInt() else 0
    assert(wnode.get("queries").size() + dropped == SparkEntry.queries.size,
      "kept + dropped must account for every registered query")
    val wKeys = "\"(\\d+)\":".r.findAllMatchIn(
      wide.substring(wide.indexOf("queries"))).map("q" + _.group(1)).toSeq
    // kept keys preserve registry order (a subsequence of it)
    assert(wKeys == keyOrder.filter(wKeys.toSet), wKeys.take(10).toString)
    // failed queries must stay visibly negative in ms form too
    val failed = Bench.jsonLine(Seq("q01_x" -> -1.0), "/root/testdata/sf0.1")
    val fnode = new com.fasterxml.jackson.databind.ObjectMapper().readTree(failed)
    assert(fnode.get("queries").get("q01").asLong() == -1L)
    // a registry far beyond any tier's capacity still produces a bounded,
    // parseable line that SAYS what it dropped (never a truncated head)
    val huge = (1 to 400).map(i => s"q${i}_x" -> 123.456)
    val hline = Bench.jsonLine(huge, "/root/testdata/sf0.1")
    assert(hline.length < 1950, s"final tier is ${hline.length} chars")
    val hnode = new com.fasterxml.jackson.databind.ObjectMapper().readTree(hline)
    assert(hnode.get("dropped").asInt() == 400 - hnode.get("queries").size())
    assert(hnode.get("dropped").asInt() > 0)
  }
}
