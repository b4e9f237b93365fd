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
    val results = SparkEntry.queries.keys.map(_ -> 1.2345).toSeq
    val line = Bench.jsonLine(results, "/root/testdata/sf0.1")
    assert(!line.contains("\n"), "headline must be a single line")
    // registry order must survive into the JSON line (ADVICE r9: a .toMap
    // here once turned artifact diffs into hash-order noise)
    val keyOrder = results.map(_._1.takeWhile(_ != '_'))
    val inLine = "\"(q\\d+)\":".r.findAllMatchIn(line).map(_.group(1)).toSeq
    assert(inLine == keyOrder, "per-query keys must print in registry order")
    // margin vs the driver's tail capture: the r9 artifact proves the
    // window is EXACTLY 2000 chars and ends with this line + "\n" (the
    // headline is the final bytes of output — nothing prints after it),
    // so the hard constraint is line ≤ 1999. 50 chars of slack guards a
    // stray trailing CR or a wider-than-usual total. At ~12 chars/query
    // this admits ~180 registered queries; past that, shave per-query
    // decimals (see the r2 scaladoc) rather than weakening this guard.
    assert(line.length < 1950, s"line is ${line.length} chars; driver tail is exactly 2000")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(math.abs(node.get("value").asDouble() - 1.2345 * results.size) < 1e-3)
    val qs = node.get("queries")
    assert(qs.size() == SparkEntry.queries.size,
      "qNN short keys must stay unique across the whole registry")
    val it = qs.fieldNames()
    while (it.hasNext) {
      val k = it.next()
      assert(k.matches("q\\d+"), s"unexpected short key $k")
      assert(math.abs(qs.get(k).asDouble() - 1.234) < 0.01)
    }
  }
}
