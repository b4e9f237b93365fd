package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** D5 (north star): 64-bit SimHash near-duplicate detection.
  *
  * simhash(doc) packs the signs of per-bit vote sums over token hashes: bit j
  * is 1 iff Σ_tokens (hash(tok) bit j ? +1 : -1) >= 0. Near-dups are pairs
  * within small Hamming distance.
  *
  * Candidate generation uses the standard chunk trick: split the 64-bit print
  * into 4 × 16-bit chunks; any pair within Hamming distance 3 must agree on
  * at least one chunk, so an equi-join on (chunk_idx, chunk_value) finds all
  * of them with a plain hash shuffle — no similarity join, scales linearly.
  */
object SimHashDedup {

  /** 64-bit simhash of a token array, pure Catalyst (array fold of ±1 votes
    * per bit, then sign-pack). Tokens weighted equally.
    */
  def simhash(toks: Column): Column = {
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        val bitVotes = array((0 until 64).map(j =>
          when(shiftright(h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)): _*)
        zip_with(acc, bitVotes, (v, b) => v + b)
      })
    (0 until 64).map(j =>
      when(element_at(votes, j + 1) >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
  }

  /** Hamming distance between two 64-bit prints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Simhash prints via explode + two hash aggregates. The first groupBy
    * collapses repeated tokens to `(id, token_hash) → cnt` — natural-language
    * documents repeat tokens heavily, so the expensive stage downstream sees
    * several-fold fewer rows, and the only work per raw token row is one
    * count (map-side combined). The second aggregate computes the 64
    * codegen'd conditional sums over the collapsed rows, each vote weighted
    * by cnt — identical votes, identical prints. Both shuffles hash-partition
    * evenly regardless of document length skew.
    */
  def simhashPrints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokenRows = docs
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("h"))
    val counted = tokenRows.groupBy("id", "h").agg(count(lit(1)).as("cnt"))
    val votes = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1L) === 1L, col("cnt"))
        .otherwise(-col("cnt"))).as(s"v$j"))
    counted.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until 64).map(j =>
          when(col(s"v$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("sh"))
  }

  /** PORTABLE tier width: 60 bits, packed as 4 × 15-bit chunks. 60 (not
    * 64) so every print is a POSITIVE long — signed-64 packing (bit 63 =
    * Long.MinValue) and arithmetic-vs-logical right shifts of negative
    * values are exactly the operations SQL engines disagree on; below
    * 2^60 every shift/mod/div is engine-agnostic integer arithmetic.
    */
  val PortableBits = 60
  private val PortableChunkBits = 15

  /** Seeded affine bit-derivation constants: portable bit j of a token is
    * `((a_j * polyHash(tok) + b_j) mod P) mod 2`. Same seeded-literal
    * replay scheme as [[MinHashDedup.perms]].
    */
  def bitPlanes(seed: Int = 35): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed.toLong * 99991 + 7)
    Seq.fill(PortableBits)(
      (1L + rnd.nextInt((TextFunctions.PolyP - 1).toInt).toLong,
        rnd.nextInt(TextFunctions.PolyP.toInt).toLong))
  }

  /** [[simhashPrints]] on the PORTABLE hash tier: token base hash is
    * [[TextFunctions.polyHash]], each of the 60 bits derives from a
    * seeded affine map over it — every vote replayable by an external
    * SQL oracle with the same inlined `(a_j, b_j)` literals. Same
    * counted pre-aggregation shape (and therefore the same two even
    * hash shuffles) as the 64-bit tier.
    */
  def simhashPrintsPortable(docs: DataFrame, idCol: String, textCol: String,
                            seed: Int = 35): DataFrame = {
    val tokenRows = docs
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("id"), TextFunctions.polyHash(col("tok")).as("h"))
    val counted = tokenRows.groupBy("id", "h").agg(count(lit(1)).as("cnt"))
    val planes = bitPlanes(seed)
    val votes = planes.zipWithIndex.map { case ((a, b), j) =>
      sum(when(pmod(pmod(col("h") * lit(a) + lit(b), lit(TextFunctions.PolyP)),
          lit(2L)) === 1L, col("cnt")).otherwise(-col("cnt"))).as(s"v$j")
    }
    counted.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until PortableBits).map(j =>
          when(col(s"v$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("sh"))
  }

  /** [[nearDupPairs]] on the PORTABLE tier: 60-bit prints, 4 × 15-bit
    * chunk pigeonhole (complete for maxDist <= 3, same argument), every
    * value oracle-replayable. `dist` is cast to int on both sides of the
    * compare surface.
    */
  def nearDupPairsPortable(docs: DataFrame, idCol: String, textCol: String,
                           maxDist: Int = 3, seed: Int = 35): DataFrame = {
    val prints = simhashPrintsPortable(docs, idCol, textCol, seed)
    val chunks = graft.util.Caches.cache(prints.select(col("id"), col("sh"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("ci"),
            shiftright(col("sh"), i * PortableChunkBits)
              .bitwiseAND((1L << PortableChunkBits) - 1).as("cv"))): _*)).as("c"))
      .select(col("id"), col("sh"), col("c.ci"), col("c.cv"))).toDF
    chunks.as("x").join(chunks.as("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        hamming(col("x.sh"), col("y.sh")).cast("int").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** Pairs (id_a < id_b) whose simhash Hamming distance <= maxDist (<= 15,
    * guaranteed complete by the 4-chunk pigeonhole for maxDist <= 3).
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val prints = simhashPrints(docs, idCol, textCol)
    // both sides of the self-join read this — persist (tracked: released by
    // Caches.releaseAll once the result is consumed), same rationale as
    // MinHashDedup/SetSimJoin (the vote aggregation is the expensive stage;
    // recomputing it doubles operator cost)
    val chunks = graft.util.Caches.cache(prints.select(col("id"), col("sh"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("ci"),
            shiftright(col("sh"), i * 16).bitwiseAND(0xFFFFL).as("cv"))): _*)).as("c"))
      .select(col("id"), col("sh"), col("c.ci"), col("c.cv"))).toDF
    chunks.as("x").join(chunks.as("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        hamming(col("x.sh"), col("y.sh")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }
}
