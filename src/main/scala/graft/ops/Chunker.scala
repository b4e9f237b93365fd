package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Fixed-token-window document chunking with stride — the standard prep step
  * that turns long documents into model-sized training/retrieval pieces
  * (north-star [EXT]; the reference has no text surface at all).
  *
  * Chunk starts are `0, stride, 2·stride, …` and the last start is the
  * smallest multiple of `stride` whose chunk reaches the document's end
  * (`start + chunkSize >= n`), so every token lands in at least one chunk
  * and trailing chunks may be short. `stride < chunkSize` gives overlapping
  * chunks (retrieval windows); `stride == chunkSize` tiles exactly.
  *
  * Scale shape: one projection + one generator — no shuffle, no self-join.
  * Output rows ≈ Σ n_tokens/stride, linear in corpus tokens, and the
  * generator explodes per document so a 100 TB corpus chunks
  * embarrassingly parallel. The token array is materialized as a column
  * BEFORE the per-chunk `slice` so each chunk re-reads a bound attribute,
  * not the tokenizer expression (a lambda/generator re-evaluates external
  * EXPRESSIONS per element — re-tokenizing per chunk — but an attribute
  * reference is a plain row read).
  */
object Chunker {

  /** Explode documents into (doc, chunk) rows.
    *
    * @return (idCol, chunk_ix, chunk_start, n_chunk_tokens, chunk_md5) — the
    *         chunk itself is carried as an md5 of its space-joined tokens so
    *         downstream exact-dedup/compare is cheap; swap the md5 select for
    *         `chunk_text` when the text body is wanted.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val toked = docs.select(col(idCol),
        TextFunctions.tokens(col(textCol)).as("__toks"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__n"))
      .filter(col("__n") > 0)
    // Last chunk index: ceil(max(n - chunkSize, 0) / stride); exact in
    // double (operands are tiny integers) and mirrored verbatim by engines
    // without integer ceil-div.
    val lastIx = ceil(greatest(col("__n") - chunkSize, lit(0L))
      .cast("double") / stride).cast("long")
    toked
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0L), lastIx)).as("chunk_ix"))
      .withColumn("chunk_start", col("chunk_ix") * stride)
      .select(col(idCol), col("chunk_ix"), col("chunk_start"),
        least(lit(chunkSize.toLong), col("__n") - col("chunk_start"))
          .as("n_chunk_tokens"),
        md5(array_join(slice(col("__toks"),
            (col("chunk_start") + 1).cast("int"), lit(chunkSize)), " ")
          .cast("binary")).as("chunk_md5"))
  }
}
