package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate LINE removal (the RefinedWeb/Gopher cleaning
  * stage): a non-blank line that appears in more than `dfCap` distinct
  * documents is boilerplate — nav menus, cookie banners, footers, license
  * headers — and is stripped from EVERY document, preserving the remaining
  * lines' order. Complements [[graft.functions.TextFunctions.dupLineFraction]]
  * (within-doc repetition metric): this one removes CROSS-document
  * repetition, which a per-doc metric cannot see.
  *
  * Scale shape: the document-frequency pass carries only
  * (xxhash64(line), id) longs — never text — through its two small
  * shuffles (pair-distinct, then count); the hot set (boilerplate is by
  * definition a tiny set of distinct lines) broadcasts into a left_anti
  * prune; reassembly is the one text-carrying shuffle, keyed by doc id.
  * Blank lines are never counted hot and never stripped (they are document
  * structure). A document whose every line is boilerplate comes back with
  * empty text, not a dropped row.
  */
object Boilerplate {

  /** @return `docs` plus `<textCol>_clean` with boilerplate lines removed */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                       dfCap: Long): DataFrame = {
    val reserved = Set("__pos", "__line", "__lh", "__df", "__clean")
    val clash = docs.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"stripBoilerplate reserves internal columns ${reserved.mkString(", ")}; " +
        s"rename: ${clash.mkString(", ")}")
    val lines = docs.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__lh", xxhash64(col("__line")))
    val hot = lines.filter(length(trim(col("__line"))) > 0)
      .select(col("__lh"), col(idCol)).distinct()
      .groupBy("__lh").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > dfCap)
      .select("__lh")
    val kept = lines.join(broadcast(hot), Seq("__lh"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line"))).as("__clean"))
    docs.join(rebuilt, Seq(idCol), "left")
      .withColumn(s"${textCol}_clean", coalesce(col("__clean"), lit("")))
      .drop("__clean")
  }
}
