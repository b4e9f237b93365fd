package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines and ORC surfaces, rounding out the source/sink matrix next to
  * parquet ([[ParquetIO]]) and CSV ([[CsvIngest]]).
  *
  * JSON reads are fixed-schema like the CSV path — inference costs a second
  * scan and drifts types; ORC carries its own schema. Doubles survive a JSON
  * round trip exactly (Jackson emits the shortest representation that parses
  * back to the same binary value), which q77's oracle hash-match proves.
  */
object FormatIO {

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
