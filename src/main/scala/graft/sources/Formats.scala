package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange-format writers/readers (SURVEY §2.1 source surface
  * beyond parquet). Schema is ALWAYS supplied explicitly on read —
  * never inferred — so a CSV/JSON round-trip preserves types exactly
  * and a streaming read stays legal (inference is forbidden on
  * streams, SURVEY §1.3).
  */
object Formats {
  val supported: Seq[String] = Seq("parquet", "json", "csv", "orc")

  def write(df: DataFrame, format: String, path: String): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  def read(spark: SparkSession, format: String, path: String,
      schema: StructType): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    (if (format == "csv") r.option("header", "true") else r).load(path)
  }
}
