package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The reference's TSV interchange boundary (S6-S8): tab-separated,
  * NO quoting, `\N` for null, backslash escapes — the format the
  * loader COPYs into Postgres (common/storage/image.py:336-354,
  * util/tsv_cleaner.py:60-71, Provider.py:317).
  *
  * Scale note: `coalesce(1)` reproduces the reference's single-file
  * append contract (Provider.py:317) and is ONLY for that
  * compatibility mode — the default writes one file per partition.
  */
object Tsv {

  val NullMarker = "\\N"

  // Boundary semantic: with quoting disabled an empty field is
  // written as nothing and reads back as NULL (not ""). The reference
  // distinguishes the two only via Postgres COPY; this engine
  // canonicalizes empty -> null at the TSV boundary.

  def write(df: DataFrame, path: String, singleFile: Boolean = false,
      mode: String = "overwrite"): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(mode)
      .option("sep", "\t")
      .option("quote", "")
      .option("escape", "\\")
      .option("nullValue", NullMarker)
      .option("emptyValue", "")
      .csv(path)
  }

  /** S8: schema-declared read (never inferSchema — SURVEY §1.2),
    * `\N` -> null. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", "\t")
      .option("quote", "")
      .option("escape", "\\")
      .option("nullValue", NullMarker)
      .option("emptyValue", "")
      .csv(path)

  /** S9: bounded-bad-rows load — PERMISSIVE read with a corrupt-record
    * column; fails the load if more than `maxBad` rows are malformed
    * (util/loader/sql.py:97-125's <=10 skip loop). Returns the clean
    * rows. */
  def readBounded(
      spark: SparkSession,
      path: String,
      schema: StructType,
      maxBad: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions.col
    val withCorrupt = schema.add("_corrupt_record", "string")
    val df = spark.read
      .schema(withCorrupt)
      .option("sep", "\t")
      .option("quote", "")
      .option("escape", "\\")
      .option("nullValue", NullMarker)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .cache()
    val bad = df.filter(col("_corrupt_record").isNotNull).count()
    if (bad > maxBad)
      throw new IllegalStateException(
        s"$bad malformed rows in $path exceeds the $maxBad-row bound")
    df.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
  }

  /** The 17->18 column schema-evolution shim
    * (util/loader/ingestion_column.py:12-45): legacy files get
    * ingestion_type derived from the provider kind. */
  def evolveIngestionType(df: DataFrame, providerCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    if (df.columns.contains("ingestion_type")) df
    else df.withColumn("ingestion_type",
      when(col(providerCol) === "commoncrawl", "commoncrawl")
        .otherwise("provider_api"))
  }
}
