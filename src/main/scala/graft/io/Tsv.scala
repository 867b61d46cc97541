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
    import org.apache.spark.sql.functions.{coalesce, col, length, lit}
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
    // Corruption is only detected for columns the scan actually
    // parses, so the check must force a FULL parse — and referencing
    // the real columns also defeats the corrupt-only-scan restriction.
    // This tautology (Catalyst can't fold it) anchors every declared
    // column without caching the whole load in memory (the old
    // `.cache()` pinned the dataset — wrong posture for a big load).
    val anchor = schema.fields
      .map(f => length(coalesce(col(f.name).cast("string"), lit(""))))
      .reduce(_ + _) >= 0
    // bounded first pass: stop scanning once the bound is exceeded
    val bad = df.filter(col("_corrupt_record").isNotNull && anchor)
      .limit(maxBad + 1).count()
    if (bad > maxBad)
      throw new IllegalStateException(
        s">$maxBad malformed rows in $path exceeds the $maxBad-row bound")
    df.filter(col("_corrupt_record").isNull && anchor).drop("_corrupt_record")
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
