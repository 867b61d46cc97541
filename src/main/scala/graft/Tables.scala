package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided synthetic tables (TESTDATA.md).
  *
  * All engine queries read Parquet through here: paths AND declared
  * schemas (graft.Schemas) live in one place, and every read is
  * validated so parquet drift fails at the source. At cluster scale
  * these would be directory-partitioned external tables; locally they
  * are single Parquet files per table, so we rely on Catalyst's
  * native parquet source for column pruning + predicate pushdown.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name != "events") Schemas.validate(name, df.schema)
    df
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts normalization. The driver has shipped the column two
    * ways across testdata generations: TIMESTAMP(NANOS) (arrives as a
    * long under spark.sql.legacy.parquet.nanosAsLong) and plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (arrives as
    * TIMESTAMP_NTZ under parquet.inferTimestampNTZ). Both normalize
    * to a session-zoned TimestampType; with the UTC session timezone
    * (Sessions.scala) the ntz cast is value-preserving, and the ns
    * path applies the same ns->us truncation DuckDB does — either way
    * oracle comparisons line up. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = table(s, d, "events")
    // integer `div`, NOT `/`: epoch-ns values (~1.7e18) exceed double
    // precision, so float division can land one microsecond off
    val fixed = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
    Schemas.validate("events", fixed.schema)
    fixed
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
