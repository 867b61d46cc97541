package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The reference's TSV interchange boundary (S6-S8): tab-separated,
  * NO quoting, `\N` for null — the format the loader COPYs into
  * Postgres (common/storage/image.py:336-354,
  * util/tsv_cleaner.py:60-71, Provider.py:317).
  *
  * FORMAT CONTRACT — sanitized tab-join, NOT general Postgres COPY:
  * the reference sanitizes every cell before write (tabs/newlines
  * stripped or rejected by its column cleaners), so cells never carry
  * embedded tabs, newlines, or backslash escape sequences, and the
  * whole boundary is a plain `"\t".join(...)` per row. This module
  * implements exactly that contract: neither side applies
  * backslash-escape decoding (`\t`/`\n`/`\\` stay literal), and the
  * two-character sequence `\N` is ALWAYS the null marker — a cell
  * whose data is literally `\N` cannot be represented (the reference
  * has the same property). GoldenTsvSpec pins the round trip
  * byte-for-byte against every reference example_output file. Feeding
  * this reader raw `COPY TO` output from an arbitrary database —
  * where those escapes DO occur — would mis-read; that input is out
  * of scope by design.
  *
  * Scale note: `coalesce(1)` reproduces the reference's single-file
  * append contract (Provider.py:317) and is ONLY for that
  * compatibility mode — the default writes one file per partition.
  */
object Tsv {

  val NullMarker = "\\N"

  // Boundary semantic: Postgres COPY distinguishes the empty string
  // (nothing between tabs) from NULL (`\N`), and the reference's own
  // expected-output TSVs carry empty-string cells (e.g. cleveland's
  // blank creators) — so the read path must too. A CSV parser with
  // quoting disabled cannot: it collapses unquoted-empty to null
  // before null-marker matching ever runs. `read` therefore parses
  // lines directly (split on tab, exact `\N` match -> null, raw cell
  // otherwise), which GoldenTsvSpec pins byte-for-byte against every
  // reference example_output file.

  def write(df: DataFrame, path: String, singleFile: Boolean = false,
      mode: String = "overwrite"): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(mode)
      .option("sep", "\t")
      .option("quote", "")
      // no escape option: with quoting disabled the writer emits raw
      // bytes, and the sanitized tab-join contract (see above) means
      // there is never anything to escape — declaring one here only
      // suggested an escape semantic the read side doesn't apply
      .option("nullValue", NullMarker)
      .option("emptyValue", "")
      // the CSV writer TRIMS whitespace-edged cells by default; COPY
      // data is byte-exact (reference goldens carry cells with
      // trailing spaces — thingiverse line 27's creator 'Willie ')
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
  }

  /** S8: schema-declared read (never inferSchema — SURVEY §1.2),
    * `\N` -> null, empty cell -> empty string (COPY-faithful — see
    * the boundary note above). Casts are permissive (non-ANSI): a
    * non-numeric cell in a numeric column nulls out, as before. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, element_at, lit, split, when}
    val parts = split(col("value"), "\t", -1)
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      val cell = element_at(parts, i + 1)
      when(cell === lit(NullMarker), lit(null)).otherwise(cell)
        .cast(f.dataType).as(f.name)
    }
    spark.read.text(path).select(cols.toSeq: _*)
  }

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
