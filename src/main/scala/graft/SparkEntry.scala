package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CleaningPack, LlmPack, QueryPack, RelationalPack}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 surfaces here as a
  * named query over the driver testdata; names present in `oracleSql`
  * are hash-compared against DuckDB by the driver (the correctness
  * gate), the rest are rows-only and carry ScalaTest verification
  * against exact counterparts instead.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(RelationalPack, CleaningPack, LlmPack)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The A2/O1 top-domains summary — the reference's own
    * flagship test query (tests/test_ExtractCCLinks.py:236). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_a2_top_domains")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted for non-SQL-expressible ops
    * (the LSH scale paths), which the driver records as rows-only. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
