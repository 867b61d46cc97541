package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries.
  *
  * Each query is `(spark, sfDir) => DataFrame`; its key optionally maps
  * to an ANSI-SQL oracle the driver runs in DuckDB over the same
  * parquet tables. Determinism rules for oracle-checked queries:
  *   - every output row set is totally ordered (explicit ORDER BY on a
  *     unique key) in BOTH the Spark query and the oracle SQL;
  *   - money aggregates go through DECIMAL(18,2) before a final cast
  *     to DOUBLE so partial-aggregation order can't change low bits;
  *   - aliases match the oracle column names exactly.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB oracle SQL per query name; omit names whose results are
    * not SQL-expressible (they get a rows-only check + ScalaTest). */
  def oracles: Map[String, String]
}
