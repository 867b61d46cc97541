package graft

import org.apache.spark.sql.types.StructType

/** Declared schemas for every driver table (TESTDATA.md) — the
  * engine's schema posture is fixed-and-explicit, never inferred
  * (SURVEY §1.2). Tables.table validates reads against these so a
  * parquet drift fails loudly at the source instead of as a confusing
  * Catalyst error downstream (round-1 ADVICE).
  */
object Schemas {

  private def ddl(s: String): StructType =
    StructType.fromDDL(s.replace("\n", " "))

  val expected: Map[String, StructType] = Map(
    "region" -> ddl("r_regionkey INT, r_name STRING"),
    "nation" -> ddl("n_nationkey INT, n_name STRING, n_regionkey INT"),
    "customer" -> ddl(
      """c_custkey BIGINT, c_name STRING, c_nationkey INT,
        |c_acctbal DOUBLE, c_mktsegment STRING""".stripMargin),
    "supplier" -> ddl(
      "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE"),
    "part" -> ddl(
      """p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING,
        |p_size INT, p_retailprice DOUBLE""".stripMargin),
    "orders" -> ddl(
      """o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        |o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING"""
        .stripMargin),
    "lineitem" -> ddl(
      """l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,
        |l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE,
        |l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,
        |l_linestatus STRING, l_shipdate TIMESTAMP_NTZ""".stripMargin),
    // ts declared as the POST-conversion type (Tables.events turns the
    // raw TIMESTAMP(NANOS)-as-long into a microsecond timestamp)
    "events" -> ddl(
      """event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |event_type STRING, value DOUBLE, props STRING""".stripMargin),
    "documents" -> ddl(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"),
    "embeddings" -> ddl(
      "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"),
  )

  /** Field-name + type check (nullability ignored — parquet writers
    * disagree about it and it carries no semantics here). */
  def validate(name: String, actual: StructType): Unit =
    expected.get(name).foreach { want =>
      val a = actual.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
      val w = want.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
      require(a == w,
        s"schema drift in table '$name': expected $w but read $a")
    }
}
