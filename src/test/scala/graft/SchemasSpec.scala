package graft

import org.apache.spark.sql.types.StructType

class SchemasSpec extends SparkSpec {

  test("every driver table matches its declared schema at sf0.001") {
    val d = "/root/testdata/sf0.001"
    Schemas.expected.keys.foreach { name =>
      // throws on drift; events goes through the ns->us shim
      val df = Tables.table(spark, d, name)
      assert(df.columns.nonEmpty, name)
    }
    assert(Tables.events(spark, d).schema("ts").dataType.simpleString == "timestamp")
  }

  test("validate rejects a wrong schema loudly") {
    val bad = StructType.fromDDL("r_regionkey INT, wrong_name STRING")
    val e = intercept[IllegalArgumentException] {
      Schemas.validate("region", bad)
    }
    assert(e.getMessage.contains("schema drift"))
    assert(e.getMessage.contains("region"))
  }
}
