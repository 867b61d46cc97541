package graft.io

import java.nio.file.Files

import graft.SparkSpec

/** S11: the loader's JDBC sink (util/loader/sql.py upsert target —
  * SURVEY §2.1), exercised end-to-end against an embedded Derby
  * database (in-JVM, no external service): write 100 rows through
  * Spark's JDBC writer, read them back through the JDBC source, and
  * require value-level equality. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  test("S11: df.write.jdbc round-trips 100 rows through embedded Derby") {
    val dbDir = Files.createTempDirectory("derby").toString + "/imagedb"
    val url = s"jdbc:derby:$dbDir;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    val rows = (1 to 100).map(i =>
      (s"fid$i", s"https://img.example.com/$i.jpg", i, i * 1.5,
        if (i % 7 == 0) null else s"creator $i"))
    val df = rows.toDF("foreign_identifier", "image_url", "width",
      "score", "creator")
    // single writer connection: the reference's loader COPYs through
    // one session; Derby embedded also prefers serialized DDL+insert
    df.coalesce(1).write.mode("overwrite").jdbc(url, "image", props)

    val back = spark.read.jdbc(url, "image", props)
    assert(back.count() == 100)
    val expect = rows.sortBy(_._1)
    val got = back.collect()
      .map(r => (r.getAs[String]("foreign_identifier"),
        r.getAs[String]("image_url"), r.getAs[Int]("width"),
        r.getAs[Double]("score"), r.getAs[String]("creator")))
      .sortBy(_._1)
    assert(got.toSeq == expect)
    // append mode adds rows (the buffered-appender contract, S7/S11)
    df.limit(10).coalesce(1).write.mode("append").jdbc(url, "image", props)
    assert(spark.read.jdbc(url, "image", props).count() == 110)
  }
}
