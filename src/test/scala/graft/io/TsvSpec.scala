package graft.io

import java.nio.file.Files

import org.apache.spark.sql.types.StructType

import graft.SparkSpec

class TsvSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "provider STRING, fid STRING, url STRING, width INT")

  test("TSV round-trip preserves nulls via \\N and writes no quotes") {
    val dir = Files.createTempDirectory("tsv").toString + "/out"
    val df = Seq(
      ("flickr", "a1", "http://x/1", Some(10)),
      ("flickr", "a2", null, None)).toDF("provider", "fid", "url", "width")
    Tsv.write(df, dir, singleFile = true)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".csv"))
    assert(files.length == 1) // coalesce(1) single-file contract
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.exists(_ == "flickr\ta2\t\\N\t\\N"))
    assert(!lines.exists(_.contains("\"")))
    val back = Tsv.read(spark, dir, schema).orderBy("fid").collect()
    assert(back.length == 2)
    assert(back(1).isNullAt(2) && back(1).isNullAt(3))
    assert(back(0).getAs[Int]("width") == 10)
  }

  test("readBounded tolerates <=maxBad malformed rows and fails above it") {
    val dir = Files.createTempDirectory("tsvbad").toString
    val f = new java.io.File(dir, "in.tsv")
    val w = new java.io.PrintWriter(f)
    w.println("p\tf1\thttp://x\t5")
    w.println("p\tf2\thttp://y\tnotanint") // malformed width
    w.close()
    val ok = Tsv.readBounded(spark, f.toString, schema, maxBad = 1)
    assert(ok.count() == 1)
    intercept[IllegalStateException] {
      Tsv.readBounded(spark, f.toString, schema, maxBad = 0).count()
    }
  }

  test("17->18 column ingestion_type shim (ingestion_column.py:12-45)") {
    val legacy = Seq(("commoncrawl", "x"), ("flickr", "y")).toDF("provider", "v")
    val out = Tsv.evolveIngestionType(legacy, "provider")
      .orderBy("provider").collect()
    assert(out.map(_.getAs[String]("ingestion_type")).toSeq ==
      Seq("commoncrawl", "provider_api"))
  }
}
