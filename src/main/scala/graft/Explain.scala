package graft

/** Plan-audit main: prints the formatted physical plan of each query
  * (or a named subset) so shuffle counts, PushedFilters, broadcast
  * choices, and WholeStageCodegen spans can be reviewed. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty && args(0).startsWith("/")) args(0)
      else "/root/testdata/sf0.01"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else if (args.nonEmpty && !args(0).startsWith("/")) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local("graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
