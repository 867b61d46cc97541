package graft

/** Plan-audit main: prints the formatted physical plan of each query
  * (or a named subset) so shuffle counts, PushedFilters, broadcast
  * choices, and WholeStageCodegen spans can be reviewed. */
object Explain {
  def main(args: Array[String]): Unit = {
    // args(0) is the sfDir ONLY when it looks like one (absolute
    // path); everything else is query names. The old rule dropped
    // args(0) whenever MORE than one name was passed — silently
    // explaining all but the first query asked for.
    val hasDir = args.nonEmpty && args(0).startsWith("/")
    val sfDir = if (hasDir) args(0) else "/root/testdata/sf0.01"
    val named = (if (hasDir) args.drop(1) else args).toSeq
    val names =
      if (named.nonEmpty) named else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local("graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
