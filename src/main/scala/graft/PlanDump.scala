package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection utility: prints the executed plan (or just its
  * PushedFilters/ReadSchema lines with --scan) for named SparkEntry
  * queries — the fast feedback loop for scan-pruning work.
  *
  * Usage: runMain graft.PlanDump <sfDir> [--scan] <query> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val scanOnly = args.contains("--scan")
    val exec = args.contains("--exec") // run first → AQE-final plan
    val names = args.drop(1).filterNot(a => a == "--scan" || a == "--exec")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (exec) df.count()
      val p = df.queryExecution.executedPlan.toString
      println(s"==== $n")
      if (scanOnly)
        p.linesIterator
          .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema") ||
            l.contains("FileScan") || l.contains("PartitionFilters"))
          .foreach(l => println(l.trim.take(300)))
      else println(p)
    }
    spark.stop()
  }
}
