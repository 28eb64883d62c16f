package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the executed physical plan of one registered query —
  * the `.explain("formatted")` feedback loop as a one-liner.
  *
  * {{{ sbt "runMain graft.PlanDump doc_cms_freq [/root/testdata/sf0.001] [--aqe]" }}}
  *
  * AQE is off by default so the static plan (the one PlanSpec asserts on)
  * is shown; pass `--aqe` for the runtime-replanned form.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: PlanDump <query> [sfDir] [--aqe]"))
    val sfDir = args.drop(1).find(!_.startsWith("--")).getOrElse("/root/testdata/sf0.001")
    val aqe = args.contains("--aqe")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = CacheScope.uncached(SparkEntry.queries(name)(spark, sfDir))
    df.explain("formatted")
    println("===== toString form (what PlanSpec greps) =====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
