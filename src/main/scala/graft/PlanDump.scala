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
    val outDir = args.sliding(2).collectFirst {
      case Array("--out", d) => d }
    val positional = {
      var rest = args.toSeq
      val b = Seq.newBuilder[String]
      while (rest.nonEmpty) rest match {
        case Seq("--out", _, tail @ _*) => rest = tail
        case Seq(a, tail @ _*) => if (!a.startsWith("--")) b += a; rest = tail
      }
      b.result()
    }
    val names = positional.filter(!_.startsWith("/")).flatMap(_.split(","))
    if (names.isEmpty) sys.error("usage: PlanDump <query>[,q2,...] [sfDir] [--aqe] [--out dir]")
    val sfDir = positional.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.001")
    val aqe = args.contains("--aqe")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = CacheScope.uncached(SparkEntry.queries(name)(spark, sfDir))
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      outDir match {
        case Some(dir) =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"$name.txt"),
            formatted.getBytes("UTF-8"))
          println(s"[plandump] wrote $dir/$name.txt")
        case None =>
          println(formatted)
          println("===== toString form (what PlanSpec greps) =====")
          println(df.queryExecution.executedPlan.toString)
      }
      CacheScope.release()
    }
    spark.stop()
  }
}
