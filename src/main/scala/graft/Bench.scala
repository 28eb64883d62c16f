package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1), prints ONE JSON line.
  *
  * Protocol (BASELINE.md): per query 1 warm-up + 3 timed runs, median
  * reported. Each run forces the complete plan through the `noop` sink —
  * a bare `count()` would let Catalyst prune the projections being
  * measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // optional args = query-name subset (dev loop); driver passes none
    val wanted = args.toSet
    val picked =
      if (wanted.isEmpty) SparkEntry.queries.toSeq
      else SparkEntry.queries.filter(q => wanted(q._1)).toSeq
    val results = picked.sortBy(_._1).map { case (name, fn) =>
      val t = try {
        once(fn) // warm-up (plan compile + JIT + page cache)
        val timed = Seq(once(fn), once(fn), once(fn)).sorted
        timed(1) // median
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      } finally {
        // Cache hygiene: operators persist() intermediates for the duration
        // of one query; without this, blocks from ~40 earlier queries pile
        // up in the local[32] JVM and squeeze execution memory for later
        // ones (round-2 q7_except went 0.35s -> 2.02s with zero code change).
        // Within a query the warm-up run's barriers stay live (warm-cache
        // protocol, same as rounds 1-2); between queries everything drops.
        CacheScope.release()
        spark.catalog.clearCache()
      }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
