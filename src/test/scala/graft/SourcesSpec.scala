package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** CSV / JSON / parquet round-trips preserve schema and values. */
class SourcesSpec extends SparkSpec {

  private def tmp(suffix: String): String =
    Files.createTempDirectory(s"graft-$suffix").toString + "/out"

  test("CSV round-trip preserves rows and schema (with header + types)") {
    val src = Tables.nation(spark, sf)
    val path = tmp("csv")
    src.write.option("header", "true").csv(path)
    val back = spark.read.option("header", "true").schema(src.schema).csv(path)
    assert(back.schema == src.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
           src.orderBy("n_nationkey").collect().toSeq)
  }

  test("JSON round-trip preserves rows (schema re-applied on read)") {
    val src = Tables.region(spark, sf)
    val path = tmp("json")
    src.write.json(path)
    val back = spark.read.schema(src.schema).json(path)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
           src.orderBy("r_regionkey").collect().toSeq)
  }

  test("parquet round-trip preserves a query result exactly") {
    val src = ops.Relational.q01(spark, sf)
    val path = tmp("parquet")
    src.write.parquet(path)
    val back = spark.read.parquet(path)
    assert(back.orderBy("l_returnflag", "l_linestatus").collect().toSeq ==
           src.orderBy("l_returnflag", "l_linestatus").collect().toSeq)
  }
}
