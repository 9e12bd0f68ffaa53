package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Loader drift-tolerance: the events `ts` adaptation (NANOS-as-long vs
  * MICROS timestamp testdata) and the schema guard that turns the NEXT
  * silent testdata regeneration into a loud, named error.
  */
class TablesSpec extends SparkSpec {

  test("events exposes ts_ns/ts_us/ts regardless of on-disk ts encoding") {
    val e = Tables.events(spark, sf())
    val types = e.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("ts_ns") == "bigint")
    assert(types("ts_us") == "bigint")
    assert(types("ts") == "timestamp")
    // internal consistency: ns = us * 1000, ts == timestamp_micros(ts_us)
    val bad = e.filter(col("ts_ns") =!= col("ts_us") * lit(1000L) ||
      col("ts") =!= timestamp_micros(col("ts_us"))).count()
    assert(bad == 0L)
  }

  test("events ts_us matches DuckDB epoch_us semantics (UTC wall clock)") {
    // The generator writes naive micro timestamps; under a UTC session the
    // derived epoch micros must reproduce the wall-clock fields exactly.
    val row = Tables.events(spark, sf())
      .select(col("ts_us"),
        unix_micros(to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))).as("rt"))
      .filter(col("ts_us") =!= col("rt"))
    assert(row.count() == 0L)
  }

  test("schema guard names the drifted column and its types") {
    val dir = Files.createTempDirectory("graft-tables-drift").toFile
    dir.deleteOnExit()
    // documents with n_chars re-typed to string and `lang` renamed away
    val bad = spark.range(3).select(
      col("id").as("doc_id"), lit("x").as("text"),
      lit("en").as("language"), lit("web").as("source"),
      lit("12").as("n_chars"))
    val p = s"${dir.getAbsolutePath}/documents.parquet"
    bad.write.mode("overwrite").parquet(p)
    val err = intercept[IllegalStateException] {
      Tables(spark, dir.getAbsolutePath, "documents")
    }
    assert(err.getMessage.contains("schema drift"))
    assert(err.getMessage.contains("`lang`"))     // missing column named
    assert(err.getMessage.contains("`n_chars`"))  // wrong type named
    assert(err.getMessage.contains("`language`")) // extra column named
  }

  test("schema guard passes the real testdata for every table") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t => assert(Tables(spark, sf(), t).columns.nonEmpty) }
  }

  test("events loader rejects an unadaptable ts type loudly") {
    val dir = Files.createTempDirectory("graft-events-drift").toFile
    dir.deleteOnExit()
    val bad = spark.range(3).select(
      col("id").as("event_id"), lit("2024-01-01T00:00:00").as("ts"),
      col("id").as("user_id"), lit("view").as("event_type"),
      lit(1.0).as("value"), lit("{}").as("props"))
    bad.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    val err = intercept[IllegalStateException] {
      Tables.events(spark, dir.getAbsolutePath)
    }
    // caught by the schema guard before the dataType branch even runs
    assert(err.getMessage.contains("`ts`"))
  }
}
