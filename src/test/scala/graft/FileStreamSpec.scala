package graft

import java.nio.file.Files

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** End-to-end file-based streaming: readStream over a directory of parquet
  * files (one file per micro-batch via maxFilesPerTrigger) through the
  * shared transforms → memory sink, compared against the batch run on the
  * same data. This is the production shape (`readStream` → transform →
  * `writeStream`); MemoryStream tests cover the semantics matrix.
  */
class FileStreamSpec extends SparkSpec {

  test("parquet file stream through tumblingCounts equals batch") {
    val dir = Files.createTempDirectory("graft-stream").toFile
    try {
      // two "arriving" files from the events table (micro-batch per file)
      val events = Tables.events(spark, sf()).select("event_id", "event_type", "ts", "value")
      events.filter(col("event_id") % 2 === 0).coalesce(1)
        .write.mode("append").parquet(dir.getAbsolutePath)
      events.filter(col("event_id") % 2 === 1).coalesce(1)
        .write.mode("append").parquet(dir.getAbsolutePath)

      val stream = spark.readStream
        .schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir.getAbsolutePath)
      val q = Streams.tumblingCounts(stream).writeStream
        .format("memory").queryName("fs_tumble").outputMode(OutputMode.Complete).start()
      try q.processAllAvailable() finally q.stop()

      val streamed = spark.table("fs_tumble")
        .orderBy("w_start", "event_type").collect().toSeq
      val batch = Streams.tumblingCounts(events)
        .orderBy("w_start", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
