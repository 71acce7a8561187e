package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** A6/A9/J9 — deterministic stream replay harness: feed a batch Dataset
  * through a MemoryStream in fixed-size chunks, drain with
  * Trigger.AvailableNow into a memory sink, return the final result table.
  * This is how every streaming operator gets a deterministic
  * batch-equivalence check (SURVEY.md §5.1).
  */
object Replay {

  def run[T](spark: SparkSession, rows: Seq[T], chunkSize: Int,
             name: String, outputMode: String = "append")(
    transform: Dataset[T] => DataFrame)(implicit enc: org.apache.spark.sql.Encoder[T]): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[T]
    rows.grouped(math.max(chunkSize, 1)).foreach(chunk => source.addData(chunk))
    val q = transform(source.toDS())
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"graft-ckpt-$name").toString)
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
