package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.etl.Pipeline

/** Runnable demo of the streaming ingest path:
  * `sbt "runMain graft.streaming.StreamingDemo <pageDir> <targetTable> <checkpoint>"`.
  * Processes whatever envelope page files are in <pageDir> (AvailableNow),
  * merge-upserting into <targetTable>; re-runs resume from the checkpoint
  * and only touch new files — the streaming twin of the s5 page checkpoint.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val Array(pageDir, targetTable, checkpoint) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stream = StreamingIngest.pageStream(spark, pageDir, "produtos",
      "produto", Pipeline.produtoSchema)
    val q = StreamingIngest.incrementalSink(stream, spark, targetTable,
      Seq("id"), checkpoint).start()
    q.awaitTermination()
    val result = spark.read.parquet(targetTable)
    println(s"[stream] table rows: ${result.count()}")
    result.orderBy("id").select("id", "nome", "preco")
      .collect().foreach(r => println(s"[stream] ${r.mkString(" | ")}"))
    spark.stop()
  }
}
