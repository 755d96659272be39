package graft.state

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp
import java.time.Instant
import scala.util.Try

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Pipeline state tables (SURVEY.md §2.7 s1/s2/s5): the Spark re-expression
  * of the reference's `script_ultima_execucao` (watermarks, one row per
  * process, tiny_api_v2_cliente.py:90) and `script_progresso_paginas` (page
  * checkpoints, :91).
  *
  * Storage: single-partition parquet directories rewritten per update via
  * write-temp-then-swap (the local-FS stand-in for an atomic table-format
  * commit; at cluster scale this is a Delta/Iceberg MERGE — SURVEY.md §7.4).
  * State is O(#processes) rows, so driver-side read-modify-write is correct
  * by design — the 100 TB posture keeps *data* distributed, not these
  * few-row control tables.
  */
class StateStore(spark: SparkSession, dir: String) {
  import StateStore._

  private val wmPath = s"$dir/watermarks"
  private val pgPath = s"$dir/progress"

  // ---- s1/s2: watermark store -----------------------------------------

  /** s1_watermark_read: per-process watermark with the reference's
    * **exclusive +1 s bound** (tiny_api_v2_cliente.py:113) applied at read
    * time, exactly like `get_ultima_execucao`. */
  def watermarkExclusive(process: String): Option[Instant] =
    rawWatermark(process).map(_.plusSeconds(1))

  /** The stored value itself (no +1 s) — what s2 wrote. */
  def rawWatermark(process: String): Option[Instant] =
    readKv(wmPath, wmSchema)
      .filter(_.getString(0) == process)
      .map(r => r.getTimestamp(1).toInstant)
      .headOption

  /** s2_watermark_write: upsert the watermark. The caller passes the step
    * START time, never the end time (ref :326,363) — records modified
    * mid-run get re-fetched next run instead of lost. */
  def setWatermark(process: String, ts: Instant): Unit = {
    val rest = readKv(wmPath, wmSchema).filterNot(_.getString(0) == process)
    writeKv(wmPath, wmSchema, rest :+ Row(process, Timestamp.from(ts)))
  }

  // ---- s5: page-checkpoint store --------------------------------------

  def getProgress(process: String): Option[Progress] =
    readKv(pgPath, pgSchema).find(_.getString(0) == process).map { r =>
      Progress(r.getString(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getString(5))
    }

  def upsertProgress(p: Progress): Unit = {
    val rest = readKv(pgPath, pgSchema).filterNot(_.getString(0) == p.process)
    writeKv(pgPath, pgSchema, rest :+ Row(p.process, p.filter, p.page,
      p.totalPages, p.records, p.status))
  }

  // ---- tiny-kv parquet plumbing ---------------------------------------

  private def readKv(path: String, schema: StructType): Seq[Row] =
    if (Files.exists(Paths.get(path)))
      spark.read.schema(schema).parquet(path).collect().toSeq
    else Seq.empty

  private def writeKv(path: String, schema: StructType, rows: Seq[Row]): Unit = {
    val tmp = path + ".tmp"
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    graft.util.Fs.swapInto(Paths.get(tmp), Paths.get(path))
  }
}

object StateStore {
  /** Page-checkpoint row (ref DDL :91). Status state machine:
    * PENDENTE → EM_ANDAMENTO → CONCLUIDO | ERRO (ref :183-223). */
  case class Progress(process: String, filter: String, page: Int,
                      totalPages: Int, records: Long, status: String)

  val StatusPending = "PENDENTE"
  val StatusRunning = "EM_ANDAMENTO"
  val StatusDone = "CONCLUIDO"
  val StatusError = "ERRO"

  val wmSchema: StructType = StructType(Seq(
    StructField("nome_processo", StringType, nullable = false),
    StructField("timestamp_ultima_execucao", TimestampType, nullable = false)))

  val pgSchema: StructType = StructType(Seq(
    StructField("processo", StringType, nullable = false),
    StructField("data_filtro_api", StringType, nullable = false),
    StructField("pagina_atual", IntegerType, nullable = false),
    StructField("total_paginas", IntegerType, nullable = false),
    StructField("registros_processados", LongType, nullable = false),
    StructField("status_execucao", StringType, nullable = false)))
}
