package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** src_envelope_decode (SURVEY.md §2.1): decode the Tiny-API JSON envelope
  * (parser semantics at tiny_api_v2_cliente.py:246-285) as DataFrame ops:
  *
  *  - require a `retorno` key (:249-250)
  *  - accept `status == "OK"` (:259)
  *  - API error protocol: codigo "2" = fatal bad token (:272), "35" =
  *    retryable (:268-270)
  *  - processing status ∉ {"3","10"} is empty/error; the literal
  *    "Nenhum registro encontrado" error is an EMPTY SUCCESS (:281-282)
  *  - malformed JSON rows land in a `_corrupt` quarantine column instead of
  *    failing the job (PERMISSIVE mode)
  *
  * Page files are small (API pages of ≤100 records), so classifying a page's
  * envelope status on the driver is O(1) — the entity payload itself stays
  * distributed.
  */
object EnvelopeReader {

  /** Envelope wrapper around an entity array field, e.g. field `produtos`
    * whose elements are `{"produto": {...}}` (FIXTURES.md §3.2). */
  def envelopeSchema(entityField: String, itemWrapper: String,
                     itemSchema: StructType): StructType =
    StructType(Seq(
      StructField("retorno", StructType(Seq(
        StructField("status", StringType),
        StructField("status_processamento", StringType),
        StructField("pagina", StringType),
        StructField("numero_paginas", StringType),
        // dict-or-string duality (ref :261-264): captured as raw JSON text
        // and parsed defensively (t9_json_field)
        StructField("erros", StringType),
        StructField(entityField, ArrayType(StructType(Seq(
          StructField(itemWrapper, itemSchema)))))))),
      StructField("_corrupt", StringType)))

  sealed trait PageStatus
  case class PageOk(totalPages: Int) extends PageStatus
  case object PageEmpty extends PageStatus
  case class PageError(message: String, fatal: Boolean, retryable: Boolean)
    extends PageStatus

  /** Read raw envelope JSON file(s) with quarantine. */
  def readRaw(spark: SparkSession, path: String, entityField: String,
              itemWrapper: String, itemSchema: StructType): DataFrame =
    spark.read
      .schema(envelopeSchema(entityField, itemWrapper, itemSchema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Classify a page envelope per the reference's status protocol. */
  def classify(raw: DataFrame): PageStatus = {
    val head = raw.select(
      col("retorno.status"), col("retorno.status_processamento"),
      col("retorno.numero_paginas"), col("retorno.erros"),
      col("_corrupt")).collect().headOption
    val CodigoRe = "\"codigo\"\\s*:\\s*\"(\\d+)\"".r
    head match {
      case None => PageEmpty
      case Some(r) if r.getString(4) != null =>
        PageError(s"malformed envelope: ${r.getString(4).take(80)}",
          fatal = false, retryable = false)
      case Some(r) if r.getString(0) == null =>
        PageError("missing retorno", fatal = false, retryable = false)
      case Some(r) if r.getString(0) != "OK" =>
        val erros = Option(r.getString(3)).getOrElse("")
        CodigoRe.findFirstMatchIn(erros).map(_.group(1)) match {
          case Some("2") => // bad token: fatal, never retry (ref :272)
            PageError("invalid token (codigo 2)", fatal = true, retryable = false)
          case Some("35") => // API asks for retry (ref :268-270)
            PageError("api asked to retry (codigo 35)", fatal = false,
              retryable = true)
          case _ =>
            PageError(s"api error: $erros", fatal = false, retryable = false)
        }
      case Some(r) if r.getString(1) != null && !Set("3", "10")(r.getString(1)) =>
        val erros = Option(r.getString(3)).getOrElse("")
        // ref :281-286: "Nenhum registro" ⇒ empty success; status "2" ⇒
        // failure; any OTHER status_proc is logged and PROCESSED anyway
        if (erros.contains("Nenhum registro")) PageEmpty
        else if (r.getString(1) == "2")
          PageError("processing status 2", fatal = false, retryable = false)
        else pageOk(r.getString(2))
      case Some(r) =>
        pageOk(r.getString(2))
    }
  }

  /** numero_paginas is STRING-typed to tolerate dirty envelopes — a
    * non-numeric value is a classification error, not a driver crash. */
  private def pageOk(numeroPaginas: String): PageStatus =
    Option(numeroPaginas) match {
      case None => PageOk(1)
      case Some(s) => s.toIntOption match {
        case Some(n) => PageOk(n)
        case None => PageError(s"bad numero_paginas '$s'",
          fatal = false, retryable = false)
      }
    }

  /** Decode the entity rows of an OK page: status gate → explode entity
    * array → flatten the `{wrapper: {...}}` indirection. */
  def entities(raw: DataFrame, entityField: String, itemWrapper: String): DataFrame =
    raw.filter(col("_corrupt").isNull &&
               col("retorno.status") === "OK")
      .select(explode(col(s"retorno.$entityField")).as("it"))
      .select(col(s"it.$itemWrapper.*"))
}
