package graft

import org.apache.spark.sql.types.StructType

import graft.etl.EnvelopeReader
import graft.etl.EnvelopeReader._
import graft.etl.Pipeline

/** src_envelope_decode over the authored fixtures (FIXTURES.md §3): status
  * protocol, error codes 2/35, "Nenhum registro" empty-success, corrupt
  * quarantine, entity explode + flatten. */
class EnvelopeSpec extends SparkSpec {

  private def read(name: String, field: String = "produtos",
                   wrapper: String = "produto",
                   schema: StructType = Pipeline.produtoSchema) =
    EnvelopeReader.readRaw(spark, resource(name), field, wrapper, schema)

  test("OK page: classified with total pages, entities flattened") {
    val raw = read("tinyapi/produtos/page-1.json")
    assert(EnvelopeReader.classify(raw) === PageOk(2))
    val ents = EnvelopeReader.entities(raw, "produtos", "produto")
    val rows = ents.orderBy("id").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("id") === "101")
    assert(rows(0).getAs[String]("preco") === "49,90")
    assert(rows(1).getAs[String]("codigo") === "CAL-002")
  }

  test("codigo 2 (bad token) is fatal and not retryable") {
    val st = EnvelopeReader.classify(read("tinyapi/err_token.json"))
    assert(st === PageError("invalid token (codigo 2)", fatal = true,
      retryable = false))
  }

  test("codigo 35 is retryable, not fatal") {
    val st = EnvelopeReader.classify(read("tinyapi/err_retry35.json"))
    assert(st === PageError("api asked to retry (codigo 35)", fatal = false,
      retryable = true))
  }

  test("'Nenhum registro encontrado' is an EMPTY SUCCESS (ref :281-282)") {
    assert(EnvelopeReader.classify(read("tinyapi/empty_page.json")) === PageEmpty)
  }

  test("unknown processing status is PROCESSED, only status 2 fails (ref :286)") {
    val dir = tmpDir("env")
    def write(name: String, body: String): String = {
      val p = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.writeString(p, body); p.toString
    }
    val ok = write("proc1.json",
      """{"retorno": {"status": "OK", "status_processamento": "1",
         "numero_paginas": "3", "produtos": []}}""".replaceAll("\n\\s*", ""))
    assert(EnvelopeReader.classify(EnvelopeReader.readRaw(spark, ok,
      "produtos", "produto", Pipeline.produtoSchema)) === PageOk(3))
    val bad = write("proc2.json",
      """{"retorno": {"status": "OK", "status_processamento": "2",
         "erros": ["other error"]}}""".replaceAll("\n\\s*", ""))
    assert(EnvelopeReader.classify(EnvelopeReader.readRaw(spark, bad,
      "produtos", "produto", Pipeline.produtoSchema))
      === PageError("processing status 2", fatal = false, retryable = false))
  }

  test("non-numeric numero_paginas is a PageError, not a driver crash") {
    val dir = tmpDir("env")
    val p = java.nio.file.Paths.get(dir, "badnum.json")
    java.nio.file.Files.writeString(p,
      """{"retorno": {"status": "OK", "status_processamento": "3", """ +
      """"numero_paginas": "abc", "produtos": []}}""")
    EnvelopeReader.classify(EnvelopeReader.readRaw(spark, p.toString,
      "produtos", "produto", Pipeline.produtoSchema)) match {
      case PageError(msg, false, false) =>
        assert(msg.contains("numero_paginas"))
      case other => fail(s"expected PageError, got $other")
    }
  }

  test("malformed JSON lands in quarantine, classified as non-fatal error") {
    val st = EnvelopeReader.classify(read("tinyapi/corrupt.json"))
    st match {
      case PageError(msg, fatal, retryable) =>
        assert(msg.startsWith("malformed envelope"))
        assert(!fatal && !retryable)
      case other => fail(s"expected PageError, got $other")
    }
  }
}
