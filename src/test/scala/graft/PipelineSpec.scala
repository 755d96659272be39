package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.Instant
import scala.jdk.CollectionConverters._

import graft.etl.{IncrementalStep, Pipeline}

/** End-to-end pipeline test (SURVEY.md §5.4): full 4-step DAG over the JSON
  * fixtures → table contents + state assertions; second overlapping run →
  * idempotent upsert + watermark advance. */
class PipelineSpec extends SparkSpec {

  private def stageSource(): String = {
    val src = tmpDir("pipe-src")
    def cp(rel: String): Unit = {
      val to = Paths.get(src, rel)
      Files.createDirectories(to.getParent)
      Files.copy(Paths.get(resource(s"tinyapi/$rel")), to,
        StandardCopyOption.REPLACE_EXISTING)
    }
    cp("categorias.json")
    cp("produtos/page-1.json"); cp("produtos/page-2.json")
    cp("estoques/page-1.json")
    cp("pedidos/page-1.json")
    src
  }

  test("full DAG run loads all tables; re-run is idempotent and advances state") {
    val src = stageSource()
    val tgt = tmpDir("pipe-tgt")
    val now1 = Instant.parse("2024-06-15T08:00:00Z")

    val r1 = Pipeline.run(spark, src, tgt, now1)
    assert(r1.steps.forall(_.outcome.isInstanceOf[IncrementalStep.Completed]),
      r1.steps.toString)
    assert(r1.audit === Map(
      "categorias" -> 5L, "produtos" -> 3L, "produto_estoque_total" -> 2L,
      "produto_estoque_depositos" -> 3L, "pedidos" -> 1L,
      "pedido_itens" -> 2L))

    val depots = Pipeline.readTable(spark, s"$tgt/produto_estoque_depositos")
      .orderBy("id_produto", "nome_deposito").collect()
    assert(depots.map(r => (r.getInt(0), r.getString(1),
      r.getAs[Double]("saldo"))).toSeq
      === Seq((101, "Filial", 2.0), (101, "Matriz", 10.5),
              (102, "Matriz", 7.0)))

    // coercions landed: comma decimals became doubles, br dates parsed
    val prod = Pipeline.readTable(spark, s"$tgt/produtos")
      .orderBy("id_produto").collect()
    assert(prod(0).getAs[Double]("preco") === 49.90)
    assert(prod(2).getAs[Double]("preco") === 0.0) // "invalid" -> default
    assert(prod(0).getAs[java.sql.Timestamp]("data_criacao").toInstant
      === Instant.parse("2024-03-15T10:22:01Z"))

    val itens = Pipeline.readTable(spark, s"$tgt/pedido_itens")
      .orderBy("id_produto_tiny").collect()
    assert(itens.map(_.getAs[Double]("quantidade")).toSeq === Seq(2.0, 1.0))

    // second run later, overlapping data: idempotent, watermark advances
    val now2 = now1.plusSeconds(86400)
    val r2 = Pipeline.run(spark, src, tgt, now2)
    assert(r2.steps.forall(_.outcome.isInstanceOf[IncrementalStep.Completed]))
    assert(r2.audit === r1.audit) // same keys re-upserted, no duplicates

    val store = new graft.state.StateStore(spark, s"$tgt/_state")
    assert(store.rawWatermark("produtos") === Some(now2)) // start-time semantics
    assert(store.rawWatermark("pedidos") === Some(now2))
    assert(store.getProgress("produtos").get.status
      === graft.state.StateStore.StatusDone)
  }

  test("group-commit run (K=3) produces the same tables as per-page (K=1)") {
    val src = stageSource()
    val now = Instant.parse("2024-06-15T08:00:00Z")
    val tgt1 = tmpDir("pipe-k1")
    val tgt3 = tmpDir("pipe-k3")
    val r1 = Pipeline.run(spark, src, tgt1, now, groupCommitPages = 1)
    val r3 = Pipeline.run(spark, src, tgt3, now, groupCommitPages = 3)
    assert(r3.steps.forall(_.outcome.isInstanceOf[IncrementalStep.Completed]))
    assert(r3.audit === r1.audit)
    for (tbl <- r1.audit.keys) {
      val a = Pipeline.readTable(spark, s"$tgt1/$tbl")
      val b = Pipeline.readTable(spark, s"$tgt3/$tbl")
      assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0,
        s"table $tbl differs between K=1 and K=3")
    }
    // no staged PAGES left behind after a completed run (the staging
    // root may persist since the r7 concurrent-flush fix — flush
    // deletes exactly the page dirs it merged)
    val stagingRoot = Paths.get(s"$tgt3/_staging/produtos")
    if (Files.exists(stagingRoot)) {
      val s = Files.list(stagingRoot)
      val left = try s.iterator().asScala
        .count(_.getFileName.toString.startsWith("p="))
      finally s.close()
      assert(left === 0)
    }
  }
}
