package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.etl.{EnvelopeReader, Pipeline}

/** DSv2 paginated source: partition-per-page, pagination pushdown pruning
  * partitions at planning time, and envelope decode over the body. */
class PageFileSourceSpec extends SparkSpec {

  private def stage(): String = {
    val dir = tmpDir("pages")
    Seq("page-1.json", "page-2.json").foreach { f =>
      Files.copy(Paths.get(resource(s"tinyapi/produtos/$f")),
        Paths.get(dir, f), StandardCopyOption.REPLACE_EXISTING)
    }
    // fabricate pages 3..5 from page-2 to get a real range
    (3 to 5).foreach { n =>
      Files.copy(Paths.get(dir, "page-2.json"), Paths.get(dir, s"page-$n.json"))
    }
    dir
  }

  private def read(dir: String) =
    spark.read.format("graft.sources.PageFileSource")
      .option("path", dir).load()

  test("reads one row per page file") {
    val dir = stage()
    val df = read(dir)
    assert(df.count() === 5)
    assert(df.select("page").orderBy("page").collect().map(_.getInt(0)).toSeq
      === Seq(1, 2, 3, 4, 5))
  }

  test("page-range predicate prunes partitions at planning time") {
    val dir = stage()
    val df = read(dir).filter(col("page") >= 4)
    assert(df.count() === 2)
    // pushdown visible in partition count, not just row filtering
    assert(df.rdd.getNumPartitions === 2)
    assert(read(dir).filter(col("page") === 3).rdd.getNumPartitions === 1)
    assert(read(dir).rdd.getNumPartitions === 5)
  }

  test("boundary predicates and junk filenames are safe") {
    val dir = stage()
    // strict bound at Int.MaxValue must return 0 rows, not wrap
    assert(read(dir).filter(col("page") > Int.MaxValue).count() === 0)
    assert(read(dir).filter(col("page") < Int.MinValue).count() === 0)
    // out-of-range page number and duplicate page spelling are tolerated
    Files.copy(Paths.get(dir, "page-1.json"),
      Paths.get(dir, "page-99999999999.json"))
    Files.copy(Paths.get(dir, "page-1.json"), Paths.get(dir, "page-01.json"))
    val df = read(dir)
    assert(df.count() === 5) // 5 distinct pages, junk skipped, dup collapsed
    // missing path option fails with a clear message
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.PageFileSource").load().count()
    }
    assert(e.getMessage.contains("path"))
  }

  test("watermark-date predicate prunes dated pages at planning time") {
    val dir = stage() // pages 1..5, undated
    // dated pages 6..9 straddling the watermark (ref pushes data_filtro_api
    // into the API query — here the date rides the filename)
    Seq(6 -> "2024-01-03", 7 -> "2024-01-04",
        8 -> "2024-01-05", 9 -> "2024-01-06").foreach { case (n, dt) =>
      Files.copy(Paths.get(dir, "page-2.json"),
        Paths.get(dir, s"page-$n-$dt.json"))
    }
    val df = read(dir).filter(col("page_date") >= "2024-01-05")
    // planning-time pruning: only the matching dated pages become
    // partitions; undated pages are excluded by SQL NULL-compare semantics
    assert(df.rdd.getNumPartitions === 2)
    assert(df.select("page").orderBy("page").collect().map(_.getInt(0)).toSeq
      === Seq(8, 9))
    // the pushed range is visible on the scan node
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val scan = df.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }.get
    assert(scan.scan.description().contains("dateRange=[2024-01-05,"),
      scan.scan.description())
    // page and date pushdowns compose; page-only reads see all 9 pages
    assert(read(dir).rdd.getNumPartitions === 9)
    assert(read(dir)
      .filter(col("page_date") >= "2024-01-04" && col("page") <= 8)
      .rdd.getNumPartitions === 2)
    // strict and equality date bounds prune exactly
    assert(read(dir).filter(col("page_date") > "2024-01-05")
      .rdd.getNumPartitions === 1)
    assert(read(dir).filter(col("page_date") === "2024-01-04")
      .rdd.getNumPartitions === 1)
    // undated rows surface page_date as NULL
    assert(read(dir).filter(col("page_date").isNull).count() === 5)
  }

  test("body decodes through the envelope machinery") {
    val dir = stage()
    val env = graft.etl.EnvelopeReader.envelopeSchema(
      "produtos", "produto", Pipeline.produtoSchema)
    val ents = read(dir).filter(col("page") === 1)
      .select(from_json(col("body"), env).as("e"))
      .select(explode(col("e.retorno.produtos")).as("it"))
      .select(col("it.produto.id"), col("it.produto.preco"))
      .orderBy("id").collect()
    assert(ents.map(r => (r.getString(0), r.getString(1))).toSeq
      === Seq(("101", "49,90"), ("102", "129,90")))
  }
}
