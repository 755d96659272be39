package graft

/** x_kmeans_train: the distributed Lloyd's loop must equal a naive
  * driver-side reference implementation exactly — same seeds, same
  * argmin tie-break, same fixed-point centroid means (the determinism
  * the DuckDB oracle also relies on). */
class KMeansSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("distributed 2-iteration k-means equals the naive reference bit-for-bit") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(rows.length > 4)

    var cents: Map[Long, Array[Double]] = rows.filter(_._1 < 4)
      .map { case (id, e) => id -> e.map(_.toDouble) }.toMap
    var counts: Map[Long, Long] = Map.empty
    for (_ <- 1 to 2) {
      val assigned = rows.map { case (_, e) =>
        val (_, cell) = cents.toSeq.map { case (cid, c) =>
          var acc = 0.0
          var i = 0
          while (i < e.length) {
            val d = e(i).toDouble - c(i); acc += d * d; i += 1
          }
          (acc, cid)
        }.min
        (cell, e)
      }
      val byCell = assigned.groupBy(_._1)
      counts = byCell.map { case (cid, vs) => cid -> vs.size.toLong }
      cents = byCell.map { case (cid, vs) =>
        cid -> Array.tabulate(vs.head._2.length) { i =>
          vs.map(v => math.floor(v._2(i).toDouble * 1e6).toLong).sum
            .toDouble / (1e6 * vs.size)
        }
      }
    }
    val expected = cents.toSeq.flatMap { case (cid, arr) =>
      arr.zipWithIndex.map { case (v, i) =>
        (cid, i.toLong, math.floor(v * 1e6 + 0.5) / 1e6, counts(cid))
      }
    }.sorted

    val got = SparkEntry.queries("x_kmeans_train")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sorted

    assert(got === expected)
  }
}
