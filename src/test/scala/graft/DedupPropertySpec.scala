package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.util.ScaleJoins

/** Property tests for the round-3 fast paths: the SWAR-packed 64-bit
  * SimHash must equal an independent plain-Scala majority-vote reference
  * on random corpora (lane packing, conv decoding, and the 2·bits ≥ n
  * vote recovery are all one off-by-one away from silent corruption),
  * and chunkedSelfPairs must equal the naive self-join for arbitrary
  * key skew and chunk counts. */
class DedupPropertySpec extends SparkSpec {

  private def sample[A](gen: Gen[A], n: Int): List[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(7L + i))).toList

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** independent reference: per-bit ±1 votes straight off the hex. */
  private def refFp(tokens: Seq[String]): (Long, Long) = {
    val votes = Array.fill(64)(0)
    tokens.foreach { t =>
      val h = md5hex(t)
      for (j <- 0 until 64) {
        val nib = Integer.parseInt(h.charAt(j % 32).toString, 16)
        val bit = if (j < 32) (nib >> 3) & 1 else (nib >> 2) & 1
        votes(j) += (if (bit == 1) 1 else -1)
      }
    }
    def half(lo: Int): Long = (lo until lo + 32)
      .map(j => if (votes(j) >= 0) 1L << (j - lo) else 0L).sum
    (half(0), half(32))
  }

  test("SWAR simhash equals the plain-Scala majority vote (property)") {
    import spark.implicits._
    // small vocabulary + even doc lengths make exact vote TIES likely —
    // the 2·bits >= n boundary the rewrite must get right
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x1", "y2", "z3")
    val docGen = Gen.chooseNum(1, 40)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
    val docs = sample(docGen, 120).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks) }
    val df = docs.map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = graft.ext.DedupOps.simhashFps64From(df)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    docs.foreach { case (id, toks) =>
      assert(got(id) === refFp(toks), s"doc $id tokens=$toks")
    }
    // halves stay in unsigned-32 range (the no-sign-bit invariant)
    got.values.foreach { case (fp0, fp1) =>
      assert(fp0 >= 0L && fp0 < (1L << 32) && fp1 >= 0L && fp1 < (1L << 32))
    }
  }

  test("SWAR simhash guards the 16-bit lane bound (65535 ok, 65536 raises)") {
    import spark.implicits._
    // 65,535 tokens saturates a lane exactly — still correct
    val atBound = Seq((1L, Seq.fill(65535)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val ok = graft.ext.DedupOps.simhashFps64From(atBound).collect()
    assert(ok.length === 1)
    assert((ok.head.getLong(1), ok.head.getLong(2)) === refFp(Seq("tok")),
      "identical tokens must vote like a single token")
    // one more token would carry across lanes — must fail loudly, not
    // emit a corrupted fingerprint
    val over = Seq((2L, Seq.fill(65536)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      graft.ext.DedupOps.simhashFps64From(over).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m =>
      m != null && m.contains("SWAR lane overflow")), messages(ex).toString)
  }

  test("chunkedSelfPairs equals the naive self-join (property)") {
    import spark.implicits._
    val rowGen = for {
      band <- Gen.frequency(5 -> Gen.const("HOT"),
        3 -> Gen.oneOf("a", "b", "c"), 2 -> Gen.choose(0, 50).map("t" + _))
      id <- Gen.chooseNum(0L, 500L)
    } yield (band, id)
    for (round <- 0 until 3) {
      val rows = sample(rowGen, 150 + round * 50)
        .distinctBy(_._2) // unique ids, like doc ids
      val df = rows.toDF("band", "id")
      val naive = df.alias("x").join(df.alias("y"),
          col("x.band") === col("y.band") && col("x.id") < col("y.id"))
        .select(col("x.band"), col("x.id").as("a"), col("y.id").as("b"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      for (chunks <- Seq(1, 2, 5)) {
        val got = ScaleJoins.chunkedSelfPairs(df, Seq("band"), "id", chunks)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        assert(got.length === got.toSet.size,
          s"duplicate pairs at chunks=$chunks round=$round")
        assert(got.toSet === naive, s"chunks=$chunks round=$round")
      }
    }
  }
}
