package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.types.Coercions.detRound
import graft.util.Tables.t

/** Deduplication operators for training-data pipelines (SURVEY.md §2.10).
  *
  * Four tiers, cheapest first:
  *  - exact (content hash, hash-groupBy)
  *  - MinHash + LSH banding (shingle → per-band min signature → bucket join)
  *  - SimHash (bitwise majority fingerprint, group-by-fingerprint)
  *  - n-gram Jaccard verification on candidate pairs
  *
  * The parquet fixtures contain no duplicates, so each query first builds a
  * deterministic duplicated corpus (a shifted-id copy, near-dup variants with
  * one appended token) — that construction is mirrored in the oracle SQL.
  *
  * Scale posture: MinHash signatures are per-row folds (no shuffle); the only
  * shuffle is the band-bucket self-join, which at 100 TB is the standard
  * LSH-banding trick — candidate pairs ~ O(true dups), not O(n²). SimHash
  * group-by shuffles 64-bit fingerprints (two BIGINT halves) only. Exact
  * dedup shuffles the 32-byte sha256, never the document text.
  */
object DedupOps {

  /** exact-dup corpus: every document appears twice under different ids. */
  private def dupCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))

  private val dupCorpusSql =
    """corpus AS (SELECT doc_id, text FROM documents
                  UNION ALL
                  SELECT doc_id + 100000 AS doc_id, text FROM documents)"""

  /** near-dup corpus: the copy differs by one appended token. */
  private def nearDupCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" extradup token")).as("text")))

  private val nearDupCorpusSql =
    """corpus AS (SELECT doc_id, text FROM documents
                  UNION ALL
                  SELECT doc_id + 100000 AS doc_id, text || ' extradup token' AS text
                  FROM documents)"""

  /** 3-word shingles of the whitespace token stream (as a Column over a
    * DataFrame that has a `toks` array column). */
  private val shinglesExpr =
    "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"

  private val shinglesSql =
    "list_transform(range(0, len(tk) - 2), i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])"

  /** width-parameterized n-token shingles (r4): production
    * decontamination overlaps on 8–13-grams, not 3 — width is the
    * precision dial (long shingles almost never collide by accident). */
  private def shinglesExprN(n: Int): String = {
    val parts = (0 until n).map(k => s"toks[i+$k]").mkString(", ")
    s"transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', $parts))"
  }

  private def shinglesSqlN(n: Int): String = {
    val parts = (1 to n).map(k => s"tk[i+$k]").mkString(" || ' ' || ")
    s"list_transform(range(0, len(tk) - ${n - 1}), i -> $parts)"
  }

  /** DuckDB twin of `decontaminate` at shingle width n. */
  private def decontaminateSql(n: Int): String =
    s"""WITH bench AS (
          SELECT doc_id AS bid,
                 array_to_string(list_slice(string_split(text, ' '), 1, 10),
                                 ' ') AS excerpt
          FROM documents WHERE doc_id < 20),
        train AS (
          SELECT d.doc_id,
                 CASE WHEN d.doc_id % 7 = 0 THEN d.text || ' ' || b.excerpt
                      ELSE d.text END AS text
          FROM documents d JOIN bench b ON b.bid = d.doc_id % 20
          WHERE d.doc_id >= 20),
        ttk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM train),
        tsh AS (SELECT doc_id, unnest(list_distinct(${shinglesSqlN(n)})) AS sh
                FROM ttk WHERE len(tk) >= $n),
        btk AS (SELECT doc_id, string_split(text, ' ') AS tk
                FROM documents WHERE doc_id < 20),
        bsh AS (SELECT DISTINCT unnest(list_distinct(${shinglesSqlN(n)})) AS sh
                FROM btk WHERE len(tk) >= $n)
        SELECT t.doc_id, COUNT(*) AS n_shared
        FROM tsh t JOIN bsh b ON t.sh = b.sh
        GROUP BY 1 ORDER BY doc_id"""

  /** training-data decontamination at shingle width n: flag training
    * docs sharing any n-token shingle with the benchmark/eval set — the
    * n-gram overlap check every LLM data pipeline runs before training.
    * Fixture: docs < 20 are the "benchmark"; training docs divisible by
    * 7 get a 10-token benchmark excerpt appended (known contamination —
    * it carries 10-n+1 of the benchmark doc's n-grams for n <= 10).
    * Plan shape: shingle equi-join against the benchmark shingle set
    * (tiny → broadcast), never all-pairs; training shingles are a
    * scan-side Generate. */
  private def decontaminate(s: SparkSession, d: String, n: Int): DataFrame = {
    val base = t(s, d, "documents").select(col("doc_id"), col("text"))
    val benchTexts = base.filter(col("doc_id") < 20)
      .select(col("doc_id").as("bid"),
        expr("concat_ws(' ', slice(split(text, ' '), 1, 10))").as("excerpt"))
    val train = base.filter(col("doc_id") >= 20)
      .withColumn("bid", col("doc_id") % 20)
      .join(broadcast(benchTexts), "bid")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" "), col("excerpt")))
          .otherwise(col("text")).as("text"))
    def shingled(df: DataFrame): DataFrame = df
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(expr(s"array_distinct(${shinglesExprN(n)})")).as("sh"))
    val benchSh = shingled(base.filter(col("doc_id") < 20))
      .select(col("sh")).distinct()
    shingled(train)
      .join(broadcast(benchSh), "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  /** hex nibbles with bit3 set (value >= 8) / with bit2 set (value & 4) —
    * two independent uniform bits per md5 hex char. */
  private val hiBitNibbles = Seq("8", "9", "a", "b", "c", "d", "e", "f")
  private val bit2Nibbles = Seq("4", "5", "6", "7", "c", "d", "e", "f")
  private val nibbles1 = hiBitNibbles.map(c => s"'$c'").mkString("(", ", ", ")")
  private val nibbles2 = bit2Nibbles.map(c => s"'$c'").mkString("(", ", ", ")")

  /** MinHash-LSH candidate pairs (a < b) over the near-dup corpus —
    * shared by x_dedup_minhash, the composed x_dedup_pipeline, the
    * cluster former and the quality gauge.
    *
    * Hash family: 8 independent 4-hex (16-bit) slices of ONE md5 per
    * shingle (round 2 — was 2 md5s of 8-hex slices; the quality gauge
    * showed identical recall/precision, 95%/84%, while halving the
    * md5-bound hot loop: at ~100 shingles/doc a 16-bit min-hash
    * collision is still rare, and LSH quality is set by the band
    * structure, not slice width). */
  private def minhashPairs(s: SparkSession, d: String): DataFrame = {
    val sh = nearDupCorpus(t(s, d, "documents"))
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(shinglesExpr)).as("sh"))
    minhashPairsOverShingles(sh)
  }

  /** Candidate pairs from a CHECKPOINTED (doc_id, shs) shingle-set table
    * — callers that ALSO verify with the sets (pipeline, clusters) pass
    * it so the corpus is tokenized and shingled exactly once. min over
    * the distinct set equals min over the raw shingle multiset, so
    * signatures are unchanged and the oracle SQL (which hashes the
    * non-distinct stream) still matches. Only worth it when `sets` is
    * materialized: exploding a LAZY array_distinct re-evaluates the
    * whole shingle construction per branch and measured 3× slower. */
  private def minhashPairsFrom(sets: DataFrame): DataFrame =
    minhashPairsOverShingles(
      sets.select(col("doc_id"), explode(col("shs")).as("sh")))

  private def minhashPairsOverShingles(sh: DataFrame): DataFrame =
    bandPairs(sigsOverShingles(sh), 4)

  /** 8 min-hash signatures per doc from an exploded (doc_id, sh) stream. */
  private def sigsOverShingles(sh: DataFrame): DataFrame = {
    val sigCols = (0 until 8).map { j =>
      min(substring(col("h"), j * 4 + 1, 4)).as(s"s$j")
    }
    sh.withColumn("h", md5(concat(lit("0|"), col("sh"))))
      .groupBy(col("doc_id"))
      .agg(sigCols.head, sigCols.tail: _*)
  }

  /** (doc_id, band_idx, band_val) band rows over the 8 signatures —
    * the banding half of bandPairs, factored out so the streaming
    * near-dup sink shares the exact batch hash family. */
  private def bandRows(sigs: DataFrame, rowsPerBand: Int): DataFrame = {
    val nBands = 8 / rowsPerBand
    val stackArgs = (0 until nBands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(j => s"s$j").mkString(", ")
      s"$b, md5(concat($cols))"
    }.mkString(", ")
    sigs.select(col("doc_id"),
      expr(s"stack($nBands, $stackArgs) AS (band_idx, band_val)"))
  }

  /** LSH band table from raw (doc_id, text, …) rows — THE
    * x_dedup_minhash hash family (3-token shingles, 8 × 16-bit
    * md5-slice min-hash signatures, 4 signatures per band → 2 bands),
    * exposed private[graft] so streaming near-dup dedup
    * (StreamingIngest.minhashDedupSink) and batch LSH dedup share one
    * family: a doc the stream deduped lands in the same band buckets a
    * batch re-run would compute. Docs with < 3 tokens produce no
    * shingles and therefore NO band rows — they can never be a
    * near-dup candidate; the caller decides their fate. */
  private[graft] def bandTable(docs: DataFrame): DataFrame = {
    val sh = docs.withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(shinglesExpr)).as("sh"))
    bandRows(sigsOverShingles(sh), 4)
  }

  /** LSH banding over the 8 signatures: 8/rowsPerBand bands, candidate =
    * any band fully equal. rowsPerBand is THE recall/precision dial
    * (fewer rows per band ⇒ more bands ⇒ higher recall, more false
    * candidates) — x_dedup_band_tuning measures both settings. */
  private def bandPairs(sigs: DataFrame, rowsPerBand: Int): DataFrame = {
    val bands = bandRows(sigs, rowsPerBand)
    bands.alias("x").join(bands.alias("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** 64-bit SimHash fingerprints (doc_id, fp0, fp1) as two 32-bit BIGINT
    * halves (round 3 — the r2 verdict's one genuine scale defect: 16-bit
    * fps live in a 2^16 space and collide constantly beyond ~1e5 docs).
    * Two independent bits per md5 hex nibble (bit3 = value>=8, bit2 =
    * value&4) give 64 majority votes from ONE md5 per token: the md5
    * computes once in a codegen'd Project and the 64 integer partial-sum
    * aggregates read the attribute (the HOF fold variant re-hashed per
    * bit — same lesson as x_dedup_minhash). Halves stay in [0, 2^32) so
    * no sign-bit arithmetic in either engine. Integer ± votes are
    * commutative, so partial aggregation is exact. (Zero-token docs would
    * drop at the explode; the corpus has none.) */
  private[graft] def simhashFps64From(corpus: DataFrame): DataFrame = {
    // SWAR-packed bit sums (round-3 rewrite, 64 → 17 aggregate buffers,
    // measured ~2.5× on the sf0.1 corpus): the 32 hex chars decode to
    // four 32-bit ints via conv ONCE per token; each of 16 packed longs
    // sums 4 bit-counters in 16-bit lanes (no cross-lane carry below
    // 65,536 tokens/doc — far above any corpus doc). The majority vote
    // is recovered per bit as 2·bits ≥ n ⟺ the old ±1 vote sum ≥ 0, so
    // fingerprints — and the DuckDB oracle, which keeps the readable
    // per-bit CASE sums — are unchanged.
    // bit j (0..31 = bit3 of hex nibble j, 32..63 = bit2 of nibble j-32)
    def bitExpr(j: Int): String = {
      val n = j % 32; val chunk = n / 8; val k = n % 8
      val shift = 4 * (7 - k) + (if (j < 32) 3 else 2)
      s"((c$chunk >> $shift) & 1)"
    }
    val packed = (0 until 16).map { m =>
      val lanes = (0 until 4).map(l => s"(${bitExpr(m * 4 + l)} << ${16 * l})")
      sum(expr(lanes.mkString(" + "))).as(s"p$m")
    }
    val toks = corpus
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val withChunks = (0 until 4).foldLeft(toks) { (df, c) =>
      df.withColumn(s"c$c",
        expr(s"CAST(conv(substring(h, ${c * 8 + 1}, 8), 16, 10) AS BIGINT)"))
    }
    // SWAR lanes are 16 bits: a doc with >= 65536 tokens carries across
    // lanes and would silently corrupt the fingerprint (and diverge from
    // the per-bit oracle). Fail loudly instead — n is read by every
    // majority vote below, so the guard cannot be pruned away. Callers
    // with longer documents must chunk first (see TextOps.x_doc_chunks).
    val agg = withChunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), packed: _*)
      .withColumn("n", expr(
        s"""if(n < ${1 << 16}, n,
            raise_error(concat('graft simhash64: SWAR lane overflow — doc ',
              CAST(doc_id AS STRING), ' has ', CAST(n AS STRING),
              ' tokens (>= ${1 << 16}); chunk the document first')))"""))
    def half(lo: Int): Column = (lo until lo + 32).map { j =>
      val m = j / 4; val lane = j % 4
      when(expr(s"2 * ((p$m >> ${16 * lane}) & 65535) >= n"),
        lit(1L << (j - lo))).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc_id"), half(0).as("fp0"), half(32).as("fp1"))
  }

  private def simhashFps64(s: SparkSession, d: String): DataFrame =
    simhashFps64From(nearDupCorpus(t(s, d, "documents")))

  // ---- per-ROW SimHash fold (streaming twin, round 4) ------------------
  //
  // The batch path explodes tokens and SWAR-aggregates per doc — a
  // groupBy, which in Structured Streaming would put a stateful
  // aggregation BEFORE the stateful dedup operator. The streaming twin
  // folds the same 16 packed lanes inside one row (higher-order
  // aggregate over split(text)), so fingerprinting is stateless and the
  // only stateful operator is dropDuplicatesWithinWatermark. Interpreted
  // HOF — off the batch hot path by design; bit derivation is IDENTICAL
  // to simhashFps64From (StreamingSpec asserts equal fingerprints).
  // Same 16-bit-lane bound: docs must stay under 65,536 tokens (chunk
  // first — TextOps.x_doc_chunks); the batch guard's raise_error is
  // deliberately absent here so a poison doc cannot kill a long-running
  // stream (it would merely dedup within its overflowed fingerprint).

  /** SQL for the packed-lane fold over column `text` → struct
    * (n, p0..p15); materialize as one column, then read halves with
    * [[simhashRowHalf]]. */
  private[graft] val simhashRowFoldSql: String = {
    def bit(j: Int): String = {
      val n = j % 32; val chunk = n / 8; val k = n % 8
      val shift = 4 * (7 - k) + (if (j < 32) 3 else 2)
      s"((x.c$chunk >> $shift) & 1)"
    }
    val lanes = (0 until 16).map { m =>
      val ls = (0 until 4).map(l => s"(${bit(m * 4 + l)} << ${16 * l})")
      s"'p$m', acc.p$m + ${ls.mkString(" + ")}"
    }
    val zero = "named_struct('n', CAST(0 AS BIGINT), " +
      (0 until 16).map(m => s"'p$m', CAST(0 AS BIGINT)").mkString(", ") + ")"
    val chunks = (0 until 4).map(c =>
      s"'c$c', CAST(conv(substring(md5(t), ${c * 8 + 1}, 8), 16, 10) AS BIGINT)")
      .mkString(", ")
    s"""aggregate(
        transform(split(text, ' '), t -> named_struct($chunks)),
        $zero,
        (acc, x) -> named_struct('n', acc.n + 1, ${lanes.mkString(", ")}))"""
  }

  /** Fingerprint half (32 bits from `lo`) from the fold struct `sw` —
    * same majority rule as the batch path: 2·bits ≥ n. */
  private[graft] def simhashRowHalf(lo: Int): Column =
    (lo until lo + 32).map { j =>
      val m = j / 4; val lane = j % 4
      when(expr(s"2 * ((sw.p$m >> ${16 * lane}) & 65535) >= sw.n"),
        lit(1L << (j - lo))).otherwise(lit(0L))
    }.reduce(_ + _)

  /** the r1/r2 16-bit fingerprint, kept ONLY as the collision baseline
    * for x_simhash_width_gauge. */
  private def simhashFps16From(corpus: DataFrame): DataFrame = {
    val bitSums = (0 until 16).map(j =>
      sum(when(substring(col("h"), j + 1, 1).isin(hiBitNibbles: _*), 1)
        .otherwise(-1)).as(s"s$j"))
    val withBits = corpus
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", md5(col("tok")))
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 16).map(j =>
      when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    withBits.select(col("doc_id"), fp.as("fp"))
  }

  /** DuckDB twin of simhashFps64From over CTE `corpus`: emits
    * `${p}fps(doc_id, fp0, fp1)` (prefix keeps two instances
    * coexisting in one query). md5 computes once per token (unnest →
    * group), mirroring the Spark plan. */
  private def simhashFps64Sql(p: String): String = {
    val sums = (0 until 64).map { j =>
      val nib = j % 32 + 1
      val set = if (j < 32) nibbles1 else nibbles2
      s"CAST(SUM(CASE WHEN substr(h, $nib, 1) IN $set THEN 1 ELSE -1 END) AS BIGINT) AS s$j"
    }.mkString(", ")
    def half(lo: Int) = (lo until lo + 32).map(j =>
      s"(CASE WHEN s$j >= 0 THEN ${1L << (j - lo)} ELSE 0 END)")
      .mkString(" + ")
    s"""${p}tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM corpus),
        ${p}h AS (SELECT doc_id, md5(tok) AS h FROM ${p}tok),
        ${p}sig AS (SELECT doc_id, $sums FROM ${p}h GROUP BY doc_id),
        ${p}fps AS (SELECT doc_id, CAST(${half(0)} AS BIGINT) AS fp0,
                           CAST(${half(32)} AS BIGINT) AS fp1
                    FROM ${p}sig)"""
  }

  /** DuckDB twin of simhashFps16From: emits `${p}fps(doc_id, fp)`. */
  private def simhashFps16Sql(p: String): String = {
    val sums = (0 until 16).map(j =>
      s"CAST(SUM(CASE WHEN substr(h, ${j + 1}, 1) IN $nibbles1 THEN 1 ELSE -1 END) AS BIGINT) AS s$j")
      .mkString(", ")
    val fpSum = (0 until 16).map(j =>
      s"(CASE WHEN s$j >= 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""${p}tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM corpus),
        ${p}h AS (SELECT doc_id, md5(tok) AS h FROM ${p}tok),
        ${p}sig AS (SELECT doc_id, $sums FROM ${p}h GROUP BY doc_id),
        ${p}fps AS (SELECT doc_id, CAST($fpSum AS BIGINT) AS fp
                    FROM ${p}sig)"""
  }

  /** distinct 3-shingle sets per doc of the near-dup corpus. */
  private def shingleSets(s: SparkSession, d: String): DataFrame =
    nearDupCorpus(t(s, d, "documents"))
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("shs", array_distinct(expr(shinglesExpr)))
      .select(col("doc_id"), col("shs"))

  private val minhashCandidatesSql: String = {
    val sigDefs = (0 until 8).map { j =>
      val off = j * 4 + 1
      s"list_min(list_transform(shingles, sh -> substr(md5('0|' || sh), $off, 4))) AS s$j"
    }.mkString(", ")
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
        shg AS (SELECT doc_id, $shinglesSql AS shingles
                FROM toks WHERE len(tk) >= 3),
        sig AS (SELECT doc_id, $sigDefs FROM shg),
        bands AS (SELECT doc_id, 0 AS band_idx,
                         md5(s0 || s1 || s2 || s3) AS band_val FROM sig
                  UNION ALL
                  SELECT doc_id, 1 AS band_idx,
                         md5(s4 || s5 || s6 || s7) AS band_val FROM sig),
        cands AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                  FROM bands x JOIN bands y
                    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
                       AND x.doc_id < y.doc_id)"""
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — O(log n) fixed-point rounds on ANY graph, vs the
    * O(diameter) rounds of min-label propagation (the r3 implementation,
    * which a 64-hop duplicate chain forces through 64 passes). Each round
    * is two grouped min-aggregates + equi-joins — fully distributed, no
    * driver data.
    *
    *  - large-star: every neighbor v > u re-attaches to m = min(Γ(u)∪{u});
    *    output edges are (big, small) oriented.
    *  - small-star: on oriented edges, all of u's smaller neighbors (and u)
    *    re-attach to u's minimum neighbor — halving star depth.
    *
    * Fixed point ⇔ the edge set is stable; detected by a
    * (count, sum(xxhash64), sum(murmur3)) triple — scalar aggregates, no
    * set compare. Two INDEPENDENT hash families: a collision would need
    * the same count AND colliding sums under both xxhash64 and Murmur3
    * simultaneously, so a same-signature-different-edge-set false
    * convergence is ruled out in practice (r5 ADVICE #3).
    * Returns (labels: doc → component-min, rounds). Input pairs must have
    * a != b; orientation is irrelevant (each round symmetrizes). Pass
    * `oriented = true` when the caller guarantees DISTINCT a < b pairs
    * (every LSH/verify pipeline here does) to skip the setup
    * filter+distinct shuffle.
    *
    * Job accounting (r6): one Spark action per round. The contraction
    * DataFrames are lineage-cut with LAZY local checkpoints, so the
    * round's single signature aggregate materializes the checkpoint
    * blocks as a side effect — previously each round ran two eager
    * checkpoint jobs plus the convergence aggregate, and per-round
    * scheduling overhead dominated the two cluster queries' wall time. */
  def connectedComponentsStar(pairs: DataFrame,
                              maxRounds: Int = 40,
                              oriented: Boolean = false): (DataFrame, Int) = {
    def sig(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v"))), lit(0L)),
        coalesce(sum(hash(col("u"), col("v")).cast("long")), lit(0L)))
        .first()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val base = pairs.select(col("a").as("u"), col("b").as("v"))
    var e = (if (oriented) base
             else base.filter(col("u") =!= col("v")).distinct())
      .localCheckpoint(eager = false)
    var prev = sig(e) // one job: checkpoint materialization + signature
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      rounds += 1
      // large-star over the symmetrized edges
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      val large = sym.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint(eager = false)
      // small-star over the (big, small)-oriented output
      val smins = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val reattached = large.join(smins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      val next = reattached
        .unionByName(smins.select(col("u"), col("m").as("v")))
        .distinct().localCheckpoint(eager = false)
      val cur = sig(next) // the round's ONLY action
      converged = cur == prev
      prev = cur
      e = next
    }
    if (!converged)
      sys.error(s"connectedComponentsStar: no fixed point in $maxRounds rounds")
    // final stars: u → root; roots appear only on the small side
    val labels = e.select(col("u").as("doc"), col("v").as("lbl"))
      .unionByName(e.select(col("v").as("doc"), col("v").as("lbl")))
      .distinct()
    (labels, rounds)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x_dedup_pipeline" -> ((s, d) => {
      // the full near-dup pipeline composed end-to-end: MinHash-LSH
      // candidates → exact Jaccard verification (≥ 0.6) → dedup summary
      // (distinct dropped docs). At 100 TB this is THE dedup recipe: the
      // expensive exact verify runs only on O(candidates), not O(n²).
      // shingle sets materialized once (localCheckpoint) and shared by
      // candidate generation AND verification; candidates likewise
      // materialized once (verify join + candidate count)
      val sets = shingleSets(s, d).localCheckpoint()
      val pairs = minhashPairsFrom(sets).localCheckpoint()
      val conf = pairs
        .join(sets.select(col("doc_id").as("a"), col("shs").as("shs_a")), "a")
        .join(sets.select(col("doc_id").as("b"), col("shs").as("shs_b")), "b")
        .withColumn("inter",
          size(array_intersect(col("shs_a"), col("shs_b"))))
        .withColumn("jacc", col("inter") /
          (size(col("shs_a")) + size(col("shs_b")) - col("inter")))
        .filter(col("jacc") >= 0.6)
      val nc = pairs.agg(count(lit(1)).as("n_candidates"))
      val agg = conf.agg(count(lit(1)).as("n_confirmed"),
        countDistinct(col("b")).as("n_dropped"))
      nc.crossJoin(agg)
    }),

    "x_dedup_quality" -> ((s, d) => {
      // LSH quality gauge: the constructed corpus has KNOWN ground truth
      // (every doc pairs exactly with its +100000 near-dup copy), so
      // candidate recall and precision are computable in-engine — the
      // measurement you rerun when tuning bands/rows-per-band at scale.
      val cands = minhashPairs(s, d).localCheckpoint()
      val truth = t(s, d, "documents")
        .select(col("doc_id").as("a"), (col("doc_id") + 100000).as("b"))
      val nT = truth.agg(count(lit(1)).as("n_true"))
      val nC = cands.agg(count(lit(1)).as("n_candidates"))
      val nH = cands.join(truth, Seq("a", "b"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      nT.crossJoin(nC).crossJoin(nH)
        .select(col("n_true"), col("n_candidates"), col("n_hits"),
          graft.types.Coercions.detRound(
            col("n_hits") / col("n_true"), 4).as("recall"),
          graft.types.Coercions.detRound(
            col("n_hits") / col("n_candidates"), 4).as("precision"))
    }),

    "x_dedup_band_tuning" -> ((s, d) => {
      // LSH band-structure tuning measured in-engine: the SAME 8
      // signatures (computed once, checkpointed) banded as 2×4 and 4×2,
      // each scored for candidate recall/precision against the corpus's
      // known ground truth — the measurement you run before choosing
      // the band dial for a 100 TB dedup pass.
      val sets = shingleSets(s, d).localCheckpoint()
      val sigs = sigsOverShingles(
        sets.select(col("doc_id"), explode(col("shs")).as("sh")))
        .localCheckpoint()
      val truth = t(s, d, "documents")
        .select(col("doc_id").as("a"), (col("doc_id") + 100000).as("b"))
      def gauge(rowsPerBand: Int, label: String): DataFrame = {
        val cands = bandPairs(sigs, rowsPerBand).localCheckpoint()
        val nT = truth.agg(count(lit(1)).as("n_true"))
        val nC = cands.agg(count(lit(1)).as("n_candidates"))
        val nH = cands.join(truth, Seq("a", "b"), "left_semi")
          .agg(count(lit(1)).as("n_hits"))
        nT.crossJoin(nC).crossJoin(nH)
          .select(lit(label).as("config"),
            col("n_true"), col("n_candidates"), col("n_hits"),
            graft.types.Coercions.detRound(
              col("n_hits") / col("n_true"), 4).as("recall"),
            graft.types.Coercions.detRound(
              col("n_hits") / col("n_candidates"), 4).as("precision"))
      }
      gauge(4, "2x4").unionByName(gauge(2, "4x2")).orderBy("config")
    }),

    "x_dedup_clusters" -> ((s, d) => {
      // dedup cluster formation: connected components over the VERIFIED
      // near-dup pairs (candidates → Jaccard ≥ 0.6). r4: large-star /
      // small-star contraction (connectedComponentsStar) replaces min-label
      // propagation — O(log n) rounds instead of O(diameter), so an
      // adversarial duplicate CHAIN (A≈B≈C≈…, transitively linked shards
      // of one document) converges in a handful of passes where
      // propagation needed one pass per hop (StarClusterSpec measures
      // both on a 100-hop chain).
      val sets = shingleSets(s, d).localCheckpoint()
      val pairs = minhashPairsFrom(sets)
      val conf = pairs
        .join(sets.select(col("doc_id").as("a"), col("shs").as("shs_a")), "a")
        .join(sets.select(col("doc_id").as("b"), col("shs").as("shs_b")), "b")
        .withColumn("inter",
          size(array_intersect(col("shs_a"), col("shs_b"))))
        .filter(col("inter") / (size(col("shs_a")) + size(col("shs_b"))
          - col("inter")) >= 0.6)
        .select(col("a"), col("b"))
        .localCheckpoint()
      // LSH candidates are emitted DISTINCT with a < b — oriented path
      val (labels, _) = connectedComponentsStar(conf, oriented = true)
      labels.groupBy(col("lbl").as("cluster"))
        .agg(count(lit(1)).as("n_members"), max(col("doc")).as("max_doc"))
        .orderBy("cluster")
    }),

    "x_cluster_size_dist" -> ((s, d) => {
      // the distributional view of dedup clustering (what fraction of
      // the corpus sits in how-big duplicate groups — the number a
      // dedup run reports to justify its token savings): same verified-
      // pair → star-contraction chain as x_dedup_clusters, aggregated
      // to a cluster-size histogram. Singleton docs (no verified pair)
      // are NOT clusters and are excluded, stated explicitly.
      val sets = shingleSets(s, d).localCheckpoint()
      val pairs = minhashPairsFrom(sets)
      val conf = pairs
        .join(sets.select(col("doc_id").as("a"), col("shs").as("shs_a")), "a")
        .join(sets.select(col("doc_id").as("b"), col("shs").as("shs_b")), "b")
        .withColumn("inter",
          size(array_intersect(col("shs_a"), col("shs_b"))))
        .filter(col("inter") / (size(col("shs_a")) + size(col("shs_b"))
          - col("inter")) >= 0.6)
        .select(col("a"), col("b"))
        .localCheckpoint()
      val (labels, _) = connectedComponentsStar(conf, oriented = true)
      labels.groupBy(col("lbl"))
        .agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .select(col("cluster_size"), col("n_clusters"),
          (col("cluster_size") * col("n_clusters")).as("n_docs"))
        .orderBy("cluster_size")
    }),

    "x_dedup_chain_clusters" -> ((s, d) => {
      // adversarial transitive-duplicate CHAINS under oracle: shards of
      // a document that link only consecutively (A≈B, B≈C, … — never
      // A≈C) give components of MAXIMAL diameter, the exact shape the
      // old min-label propagation could not converge on within its pass
      // cap (one pass per hop). 7 chains of 64 docs each; DuckDB walks
      // them with WITH RECURSIVE, the engine contracts them in O(log n)
      // large-star/small-star rounds.
      val edges = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 448 && pmod(col("doc_id"), lit(64)) =!= 63)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
      val (labels, _) = connectedComponentsStar(edges, oriented = true)
      labels.groupBy(col("lbl").as("cluster"))
        .agg(count(lit(1)).as("n_members"),
          max(col("doc")).as("max_doc"))
        .orderBy("cluster")
    }),

    "x_dedup_exact" -> ((s, d) => {
      dupCorpus(t(s, d, "documents"))
        .groupBy(sha2(col("text"), 256).as("content_hash"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
        .orderBy("content_hash")
    }),

    "x_dedup_saturation" -> ((s, d) => {
      // dedup saturation curve — the crawl-economics readout: at each
      // ingest prefix, what fraction of documents seen so far are exact
      // duplicates of EARLIER documents, and what is the MARGINAL dup
      // rate of the newest slice (when that approaches 1, continued
      // crawling buys nothing). Fixture interleaves a copy after every
      // original (odd ids original, even ids copy) so the curve rises
      // smoothly instead of step-functioning at the corpus seam.
      // Plan: one sha256 groupBy for first-occurrence ids (shuffles the
      // 32-byte hash, never text), one hash-keyed join back, then each
      // (doc, is_dup) row fans to ≤ 8 skinny checkpoint rows with
      // map-side partials — shuffle is 8 groups at any corpus size; the
      // lag window runs over the 8-row curve only.
      val corpus = t(s, d, "documents")
        .select((col("doc_id") * 2 - 1).as("doc_id"), col("text"))
        .unionByName(t(s, d, "documents")
          .select((col("doc_id") * 2).as("doc_id"), col("text")))
      val firsts = corpus
        .groupBy(sha2(col("text"), 256).as("h"))
        .agg(min(col("doc_id")).as("first_id"))
      val flagged = corpus
        .select(col("doc_id"), sha2(col("text"), 256).as("h"))
        .join(firsts, "h")
        .select(col("doc_id"), (col("doc_id") > col("first_id")).as("is_dup"))
      val maxId = flagged.agg(max(col("doc_id")).as("max_id"))
      val curve = flagged.crossJoin(broadcast(maxId))
        .select(explode(expr("sequence(1, 8)")).as("cp"),
          col("doc_id"), col("is_dup"), col("max_id"))
        .filter(col("doc_id") <= expr("(max_id * cp) div 8"))
        .groupBy("cp")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("cp")
      curve
        .withColumn("pd", coalesce(lag("n_docs", 1).over(w), lit(0L)))
        .withColumn("pk", coalesce(lag("n_dups", 1).over(w), lit(0L)))
        .select(col("cp").cast("long").as("cp"),
          col("n_docs"), col("n_dups"),
          detRound(col("n_dups").cast("double") /
            col("n_docs").cast("double"), 6).as("dup_frac"),
          // guard the marginal against an empty slice (n_docs == pd is
          // possible with sparse/clustered doc_id fixtures): 0/0 is a
          // non-finite double whose quantized floor is engine-dependent,
          // so emit NULL instead, matching the oracle's CASE
          when(col("n_docs") > col("pd"),
            detRound((col("n_dups") - col("pk")).cast("double") /
              (col("n_docs") - col("pd")).cast("double"), 6))
            .as("marginal_dup_frac"))
        .orderBy("cp")
    }),

    "x_dedup_minhash" -> ((s, d) => {
      // hash family: see minhashPairs (8 × 16-bit slices of one md5 per
      // shingle, quality-gauge-validated). Shingles are EXPLODED to a
      // flat column so the md5s compute in a codegen'd Project exactly once
      // (the 8 min-aggregates reference the attribute, and map-side partial
      // min keeps the shuffle at O(docs × 64 bytes) — array-lambda variants
      // are interpreted (no codegen CSE) and re-hash per signature)
      minhashPairs(s, d).orderBy("a", "b")
    }),

    "x_dedup_simhash" -> ((s, d) => {
      simhashFps64(s, d)
        .groupBy(col("fp0"), col("fp1"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
        .orderBy("fp0", "fp1")
    }),

    "x_simhash_hamming" -> ((s, d) => {
      // SimHash near-dup candidates beyond exact fingerprint equality:
      // multi-index banding — split the 64-bit fingerprint into 4 bands
      // of 16 bits; any pair within hamming distance 3 keeps at least
      // one band intact (pigeonhole), so band-equality candidates have
      // GUARANTEED recall at d ≤ 3; verify with bit_count(xor) over both
      // halves. The shuffle carries (band_idx, 16-bit value) keys —
      // O(docs·4) rows; 16-bit bands mean random 64-bit fps collide on
      // a band at ~2^-16, so the candidate set stays O(true near-dups)
      // at corpus scale (vs the r2 16-bit fps, where the fingerprint
      // space itself saturated — see x_simhash_width_gauge).
      val fps = simhashFps64(s, d).localCheckpoint()
      val bands = fps.select(col("doc_id"), col("fp0"), col("fp1"),
          explode(expr("array(0, 1, 2, 3)")).as("bidx"))
        .withColumn("bv",
          expr("shiftright(IF(bidx < 2, fp0, fp1), (bidx % 2) * 16) & 65535"))
      bands.alias("x").join(bands.alias("y"),
          col("x.bidx") === col("y.bidx") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("x.fp0").as("fa0"),
          col("x.fp1").as("fa1"), col("y.doc_id").as("b"),
          col("y.fp0").as("fb0"), col("y.fp1").as("fb1"))
        .distinct()
        .withColumn("hamming", expr(
          "CAST(bit_count(fa0 ^ fb0) + bit_count(fa1 ^ fb1) AS BIGINT)"))
        .filter(col("hamming") <= 3)
        .select("a", "b", "hamming")
        .orderBy("a", "b")
    }),

    "x_simhash_width_gauge" -> ((s, d) => {
      // fingerprint-width collision gauge: on the EXACT-dup corpus true
      // dup groups have identical text, so any fingerprint group mixing
      // >1 distinct text is a FALSE merge. The 16-bit baseline vs the
      // 64-bit fingerprint on the same corpus measures the precision
      // lift of widening — the number you check before trusting
      // group-by-fingerprint dedup at a given corpus size.
      val corpus = dupCorpus(t(s, d, "documents"))
      val th = corpus.select(col("doc_id"), sha2(col("text"), 256).as("th"))
      def gauge(fps: DataFrame, keys: Seq[String], label: String): DataFrame = {
        val g = fps.join(th, "doc_id")
          .groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("n"), countDistinct(col("th")).as("nt"))
        g.agg(count(lit(1)).as("n_groups"),
            coalesce(sum(when(col("nt") > 1, col("n"))), lit(0L))
              .as("n_false_merged"))
          .select(lit(label).as("config"), col("n_groups"),
            col("n_false_merged"))
      }
      gauge(simhashFps16From(corpus), Seq("fp"), "16-bit")
        .unionByName(
          gauge(simhashFps64From(corpus), Seq("fp0", "fp1"), "64-bit"))
        .orderBy("config")
    }),

    "x_dedup_skew_chunked" -> ((s, d) => {
      // skew-hardened band self-join under oracle: a worst-case band
      // table (half the corpus shares one boilerplate band — the LSH
      // dedup failure mode) through ScaleJoins.chunkedSelfPairs, whose
      // result provably equals the naive self-join (the oracle IS the
      // naive join) while the quadratic pair generation spreads across
      // chunk cells instead of one reducer (SkewedSelfJoinSpec asserts
      // the spread; SkewStress measures 0.999 → 0.148 max task share).
      // doc_id cap keeps the demonstration pair count sort-friendly at
      // larger SFs — the skew RATIO (50% hot) is what's being exercised
      val bands = t(s, d, "documents").filter(col("doc_id") < 2000)
        .select(col("doc_id").as("id"),
          when(col("doc_id") % 2 === 0, lit("HOT"))
            .otherwise(concat(lit("band-"),
              (col("doc_id") % 37).cast("string"))).as("band"))
      graft.util.ScaleJoins.chunkedSelfPairs(bands, Seq("band"), "id", 8)
        .orderBy("band", "a", "b")
    }),

    "x_decontaminate" -> ((s, d) => decontaminate(s, d, 3)),

    "x_decontaminate_8gram" -> ((s, d) =>
      // the production width (r4): 8-token shingles almost never collide
      // by accident, so flagged docs ≈ the truly contaminated set — the
      // injected 10-token excerpt still carries three 8-grams of the
      // benchmark doc and stays caught. Same plan shape as the 3-gram
      // entry; only the Generate's shingle width changes.
      decontaminate(s, d, 8)),

    "x_ngram_novelty" -> ((s, d) => {
      // novelty scoring (data-curation dial): per doc, the fraction of
      // its distinct 3-gram shingles whose FIRST owner (min doc_id over
      // the corpus) is the doc itself — low novelty = mostly re-used
      // phrasing, the cross-doc complement of x_repetition_scores'
      // within-doc boilerplate. Aggregated per language. Plan: one
      // scan-side Generate, one shuffle on the shingle for the owner
      // min, one hash join back — the decontaminate shape without a
      // benchmark side. At 100 TB shuffle xxhash64(shingle) instead of
      // the text (collisions only blur the gauge); the string form here
      // keeps the DuckDB twin exact.
      val g = t(s, d, "documents")
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), col("lang"),
          explode(expr("array_distinct(" + shinglesExprN(3) + ")")).as("sh"))
      val owner = g.groupBy(col("sh")).agg(min(col("doc_id")).as("owner"))
      val per = g.join(owner, "sh")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("owner") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .withColumn("novelty", graft.types.Coercions.detRound(
          col("n_novel") / col("n_grams"), 4))
      per.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          graft.types.Coercions.detRound(
            graft.types.Coercions.dsum(col("novelty")) / count(lit(1)), 4)
            .as("avg_novelty"))
        .orderBy("lang")
    }),

    "x_ngram_jaccard" -> ((s, d) => {
      // verification tier: exact Jaccard over distinct shingle sets for the
      // constructed (original, near-dup copy) candidate pairs
      val sh = nearDupCorpus(t(s, d, "documents"))
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .withColumn("shs", array_distinct(expr(shinglesExpr)))
        .select(col("doc_id"), col("shs"))
      sh.alias("a").join(sh.alias("b"),
          col("b.doc_id") === col("a.doc_id") + 100000)
        .withColumn("inter",
          size(array_intersect(col("a.shs"), col("b.shs"))))
        .select(col("a.doc_id").as("doc_id"),
          graft.types.Coercions.detRound(col("inter") /
            (size(col("a.shs")) + size(col("b.shs")) - col("inter")), 4)
            .as("jaccard"))
        .orderBy("doc_id")
    }),

    "x_span_dedup" -> ((s, d) => {
      // exact-substring span dedup (Lee et al. 2022, "Deduplicating
      // Training Data Makes Language Models Better"): find every
      // k-token window that appears verbatim in >= 2 DISTINCT docs,
      // merge overlapping/adjacent duplicated windows into maximal
      // spans per doc, and report span count + duplicated-token
      // coverage — the REMOVE-THE-SPAN dedup that doc-level dedup
      // (x_dedup_*) and within-doc repetition (x_repetition_scores)
      // both miss. Lee et al. run a suffix array at k=50; the
      // distributed equivalent is rolling k-gram windows (k=8 here —
      // the fixture docs are 10-100 tokens; width is the precision
      // dial exactly as in decontaminate). Fixture construction:
      // docs >= 25 with doc_id % 5 == 0 get a 12-token excerpt of
      // donor doc (doc_id % 25) appended — known cross-doc plagiarism
      // with known span length; the corpus's own natural near-dups
      // surface too. Plan: one scan-side Generate (positions kept),
      // one shuffle on the gram for the distinct-doc count, one join
      // back, then doc-partitioned windows for the interval merge
      // (gaps-and-islands) — never all-pairs, and the window state is
      // bounded by a single doc's duplicated positions. At 100 TB
      // shuffle xxhash64(gram) instead of the text; collisions only
      // over-mark spans (the same trade Lee et al.'s Bloom variant
      // makes). The string form keeps the DuckDB twin exact.
      import org.apache.spark.sql.expressions.Window
      val k = 8
      val docs = t(s, d, "documents")
      val donors = docs.filter(col("doc_id") < 25)
        .select(col("doc_id").as("did"),
          expr("concat_ws(' ', slice(split(text, ' '), 1, 12))").as("excerpt"))
      val base = docs.withColumn("did", col("doc_id") % 25)
        .join(broadcast(donors), "did")
        .select(col("doc_id"),
          when(col("doc_id") >= 25 && col("doc_id") % 5 === 0,
            concat(col("text"), lit(" "), col("excerpt")))
            .otherwise(col("text")).as("text"))
      val tks = base.select(col("doc_id"), split(col("text"), " ").as("tk"))
        .withColumn("n", size(col("tk")).cast("long"))
      val shp = tks.filter(col("n") >= k)
        .select(col("doc_id"), explode(expr(
          s"""transform(sequence(1, int(n) - ${k - 1}),
              i -> struct(bigint(i) AS pos, concat_ws(' ', slice(tk, i, $k)) AS g))"""))
          .as("sh"))
        .select(col("doc_id"), col("sh.pos").as("pos"), col("sh.g").as("g"))
      val dup = shp.groupBy(col("g"))
        .agg(count_distinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("g"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val spans = shp.join(dup, "g")
        .select(col("doc_id"), col("pos"))
        .withColumn("b", when(
          col("pos") > coalesce(lag(col("pos"), 1).over(w), lit(-k.toLong)) + k,
          1L).otherwise(0L))
        .withColumn("island", sum(col("b")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("island"))
        .agg((max(col("pos")) - min(col("pos")) + k).as("span_tokens"))
      val per = spans.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_dup_spans"),
          sum(col("span_tokens")).cast("long").as("dup_tokens"))
      tks.select(col("doc_id"), col("n"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n").as("n_tokens"),
          coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          graft.types.Coercions.detRound(
            coalesce(col("dup_tokens"), lit(0L)) / col("n"), 6).as("dup_frac"))
        .orderBy("doc_id")
    }),

    "x_containment" -> ((s, d) => {
      // Broder (1997) separates RESEMBLANCE (Jaccard — what the
      // MinHash tier estimates) from CONTAINMENT |S(A)∩S(B)|/|S(A)| —
      // the asymmetric measure that catches a short doc quoted inside
      // a long one, where Jaccard stays low and resemblance dedup
      // never fires. Fixture: receivers (doc_id % 7 == 3, >= 25)
      // append the first 80% of donor (doc_id % 25)'s tokens, so the
      // constructed pairs score containment ≈ 0.8 with Jaccard far
      // below it — the gap IS the reason containment exists. Plan:
      // the donor shingle sets are O(#donors) and broadcast; per
      // receiver the intersection is a per-row array op — no
      // shuffle beyond the corpus scan. At 100 TB the donor side
      // (the "is this quoted?" reference set) stays the broadcast
      // side exactly like the decontamination benchmark set.
      val docs = t(s, d, "documents")
      val donors = docs.filter(col("doc_id") < 25)
        .select(col("doc_id").as("did"),
          expr("""concat_ws(' ', slice(split(text, ' '), 1,
              (4 * size(split(text, ' '))) div 5))""").as("excerpt"))
      val corpus = docs.withColumn("did", col("doc_id") % 25)
        .join(broadcast(donors), "did")
        .select(col("doc_id"), col("did"),
          when(col("doc_id") >= 25 && col("doc_id") % 7 === 3,
            concat(col("text"), lit(" "), col("excerpt")))
            .otherwise(col("text")).as("text"))
      val sh = corpus.withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .withColumn("shs", array_distinct(expr(shinglesExpr)))
        .select(col("doc_id"), col("did"), col("shs"))
      val donorSh = sh.filter(col("doc_id") < 25)
        .select(col("doc_id").as("donor_id"), col("shs").as("dshs"))
      sh.filter(col("doc_id") >= 25 && col("doc_id") % 7 === 3)
        .join(broadcast(donorSh), col("donor_id") === col("did"))
        .withColumn("inter",
          size(array_intersect(col("dshs"), col("shs"))))
        .select(col("donor_id"), col("doc_id").as("receiver_id"),
          graft.types.Coercions.detRound(
            col("inter") / size(col("dshs")), 4).as("containment"),
          graft.types.Coercions.detRound(col("inter") /
            (size(col("dshs")) + size(col("shs")) - col("inter")), 4)
            .as("jaccard"))
        .orderBy("receiver_id")
    }),

    "x_shingle_profile" -> ((s, d) => {
      // the shingle-width dial, measured: mean Jaccard of KNOWN near-dup
      // pairs (doc vs its one-token-appended copy — the corpus's own
      // construction) vs background pairs (doc_id, doc_id+7) at widths
      // k ∈ {2, 3, 5}. Separation (dup − background) is what the dedup
      // threshold lives off; longer shingles push background similarity
      // toward zero while true near-dups stay high — this entry puts
      // numbers on that tradeoff for THIS corpus, which is how the
      // production width (3 for near-dup, 8+ for decontamination) is
      // chosen. Per-pair Jaccards are exact set arithmetic on
      // array_intersect; the only float step is the final rounded mean.
      val base = nearDupCorpus(t(s, d, "documents"))
        .withColumn("toks", split(col("text"), " "))
        .localCheckpoint()
      val ids = t(s, d, "documents").select(col("doc_id")).localCheckpoint()
      val perK = Seq(2, 3, 5).map { k =>
        val sets = base.filter(size(col("toks")) >= k)
          .select(col("doc_id"),
            expr(s"array_distinct(${shinglesExprN(k)})").as("shs"))
          .localCheckpoint()
        val dup = ids.select(col("doc_id").as("a"),
          (col("doc_id") + 100000L).as("b"), lit("near_dup").as("pair_type"))
        val rand = ids.select(col("doc_id").as("a"),
            (col("doc_id") + 7L).as("b"), lit("background").as("pair_type"))
          .join(ids.select(col("doc_id").as("b")), "b")
        dup.unionByName(rand.select(col("a"), col("b"), col("pair_type")))
          .join(sets.select(col("doc_id").as("a"), col("shs").as("sa")), "a")
          .join(sets.select(col("doc_id").as("b"), col("shs").as("sb")), "b")
          .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
          .withColumn("j", col("inter") /
            (size(col("sa")) + size(col("sb")) - col("inter")))
          .withColumn("q", floor(col("j") * 1e9 + 0.5).cast("long"))
          .groupBy(col("pair_type"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("q")).cast("long").as("sq"))
          .select(lit(k.toLong).as("shingle_k"), col("pair_type"),
            col("n_pairs"),
            graft.types.Coercions.detRound(
              col("sq") / 1e9 / col("n_pairs"), 6).as("avg_jaccard"))
      }
      perK.reduce(_.unionByName(_)).orderBy("shingle_k", "pair_type")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "x_ngram_novelty" ->
      s"""WITH tks AS (
           SELECT doc_id, lang, string_split(text, ' ') AS tk
           FROM documents),
         g AS (
           SELECT doc_id, lang,
                  unnest(list_distinct(${shinglesSqlN(3)})) AS sh
           FROM tks WHERE len(tk) >= 3),
         own AS (SELECT sh, MIN(doc_id) AS owner FROM g GROUP BY 1),
         per AS (
           SELECT g.doc_id, g.lang, COUNT(*) AS n_grams,
                  SUM(CASE WHEN o.owner = g.doc_id THEN 1 ELSE 0 END)
                    AS n_novel
           FROM g JOIN own o USING (sh) GROUP BY 1, 2),
         r AS (
           SELECT lang,
                  floor((n_novel / n_grams) * 1e4 + 0.5) / 1e4 AS novelty
           FROM per)
         SELECT lang, COUNT(*) AS n_docs,
                floor((CAST(SUM(CAST(novelty AS DECIMAL(18,4))) AS DOUBLE)
                       / COUNT(*)) * 1e4 + 0.5) / 1e4 AS avg_novelty
         FROM r GROUP BY 1 ORDER BY lang""",

    "x_dedup_pipeline" ->
      s"""WITH $nearDupCorpusSql,
          $minhashCandidatesSql,
          shd AS (SELECT doc_id, list_distinct($shinglesSql) AS shs
                  FROM toks WHERE len(tk) >= 3),
          conf AS (SELECT c.a, c.b
                   FROM cands c
                   JOIN shd sa ON sa.doc_id = c.a
                   JOIN shd sb ON sb.doc_id = c.b
                   WHERE len(list_intersect(sa.shs, sb.shs)) /
                         (len(sa.shs) + len(sb.shs)
                          - len(list_intersect(sa.shs, sb.shs))) >= 0.6)
          SELECT (SELECT COUNT(*) FROM cands) AS n_candidates,
                 (SELECT COUNT(*) FROM conf) AS n_confirmed,
                 (SELECT COUNT(DISTINCT b) FROM conf) AS n_dropped""",

    "x_dedup_quality" ->
      s"""WITH $nearDupCorpusSql,
          $minhashCandidatesSql,
          truth AS (SELECT doc_id AS a, doc_id + 100000 AS b FROM documents),
          hits AS (SELECT c.a, c.b FROM cands c JOIN truth t
                   ON c.a = t.a AND c.b = t.b)
          SELECT (SELECT COUNT(*) FROM truth) AS n_true,
                 (SELECT COUNT(*) FROM cands) AS n_candidates,
                 (SELECT COUNT(*) FROM hits) AS n_hits,
                 floor(((SELECT COUNT(*) FROM hits) /
                        (SELECT COUNT(*) FROM truth)) * 1e4 + 0.5) / 1e4
                   AS recall,
                 floor(((SELECT COUNT(*) FROM hits) /
                        (SELECT COUNT(*) FROM cands)) * 1e4 + 0.5) / 1e4
                   AS precision""",

    "x_dedup_band_tuning" -> {
      val sigDefs = (0 until 8).map { j =>
        val off = j * 4 + 1
        s"list_min(list_transform(shingles, sh -> substr(md5('0|' || sh), $off, 4))) AS s$j"
      }.mkString(", ")
      def bandsCte(name: String, rpb: Int): String = {
        val selects = (0 until 8 / rpb).map { b =>
          val cat = (b * rpb until (b + 1) * rpb).map(j => s"s$j")
            .mkString(" || ")
          s"SELECT doc_id, $b AS band_idx, md5($cat) AS band_val FROM sig"
        }.mkString(" UNION ALL ")
        s"$name AS ($selects)"
      }
      def candsCte(bands: String, name: String) =
        s"""$name AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM $bands x JOIN $bands y
              ON x.band_idx = y.band_idx AND x.band_val = y.band_val
                 AND x.doc_id < y.doc_id)"""
      def row(cands: String, label: String) = {
        val hits = s"""(SELECT COUNT(*) FROM $cands c JOIN truth t
                        ON c.a = t.a AND c.b = t.b)"""
        s"""SELECT '$label' AS config,
            (SELECT COUNT(*) FROM truth) AS n_true,
            (SELECT COUNT(*) FROM $cands) AS n_candidates,
            $hits AS n_hits,
            floor(($hits / (SELECT COUNT(*) FROM truth)) * 1e4 + 0.5) / 1e4
              AS recall,
            floor(($hits / (SELECT COUNT(*) FROM $cands)) * 1e4 + 0.5) / 1e4
              AS precision"""
      }
      s"""WITH $nearDupCorpusSql,
          toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
          shg AS (SELECT doc_id, $shinglesSql AS shingles
                  FROM toks WHERE len(tk) >= 3),
          sig AS (SELECT doc_id, $sigDefs FROM shg),
          ${bandsCte("bands2", 4)},
          ${candsCte("bands2", "cands2")},
          ${bandsCte("bands4", 2)},
          ${candsCte("bands4", "cands4")},
          truth AS (SELECT doc_id AS a, doc_id + 100000 AS b FROM documents)
          SELECT * FROM (${row("cands2", "2x4")}
                         UNION ALL
                         ${row("cands4", "4x2")})
          ORDER BY config"""
    },

    "x_dedup_clusters" ->
      s"""WITH RECURSIVE $nearDupCorpusSql,
          $minhashCandidatesSql,
          shd AS (SELECT doc_id, list_distinct($shinglesSql) AS shs
                  FROM toks WHERE len(tk) >= 3),
          conf AS (SELECT c.a, c.b
                   FROM cands c
                   JOIN shd sa ON sa.doc_id = c.a
                   JOIN shd sb ON sb.doc_id = c.b
                   WHERE len(list_intersect(sa.shs, sb.shs)) /
                         (len(sa.shs) + len(sb.shs)
                          - len(list_intersect(sa.shs, sb.shs))) >= 0.6),
          edges AS (SELECT a, b FROM conf UNION SELECT b, a FROM conf),
          nodes AS (SELECT DISTINCT a AS doc FROM edges),
          reach AS (
            SELECT doc, doc AS lbl FROM nodes
            UNION
            SELECT e.b AS doc, r.lbl FROM reach r JOIN edges e ON e.a = r.doc),
          labeled AS (SELECT doc, MIN(lbl) AS lbl FROM reach GROUP BY 1)
          SELECT lbl AS cluster, COUNT(*) AS n_members, MAX(doc) AS max_doc
          FROM labeled GROUP BY 1 ORDER BY cluster""",

    "x_cluster_size_dist" ->
      s"""WITH RECURSIVE $nearDupCorpusSql,
          $minhashCandidatesSql,
          shd AS (SELECT doc_id, list_distinct($shinglesSql) AS shs
                  FROM toks WHERE len(tk) >= 3),
          conf AS (SELECT c.a, c.b
                   FROM cands c
                   JOIN shd sa ON sa.doc_id = c.a
                   JOIN shd sb ON sb.doc_id = c.b
                   WHERE len(list_intersect(sa.shs, sb.shs)) /
                         (len(sa.shs) + len(sb.shs)
                          - len(list_intersect(sa.shs, sb.shs))) >= 0.6),
          edges AS (SELECT a, b FROM conf UNION SELECT b, a FROM conf),
          nodes AS (SELECT DISTINCT a AS doc FROM edges),
          reach AS (
            SELECT doc, doc AS lbl FROM nodes
            UNION
            SELECT e.b AS doc, r.lbl FROM reach r JOIN edges e ON e.a = r.doc),
          labeled AS (SELECT doc, MIN(lbl) AS lbl FROM reach GROUP BY 1),
          sizes AS (SELECT lbl, COUNT(*) AS cluster_size
                    FROM labeled GROUP BY 1)
          SELECT cluster_size, COUNT(*) AS n_clusters,
                 cluster_size * COUNT(*) AS n_docs
          FROM sizes GROUP BY 1 ORDER BY cluster_size""",

    "x_dedup_chain_clusters" ->
      """WITH RECURSIVE base AS (
           SELECT doc_id AS a, doc_id + 1 AS b FROM documents
           WHERE doc_id < 448 AND doc_id % 64 != 63),
         edges AS (SELECT a, b FROM base UNION SELECT b, a FROM base),
         nodes AS (SELECT DISTINCT a AS doc FROM edges),
         reach AS (
           SELECT doc, doc AS lbl FROM nodes
           UNION
           SELECT e.b AS doc, r.lbl FROM reach r JOIN edges e ON e.a = r.doc),
         labeled AS (SELECT doc, MIN(lbl) AS lbl FROM reach GROUP BY 1)
         SELECT lbl AS cluster, COUNT(*) AS n_members, MAX(doc) AS max_doc
         FROM labeled GROUP BY 1 ORDER BY cluster""",

    "x_dedup_exact" ->
      s"""WITH $dupCorpusSql
          SELECT sha256(text) AS content_hash, COUNT(*) AS n_copies,
                 MIN(doc_id) AS keeper
          FROM corpus GROUP BY 1 ORDER BY content_hash""",

    "x_dedup_minhash" ->
      s"""WITH $nearDupCorpusSql,
          $minhashCandidatesSql
          SELECT a, b FROM cands ORDER BY a, b""",

    "x_dedup_saturation" ->
      """WITH corpus AS (
           SELECT doc_id * 2 - 1 AS doc_id, text FROM documents
           UNION ALL
           SELECT doc_id * 2 AS doc_id, text FROM documents),
         firsts AS (
           SELECT sha256(text) AS h, MIN(doc_id) AS first_id
           FROM corpus GROUP BY 1),
         flagged AS (
           SELECT c.doc_id, c.doc_id > f.first_id AS is_dup
           FROM (SELECT doc_id, sha256(text) AS h FROM corpus) c
           JOIN firsts f USING (h)),
         mx AS (SELECT MAX(doc_id) AS max_id FROM flagged),
         cps AS (SELECT unnest(range(1, 9)) AS cp),
         curve AS (
           SELECT cp, COUNT(*) AS n_docs,
                  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_dups
           FROM flagged, cps, mx
           WHERE flagged.doc_id <= (mx.max_id * cps.cp) // 8
           GROUP BY 1),
         lagged AS (
           SELECT cp, n_docs, n_dups,
                  COALESCE(lag(n_docs) OVER (ORDER BY cp), 0) AS pd,
                  COALESCE(lag(n_dups) OVER (ORDER BY cp), 0) AS pk
           FROM curve)
         SELECT CAST(cp AS BIGINT) AS cp, n_docs, n_dups,
                floor(CAST(n_dups AS DOUBLE) / CAST(n_docs AS DOUBLE)
                      * 1e6 + 0.5) / 1e6 AS dup_frac,
                CASE WHEN n_docs > pd THEN
                  floor(CAST(n_dups - pk AS DOUBLE)
                        / CAST(n_docs - pd AS DOUBLE) * 1e6 + 0.5) / 1e6
                END AS marginal_dup_frac
         FROM lagged ORDER BY cp""",

    "x_dedup_simhash" ->
      s"""WITH $nearDupCorpusSql,
          ${simhashFps64Sql("")}
          SELECT fp0, fp1, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
          FROM fps GROUP BY 1, 2 ORDER BY fp0, fp1""",

    "x_simhash_hamming" ->
      s"""WITH $nearDupCorpusSql,
          ${simhashFps64Sql("")},
          bands AS (SELECT doc_id, fp0, fp1, i AS bidx,
                           ((CASE WHEN i < 2 THEN fp0 ELSE fp1 END)
                            >> ((i % 2) * 16)) & 65535 AS bv
                    FROM fps, range(4) t(i)),
          cand AS (SELECT DISTINCT x.doc_id AS a, x.fp0 AS fa0, x.fp1 AS fa1,
                                   y.doc_id AS b, y.fp0 AS fb0, y.fp1 AS fb1
                   FROM bands x JOIN bands y
                     ON x.bidx = y.bidx AND x.bv = y.bv
                        AND x.doc_id < y.doc_id)
          SELECT a, b, CAST(bit_count(xor(fa0, fb0))
                            + bit_count(xor(fa1, fb1)) AS BIGINT) AS hamming
          FROM cand
          WHERE bit_count(xor(fa0, fb0)) + bit_count(xor(fa1, fb1)) <= 3
          ORDER BY a, b""",

    "x_simhash_width_gauge" ->
      s"""WITH $dupCorpusSql,
          ${simhashFps16Sql("a")},
          ${simhashFps64Sql("b")},
          th AS (SELECT doc_id, sha256(text) AS th FROM corpus),
          g16 AS (SELECT fp, COUNT(*) AS n, COUNT(DISTINCT th) AS nt
                  FROM afps JOIN th USING (doc_id) GROUP BY fp),
          g64 AS (SELECT fp0, fp1, COUNT(*) AS n, COUNT(DISTINCT th) AS nt
                  FROM bfps JOIN th USING (doc_id) GROUP BY fp0, fp1)
          SELECT * FROM (
            SELECT '16-bit' AS config, COUNT(*) AS n_groups,
                   CAST(COALESCE(SUM(CASE WHEN nt > 1 THEN n END), 0)
                        AS BIGINT) AS n_false_merged
            FROM g16
            UNION ALL
            SELECT '64-bit' AS config, COUNT(*) AS n_groups,
                   CAST(COALESCE(SUM(CASE WHEN nt > 1 THEN n END), 0)
                        AS BIGINT) AS n_false_merged
            FROM g64)
          ORDER BY config""",

    "x_dedup_skew_chunked" ->
      """WITH bands AS (
           SELECT doc_id AS id,
                  CASE WHEN doc_id % 2 = 0 THEN 'HOT'
                       ELSE 'band-' || CAST(doc_id % 37 AS VARCHAR) END AS band
           FROM documents WHERE doc_id < 2000)
         SELECT x.band AS band, x.id AS a, y.id AS b
         FROM bands x JOIN bands y
           ON x.band = y.band AND x.id < y.id
         ORDER BY band, a, b""",

    "x_decontaminate" -> decontaminateSql(3),

    "x_decontaminate_8gram" -> decontaminateSql(8),

    "x_ngram_jaccard" ->
      s"""WITH $nearDupCorpusSql,
          toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
          sh AS (SELECT doc_id, list_distinct($shinglesSql) AS shs
                 FROM toks WHERE len(tk) >= 3)
          SELECT a.doc_id AS doc_id,
                 floor((len(list_intersect(a.shs, b.shs)) /
                       (len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs))))
                       * 1e4 + 0.5) / 1e4 AS jaccard
          FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 100000
          ORDER BY doc_id""",

    "x_span_dedup" ->
      """WITH base AS (
           SELECT d.doc_id,
                  CASE WHEN d.doc_id >= 25 AND d.doc_id % 5 = 0
                       THEN d.text || ' ' || don.excerpt
                       ELSE d.text END AS text
           FROM documents d
           JOIN (SELECT doc_id AS did,
                        array_to_string(list_slice(string_split(text, ' '), 1, 12),
                                        ' ') AS excerpt
                 FROM documents WHERE doc_id < 25) don
             ON don.did = d.doc_id % 25),
         tks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM base),
         shs AS (
           SELECT doc_id,
                  unnest(list_transform(range(1, len(tk) - 6),
                    i -> {'pos': i, 'g': array_to_string(list_slice(tk, i, i + 7), ' ')}))
                    AS s
           FROM tks WHERE len(tk) >= 8),
         shp AS (SELECT doc_id, s.pos AS pos, s.g AS g FROM shs),
         dup AS (SELECT g FROM shp GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2),
         brk AS (
           SELECT doc_id, pos,
                  CASE WHEN pos > COALESCE(lag(pos) OVER w, -8) + 8
                       THEN 1 ELSE 0 END AS b
           FROM shp JOIN dup USING (g)
           WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         isl AS (
           SELECT doc_id, pos,
                  SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS island
           FROM brk),
         spans AS (
           SELECT doc_id, island, MAX(pos) - MIN(pos) + 8 AS span_tokens
           FROM isl GROUP BY 1, 2),
         per AS (
           SELECT doc_id, COUNT(*) AS n_dup_spans,
                  CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens
           FROM spans GROUP BY 1)
         SELECT t.doc_id, len(t.tk) AS n_tokens,
                COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
                COALESCE(p.dup_tokens, 0) AS dup_tokens,
                floor((COALESCE(p.dup_tokens, 0) / len(t.tk)) * 1e6 + 0.5) / 1e6
                  AS dup_frac
         FROM tks t LEFT JOIN per p USING (doc_id) ORDER BY doc_id""",

    "x_containment" ->
      s"""WITH base AS (
           SELECT d.doc_id, d.doc_id % 25 AS did,
                  CASE WHEN d.doc_id >= 25 AND d.doc_id % 7 = 3
                       THEN d.text || ' ' || don.excerpt
                       ELSE d.text END AS text
           FROM documents d
           JOIN (SELECT doc_id AS did,
                        array_to_string(list_slice(string_split(text, ' '), 1,
                          (4 * len(string_split(text, ' '))) // 5), ' ')
                          AS excerpt
                 FROM documents WHERE doc_id < 25) don
             ON don.did = d.doc_id % 25),
         tks AS (SELECT doc_id, did, string_split(text, ' ') AS tk
                 FROM base),
         sh AS (SELECT doc_id, did, list_distinct($shinglesSql) AS shs
                FROM tks WHERE len(tk) >= 3),
         dsh AS (SELECT doc_id AS donor_id, shs AS dshs FROM sh
                 WHERE doc_id < 25)
         SELECT d.donor_id, r.doc_id AS receiver_id,
                floor((len(list_intersect(d.dshs, r.shs))
                       / len(d.dshs)) * 1e4 + 0.5) / 1e4 AS containment,
                floor((len(list_intersect(d.dshs, r.shs))
                       / (len(d.dshs) + len(r.shs)
                          - len(list_intersect(d.dshs, r.shs))))
                      * 1e4 + 0.5) / 1e4 AS jaccard
         FROM sh r JOIN dsh d ON d.donor_id = r.did
         WHERE r.doc_id >= 25 AND r.doc_id % 7 = 3
         ORDER BY receiver_id""",

    "x_shingle_profile" -> {
      val perK = Seq(2, 3, 5).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS shingle_k, p.pair_type,
              COUNT(*) AS n_pairs,
              floor((CAST(SUM(CAST(floor(
                  (len(list_intersect(sa.shs, sb.shs))
                   / (len(sa.shs) + len(sb.shs)
                      - len(list_intersect(sa.shs, sb.shs))))
                  * 1e9 + 0.5) AS BIGINT)) AS BIGINT) / 1e9 / COUNT(*))
                * 1e6 + 0.5) / 1e6 AS avg_jaccard
            FROM pairs p
            JOIN sets$k sa ON sa.doc_id = p.a
            JOIN sets$k sb ON sb.doc_id = p.b
            GROUP BY 1, 2"""
      }.mkString(" UNION ALL ")
      val setDefs = Seq(2, 3, 5).map { k =>
        s"""sets$k AS MATERIALIZED (
              SELECT doc_id, list_distinct(${shinglesSqlN(k)}) AS shs
              FROM ctk WHERE len(tk) >= $k)"""
      }.mkString(",\n")
      s"""WITH $nearDupCorpusSql,
          ctk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
          $setDefs,
          ids AS (SELECT doc_id FROM documents),
          pairs AS (
            SELECT doc_id AS a, doc_id + 100000 AS b,
                   'near_dup' AS pair_type FROM ids
            UNION ALL
            SELECT i.doc_id AS a, i.doc_id + 7 AS b,
                   'background' AS pair_type
            FROM ids i JOIN ids j ON j.doc_id = i.doc_id + 7)
          SELECT * FROM ($perK)
          ORDER BY shingle_k, pair_type"""
    }
  )
}
