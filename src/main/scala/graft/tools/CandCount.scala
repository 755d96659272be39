package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: PassJoin candidate-pair count under the plain ±2
  * shift window vs the multi-match position+length filter (r6). Prints
  * two counts; PERFORMANCE.md records the result. Not part of the
  * registry. */
object CandCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/part.parquet")
      .filter(col("p_partkey") < 600)
      .select(col("p_partkey").as("id"), col("p_name").as("name"))
    def guarded(c: org.apache.spark.sql.Column) =
      when(length(col("name")) >= 7, c).otherwise(col("name"))
    val delOne = base.select((col("id") + 100000).as("id"),
      guarded(expr("concat(substring(name, 1, 1), substring(name, 3))"))
        .as("name"))
    val insDel = base.select((col("id") + 300000).as("id"),
      guarded(expr("concat('x', substring(name, 1, length(name) - 1))"))
        .as("name"))
    val subIns = base.select((col("id") + 400000).as("id"),
      guarded(expr("""concat('z', substring(name, 2, 3), 'q',
          substring(name, 5))""")).as("name"))
    val shortb = base.select((col("id") + 200000).as("id"),
      expr("substring(name, 1, 7)").as("name"))
    val shortMut = shortb.select((col("id") + 300000).as("id"),
      expr("concat('x', substring(name, 1, 6))").as("name"))
    val corpus = base.unionByName(delOne).unionByName(insDel)
      .unionByName(subIns).unionByName(shortb).unionByName(shortMut)
      .filter(length(col("name")) >= 3).localCheckpoint()
    val idx = corpus
      .withColumn("t1", expr("cast(floor(length(name)/3) as int)"))
      .withColumn("t2", expr("cast(floor(2*length(name)/3) as int)"))
      .select(col("id"), col("name"), explode(array(
        concat_ws("|", lit(1), length(col("name")),
          expr("substring(name, 1, t1)")),
        concat_ws("|", lit(2), length(col("name")),
          expr("substring(name, t1 + 1, t2 - t1)")),
        concat_ws("|", lit(3), length(col("name")),
          expr("substring(name, t2 + 1, length(name) - t2)"))))
        .as("blk"))
    def probeWith(posFilter: Boolean) = {
      val pre = corpus
        .withColumn("Lc",
          explode(expr("sequence(greatest(3, length(name) - 2), " +
            "length(name) + 2)")))
        .withColumn("i", explode(expr("array(1, 2, 3)")))
        .withColumn("t1", expr("cast(floor(Lc/3) as int)"))
        .withColumn("t2", expr("cast(floor(2*Lc/3) as int)"))
        .withColumn("st",
          expr("CASE i WHEN 1 THEN 1 WHEN 2 THEN t1 + 1 ELSE t2 + 1 END"))
        .withColumn("ln",
          expr("CASE i WHEN 1 THEN t1 WHEN 2 THEN t2 - t1 ELSE Lc - t2 END"))
      val bounded =
        if (posFilter) pre
          .withColumn("net", expr("length(name) - Lc"))
          .withColumn("slack",
            expr("cast(floor((2 - abs(net)) / 2) as int)"))
          .withColumn("lo", expr("greatest(1, st + least(0, net) - slack)"))
          .withColumn("hi",
            expr("least(length(name) - ln + 1, st + greatest(0, net) + slack)"))
        else pre
          .withColumn("lo", expr("greatest(1, st - 2)"))
          .withColumn("hi", expr("least(length(name) - ln + 1, st + 2)"))
      bounded
        .filter(col("ln") >= 1 && col("lo") <= col("hi"))
        .withColumn("p", explode(expr("sequence(lo, hi)")))
        .select(col("id"), col("name"),
          concat_ws("|", col("i"), col("Lc"),
            expr("substring(name, p, ln)")).as("blk"))
    }
    def cands(posFilter: Boolean): (Long, Long) = {
      val probe = probeWith(posFilter)
      val joined = idx.alias("x").join(probe.alias("y"),
          col("x.blk") === col("y.blk") && col("x.id") =!= col("y.id"))
        .select(least(col("x.id"), col("y.id")).as("a"),
          greatest(col("x.id"), col("y.id")).as("b"))
      (probe.count(), joined.distinct().count())
    }
    val (pkOld, cOld) = cands(posFilter = false)
    val (pkNew, cNew) = cands(posFilter = true)
    println(s"probe_keys old=$pkOld new=$pkNew  " +
      s"distinct_candidate_pairs old=$cOld new=$cNew")
    spark.stop()
  }
}
