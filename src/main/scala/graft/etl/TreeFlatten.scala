package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy operators (SURVEY.md §2.5 `j4_tree_flatten`).
  *
  * The reference stores the category tree as an adjacency list
  * (`categorias.id_categoria_pai` self-FK, tiny_api_v2_cliente.py:83,
  * README.md:7 "com hierarquia"). Analytics over it (rollups, ancestor
  * paths) need the transitive closure; Spark SQL has no recursive CTE, so we
  * iterate a self-join to fixed point, cutting lineage with localCheckpoint
  * each level (SURVEY.md §4).
  *
  * Scale posture: hierarchy dimensions are small (thousands of categories
  * even in large ERPs) — each iteration joins frontier⋈edges where edges is
  * broadcast; depth is bounded by `maxDepth` to guard against cycles in
  * dirty data (nullable self-FK).
  */
object TreeFlatten {

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.types._

  /** Recursive node schema for the categories tree JSON
    * (`{"id","descricao","nodes":[...]}`, FIXTURES.md §3.1; árvore endpoint
    * ref :33). Spark schemas can't be infinitely recursive, so depth is
    * bounded — the innermost level drops the `nodes` field. */
  private def nodeSchema(depth: Int): StructType = {
    val base = StructType(Seq(
      StructField("id", StringType),
      StructField("descricao", StringType)))
    if (depth <= 0) base
    else StructType(base.fields :+
      StructField("nodes", ArrayType(nodeSchema(depth - 1))))
  }

  /** j4 ingest side: nested tree JSON → adjacency list
    * (id, descricao, id_pai), the exact shape of the `categorias` DDL
    * (ref :83). Reads `{"retorno": [ ...roots... ]}` envelopes. */
  def flattenCategoryTree(spark: SparkSession, path: String,
                          maxDepth: Int = 8): DataFrame = {
    val schema = StructType(Seq(
      StructField("retorno", ArrayType(nodeSchema(maxDepth)))))
    val raw = spark.read.schema(schema).option("multiLine", value = true)
      .json(path)
    var level: DataFrame = raw
      .select(explode(col("retorno")).as("n"))
      .select(col("n.id").cast("int").as("id_categoria"),
        col("n.descricao").as("descricao_categoria"),
        lit(null).cast("int").as("id_categoria_pai"),
        col("n.nodes").as("nodes"))
    var out = level.select("id_categoria", "descricao_categoria",
      "id_categoria_pai")
    var depth = 0
    while (depth < maxDepth &&
           level.schema.fieldNames.contains("nodes")) {
      val hasChildNodes = level.schema("nodes").dataType match {
        case ArrayType(st: StructType, _) => st.fieldNames.contains("nodes")
        case _ => false
      }
      val children = level
        .filter(col("nodes").isNotNull && size(col("nodes")) > 0)
        .select(col("id_categoria").as("pid"), explode(col("nodes")).as("n"))
      level =
        if (hasChildNodes)
          children.select(col("n.id").cast("int").as("id_categoria"),
            col("n.descricao").as("descricao_categoria"),
            col("pid").as("id_categoria_pai"),
            col("n.nodes").as("nodes"))
        else
          children.select(col("n.id").cast("int").as("id_categoria"),
            col("n.descricao").as("descricao_categoria"),
            col("pid").as("id_categoria_pai"))
      out = out.unionByName(
        level.select("id_categoria", "descricao_categoria", "id_categoria_pai"))
      depth += 1
      if (!level.schema.fieldNames.contains("nodes")) depth = maxDepth
    }
    out
  }

  /** Transitive ancestor closure of an adjacency list.
    *
    * @param edges DataFrame with columns (`id`, `parent`), `parent` nullable
    *              for roots.
    * @return (id, ancestor, depth) with depth >= 1 — one row per
    *         (node, proper ancestor) pair.
    */
  def ancestorClosure(edges: DataFrame, maxDepth: Int = 32): DataFrame = {
    val parentOf = edges.filter(col("parent").isNotNull)
      .select(col("id"), col("parent"))
    var frontier = parentOf
      .select(col("id"), col("parent").as("ancestor"), lit(1).as("depth"))
      .localCheckpoint()
    var closure = frontier
    var depth = 1
    while (depth < maxDepth && !frontier.isEmpty) {
      frontier = frontier.alias("f")
        .join(parentOf.alias("e"), col("f.ancestor") === col("e.id"))
        .select(col("f.id"), col("e.parent").as("ancestor"),
                (col("f.depth") + 1).as("depth"))
        .localCheckpoint()
      closure = closure.unionByName(frontier)
      depth += 1
    }
    closure
  }

  /** Roll a per-node measure up to every ancestor (each node also counts
    * toward itself). Returns (ancestor, rolled) where `rolled` sums
    * `measureCol` over the node's full subtree.
    */
  def rollup(edges: DataFrame, nodeMeasures: DataFrame,
             nodeCol: String, measureCol: String): DataFrame = {
    val closure = ancestorClosure(edges)
    val selfEdge = nodeMeasures.select(col(nodeCol).as("id"),
      col(nodeCol).as("ancestor"))
    val allPairs = closure.select("id", "ancestor").unionByName(selfEdge)
    allPairs.join(nodeMeasures, allPairs("id") === nodeMeasures(nodeCol))
      .groupBy(col("ancestor"))
      .agg(sum(col(measureCol)).as(measureCol))
  }
}
