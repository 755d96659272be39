package graft.model

import org.apache.spark.sql.types._

/** sink_ddl_bootstrap (SURVEY.md §2.1): the nine reference tables
  * (tiny_api_v2_cliente.py:82-92) as explicit StructTypes — the engine's
  * schema catalog. Types per SURVEY.md §1.3: REAL → DoubleType (reference
  * fidelity), TEXT dates stay strings at the storage boundary and are
  * parsed by Coercions at load, TIMESTAMPTZ → TimestampType (UTC session).
  */
object Schemas {

  // ref :83 — adjacency-list category hierarchy
  val categorias: StructType = StructType.fromDDL(
    "id_categoria INT NOT NULL, descricao_categoria STRING NOT NULL, " +
    "id_categoria_pai INT")

  // ref :84 — product dimension
  val produtos: StructType = StructType.fromDDL(
    "id_produto INT NOT NULL, nome_produto STRING, codigo_produto STRING, " +
    "preco DOUBLE, preco_promocional DOUBLE, preco_custo DOUBLE, " +
    "preco_custo_medio DOUBLE, unidade STRING, situacao STRING, " +
    "data_criacao_produto STRING")

  // ref :85 — M:N bridge
  val produtoCategorias: StructType = StructType.fromDDL(
    "id_produto INT NOT NULL, id_categoria INT NOT NULL")

  // ref :86 — 1:1 current stock snapshot
  val produtoEstoqueTotal: StructType = StructType.fromDDL(
    "id_produto INT NOT NULL, saldo_total_api DOUBLE, " +
    "saldo_reservado_api DOUBLE, data_ultima_atualizacao_api TIMESTAMP")

  // ref :87 — per-depot stock; natural key (id_produto, nome_deposito)
  val produtoEstoqueDepositos: StructType = StructType.fromDDL(
    "id_produto INT NOT NULL, nome_deposito STRING NOT NULL, " +
    "saldo DOUBLE, desconsiderar_deposito STRING, empresa STRING")

  // ref :88 — order header (fact)
  val pedidos: StructType = StructType.fromDDL(
    "id_pedido INT NOT NULL, numero_pedido STRING, " +
    "numero_ecommerce STRING, data_pedido STRING, data_prevista STRING, " +
    "nome_cliente STRING, valor_pedido DOUBLE, id_vendedor INT, " +
    "nome_vendedor STRING, situacao_pedido STRING, " +
    "codigo_rastreamento STRING")

  // ref :89 — order detail (fact)
  val pedidoItens: StructType = StructType.fromDDL(
    "id_pedido INT NOT NULL, id_produto_tiny INT, codigo_produto STRING, " +
    "descricao_item STRING, quantidade DOUBLE, valor_unitario_pedido DOUBLE")

  // ref :90 — watermark store (see graft.state.StateStore)
  val scriptUltimaExecucao: StructType = graft.state.StateStore.wmSchema

  // ref :91 — page-checkpoint store (see graft.state.StateStore)
  val scriptProgressoPaginas: StructType = graft.state.StateStore.pgSchema

  /** Natural upsert keys per table (the reference's PKs / UNIQUEs). */
  val naturalKeys: Map[String, Seq[String]] = Map(
    "categorias" -> Seq("id_categoria"),
    "produtos" -> Seq("id_produto"),
    "produto_categorias" -> Seq("id_produto", "id_categoria"),
    "produto_estoque_total" -> Seq("id_produto"),
    "produto_estoque_depositos" -> Seq("id_produto", "nome_deposito"),
    "pedidos" -> Seq("id_pedido"),
    "pedido_itens" -> Seq("id_pedido", "id_produto_tiny"),
    "script_ultima_execucao" -> Seq("nome_processo"),
    "script_progresso_paginas" -> Seq("processo"))

  val all: Map[String, StructType] = Map(
    "categorias" -> categorias,
    "produtos" -> produtos,
    "produto_categorias" -> produtoCategorias,
    "produto_estoque_total" -> produtoEstoqueTotal,
    "produto_estoque_depositos" -> produtoEstoqueDepositos,
    "pedidos" -> pedidos,
    "pedido_itens" -> pedidoItens,
    "script_ultima_execucao" -> scriptUltimaExecucao,
    "script_progresso_paginas" -> scriptProgressoPaginas)
}
