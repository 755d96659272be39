#!/usr/bin/env python3
"""Synthesize an N× documents/embeddings fixture (r13 verdict #4).

Driver-side tooling only — generates a scaled twin of the sf0.1
documents and embeddings tables (same schema, same token vocabulary,
same value distributions) under target/ so the dedup/ANN scale posture
can be measured at two corpus sizes. The engine never depends on this;
the output dir is passed to graft.ScaleProbe / graft.Bench as the
SF dir.

Usage: python3 scripts/make_scale_fixture.py [factor] [out_dir]
Defaults: factor 10, out dir target/scale10x.
"""
import random
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
SRC = "/root/testdata/sf0.1"


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else (
        REPO / "target" / f"scale{factor}x")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    vocab = [r[0] for r in con.execute(
        f"SELECT DISTINCT unnest(string_split(text, ' ')) v "
        f"FROM '{SRC}/documents.parquet' ORDER BY v").fetchall()]
    n_docs = con.execute(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
    n_vecs = con.execute(
        f"SELECT count(*) FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    langs = ["en", "en", "en", "fr", "de", "es", "zh"]  # en-weighted
    rng = random.Random(14)

    docs = []
    for i in range(n_docs * factor):
        n_tok = rng.randint(10, 100)
        text = " ".join(rng.choice(vocab) for _ in range(n_tok))
        docs.append((i, text, rng.choice(langs), f"src{i % 20}", len(text)))
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?, ?, ?)", docs)
    con.execute(f"COPY docs TO '{out}/documents.parquet' (FORMAT PARQUET)")

    vecs = []
    for i in range(n_vecs * factor):
        emb = [rng.gauss(0.0, 0.13) for _ in range(64)]
        vecs.append((i, emb, i % 10))
    con.execute("CREATE TABLE vecs (vec_id BIGINT, embedding FLOAT[], "
                "label INTEGER)")
    con.executemany("INSERT INTO vecs VALUES (?, ?, ?)", vecs)
    con.execute(f"COPY vecs TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    print(f"wrote {n_docs * factor} docs, {n_vecs * factor} vecs -> {out}")

    # r15: N-x fact tables for the survival / itemset probes. Orders and
    # lineitem replicate with SHIFTED keys (copy c adds c*stride to the
    # order and customer keys) so per-customer order sequences and
    # per-order baskets keep their exact shape: the day-grain spell
    # histogram keeps its distinct (dur, grp) domain with N-x counts,
    # and itemset support FRACTIONS are invariant while counts scale N-x
    # — the structural claims the probes measure. Part is a dimension:
    # copied 1-x (brands unchanged).
    ko, kc = 200000, 20000  # > max o_orderkey / o_custkey at sf0.1
    con.execute(
        f"COPY (SELECT o_orderkey + c.c * {ko} AS o_orderkey, "
        f"o_custkey + c.c * {kc} AS o_custkey, o_orderstatus, "
        f"o_totalprice, o_orderdate, o_orderpriority "
        f"FROM '{SRC}/orders.parquet', range({factor}) c(c)) "
        f"TO '{out}/orders.parquet' (FORMAT PARQUET)")
    con.execute(
        f"COPY (SELECT l_orderkey + c.c * {ko} AS l_orderkey, l_partkey, "
        f"l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
        f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
        f"FROM '{SRC}/lineitem.parquet', range({factor}) c(c)) "
        f"TO '{out}/lineitem.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY (SELECT * FROM '{SRC}/part.parquet') "
                f"TO '{out}/part.parquet' (FORMAT PARQUET)")
    print(f"wrote {factor}x orders/lineitem + 1x part -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
