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
    return 0


if __name__ == "__main__":
    sys.exit(main())
