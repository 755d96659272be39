#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
SQL from oracle_sql.json in DuckDB with views over <sfDir>/*.parquet, sorts
columns by name, and compares row-for-row (exact, like a hash compare).
Driver-side tooling only — the engine itself never depends on this.
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact float compare via repr; driver hashes values similarly
        return repr(v)
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # Fixture FK gate (r20 advice): x_tsb_demand's single-scan rewrite
    # derives its dmax/span anchors from the part-joined grain while the
    # oracle twin derives them from bare lineitem — equivalent ONLY while
    # lineitem->part referential integrity holds. Assert it here so a
    # future fixture with orphan l_partkey rows fails LOUDLY at the gate
    # instead of silently shifting the anchors.
    orphans = con.execute(
        "SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS "
        "(SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)"
    ).fetchone()[0]
    if orphans:
        print(f"FAIL fixture-fk: {orphans} lineitem rows with orphan "
              f"l_partkey in {sf_dir} — x_tsb_demand's grain-derived "
              f"anchors are no longer lineitem-equivalent")
        sys.exit(1)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Verify writes errors.json for queries that crashed before producing
    # output (r8 loud-failure contract). Queries WITH oracle SQL already
    # show red via their sentinel parquet below; count the rest here so a
    # crashed rows-only query can't pass unnoticed locally either.
    try:
        errors = json.load(open(f"{out_dir}/errors.json"))
    except FileNotFoundError:
        errors = {}
    for name, msg in sorted(errors.items()):
        if name not in oracle:
            print(f"FAIL {name}: crashed (no oracle SQL): {msg}")
            n_fail += 1
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: read/exec error: {e}")
            n_fail += 1
            continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        s = spark_df[s_cols]
        dd = duck_df[d_cols]
        if len(s) != len(dd):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(dd)}")
            n_fail += 1
            continue
        srows = [tuple(norm(v) for v in r) for r in s.itertuples(index=False)]
        drows = [tuple(norm(v) for v in r) for r in dd.itertuples(index=False)]
        if srows != drows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  spark: {srows[bad]}")
            print(f"  duck : {drows[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
