#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle gate (driver-side python;
not part of the shipped Scala library).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--time [budget_s]]
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
  2. registers each parquet table under its bare name in DuckDB
  3. runs every oracle_sql.json entry and compares rows (sorted columns by
     name, sorted rows, exact values) against the Spark parquet dump

--time: additionally prints per-oracle DuckDB seconds and FAILS the run
if any single oracle exceeds the budget (default 30 s at sf0.01) — the
round-10 lesson: six slow oracles silently quintupled the driver's replay
cost and the correctness gate recorded nothing. Keep every oracle cheap.
"""
import sys, json, glob, math, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision repr: bit-exact compare
    return repr(v)

def canon(rows, cols):
    """Rows with cells reordered by column name, then sorted."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)

def main(sf_dir, out_dir, timed=False, budget_s=30.0):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_fail = 0
    n_over = 0
    t_total = 0.0
    timings = []
    for name, sql in sorted(oracles.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"[MISS] {name}: no spark output")
            n_fail += 1
            continue
        try:
            t0 = time.time()
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
            dt = time.time() - t0
            t_total += dt
            timings.append((dt, name))
            if timed:
                flag = "  <-- OVER BUDGET" if dt > budget_s else ""
                print(f"[TIME] {name}: {dt:.1f}s{flag}")
                if dt > budget_s:
                    n_over += 1
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {str(e)[:300]}")
            n_fail += 1
            continue
        sq = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols = [d[0] for d in sq.description]
        srows = sq.fetchall()
        if sorted(dcols) != sorted(scols):
            print(f"[SCHEMA] {name}: duck={sorted(dcols)} spark={sorted(scols)}")
            n_fail += 1
            continue
        dcanon = canon(drows, dcols)
        scanon = canon(srows, scols)
        if dcanon == scanon:
            print(f"[OK] {name}: {len(drows)} rows")
            n_ok += 1
        else:
            print(f"[DIFF] {name}: duck {len(drows)} rows vs spark {len(srows)} rows")
            only_d = [r for r in dcanon if r not in set(scanon)][:3]
            only_s = [r for r in scanon if r not in set(dcanon)][:3]
            for r in only_d:
                print(f"   duck-only:  {r}")
            for r in only_s:
                print(f"   spark-only: {r}")
            n_fail += 1
    print(f"\n{n_ok} ok, {n_fail} failed")
    if timed:
        timings.sort(reverse=True)
        print(f"[TIME] total oracle replay: {t_total:.1f}s; slowest:")
        for dt, name in timings[:8]:
            print(f"[TIME]   {name}: {dt:.1f}s")
        if n_over:
            print(f"[TIME] {n_over} oracle(s) over the {budget_s:.0f}s budget — FAIL")
    return 1 if (n_fail or n_over) else 0

if __name__ == "__main__":
    timed = "--time" in sys.argv[3:]
    rest = [a for a in sys.argv[3:] if a != "--time"]
    budget = float(rest[0]) if rest else 30.0
    sys.exit(main(sys.argv[1], sys.argv[2], timed, budget))
