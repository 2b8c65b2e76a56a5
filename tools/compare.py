#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py /root/testdata/sf0.01 /tmp/verifyout

For each query dir under outDir: read our parquet result, run the oracle SQL
from oracle_sql.json in DuckDB (tables = raw parquet in sfDir), sort columns
by name + rows by all values, compare cell-by-cell.
"""
import sys, json, math, glob, os
import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = f"{v:.10g}"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in idx], out

def main(sf, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for qdir in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"!! {name}: no parquet output"); n_fail += 1; continue
        mine = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        mc, mr = canon(mine.fetchall(), mine.columns)
        if name not in oracles:
            print(f"-- {name}: rows-only ({len(mr)} rows)"); n_skip += 1
            if len(mr) == 0: print(f"!! {name}: EMPTY rows-only result"); n_fail += 1
            continue
        try:
            oracle = con.sql(oracles[name])
            oc, orows = canon(oracle.fetchall(), oracle.columns)
        except Exception as e:
            print(f"!! {name}: oracle SQL failed: {e}"); n_fail += 1; continue
        if mc != oc:
            print(f"!! {name}: column mismatch mine={mc} oracle={oc}"); n_fail += 1; continue
        if len(mr) != len(orows):
            print(f"!! {name}: row count mine={len(mr)} oracle={len(orows)}"); n_fail += 1
            for a, b in list(zip(mr, orows))[:3]: print("   mine:", a, "\n   orcl:", b)
            continue
        bad = [(a, b) for a, b in zip(mr, orows) if a != b]
        if bad:
            print(f"!! {name}: {len(bad)}/{len(mr)} rows differ; first:")
            for a, b in bad[:3]: print("   mine:", a, "\n   orcl:", b)
            n_fail += 1
        else:
            print(f"ok {name}: {len(mr)} rows, {len(mc)} cols")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
