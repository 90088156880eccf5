#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB with every testdata
table registered as a view, and compares values exactly (row order AND
value bit-equality, columns sorted by name) — stricter than any plausible
driver comparison, so a PASS here should be a PASS there.
"""
import sys, os, json, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status:9s} {name}: {len(got)} rows")
            n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if [c.lower() for c in gc] != [c.lower() for c in ec]:
            print(f"FAIL  {name}: columns differ: spark={gc} oracle={ec}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: row count {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        got = got[gc]; exp = exp[[c for c in ec]]
        exp.columns = gc
        bad = None
        for c in gc:
            gv = [norm(x) for x in got[c].tolist()]
            ev = [norm(x) for x in exp[c].tolist()]
            for i, (a, b) in enumerate(zip(gv, ev)):
                ok = (a == b) or (a is None and b is None) or \
                     (isinstance(a, float) and isinstance(b, float) and a == b) or \
                     (a is None and isinstance(b, float) and math.isnan(b)) or \
                     (str(a) == str(b))
                if not ok:
                    bad = (c, i, a, b)
                    break
            if bad: break
        if bad:
            c, i, a, b = bad
            print(f"FAIL  {name}: col={c} row={i}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(got)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
