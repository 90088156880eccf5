#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB with every testdata
table registered as a view, and compares:

1. SCHEMA TYPE PARITY — DESCRIBE of the Spark parquet output vs DESCRIBE
   of the oracle SQL, per column (names lowercased, types normalized only
   for the known-benign tz annotation). This catches the round-5 bug
   class the value compare below cannot: DuckDB silently promoting
   sum() to HUGEINT, date_trunc('week') returning DATE where Spark emits
   TIMESTAMP, epoch() arithmetic staying DOUBLE where Spark emits BIGINT.
   The driver's canonical-value hash distinguishes all of those even when
   every value is numerically identical, so a type mismatch here is a
   guaranteed red driver row.
2. VALUES — row order AND value equality, columns sorted by name.
"""
import sys, os, json, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def norm_type(t):
    """DuckDB type name → canonical form for parity comparison.

    The ONLY collapse is the timezone annotation: Spark writes parquet
    TIMESTAMP with isAdjustedToUTC=true, which DuckDB reads back as
    TIMESTAMP WITH TIME ZONE, while oracle SQL produces plain TIMESTAMP
    — both hash identically driver-side (proven by 140 green timestamp
    rows in r05), so the annotation is noise. Everything else (HUGEINT
    vs BIGINT, DATE vs TIMESTAMP, DOUBLE vs BIGINT, DECIMAL widths) is
    a real driver-visible difference and must compare exactly.
    """
    t = t.strip().upper()
    if t == "TIMESTAMP WITH TIME ZONE":
        return "TIMESTAMP"
    return t

def described(con, sql):
    return {r[0].lower(): norm_type(r[1])
            for r in con.execute(f"DESCRIBE {sql}").fetchall()}

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
        # type-parity gate (see module docstring): per-column DuckDB type
        # of the Spark parquet vs the oracle result must match exactly
        # (modulo the tz annotation) or the driver hash WILL diverge.
        try:
            gt = described(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            et = described(con, oracle[name])
        except Exception as e:
            print(f"FAIL  {name}: describe error: {e}")
            n_fail += 1
            continue
        tbad = [(c, gt.get(c.lower()), et.get(c.lower())) for c in gc
                if gt.get(c.lower()) != et.get(c.lower())]
        if tbad:
            for c, a, b in tbad:
                print(f"FAIL  {name}: TYPE col={c}: spark={a} oracle={b}")
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
