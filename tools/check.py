#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, load the engine's Verify output parquet, and
compare schema + values cell-by-cell (columns sorted by name, rows in
written order). Dev tool only — not part of the library."""
import json, sys, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    """String-normalize like a value-hashing comparator would: int 5 and
    float 5.0 must NOT compare equal (DuckDB HUGEINT sums come back as
    float64 and the driver hashes the repr)."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no engine output")
            n_fail += 1
            continue
        try:
            # fetchdf (pandas) on BOTH sides, like the driver: pandas quirks
            # (nullable-int → float) then cancel out, while genuine type
            # divergence (HUGEINT sum → float64 vs engine int64) surfaces.
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf().to_dict("records")
            want = con.execute(sql).fetchdf().to_dict("records")
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(want)}")
            n_fail += 1
            continue
        gcols = sorted(got[0].keys()) if got else []
        wcols = sorted(want[0].keys()) if want else []
        if gcols != wcols:
            print(f"FAIL {name}: cols {gcols} != oracle {wcols}")
            n_fail += 1
            continue
        bad = 0
        for i, (g, w) in enumerate(zip(got, want)):
            for c in gcols:
                gv, wv = norm_cell(g[c]), norm_cell(w[c])
                if gv != wv:
                    if bad < 3:
                        print(f"  {name} row {i} col {c}: engine={gv!r} oracle={wv!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells / {len(got)} rows")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
