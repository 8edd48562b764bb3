#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, load the engine's Verify output parquet, and
compare schema + values cell-by-cell (columns sorted by name, rows in
written order). Dev tool only — not part of the library."""
import json, sys, glob, math, time, os
import duckdb

# A single oracle exceeding this wall (seconds) is reported loudly: one
# pathological oracle (freq_triples' old triple self-join, 648.6 s at
# sf0.01) silently zeroed round 15's entire correctness artifact by
# blowing the driver's compare budget. The SLOW warning + the
# oracle_times.json artifact always fire; the exit code only fails on it
# when GRAFT_ORACLE_BUDGET_GATE=1 is set — otherwise a value-identical
# run on a slower or loaded host would fail a *correctness* gate on
# machine speed (round-17 advice).
ORACLE_BUDGET_S = float(os.environ.get("GRAFT_ORACLE_BUDGET_S", "60"))
BUDGET_GATES = os.environ.get("GRAFT_ORACLE_BUDGET_GATE", "") == "1"

# Rows-only contract (round-17 verdict item 8): every query that ships
# WITHOUT an oracleSql entry (engine-local hash/LSH seeds, media DSP,
# ε-ball) must carry an oracle-green recall/precision/parity companion,
# or the gate fails. A future rows-only query landing without a
# companion goes red here instead of silently weakening the surface.
# Key: rows-only query name (an out_dir subdir absent from
# oracle_sql.json); value: list of companion queries, at least one of
# which must PASS.
ROWS_ONLY_COMPANIONS = {
    "ann_range": ["ann_range_recall"],
    "ann_range_filtered": ["ann_range_filtered_recall"],
    "audio_cover": ["audio_cover_recall"],
    "audio_neardup": ["audio_neardup_recall", "audio_neardup_precision"],
    "audio_neardup_groups": ["audio_neardup_groups_recall"],
    "dedup_minhash": ["minhash_recall"],
    "dedup_simhash": ["simhash_recall", "simhash_precision"],
    "image_neardup": ["image_neardup_recall"],
    "image_neardup_groups": ["image_neardup_groups_recall"],
    "knn_lsh": ["knn_lsh_recall"],
    "video_neardup": ["video_neardup_recall"],
    "video_neardup_groups": ["video_neardup_groups_recall"],
}

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
    times = {}
    over_budget = []
    passed = set()
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
            t0 = time.monotonic()
            want = con.execute(sql).fetchdf().to_dict("records")
            times[name] = round(time.monotonic() - t0, 3)
            if times[name] > ORACLE_BUDGET_S:
                over_budget.append(name)
                print(f"SLOW {name}: oracle took {times[name]:.1f}s"
                      f" > budget {ORACLE_BUDGET_S:.0f}s")
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
            passed.add(name)
    # Per-oracle timing artifact: slowest-first so the top line is the
    # next budget risk. Committed at round close for the timing record.
    with open(f"{out_dir}/oracle_times.json", "w") as f:
        json.dump(dict(sorted(times.items(), key=lambda kv: -kv[1])), f,
                  indent=1)
    total = sum(times.values())
    print(f"oracle wall: {total:.1f}s total,"
          f" max {max(times.values()) if times else 0:.1f}s"
          f" -> {out_dir}/oracle_times.json")
    if over_budget:
        gate_word = "GATE FAIL" if BUDGET_GATES else "WARN"
        print(f"== {gate_word}: {len(over_budget)} oracle(s) over"
              f" {ORACLE_BUDGET_S:.0f}s budget: {over_budget} ==")
    # Rows-only companion gate: every Verify output dir absent from
    # oracle_sql.json must be declared in ROWS_ONLY_COMPANIONS and have
    # at least one PASSING companion this run.
    rows_only_bad = []
    out_queries = {os.path.basename(os.path.dirname(p))
                   for p in glob.glob(f"{out_dir}/*/")}
    for name in sorted(out_queries - set(oracle)):
        comps = ROWS_ONLY_COMPANIONS.get(name)
        if comps is None:
            rows_only_bad.append(name)
            print(f"FAIL {name}: rows-only query with NO declared"
                  f" companion (add oracleSql or a recall/precision"
                  f" companion + ROWS_ONLY_COMPANIONS entry)")
        elif not any(c in passed for c in comps):
            rows_only_bad.append(name)
            print(f"FAIL {name}: rows-only query, no companion of"
                  f" {comps} passed this run")
        else:
            ok = [c for c in comps if c in passed]
            print(f"PASS {name} (rows-only; companion {ok[0]} green)")
    if rows_only_bad:
        print(f"== GATE FAIL: {len(rows_only_bad)} rows-only quer(ies)"
              f" without a passing companion: {rows_only_bad} ==")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if (n_fail or rows_only_bad
                 or (over_budget and BUDGET_GATES)) else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
