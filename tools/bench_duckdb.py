#!/usr/bin/env python3
"""Time the oracle SQL of every query in DuckDB on a scale dir, as the
single-node comparison point for graft.Bench (see BENCH_NOTES.md).

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir> [bench.json]

<verifyOutDir> must contain oracle_sql.json (graft.Verify output).
Each query runs twice; the min is reported (same methodology as
graft.Bench). If a bench JSON is given, prints a side-by-side table.
"""
import json, os, sys, time
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    bench = None
    if len(sys.argv) > 3:
        line = open(sys.argv[3]).read()
        bench = json.loads(line[line.index('{'):])["queries"]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # BDD_SKIP: comma-separated query names to skip (pathological pure-SQL
    # formulations, e.g. q150's recursive-CTE BFS whose working set is the
    # full path closure at sf>=0.1). Skipped => -2.0, excluded from total.
    skip = set(filter(None, os.environ.get("BDD_SKIP", "").split(",")))
    times = {}
    for name, sql in sorted(oracle.items()):
        if name in skip:
            times[name] = -2.0
            print(f"{name}: SKIPPED (BDD_SKIP)", file=sys.stderr)
            continue
        print(f"{name}...", file=sys.stderr, flush=True)
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                best = -1.0
                print(f"{name}: FAILED {e}", file=sys.stderr)
                break
            el = time.monotonic() - t0
            best = el if best is None else min(best, el)
        times[name] = best
    total = sum(v for v in times.values() if v >= 0)
    print(json.dumps({"metric": "duckdb_total", "value": total,
                      "queries": times, "sf": sf_dir}))
    if bench:
        print(f"\n{'query':30s} {'spark':>8s} {'duckdb':>8s} {'ratio':>7s}")
        for name, dv in sorted(times.items(), key=lambda kv: -kv[1]):
            # graft.Bench stdout uses short "qNN" keys (tail-window fit);
            # bench_detail.json keeps full names — accept either
            sv = bench.get(name, bench.get(name.split("_")[0]))
            if sv is None or sv < 0 or dv <= 0:
                continue
            print(f"{name:30s} {sv:8.2f} {dv:8.2f} {sv/dv:7.1f}x")

if __name__ == "__main__":
    main()
