#!/usr/bin/env python3
"""Dev-only absolute baseline: wall-time every oracle SQL in DuckDB on
the same parquet fixtures the Spark bench reads.

Usage: python3 tools/duckdb_baseline.py <sfDir> <oracleSqlJson> <outJson>
       [perQueryTimeoutSec]

The round verdicts have carried "ask the driver for an absolute bench
baseline" since r1; this closes it from the builder side: the
oracle-expressible subset of the registry IS a DuckDB workload, so
timing it (same machine, same parquet, DuckDB's own thread pool) gives
the single-node reference number the 2x gate can be read against.
Min-of-3 per query after one untimed warm-up; results fully
materialized (fetchall) so lazy execution cannot undercount; a watchdog
thread interrupts any query past the per-query timeout (recorded as
timed_out, excluded from totals). This script is a local development
tool only — the shipped library is pure Scala/Spark.
"""
import json
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_json, out_json, timeout_s=120.0):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(oracle_json) as f:
        oracles = json.load(f)

    results, timed_out, failed = {}, [], {}
    for name in sorted(oracles):
        sql = oracles[name]

        def run_once():
            done = threading.Event()

            def watchdog():
                if not done.wait(timeout_s):
                    con.interrupt()

            w = threading.Thread(target=watchdog, daemon=True)
            w.start()
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
                return time.monotonic() - t0
            finally:
                done.set()

        try:
            run_once()  # warm-up (untimed: buffer pool, JIT-free anyway)
            best = min(run_once() for _ in range(3))
            results[name] = round(best, 4)
            print(f"  [duck] {name:36s} {best:8.3f} s", file=sys.stderr)
        except duckdb.InterruptException:
            timed_out.append(name)
            print(f"  [duck] {name:36s} TIMEOUT >{timeout_s:.0f}s",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — record, keep measuring
            failed[name] = str(e).splitlines()[0][:200]
            print(f"  [duck] {name:36s} FAILED {failed[name]}",
                  file=sys.stderr)

    out = {
        "sf": sf_dir,
        "engine": "duckdb " + duckdb.__version__,
        "protocol": "min-of-3 after warm-up, fetchall-materialized, "
                    f"per-query interrupt at {timeout_s:.0f}s",
        "total_sec": round(sum(results.values()), 3),
        "n": len(results),
        "timed_out": timed_out,
        "failed": failed,
        "queries": results,
    }
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"== {len(results)} timed, total {out['total_sec']:.1f} s, "
          f"{len(timed_out)} timeout, {len(failed)} failed ==")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3],
                  float(sys.argv[4]) if len(sys.argv) > 4 else 120.0))
