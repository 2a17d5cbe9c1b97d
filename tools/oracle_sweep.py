"""Local mirror of the driver's full correctness gate.

Runs EVERY ``queries()`` entry that has an ``oracle_sql()`` twin at a chosen
scale factor (default sf0.01 — the driver's correctness scale) and records a
per-query verdict JSON with the same three checks the driver applies
(row count, column-name schema, order-insensitive value match with
dtype-kind parity).  Purpose: the driver samples ~50 of the 104 catalog
entries per round; this sweep provides recorded evidence for the rest.

Usage:  python tools/oracle_sweep.py [--sf-dir /root/testdata/sf0.01]
                                     [--out ORACLE_SWEEP_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="ORACLE_SWEEP_r05.json")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--only", nargs="*", default=None, help="subset of query names")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)

    # Reuse the exact comparison the test suite mirrors from the driver.
    os.environ["OCS_TEST_SF_DIR"] = args.sf_dir
    from tests.test_queries_oracle import assert_query_matches_oracle
    from ocr_suite_ray.pipelines.queries import ALL_QUERIES

    results: dict[str, dict] = {}
    names = [n for n in ALL_QUERIES if args.only is None or n in args.only]
    t_all = time.perf_counter()
    for i, name in enumerate(names, 1):
        fn, sql = ALL_QUERIES[name]
        row: dict = {"secs": None, "err": None}
        t0 = time.perf_counter()
        if sql is None:
            row["err"] = "no_oracle"
            row["status"] = "skipped"
        else:
            try:
                assert_query_matches_oracle(name, fn, sql, sf_dir=args.sf_dir)
                row["status"] = "pass"
                row["rows_match"] = row["schema_match"] = row["hash_match"] = True
            except Exception as e:  # noqa: BLE001 - record, keep sweeping
                row["status"] = "FAIL"
                row["rows_match"] = row["schema_match"] = row["hash_match"] = False
                row["err"] = f"{type(e).__name__}: {e}"[:800]
                traceback.print_exc()
        row["secs"] = round(time.perf_counter() - t0, 3)
        results[name] = row
        print(f"[{i}/{len(names)}] {name}: {row['status']} ({row['secs']}s)", flush=True)

    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    n_fail = sum(1 for r in results.values() if r["status"] == "FAIL")
    n_skip = sum(1 for r in results.values() if r["status"] == "skipped")
    summary = {
        "sf_dir": args.sf_dir,
        "num_cpus": args.num_cpus,
        "total": len(names),
        "pass": n_pass,
        "fail": n_fail,
        "skipped_no_oracle": n_skip,
        "wall_s": round(time.perf_counter() - t_all, 1),
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in ("total", "pass", "fail", "skipped_no_oracle", "wall_s")}))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
