#!/usr/bin/env python3
"""Fold N same-commit Bench local records (SPARK_GRAFT_BENCH_LOCAL_OUT
files) into one committed artifact — the single-HEAD element-wise-min
protocol the round-11 verdict demanded, now fully machine-generated
(round-12's artifact carried hand-written contention prose; round-13's
carries structured fields only).

Per query the fold keeps:
  - min  : element-wise min across runs (the headline; each run's value
           is already min(sweep_min, fresh-JVM isolated_min))
  - sweep dispersion : max over runs of the in-run max/min across the
           run's 3 sweep executions (how contended the sweeps were)
  - cross_run_ratio  : max/min of the runs' folded values (how much the
           runs disagree AFTER each healed itself — the honest residual)

Usage: fold_bench.py OUT.json RUN1.json RUN2.json [RUN3.json ...]
"""
import json
import sys


def main() -> None:
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in run_paths]
    names = set(runs[0]["queries"])
    for r in runs:
        assert set(r["queries"]) == names, "runs cover different catalogs"
        assert r["sf"] == runs[0]["sf"]
    folded = {}
    disp = {}
    xrun = {}
    for n in sorted(names):
        vals = [r["queries"][n] for r in runs if r["queries"][n] >= 0]
        folded[n] = round(min(vals), 3) if vals else -1.0
        disp[n] = round(max(r["queries_dispersion"].get(n, 1.0)
                            for r in runs), 3)
        if vals and min(vals) > 0:
            xrun[n] = round(max(vals) / min(vals), 3)
    stores = {}
    for k in runs[0].get("stores", {}):
        stores[k] = round(min(r["stores"][k] for r in runs
                              if k in r.get("stores", {})), 3)
    total = round(sum(v for v in folded.values() if v >= 0), 3)
    rec = {
        "metric": "total",
        "value": total,
        "unit": "sec",
        "sf": runs[0]["sf"],
        "runs": runs[0]["runs"],
        "n_queries": len(names),
        "n_failed": max(r["n_failed"] for r in runs),
        "protocol": (
            f"element-wise min over {len(runs)} full same-commit runs, "
            "each = min-of-3 sweep + fresh-JVM isolation (dispersion>2x "
            "force-isolated) + store prebuild on its own line; folded by "
            "scripts/fold_bench.py, no hand-edited fields"),
        "run_totals": [r["total"] for r in runs],
        "store_build_sec": round(sum(stores.values()), 3),
        "stores": stores,
        "queries": folded,
        "queries_dispersion": disp,
        "cross_run_ratio": xrun,
        "total": total,
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(rec, separators=(",", ":")) + "\n")
    worst = sorted(xrun.items(), key=lambda kv: -kv[1])[:10]
    print(f"folded {len(run_paths)} runs -> {out_path}: total={total} "
          f"n={len(names)} worst cross-run: "
          + ", ".join(f"{k}={v}" for k, v in worst))


if __name__ == "__main__":
    main()
