#!/usr/bin/env python3
"""Min-merge N bench run JSON lines into one BENCH_LOCAL-shaped file.

Usage: python3 tools/bench_merge.py OUT.json run1.json run2.json ...

Each input is the bare JSON line `graft.Bench` prints. The merged file
keeps, per query, the MINIMUM over all runs (a shared box's load spikes
only ever inflate timings, so the min is the best estimate of plan
cost), the per-run load averages, and the deepest pipeline_daily run.
"""
import json
import sys


def main():
    out_path, ins = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in ins]
    queries = {}
    seen = set()
    for r in runs:
        for k, v in r["queries"].items():
            seen.add(k)
            if v < 0:
                continue  # failed rep: never merge a failure marker as a min
            queries[k] = min(queries.get(k, float("inf")), v)
    # A key that failed in EVERY run must not vanish silently (the merged
    # file would read as "covered" with a deflated total) — keep it with the
    # -1 failure sentinel so readers see the hole.
    dropped = sorted(seen - set(queries))
    for k in dropped:
        queries[k] = -1
    if dropped:
        print(f"WARNING: {len(dropped)} queries failed in every run: "
              + ", ".join(dropped), file=sys.stderr)
    detail = {}
    for r in runs:
        for k, v in r.get("detail", {}).items():
            d = detail.setdefault(k, {"min": float("inf"), "median": float("inf"),
                                      "reps": 0, "load_avg": []})
            if v["min"] >= 0:
                d["min"] = min(d["min"], v["min"])
                d["median"] = min(d["median"], v["median"])
            d["reps"] += v.get("reps", 0)
            d["load_avg"].append(v.get("load_avg"))
    # A detail entry whose reps all failed still holds float('inf'), which
    # json.dump emits as bare Infinity (invalid JSON) — serialize as null.
    for d in detail.values():
        for f in ("min", "median"):
            if d[f] == float("inf"):
                d[f] = None
    pipe = next((r["pipeline_daily"] for r in runs
                 if isinstance(r.get("pipeline_daily"), dict)), None)
    merged = {
        "metric": "total",
        "value": sum(v for v in queries.values() if v >= 0),
        "unit": "sec",
        "queries": queries,
        "detail": detail,
        "pipeline_daily": pipe,
        "sf": runs[0].get("sf"),
        "load_avg": [r.get("load_avg") for r in runs],
        "reps": f"min-merge of {len(runs)} full runs",
    }
    json.dump(merged, open(out_path, "w"))
    print(f"{out_path}: {len(queries)} queries, total {merged['value']:.1f}s "
          f"from {len(runs)} runs")


if __name__ == "__main__":
    main()
