#!/usr/bin/env python3
"""Round-16 bench merge: min-merge fresh runs, carrying the committed
BENCH_LOCAL minima forward ONLY for plan-untouched keys.

Usage: python3 tools/bench_merge_r16.py OUT.json OLD_BENCH.json run1.json ...

The standing min-merge discipline carries a key's committed minimum
forward when its code is byte-identical (the minimum of more historical
runs is a better plan-cost estimate than a few fresh ones). A key whose
plan this round CHANGED must NOT inherit its old minimum: for improved
keys the fresh min wins anyway, and for any key the change made slower
the old minimum would silently mask the regression. TOUCHED below lists
every key whose physical plan or eager driver-job sequence changed in
r16 (see OPTIMIZATION_r16.md); their merged value comes from the fresh
runs alone.
"""
import json
import sys

# every key whose plan or eager job structure changed in round 16
TOUCHED = {
    # training-job fusion (trainCentroids/trainPqCodebooks/residual, nPre)
    "ann_ivf_trained_topk", "ann_recall_ivf", "ann_ndcg_ivf",
    "ann_pq_topk", "ann_recall_pq", "ann_ivfpq_topk", "ann_recall_ivfpq",
    "ann_ivfpq_residual_topk", "ann_recall_ivfpq_residual",
    "ann_graph_search", "ann_recall_graph", "ann_knn_graph",
    "ann_filtered_graph", "ann_recall_filtered_graph", "contrastive_pairs",
    "dedup_semantic", "dedup_hybrid_clusters", "dedup_embedding",
    "dedup_embedding_incremental", "dedup_embedding_eval",
    "dedup_gate_probe_sweep", "contamination_semantic",
    # dashboard + sweeps
    "ann_index_compare", "ann_beam_sweep",
    "ann_nprobe_sweep", "ann_nprobe_sweep_ivfpq",
    # ExactSubstr native gram ids
    "dedup_exact_substring", "dedup_substring_runs", "dedup_substring_scrub",
    # native shingle sids
    "dedup_ngram_jaccard", "dedup_containment", "dedup_threshold_sweep",
    "ngram_novelty", "shingle_df_histogram", "quality_dup_grid",
    # markov one-pass emission
    "markov_attribution", "markov2_attribution",
    # quantiles fusion + gap-series checkpoint
    "classifier_threshold_select", "touch_gap_quantiles", "time_to_convert",
    # dsir bigram buckets, nb token checkpoint
    "dsir_select", "nb_lang_classify",
    # corpus index state build (refresh nPre) — serving unchanged but the
    # memoized build rides the first corpus key of a run; keep them fresh
    "corpus_semantic_adc", "corpus_filtered_adc", "corpus_adc_residual",
    "corpus_filtered_two_col", "corpus_filtered_topk",
}


def main():
    out_path, old_path, ins = sys.argv[1], sys.argv[2], sys.argv[3:]
    old = json.load(open(old_path))
    runs = [json.load(open(p)) for p in ins]
    queries = {}
    seen = set()
    for r in runs:
        for k, v in r["queries"].items():
            seen.add(k)
            if v < 0:
                continue
            queries[k] = min(queries.get(k, float("inf")), v)
    # carry committed minima for untouched keys only
    carried = 0
    for k, v in old.get("queries", {}).items():
        if k in TOUCHED or v < 0 or k not in seen:
            continue
        if v < queries.get(k, float("inf")):
            queries[k] = v
            carried += 1
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
        "reps": f"r16 merge: {len(runs)} fresh runs; committed minima "
                f"carried for {carried} plan-untouched keys; "
                f"{len(TOUCHED)} touched keys fresh-only",
    }
    json.dump(merged, open(out_path, "w"))
    print(f"{out_path}: {len(queries)} queries, total {merged['value']:.1f}s; "
          f"carried {carried} untouched minima; "
          f"touched-fresh {len(TOUCHED & seen)}")


if __name__ == "__main__":
    main()
