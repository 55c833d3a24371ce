#!/usr/bin/env python3
"""Scaling curves: run the bench's headline dedup/ANN/relational queries
at several scale factors and record how per-query wall time grows with
input size. Produces scaling_curves.json; SCALING.md interprets it.

Usage: python3 tools/scaling_curves.py [out.json]

The growth evidence this captures: the synthetic corpus grows 10x in
documents and 100x in lineitem between sf0.01 and sf0.1 / sf0.001, so a
query whose cost is quadratic in corpus size (an all-pairs dedup, an
unpruned ANN scan) shows a time ratio far above the data ratio, while
the banded/index-pruned shapes stay at or below it (fixed per-query JVM+
planning overhead makes small-sf ratios UNDER-estimate growth, which is
the conservative direction for this check).
"""
import json
import os
import re
import subprocess
import sys

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# headline queries with a real growth axis at these SFs
QUERIES = [
    # documents 500 -> 500 -> 5,000 (10x at the last step)
    "dedup_exact", "dedup_minhash_pairs", "dedup_incremental",
    "dedup_semantic", "dedup_clusters", "dedup_keep_best",
    "txt_span_dedup", "txt_dsir_select", "txt_bpe_tokens",
    "txt_mix_unimax", "txt_mix_unimax_bpe", "txt_mix_epochs_bpe",
    "txt_budget_select_bpe",
    "txt_classifier_select", "txt_dclm_pipeline",
    "txt_exact_substr", "txt_exact_substr_cut",
    "txt_bpe_train", "txt_bpe_tokens_learned",
    "pack_occupancy", "pack_occupancy_synced",
    "media_phash_pairs",
    # embeddings 500 -> 500 -> 2,000 (4x at the last step)
    "sim_topk_brute", "sim_topk_ivf", "sim_pq_recall",
    "sim_hard_negatives",
    # r20: the multi-table LSH probe rides the literal-weight graft_dot
    # buckets now — its growth row documents the rewritten hot path
    "sim_topk_lsh_multi",
    # lineitem 6k -> 60k -> 600k (10x each step)
    "rel_pricing_summary", "rel_join_fact_fact", "sql_join_graph",
    # orders 1.5k -> 15k -> 150k; r20 materializes the recursive CTE's
    # windowed anchor once — the row pins that the recursion stays
    # data-bounded (depth = max streak) as orders grow
    "sql_recursive_chain",
]


def run_bench(sf_dir):
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_ONLY": ",".join(QUERIES),
        "SPARK_GRAFT_REPEAT": "3",
        "SPARK_GRAFT_CPUS": env.get("SPARK_GRAFT_CPUS", "32"),
    })
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=3600)
    for line in (out.stdout + out.stderr).splitlines():
        m = re.search(r'\{"metric":"total".*\}', line)
        if m:
            return json.loads(m.group(0))
    raise SystemExit(f"no bench line for {sf_dir}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    results = {}
    for sf in SFS:
        print(f"== bench {sf}", flush=True)
        r = run_bench(sf)
        results[sf] = {
            "queries": r["queries"],
            "load": r.get("load"),
            "contended": r.get("contended"),
            "round_totals": r.get("round_totals"),
        }
    curves = {}
    for q in QUERIES:
        times = [results[sf]["queries"].get(q) for sf in SFS]
        ratios = []
        for a, b in zip(times, times[1:]):
            ratios.append(round(b / a, 2) if a and b else None)
        curves[q] = {"sec": times, "step_ratios": ratios}
    out = {"sfs": SFS, "runs": results, "curves": curves}
    path = sys.argv[1] if len(sys.argv) > 1 else "scaling_curves.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(curves, indent=1))


if __name__ == "__main__":
    main()
