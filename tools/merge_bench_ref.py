#!/usr/bin/env python3
"""Round-close bench-ref merge (the r13 policy, SCALING.md methodology
note): the guard resource carries each query's warm sf0.1 MINIMUM across
measurement runs OF THE CURRENT CODE.

  - UNTOUCHED queries: min(previous resource, fresh full sweep) — the
    prior minimum is still achievable by unchanged code, and a contended
    sweep must not inflate it.
  - TOUCHED queries (code changed this round, listed below): minimum
    across the fresh sweep and this round's solo re-measurements only —
    a stale pre-change minimum may be unreachable by the new code (e.g.
    a deliberate jobs-for-wall trade) and would flag it forever.

Usage: merge_bench_ref.py <old.properties> <sweep.properties>
           <out.properties> <touched.json> [solo.json ...]
where touched.json maps query -> [solo minima] (current-code runs only).
"""
import json
import sys


def load_props(path):
    out = {}
    for line in open(path):
        line = line.strip()
        if line and not line.startswith("#"):
            k, v = line.split("=", 1)
            out[k] = float(v)
    return out


def main():
    old_p, sweep_p, out_p, touched_p = sys.argv[1:5]
    old = load_props(old_p)
    sweep = load_props(sweep_p)
    touched = json.load(open(touched_p))
    merged = {}
    for k, v in sweep.items():
        cands = [v]
        if k in touched:
            cands += [float(x) for x in touched[k]]
        else:
            if k in old:
                cands.append(old[k])
        merged[k] = min(cands)
    header = [
        "# Warm sf0.1 per-query minima (seconds) -- the bench contention guard's",
        "# reference map and docs/SCALING.md's source of truth. GENERATED: do not",
        "# hand-edit. Regenerate after surface changes with:",
        "#   SPARK_GRAFT_BENCH_ALL=1 SPARK_GRAFT_PASSES=2 \\",
        "#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \\",
        "#   SPARK_GRAFT_EMIT_REF=src/main/resources/graft/bench-ref-sf01.properties \\",
        "#   sbt 'runMain graft.Bench'",
        "# then min-merge against prior minima with tools/merge_bench_ref.py",
        "# (per-query MIN across current-code runs; prior minima kept only for",
        "# queries whose code did not change -- the r13 contended-sweep policy).",
        "# BenchRefSpec asserts keys == SparkEntry.queries.keySet.",
    ]
    body = [f"{k}={merged[k]:.2f}" for k in sorted(merged)]
    with open(out_p, "w") as f:
        f.write("\n".join(header + body) + "\n")
    n_low = sum(1 for k in merged if k in old and merged[k] < old[k] - 1e-9)
    print(f"merged {len(merged)} refs -> {out_p} "
          f"({len(touched)} touched, {n_low} lowered vs old)")


if __name__ == "__main__":
    main()
