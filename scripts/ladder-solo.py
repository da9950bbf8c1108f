#!/usr/bin/env python3
"""Row-per-JVM scale-ladder runner (r12).

At high multipliers the one-JVM ladder's rows inflate 1.5-13x after a
ceiling cancel: cancelJobGroup interrupts, but a codegen'd m2-join loop
only reaches an interrupt point at partition end, so zombie tasks churn
CPU through the following rows' windows (d23 at 280x: 8.9 s solo,
ceiling in-ladder; invisible to the status tracker, so the in-harness
drain cannot wait them out). One JVM per row IS the repo's trusted solo
re-probe protocol, promoted to the whole artifact: every row starts
process-cold (JIT included, ~2-5 s floor) and no row can poison another.

Usage: ladder-solo.py <mult> <out.json> [baseDir]
Row list + classification fields are taken from a reference single-JVM
artifact of the same shape (any level) so the merged JSON matches
ScaleSmoke's format, with "protocol":"row-per-jvm" appended.
"""
import json, os, subprocess, sys

mult = sys.argv[1]
out_path = sys.argv[2]
base = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ref = json.load(open(os.path.join(repo, "SCALESMOKE_240x.json")))
keys = list(ref["queries"].keys())

CEILING = "120"  # pinned in the child env so the artifact states the truth

queries, docs, vecs = {}, None, None
first_touch, warm_sec = [], {}
for k in keys:
    row_out = f"/tmp/ladder_row_{mult}_{k}.json"
    # ADVICE r12: delete any stale artifact from a previous run at the same
    # multiplier BEFORE launching — a crashed child (OOM, launch failure)
    # must read as harness_error, not silently resurrect the old timing
    try:
        os.remove(row_out)
    except FileNotFoundError:
        pass
    env = dict(os.environ, SPARK_GRAFT_CPUS="8", SPARK_DRIVER_MEM="32g",
               SPARK_GRAFT_SMOKE_OUT=row_out, SPARK_GRAFT_CEILING_SEC=CEILING)
    r = subprocess.run([os.path.join(repo, "scripts/run-main.sh"),
                        "graft.ScaleSmoke", mult, base, k],
                       env=env, capture_output=True, text=True)
    try:
        if r.returncode != 0:
            raise RuntimeError(f"child exited {r.returncode}")
        d = json.load(open(row_out))
        queries[k] = d["queries"][k]
        docs, vecs = d["docs"], d["vectors"]
        first_touch += [q for q in d.get("first_touch", []) if q == k]
        warm_sec.update({q: v for q, v in d.get("warm_sec", {}).items() if q == k})
    except Exception as e:
        queries[k] = "harness_error"
        sys.stderr.write(f"[ladder-solo] {k}: {e}\n{r.stderr[-500:]}\n")
    sys.stderr.write(f"[ladder-solo] {k} -> {queries[k]}"
                     + (f" warm={warm_sec[k]}" if k in warm_sec else "") + "\n")

breaches = [k for k, v in queries.items() if not isinstance(v, (int, float))]
unrouted = [k for k in breaches
            if k not in ref["routed_baselines"] and k not in ref["diagnostic_arms"]]
total = sum(v for v in queries.values() if isinstance(v, (int, float)))
# ADVICE r13 #5: total_sec sums COLD per-row timings, so first-touch rows
# fold one-off training/census cost into the level headline. Emit the
# warm-adjusted total (warm_sec substituted where measured) and the
# first-touch overhead separately, so level-over-level comparisons can run
# on search-only seconds.
warm_total = sum(warm_sec.get(k, v) for k, v in queries.items()
                 if isinstance(v, (int, float)))
ft_overhead = sum(queries[k] - w for k, w in warm_sec.items()
                  if isinstance(queries.get(k), (int, float)))
art = {
    "metric": "scale_smoke", "multiplier": int(mult), "docs": docs,
    "vectors": vecs, "ceiling_sec": float(CEILING), "total_sec": round(total, 3),
    "warm_total_sec": round(warm_total, 3),
    "first_touch_overhead_sec": round(ft_overhead, 3),
    "queries": queries, "breaches": breaches, "unrouted_breaches": unrouted,
    "first_touch": first_touch, "warm_sec": warm_sec,
    "routed_baselines": ref["routed_baselines"],
    "diagnostic_arms": ref["diagnostic_arms"],
    "excluded_baselines": ref["excluded_baselines"],
    "output_bound_baselines": ref["output_bound_baselines"],
    "base": base, "protocol": "row-per-jvm",
}
with open(out_path, "w") as f:
    json.dump(art, f)
    f.write("\n")
print(json.dumps({"total_sec": art["total_sec"], "breaches": breaches,
                  "unrouted_breaches": unrouted}))
