"""Two-parallelism scaling benchmark -> BENCH/BASELINE.md.

Sandbox proxy for the north rule's N vs 4N executor criterion: the same
workloads run at local[8] and local[32] in fresh JVMs.

This host is a virtualized sandbox whose *effective* CPU grant varies over
time (observed: identical 32-vCPU jobs ranging 1x-3.3x vs 8-vCPU in
different windows). To de-noise, levels run INTERLEAVED over several
rounds, each level carries an independent host-CPU control (python
busy-loop ops/sec at the same process count), and the report presents:

- the best round by host-control scaling (the quietest window), and
- host-normalized efficiencies: (spark_32/spark_8) / (host_32/host_8) --
  what fraction of the CPU the host actually granted did Spark convert.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROUNDS = int(os.environ.get("SCALING_ROUNDS", "3"))


def run_level(cpus: int) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "scaling_worker.py"),
            "--cpus", str(cpus),
        ],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not last:
        raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")
    return json.loads(last[-1])


METRICS = {
    "docs": "docs_per_sec",
    "join": "join_rows_per_sec",
    "snap": "snap_points_per_sec",
    "calib": "calib_rows_per_sec",
    # the pages pipeline decomposed per-stage (stage inputs materialized)
    "pages_extract": "pages_extract_docs_per_sec",
    "pages_snap": "pages_snap_docs_per_sec",
    "pages_rollup": "pages_rollup_docs_per_sec",
}


def effs(l8: dict, l32: dict) -> dict:
    host_scale = l32["host_cpu_ops_per_sec"] / l8["host_cpu_ops_per_sec"]
    out = {"host_scale": round(host_scale, 3)}
    for name, key in METRICS.items():
        scale = l32[key] / l8[key]
        out[f"eff_{name}"] = round(scale / 4.0, 3)
        out[f"eff_{name}_hostnorm"] = round(scale / host_scale, 3)
    return out


def main():
    rounds = []
    for r in range(ROUNDS):
        level = {}
        for cpus in (8, 32):
            print(f"[scaling] round {r} local[{cpus}] ...", flush=True)
            level[cpus] = run_level(cpus)
            print(f"[scaling] {level[cpus]}", flush=True)
        level["effs"] = effs(level[8], level[32])
        rounds.append(level)
        print(f"[scaling] round {r} effs: {level['effs']}", flush=True)

    import math

    # "best" round = the cleanest measurement WINDOW: host grant closest
    # to the ideal 4.00x in log space. (Selecting max host_scale picked
    # over-granted windows — e.g. 4.90x means the 8-level was starved,
    # which deflates host-normalized efficiency just as unfairly as a
    # starved 32-level inflates it.)
    best = min(
        rounds,
        key=lambda lv: abs(math.log(lv["effs"]["host_scale"] / 4.0)),
    )
    # per-metric best across rounds: the engine's demonstrated scaling
    # when the host cooperates for that workload's window. The max is a
    # selection-biased estimator (max-of-noise reads high), so each entry
    # also carries the cross-round MEDIAN and min/max spread — report the
    # median as the headline and the max as "best observed" only.
    def _median(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0

    best_per_metric = {}
    for name in METRICS:
        for kind in ("", "_hostnorm"):
            key = f"eff_{name}{kind}"
            vals = [lv["effs"][key] for lv in rounds]
            ri, val = max(enumerate(vals), key=lambda t: t[1])
            best_per_metric[key] = {
                "value": val,
                "round": ri,
                "median": round(_median(vals), 3),
                "min": round(min(vals), 3),
                "max": round(max(vals), 3),
            }
    result = {
        "rounds": [
            {"8": lv[8], "32": lv[32], "effs": lv["effs"]} for lv in rounds
        ],
        "best_round_effs": best["effs"],
        "best_per_metric": best_per_metric,
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    stamp = time.strftime("%Y-%m-%dT%H%MZ", time.gmtime())
    with open(os.path.join(REPO, "BENCH", f"scaling_{stamp}.json"), "w") as f:
        json.dump(result, f, indent=2)

    l8, l32, e = best[8], best[32], best["effs"]
    labels = {
        "docs": "pages pipeline", "join": "interval join",
        "snap": "snap kernel", "calib": "codegen calibration",
        "pages_extract": "pages leg: extract",
        "pages_snap": "pages leg: snap",
        "pages_rollup": "pages leg: rollup",
    }
    per_metric_md = "\n".join(
        "| {} | {:.3f} | {:.3f} (r{}) | {:.3f} | {:.3f} (r{}) |".format(
            labels[name],
            best_per_metric[f"eff_{name}"]["median"],
            best_per_metric[f"eff_{name}"]["value"],
            best_per_metric[f"eff_{name}"]["round"],
            best_per_metric[f"eff_{name}_hostnorm"]["median"],
            best_per_metric[f"eff_{name}_hostnorm"]["value"],
            best_per_metric[f"eff_{name}_hostnorm"]["round"],
        )
        for name in METRICS
    )
    per_metric_md = (
        "| workload | median eff (/4) | best eff | median (host-norm) "
        "| best (host-norm) |\n"
        "|---|---|---|---|---|\n" + per_metric_md
    )
    md = f"""

## Scaling measurement {stamp} (APPENDED — earlier sections above stand)

Identical workloads at `local[8]` and `local[32]` in fresh JVMs,
interleaved over {ROUNDS} rounds; host-CPU control per level. Best round
by host-control scaling (host grant 8->32: **{e['host_scale']:.2f}x** of
an ideal 4.00x); `BENCH/scaling_{stamp}.json` has all rounds.

### Workloads

- **pages pipeline** (docs/sec): Common-Crawl-style synthesis ->
  html->text extraction (byte-identity audited) -> geocode ->
  broadcast kNN nearest-route snapping -> tile rollup ({l8['docs']:,} pages)
- **interval join** (pair-rows/sec): route-equi + binned measure-axis
  overlay join, {l8['join_rows']:,} pairs produced + checksummed
- **snap kernel** (points/sec): vectorized numpy snap UDF, broadcast
  route geometry ({l8['snap_points']:,} points)
- **codegen calibration** (rows/sec): pure whole-stage-codegen xxhash --
  the Spark compute ceiling

### Results (best round)

| workload | local[8] /sec | local[32] /sec | speedup | eff (/4) | eff (host-normalized) |
|---|---|---|---|---|---|
| pages pipeline | {l8['docs_per_sec']:,.0f} | {l32['docs_per_sec']:,.0f} | {l32['docs_per_sec']/l8['docs_per_sec']:.2f}x | {e['eff_docs']:.3f} | **{e['eff_docs_hostnorm']:.3f}** |
| interval join | {l8['join_rows_per_sec']:,.0f} | {l32['join_rows_per_sec']:,.0f} | {l32['join_rows_per_sec']/l8['join_rows_per_sec']:.2f}x | {e['eff_join']:.3f} | **{e['eff_join_hostnorm']:.3f}** |
| snap kernel | {l8['snap_points_per_sec']:,.0f} | {l32['snap_points_per_sec']:,.0f} | {l32['snap_points_per_sec']/l8['snap_points_per_sec']:.2f}x | {e['eff_snap']:.3f} | **{e['eff_snap_hostnorm']:.3f}** |
| codegen calibration | {l8['calib_rows_per_sec']:,.0f} | {l32['calib_rows_per_sec']:,.0f} | {l32['calib_rows_per_sec']/l8['calib_rows_per_sec']:.2f}x | {e['eff_calib']:.3f} | **{e['eff_calib_hostnorm']:.3f}** |
| pages leg: extract | {l8['pages_extract_docs_per_sec']:,.0f} | {l32['pages_extract_docs_per_sec']:,.0f} | {l32['pages_extract_docs_per_sec']/l8['pages_extract_docs_per_sec']:.2f}x | {e['eff_pages_extract']:.3f} | **{e['eff_pages_extract_hostnorm']:.3f}** |
| pages leg: snap | {l8['pages_snap_docs_per_sec']:,.0f} | {l32['pages_snap_docs_per_sec']:,.0f} | {l32['pages_snap_docs_per_sec']/l8['pages_snap_docs_per_sec']:.2f}x | {e['eff_pages_snap']:.3f} | **{e['eff_pages_snap_hostnorm']:.3f}** |
| pages leg: rollup | {l8['pages_rollup_docs_per_sec']:,.0f} | {l32['pages_rollup_docs_per_sec']:,.0f} | {l32['pages_rollup_docs_per_sec']/l8['pages_rollup_docs_per_sec']:.2f}x | {e['eff_pages_rollup']:.3f} | **{e['eff_pages_rollup_hostnorm']:.3f}** |

"eff (host-normalized)" = Spark's throughput scaling divided by the CPU
scaling the host actually granted in the same window -- the engine's own
scaling behavior with the sandbox's time-varying CPU cap factored out.

### Best observed per workload across the {ROUNDS} rounds

Windows are noisy per-round; the per-metric maximum is the engine's
demonstrated scaling when the host cooperates for that workload:

{per_metric_md}

### Single-host caveats

local[8] and local[32] share one DRAM bus, one page cache, and one
(tmpfs) shuffle volume: shuffle- and hash-aggregation-heavy phases
under-report multi-node scaling (those resources scale with nodes on a
real cluster); map-dominant phases (broadcast joins, codegen, Arrow UDF
kernels) are representative. Shuffle dirs point at /dev/shm so the single
disk is out of the measurement.

Re-generate: `python tools/scaling_bench.py` (SCALING_ROUNDS=N to change
rounds).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    print(json.dumps(result["best_round_effs"]))


if __name__ == "__main__":
    main()
