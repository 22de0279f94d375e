"""Scaling-efficiency evidence (north_rule: ≥0.8 throughput scaling
efficiency from N to 4N executors; in-sandbox: local[8] vs local[32] on
the SAME input — driver instruction, SURVEY.md §6).

Runs the extraction job in fresh subprocesses (one JVM per parallelism
level, no warm-JVM cross-talk), 2 discarded warm runs + 4 timed runs per
level (BENCH_WARM=2 / BENCH_REPS=4), best-of-4 throughput (BENCH_AGG=min
— the host VM suffers multi-minute CPU-steal storms, so min is the
contention-free estimate; per-run user/sys/steal deltas are recorded in
the JSON for audit), efficiency = (tp_32 / tp_8) / 4. Writes
BENCH/BASELINE.md.

Usage: python BENCH/run_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cores),
        BENCH_REPS=os.environ.get("BENCH_REPS", "4"),
        BENCH_AGG="min",
        # warm-up has a long tail (python worker forks + JIT keep paying
        # across the first 2 runs at high core counts) — 2 discarded runs
        BENCH_WARM="2",
        BENCH_MULT=os.environ.get("BENCH_MULT", "16"),
    )
    # HARD cpu affinity: local[N] caps JVM task threads but python UDF
    # workers would otherwise run on the remaining idle vCPUs, silently
    # giving the "small" cluster extra cores and corrupting the ratio.
    # taskset pins the whole process tree (JVM + python workers) to N
    # physical cores — the honest stand-in for an N-core cluster.
    cmd = ["taskset", "-c", f"0-{cores - 1}",
           sys.executable, os.path.join(REPO, "bench.py")]
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, cwd=REPO, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    levels = {}
    for cores in (8, 32):
        r = run_level(cores, sf_dir)
        tp = r["extra"]["n_docs"] / r["queries"]["extract"]
        levels[cores] = {"result": r, "docs_per_sec": round(tp, 2)}
        print(f"local[{cores}]: extract={r['queries']['extract']}s "
              f"→ {tp:.1f} docs/s")

    eff = (levels[32]["docs_per_sec"] / levels[8]["docs_per_sec"]) / 4
    print(f"scaling efficiency (8→32 cores): {eff:.3f}")

    # per-stage efficiency for every benched query (same best-of-4 times):
    # eff_q = (t8 / t32) / 4 — the headline criterion is extract, but a
    # stage that stops scaling here is the stage that walls at 100 TB
    q8, q32 = levels[8]["result"]["queries"], levels[32]["result"]["queries"]
    stage_rows = []
    for name in q8:
        if name in q32 and q32[name] > 0:
            e = (q8[name] / q32[name]) / 4
            stage_rows.append((name, q8[name], q32[name], round(e, 3)))
            print(f"  stage {name}: {q8[name]}s -> {q32[name]}s "
                  f"eff={e:.3f}")
    stage_md = "\n".join(
        f"| {n} | {t8} | {t32} | {e} |" for n, t8, t32, e in stage_rows
    )

    md = f"""# BENCH/BASELINE — scaling evidence

north_rule criterion: throughput scaling efficiency ≥ 0.8 from N to 4N
executors. No real cluster exists in this sandbox, so the same extraction
job ran at two parallelism levels on the SAME input (driver instruction):
fresh JVM per level, pinned to N physical cores with `taskset` (local[N]
caps JVM task threads but python UDF workers would otherwise spill onto
the idle vCPUs and give the small level extra silicon), 2 discarded warm
runs (worker-fork/JIT warm-up has a long tail), best of 4 timed runs —
best-of-N because the host VM suffers multi-minute CPU-steal storms
(measured: up to 1300 stolen cpu-s in a single run; per-run user/sys/steal
accounting is included in the JSON below so the noise is auditable). The corpus is the
sf0.1-derived interleaved table replicated 4x with disjoint doc_id ranges
(BENCH_MULT=16, ~80k docs) so the measured region is compute-dominated —
at 5k docs the job is fixed-overhead-dominated and NO engine scales on
it; at the target 10^12-doc scale those fixed costs vanish entirely.

- generated: {datetime.now(timezone.utc).isoformat()}
- input: {sf_dir} → derived interleaved spans corpus
  ({levels[32]['result']['extra']['n_docs']} docs, deterministic,
  lens_spark/benchdata.py)
- job: full extraction pipeline incl. parquet sink (bench.py `extract`)

| parallelism | extract best-of-4 (s) | docs/sec |
|---|---|---|
| local[8]  (N)  | {levels[8]['result']['queries']['extract']} | {levels[8]['docs_per_sec']} |
| local[32] (4N) | {levels[32]['result']['queries']['extract']} | {levels[32]['docs_per_sec']} |

**efficiency = (tp_32 / tp_8) / 4 = {eff:.3f}**
({'meets' if eff >= 0.8 else 'BELOW'} the ≥ 0.8 criterion)

Per-stage scaling (best-of-4 seconds; eff = (t8/t32)/4 — wall-clock at a
fixed input, so sub-second stages are timer/overhead-bound and their eff
is not meaningful below ~2 s):

| stage | local[8] (s) | local[32] (s) | efficiency |
|---|---|---|---|
{stage_md}

Full bench JSON per level:

```json
{json.dumps(levels[8]['result'])}
{json.dumps(levels[32]['result'])}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
