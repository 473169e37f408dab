"""Scaling-efficiency evidence for the north rule.

No real cluster exists in this sandbox, so the N→4N executor
criterion is evidenced by running the IDENTICAL job on identical
deterministic input at two parallelism levels on the 32-core host:
``local[8]`` (N) and ``local[32]`` (4N), with the shuffle-partition
policy scaled with cores (partitions = cores). Each level runs in
its own JVM (subprocess).

The job is the flagship pipeline: generate documents → geocode →
cell-encode → broadcast cover join → exact ray-cast →
salted per-cell aggregation → count. Throughput = docs / wall-clock
of the pipeline action (session startup excluded, one warmup pass).

Usage:
    python tools/bench_scaling.py               # run both levels, write BENCH/
    python tools/bench_scaling.py --cores 8     # single level (JSON to stdout)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SCALING_N_DOCS", "200000000"))
REPS = int(os.environ.get("SCALING_REPS", "3"))
RES = 11
# the host is multi-tenant: neighbor load above this 1-min loadavg
# measurably depresses the wide level (16 threads can't get 16 clean
# cores) and fakes sub-linear scaling. Wait (bounded) for a quiet
# window and RECORD the load seen at each rep so the evidence is
# interpretable.
QUIET_LOAD = float(os.environ.get("SCALING_QUIET_LOAD", "2.5"))
QUIET_WAIT_S = int(os.environ.get("SCALING_QUIET_WAIT_S", "180"))


def _wait_for_quiet_host() -> None:
    t0 = time.time()
    while os.getloadavg()[0] > QUIET_LOAD and time.time() - t0 < QUIET_WAIT_S:
        time.sleep(10)


def run_level(cores: int) -> dict:
    from pyspark.sql import functions as F

    from georaster_spark.datagen import documents_df, geocode_cols, polygons
    from georaster_spark.operators.spatial_join import pip_join, salted_cell_counts
    from georaster_spark.session import get_spark

    spark = get_spark(
        f"scaling_{cores}",
        cores=cores,
        shuffle_partitions=cores,
        # throughput collector: measurably steadier than default G1
        # for this allocation profile at high thread counts.
        # ActiveProcessorCount pins the WHOLE JVM (GC, shuffle, netty
        # threads) to the level's core budget — otherwise the
        # local[8] "cluster" borrows all 32 host cores for its
        # service threads and the baseline is unfairly fast.
        extra_conf={
            "spark.driver.extraJavaOptions": (
                f"-XX:+UseParallelGC -XX:ActiveProcessorCount={cores}"
            )
        },
    )

    def stages(n: int):
        """Cumulative per-stage walls: generation only, +join/ray-
        cast, +salted aggregation (the full pipeline). Each stage
        re-runs the previous ones (lazy eval leaves no other way to
        isolate them in one plan), so report CUMULATIVE walls and
        read stage costs as deltas."""
        docs = documents_df(spark, n, partitions=cores * 4)
        lon, lat = geocode_cols(F.col("doc_seq"))
        docs = docs.withColumn("lon", lon).withColumn("lat", lat)
        joined = pip_join(docs, polygons(), RES)
        per_cell = salted_cell_counts(
            joined, salt_k=cores, salt_expr=F.pmod(F.col("doc_seq"), F.lit(cores))
        )
        out = {}
        t0 = time.time()
        docs.agg(F.sum("doc_seq")).collect()
        out["gen"] = time.time() - t0
        t0 = time.time()
        joined.agg(F.count(F.lit(1))).collect()
        out["gen_join"] = time.time() - t0
        t0 = time.time()
        per_cell.agg(F.sum("n_docs"), F.count(F.lit(1))).collect()
        out["full"] = time.time() - t0
        return out

    def pipeline(n: int) -> float:
        docs = documents_df(spark, n, partitions=cores * 4)
        lon, lat = geocode_cols(F.col("doc_seq"))
        docs = docs.withColumn("lon", lon).withColumn("lat", lat)
        joined = pip_join(docs, polygons(), RES)
        per_cell = salted_cell_counts(
            joined, salt_k=cores, salt_expr=F.pmod(F.col("doc_seq"), F.lit(cores))
        )
        t0 = time.time()
        row = per_cell.agg(
            F.sum("n_docs").alias("n"), F.count(F.lit(1)).alias("cells")
        ).collect()[0]
        return time.time() - t0, int(row["n"])

    if os.environ.get("SCALING_STAGES"):
        pipeline(1_000_000)  # warmup
        reps = [stages(N_DOCS) for _ in range(REPS)]
        best = {k: min(r[k] for r in reps) for k in reps[0]}
        return {
            "cores": cores,
            "n_docs": N_DOCS,
            "stage_walls_cumulative": {k: round(v, 2) for k, v in best.items()},
            "loadavg": round(os.getloadavg()[0], 1),
        }

    pipeline(1_000_000)  # warmup: JIT, broadcast machinery

    walls = []
    loads = []
    joined_rows = None
    for _ in range(REPS):
        _wait_for_quiet_host()
        loads.append(round(os.getloadavg()[0], 1))
        wall, joined_rows = pipeline(N_DOCS)
        walls.append(wall)
    wall = min(walls)  # the host is shared/noisy: min is the capability
    return {
        "cores": cores,
        "n_docs": N_DOCS,
        "joined_rows": int(joined_rows),
        "wall_sec": round(wall, 3),
        "all_walls": [round(w, 2) for w in walls],
        "loadavg_at_rep": loads,
        "docs_per_sec": round(N_DOCS / wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()
    if args.cores:
        print(json.dumps(run_level(args.cores)))
        return

    lo = int(os.environ.get("SCALING_N_CORES", "8"))
    hi = lo * 4
    pairs = int(os.environ.get("SCALING_PAIRS", "2"))
    results = {}
    pair_rows = []  # one FRESH-JVM paired run per entry
    # alternate levels to decorrelate host noise; keep the best
    # (min-wall) observation per level for the headline, and every
    # pair's own efficiency for the median-of-fresh-runs criterion
    # the stage-probe mode only makes sense per level (its dict lacks
    # the wall/throughput keys the pair loop needs) — run it via
    # `--cores N`; strip it here so an inherited env var can't crash
    # the campaign after the first expensive pair
    child_env = {k: v for k, v in os.environ.items() if k != "SCALING_STAGES"}
    for _ in range(pairs):
        this_pair = {}
        for cores in (lo, hi):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cores", str(cores)],
                capture_output=True,
                text=True,
                check=True,
                env=child_env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            print(r, file=sys.stderr)
            this_pair[cores] = r
            if cores not in results or r["wall_sec"] < results[cores]["wall_sec"]:
                results[cores] = r
        pair_rows.append(
            {
                "N_docs_per_sec": this_pair[lo]["docs_per_sec"],
                "4N_docs_per_sec": this_pair[hi]["docs_per_sec"],
                "efficiency": round(
                    this_pair[hi]["docs_per_sec"] / this_pair[lo]["docs_per_sec"] / 4.0, 3
                ),
                "loadavg": this_pair[lo]["loadavg_at_rep"] + this_pair[hi]["loadavg_at_rep"],
            }
        )

    assert results[lo]["joined_rows"] == results[hi]["joined_rows"], (
        "north-rule gate: join output rows must match across cluster sizes"
    )
    eff = (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / 4.0
    effs = sorted(p["efficiency"] for p in pair_rows)
    median_eff = effs[len(effs) // 2] if len(effs) % 2 else (
        effs[len(effs) // 2 - 1] + effs[len(effs) // 2]
    ) / 2.0
    summary = {
        "metric": "spatial_join_pipeline_docs_per_sec",
        "n_docs": N_DOCS,
        "local_N": results[lo],
        "local_4N": results[hi],
        # best-of-each-level ratio: the two minima can come from
        # DIFFERENT pairs, so this mixes host states; disclosed but
        # not the gate statistic
        "best_of_level_capability_ratio": round(eff, 3),
        "pair_efficiencies": [p["efficiency"] for p in pair_rows],
        "median_pair_efficiency": round(median_eff, 3),
        # gate on the median of per-pair efficiencies: each pair is
        # two fresh JVMs measured back-to-back under the SAME host
        # state, and the median is robust to one noisy pair
        "gate": "median pair efficiency >= 0.8",
        "pass": median_eff >= 0.8,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(summary, f, indent=2)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling evidence (north rule)

Job: flagship spatial-join pipeline (generate {N_DOCS:,} docs →
geocode → cell encode res {RES} → broadcast polygon-cover join →
vectorized ray-cast → salted per-cell aggregation). Identical
deterministic input at both levels; shuffle partitions = cores;
fresh JVM per level; warmup pass excluded from timing.

| level | cores | wall (s) | docs/sec | joined rows |
|---|---|---|---|---|
| N  (local[{lo}])  | {lo}  | {results[lo]['wall_sec']} | {results[lo]['docs_per_sec']:,} | {results[lo]['joined_rows']:,} |
| 4N (local[{hi}]) | {hi} | {results[hi]['wall_sec']} | {results[hi]['docs_per_sec']:,} | {results[hi]['joined_rows']:,} |

Best-of-each-level capability ratio = {eff:.3f} (the two minima can
come from different pairs / host states — disclosed, not the gate).

**Gate statistic: median per-pair efficiency = {median_eff:.3f}**
(gate ≥ 0.8: {"PASS" if median_eff >= 0.8 else "FAIL"}) — each pair
is two fresh JVMs measured back-to-back under the same host state.

Join output row counts are identical across cluster sizes
(north-rule row-count gate) — asserted by tools/bench_scaling.py.

## Fresh-run distribution (this campaign)

{len(pair_rows)} fresh-JVM paired runs, alternated N/4N to
decorrelate host noise; per-pair efficiency and the 1-min loadavg
seen at each rep:

| pair | N docs/sec | 4N docs/sec | efficiency | loadavg during reps |
|---|---|---|---|---|
"""
            + "\n".join(
                f"| {i + 1} | {p['N_docs_per_sec']:,} | {p['4N_docs_per_sec']:,} "
                f"| {p['efficiency']} | {'-'.join(str(x) for x in p['loadavg'])} |"
                for i, p in enumerate(pair_rows)
            )
            + f"""

**Median pair efficiency = {median_eff:.3f}** across {len(pair_rows)} fresh runs.
"""
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
