"""Two-parallelism scaling benchmark (north-rule evidence).

The north rule requires >=0.8 throughput scaling efficiency from N to 4N
executors. This sandbox has one machine, so the evidence is the same job on
the same input at two local parallelism levels — local[8] vs local[32] —
which exercises the identical partitioning/shuffle behavior a 4x executor
step would (BASELINE.md "Operational targets").

Each level runs in its own subprocess (fresh JVM, clean local[N] master).
The measured job is the end-to-end embedding linker (link_embed: window
build -> broadcast candidate join -> kernel scoring), timed after a warmup
query so JVM/codegen startup is excluded from both sides equally.

Writes BENCH/SCALING_LAST_RUN.md (single-run record; the multi-run
analysis in BENCH/BASELINE.md is curated by hand) and prints one JSON line.

Usage: python tools/scaling_bench.py [sf_dir] [n_small] [n_large]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from ed_twitter_spark.session import get_spark
from ed_twitter_spark.plans import registry

spark = get_spark("scaling", cores={cores})
q = registry.queries()["link_embed"]
# warmup: one full-scale pass per level spawns workers, compiles plans and
# JIT-warms codegen, so the timed pass measures steady-state throughput —
# the regime a 10^12-turn job runs in, where one-time driver setup is noise
q(spark, {sf_dir!r}).count()
# best-of-2 timed passes: the sandbox is a VM with visible host timing
# noise; min-of-k is the standard noise-robust wall-clock estimator
best, n = None, 0
for _ in range(2):
    t0 = time.time()
    n = q(spark, {sf_dir!r}).count()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print("RESULT " + json.dumps({{"cores": {cores}, "sec": round(best, 2),
                               "triples": n,
                               "triples_per_sec": round(n / best, 1)}}))
"""


def run_level(cores: int, sf_dir: str) -> dict:
    code = _CHILD.format(repo=REPO, cores=cores, sf_dir=sf_dir)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        check=True,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cores)},
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line from cores={cores}:\n{out.stdout}\n{out.stderr}")


def replicate_input(src_dir: str, k: int) -> str:
    """Deterministic k× blow-up of the documents table (doc_id offset per
    copy → k× distinct conversations); embeddings copied as-is. A scaling
    measurement on a 20-second job mostly measures fixed driver/stage
    latency; the replicated input amortizes it so the ratio reflects the
    dataflow's actual scaling."""
    import duckdb

    out = f"/tmp/scaling_input_x{k}"
    if not os.path.exists(f"{out}/documents.parquet"):
        os.makedirs(out, exist_ok=True)
        con = duckdb.connect()
        n = con.sql(
            f"SELECT MAX(doc_id) + 1 FROM read_parquet('{src_dir}/documents.parquet')"
        ).fetchone()[0]
        con.execute(
            f"""
            COPY (
              SELECT doc_id + r * {n} AS doc_id, text, lang, source, n_chars
              FROM read_parquet('{src_dir}/documents.parquet'),
                   UNNEST(range({k})) AS t(r)
            ) TO '{out}/documents.parquet' (FORMAT PARQUET)
            """
        )
        shutil_copy(f"{src_dir}/embeddings.parquet", f"{out}/embeddings.parquet")
    return out


def shutil_copy(src: str, dst: str) -> None:
    import shutil

    if os.path.isdir(src):
        shutil.copytree(src, dst, dirs_exist_ok=True)
    else:
        shutil.copyfile(src, dst)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_large = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    replicate = int(os.environ.get("SCALING_REPLICATE", "4"))
    if replicate > 1:
        sf_dir = replicate_input(sf_dir, replicate)
    # per-leg contention probes (the r4 lesson, codified for scaling too):
    # the 4-core leg has idle headroom and barely feels co-tenants, the
    # 16-core leg owns the host and absorbs ALL ambient load — recording
    # load-average + a spin calibration beside each leg makes a noisy
    # window visible in the artifact instead of reading as a regression
    sys.path.insert(0, REPO)
    from bench import host_probe

    probe_small = host_probe()
    small = run_level(n_small, sf_dir)
    probe_large = host_probe()
    large = run_level(n_large, sf_dir)
    small["probe"] = probe_small
    large["probe"] = probe_large
    ratio = n_large / n_small
    eff = (large["triples_per_sec"] / small["triples_per_sec"]) / ratio
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": f"ratio (local[{n_small}] -> local[{n_large}])",
        "sf_dir": sf_dir,
        "small": small,
        "large": large,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/SCALING_LAST_RUN.md", "w") as f:
        f.write(f"""# BENCH — measured scaling evidence (north rule)

Job: `link_embed` — the full embedding linker (per-conversation window
build → broadcast KB candidate join → K1-K6 kernel scoring → triples) on
the seed-42 synthetic transcripts at `{sf_dir}`
({replicate}× deterministic replication of sf0.1 so the multi-minute job
amortizes fixed driver/stage latency — a 20 s job mostly measures
scheduling floors, not dataflow scaling). Same input, same code, two
parallelism levels, separate JVMs, post-warmup timing.

| parallelism | wall (s) | triples | triples/sec |
|---|---|---|---|
| local[{n_small}] (N) | {small['sec']} | {small['triples']} | {small['triples_per_sec']} |
| local[{n_large}] (4N) | {large['sec']} | {large['triples']} | {large['triples_per_sec']} |

**Scaling efficiency N → 4N = {eff:.3f}** (target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"}).

Efficiency = (throughput_4N / throughput_N) / 4. The sandbox has no real
cluster; local[{n_small}] vs local[{n_large}] exercises the same
partition/shuffle plan a {ratio:.0f}× executor step would (driver
instructions + BASELINE.md "Operational targets").

Regenerate: `python tools/scaling_bench.py {sf_dir} {n_small} {n_large}`
""")


if __name__ == "__main__":
    main()
