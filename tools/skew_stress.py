"""Skew stress: run the two skew-sensitive operators on a deliberately
hot corpus and measure straggler ratios from real task metrics.

The r4 verdict's scale ask: with a Zipf-hot conversation and head mention
(documents) and a degenerate label cell (embeddings), show that no task
in `link_embed` or `embed_cosine_pairs` runs longer than 4x the stage
median — i.e. the skew defenses (LBP per-(conv, chunk) grouping + the
explicit repartition, CELL_CAP sub-splitting of hot cells, salted J1)
actually spread the hot keys.

Input: a skew corpus from `python tools/gen_sf.py <dir> <sf> --skew`
(head token ~44% of mention occurrences; head embedding label ~64% of
vectors; conv_0 structurally holds ~10% of all turns via the GRP rule).

Measurement: the Spark UI REST API's per-stage taskSummary quantiles
(executorRunTime at p50/max) — ground-truth task durations, not
guesses. Each query runs in its own job group so stages attribute
cleanly. Stages lighter than MIN_MEDIAN_MS or with < MIN_TASKS tasks
are reported but not gated (a 5 ms scheduling wiggle is not a
straggler).

Usage: python tools/skew_stress.py [skew_dir] [cores]
Prints one JSON line; exit 1 if any gated stage breaks the 4x bar.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_RATIO = 4.0
MIN_TASKS = 8
MIN_MEDIAN_MS = 200.0


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _stage_rows(ui: str, app: str, stage_ids: set[int]) -> list[dict]:
    rows = []
    for st in _get(f"{ui}/api/v1/applications/{app}/stages?status=complete"):
        if st["stageId"] not in stage_ids or st["numCompleteTasks"] == 0:
            continue
        q = _get(
            f"{ui}/api/v1/applications/{app}/stages/{st['stageId']}"
            f"/{st['attemptId']}/taskSummary?quantiles=0.5,1.0"
        )
        p50, pmax = q["executorRunTime"]
        rows.append(
            {
                "stage": st["stageId"],
                "name": st["name"].split("\n")[0][:60],
                "tasks": st["numCompleteTasks"],
                "median_ms": p50,
                "max_ms": pmax,
                "ratio": round(pmax / p50, 2) if p50 > 0 else None,
                "gated": st["numCompleteTasks"] >= MIN_TASKS
                and p50 >= MIN_MEDIAN_MS,
            }
        )
    return rows


def main() -> None:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1skew"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from ed_twitter_spark.session import get_spark
    from ed_twitter_spark.plans import registry

    spark = get_spark(
        "skew_stress", cores=cores, extra={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app = sc.applicationId
    qs = registry.queries()

    results = {}
    for name in ("embed_cosine_pairs", "link_embed"):
        sc.setJobGroup(name, name, interruptOnCancel=False)
        t0 = time.time()
        n = qs[name](spark, skew_dir).count()
        wall = round(time.time() - t0, 2)
        sc.setJobGroup("idle", "idle")
        stage_ids = {
            sid
            for job in _get(f"{ui}/api/v1/applications/{app}/jobs")
            if job.get("jobGroup") == name
            for sid in job["stageIds"]
        }
        stages = sorted(
            _stage_rows(ui, app, stage_ids),
            key=lambda r: -(r["median_ms"] * r["tasks"]),
        )
        gated = [s for s in stages if s["gated"]]
        results[name] = {
            "rows": n,
            "wall_sec": wall,
            "worst_gated_ratio": max((s["ratio"] for s in gated), default=None),
            "stages_gated": gated[:6],
        }

    ok = all(
        (r["worst_gated_ratio"] or 0) <= MAX_RATIO for r in results.values()
    )
    print(
        json.dumps(
            {
                "skew_dir": skew_dir,
                "cores": cores,
                "max_ratio_bar": MAX_RATIO,
                "pass": ok,
                "queries": results,
            }
        )
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
