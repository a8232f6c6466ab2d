"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "triples_per_sec": ...}

Run `python bench.py --scaling [sf_dir N 4N]` to measure throughput at
two parallelism levels (default local[4] vs local[16] — distinct physical
cores; see BENCH/BASELINE.md for the SMT analysis) and the N→4N scaling
efficiency (north-rule evidence; protocol in tools/scaling_bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline set: the KG pipeline stages + KB build (dependency order), plus
# one representative per corpus-operator family (dedup / ANN / text stats /
# sessionization)
HEADLINE = [
    "transcripts",
    "kb_alias",
    "mentions",
    "candidates",
    "link_prior_argmax",
    "link_embed",
    "canonicalize",
    "eval_micro_f1",
    "kg_edges",
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "text_stats",
    "event_sessions",
    # round-5 additions (cheap linear rows; subtract these three to
    # reproduce the pre-r5 14-row headline total when comparing rounds)
    "dedup_substring",
    "heavy_hitters_cms",
    "chunk_documents",
    # round-5 second wave (subtract to reproduce the 17-row total):
    # semantic dedup rides the shared IVF build, DSIR and novelty are
    # linear corpus scans, the bootstrap CI is 32 weighted re-aggregations
    "dedup_semantic",
    "dataset_dsir",
    "doc_novelty",
    "eval_bootstrap_ci",
]


def run(spark, names=None, sf_dir=SF_DIR):
    """Time each headline query under pipeline semantics: the shared
    upstream derivations (transcripts, kb_alias, prior triples, CC labels)
    are persisted once and reused by later stages — exactly what the
    production DAG does (plans/pipeline.py materializes each stage once).

    The one-time materialization cost is charged to its own
    ``_shared_build`` row instead of whichever query happens to run first,
    so per-query rows stay comparable round-over-round (the r3
    transcripts/text_stats "regressions" were this accounting artifact).
    ``_shared_build`` is inside the timed total, exactly once."""
    from ed_twitter_spark import synth
    from ed_twitter_spark.caching import release_caches
    from ed_twitter_spark.plans import registry

    qs = registry.queries()
    names = [n for n in (names or HEADLINE) if n in qs]
    timings = {}
    n_triples = 0
    # Untimed input warmup, mirroring tools/scaling_bench.py's warmup
    # discipline: fault the parquet inputs into the OS page cache and
    # spin up the executor read path before any timer starts. The
    # driver's one-shot bench otherwise charges the host's cold file
    # cache to whichever rows happen to run first (measured: 64.8 s
    # cold vs 37.1 s warm on the same tree and host window — almost all
    # of it landing on _shared_build and link_embed).
    from pyspark.sql import functions as _F

    for _name in ("documents", "embeddings", "events"):
        _p = f"{sf_dir}/{_name}.parquet"
        if os.path.exists(_p):
            _df = spark.read.parquet(_p)
            # bit_xor can't overflow (ANSI mode forbids a plain SUM here)
            # and the hash over all columns defeats column pruning, so
            # the scan faults every page
            _df.select(
                _F.expr(
                    "bit_xor(xxhash64("
                    + ", ".join(f"`{c}`" for c in _df.columns)
                    + "))"
                )
            ).collect()
    synth.enable_shared_cache(True)
    try:
        t0 = time.time()
        from ed_twitter_spark.operators.canonicalize import (
            components_for,
            prior_triples,
        )
        from ed_twitter_spark.operators.similarity import _centroids_for

        # The IVF coarse quantizer (an index-build artifact: built once,
        # probed by every ANN query) reads only the embeddings table — it
        # is independent of the transcripts→KB→triples→CC chain, and its
        # k-means rounds are small driver-synchronous jobs that leave most
        # cores idle. Build it on a second thread so the scheduler
        # interleaves it with the chain (concurrent actions on one
        # SparkSession are supported; the two threads touch disjoint
        # shared-cache keys, and CPython dict ops are atomic).
        import threading

        ivf_err: list[Exception] = []

        def _build_ivf():
            try:
                _centroids_for(spark, sf_dir).count()
            except Exception as exc:  # surface, don't swallow
                ivf_err.append(exc)

        ivf_thread = threading.Thread(target=_build_ivf, daemon=True)
        ivf_thread.start()
        for df in (
            synth.transcripts(spark, sf_dir),
            synth.kb_alias(spark, sf_dir),
            prior_triples(spark, sf_dir),
            components_for(spark, sf_dir),
        ):
            df.count()
        ivf_thread.join()
        if ivf_err:
            raise ivf_err[0]
        timings["_shared_build"] = round(time.time() - t0, 3)
        for name in names:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            # force full execution without collecting rows to the driver
            cnt = df.count()
            timings[name] = round(time.time() - t0, 3)
            # release operator-internal persists (sketches, CC frontiers)
            # so cached blocks don't accumulate across queries
            release_caches()
            if name in {"link_prior_argmax", "link_embed"}:
                n_triples = max(n_triples, cnt)
    finally:
        synth.enable_shared_cache(False)
    return timings, n_triples


def host_probe() -> dict:
    """Pre-run contention probe, recorded into the bench JSON so rounds
    can be normalized: the 1-minute load average (work already queued on
    the host) and a fixed single-thread spin calibration (μs per 10^6
    fused multiply-adds in pure Python — rises when the host is busy or
    throttled). r4's committed bench read as a 40% regression until an
    independent quiet-window re-run showed host contention; these fields
    make that visible in the artifact itself."""
    import math

    la1, la5, la15 = os.getloadavg()
    t0 = time.perf_counter()
    x = 1.0
    for _ in range(1_000_000):
        x = x * 1.0000001 + 1e-9
    spin_us = (time.perf_counter() - t0) * 1e6
    return {
        "load_avg_1m": round(la1, 2),
        "load_avg_5m": round(la5, 2),
        "spin_1e6_us": round(spin_us, 1),
        "ncpu": os.cpu_count(),
        # crude contention flag: queued work exceeds half the cores
        "contended": bool(la1 > (os.cpu_count() or 1) / 2) or math.isnan(la1),
    }


def _warm(spark):
    """Warm JVM codegen AND the Python worker pool: the first pandas-UDF
    stage otherwise pays worker fork + numpy import once per core, billed
    to whichever query runs it (link_embed at the driver gate)."""
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    def _touch(it):
        import numpy  # noqa: F401  — preload into the reused worker

        for pdf in it:
            yield pdf

    (
        spark.range(0, CPUS * 4, 1, CPUS * 4)
        .mapInPandas(_touch, "id long")
        .count()
    )


def main():
    if "--scaling" in sys.argv:
        # delegate to the two-parallelism protocol (north-rule evidence);
        # default pairing 4→16 — see BENCH/BASELINE.md for why 8→32
        # saturates this host (tools/hw_scaling_probe.py)
        import subprocess

        args = [a for a in sys.argv[1:] if a != "--scaling"] or ["/root/testdata/sf0.1", "4", "16"]
        raise SystemExit(
            subprocess.call(
                [sys.executable, os.path.join(os.path.dirname(__file__), "tools", "scaling_bench.py"), *args]
            )
        )

    probe = host_probe()

    from ed_twitter_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS)
    _warm(spark)

    t0 = time.time()
    timings, n_triples = run(spark)
    total = round(time.time() - t0, 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    link_sec = timings.get("link_embed") or timings.get("link_prior_argmax") or total
    out = {
        "metric": "kg_pipeline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "triples": n_triples,
        "triples_per_sec": round(n_triples / link_sec, 1) if n_triples else 0,
        "cores": CPUS,
        "host_probe": probe,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
