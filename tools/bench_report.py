"""Per-query bench regression table.

Keeps `BENCH/history.json` ({round: {query: sec, "_total": sec, ...}})
and renders `BENCH/QUERIES.md` with one column per round plus a delta
column vs the previous round, so every round's bench shows per-query
movement, not just the total.

Usage:
    python tools/bench_report.py record <round> <bench_json_path_or_->
    python tools/bench_report.py render
`record` accepts either a BENCH_r{N}.json driver artifact (with a
"parsed" envelope) or the raw one-line JSON bench.py prints.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HISTORY = os.path.join(ROOT, "BENCH", "history.json")
OUT = os.path.join(ROOT, "BENCH", "QUERIES.md")


def _load_history() -> dict:
    if os.path.exists(HISTORY):
        with open(HISTORY) as f:
            return json.load(f)
    return {}


def record(round_key: str, src: str) -> None:
    raw = sys.stdin.read() if src == "-" else open(src).read()
    data = json.loads(raw)
    if "parsed" in data:
        data = data["parsed"]
    hist = _load_history()
    hist[round_key] = {
        "_total": data["value"],
        "_triples_per_sec": data.get("triples_per_sec"),
        **data["queries"],
    }
    os.makedirs(os.path.dirname(HISTORY), exist_ok=True)
    with open(HISTORY, "w") as f:
        json.dump(hist, f, indent=1, sort_keys=True)
    render()


def render() -> None:
    hist = _load_history()
    rounds = sorted(hist)
    queries: list[str] = []
    for r in rounds:
        for q in hist[r]:
            if not q.startswith("_") and q not in queries:
                queries.append(q)

    lines = [
        "# BENCH — per-query regression table",
        "",
        "Seconds per headline query per round (sf0.1, local[32]); Δ is the",
        "last round vs the one before (negative = faster).",
        "",
        "| query | " + " | ".join(rounds) + " | Δ last |",
        "|---|" + "---|" * (len(rounds) + 1),
    ]

    def _fmt(v):
        return f"{v:.2f}" if isinstance(v, (int, float)) else "—"

    def _row(name, key):
        vals = [hist[r].get(key) for r in rounds]
        delta = "—"
        if len(vals) >= 2 and vals[-1] is not None and vals[-2] is not None:
            delta = f"{vals[-1] - vals[-2]:+.2f}"
        return f"| {name} | " + " | ".join(_fmt(v) for v in vals) + f" | {delta} |"

    for q in queries:
        lines.append(_row(q, q))
    lines.append(_row("shared build (within total)", "_shared_build"))
    lines.append(_row("**total**", "_total"))
    lines.append(_row("triples/sec", "_triples_per_sec"))
    lines.append("")
    lines.append(
        "Measurement caveat: this sandbox's vCPUs share a hypervisor host —"
    )
    lines.append(
        "identical code re-benchmarked under host contention has measured 2-3×"
    )
    lines.append(
        "slower wall-clock across every query. Rounds are recorded from"
    )
    lines.append(
        "quiet-host windows; compare rounds, not absolute seconds, and see"
    )
    lines.append("BENCH/BASELINE.md for the multi-run variance analysis.")
    # preserve hand-written per-round note bullets across re-renders
    # (everything from the first "- **r" line of the existing file on)
    if os.path.exists(OUT):
        old = open(OUT).read().splitlines()
        for i, line in enumerate(old):
            if line.startswith("- **r"):
                lines.extend(old[i:])
                break
    lines.append("")
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "record":
        record(sys.argv[2], sys.argv[3])
    else:
        render()
