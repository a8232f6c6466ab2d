"""Tracked persist: operators persist mid-plan frames (sketches,
fingerprints, CC frontiers) that are read by 2+ downstream branches, but
the terminal action runs *outside* the operator — in the driver gate,
bench harness, or a test — so the operator itself has nowhere to
unpersist. Every persist goes through :func:`persist_tracked`; harnesses
call :func:`release_caches` after each query's action so cached blocks
do not accumulate across operator invocations in a long-lived session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register for a later harness-level release."""
    df.persist()
    _PERSISTED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked frame (LIFO); returns how many released."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
