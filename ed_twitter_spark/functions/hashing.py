"""Cross-engine deterministic hashing helpers.

Every hash used by the dedup/fingerprint operators must produce the *same
value* in Spark and in the DuckDB oracle, so everything is derived from
md5 hex prefixes (the only strong hash both engines share) converted to
int64 — the same trick the KB uses for entity ids (synth.ent_id_*).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h32_sql(expr: str) -> str:
    """DuckDB: first 8 md5 hex digits of ``expr`` as BIGINT in [0, 2^32)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def h32_col(col: Column) -> Column:
    """Spark twin of :func:`h32_sql`."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# tokenization shared by the corpus operators: whitespace split, as both
# engines express identically (string_split_regex / F.split on \s+)
TOKS_SQL = r"string_split_regex(text, '\s+')"


def toks_col() -> Column:
    return F.split("text", r"\s+")
