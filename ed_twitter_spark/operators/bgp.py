"""SPARQL-style basic-graph-pattern (BGP) queries over the constructed KG.

The consumer surface of a KG-construction engine: declare a conjunction
of triple patterns with shared variables and get the distinct bound
variable tuples back. The reference builds the KG (entity links per
mention) but ships no pattern-query layer; this module supplies the
standard consumption path, re-expressed Spark-first the way published
Spark SPARQL engines (S2RDF, SPARQLGX) compile BGPs:

- the KG is exposed as ONE (s, p, o) triple view (`kg_triple_store`) —
  typed link facts plus the structural provenance predicates that make
  multi-hop patterns possible;
- each pattern becomes a filtered scan of that view, with constant
  terms as equality predicates — Catalyst pushes them into the parquet
  scan, so a pattern with a constant predicate reads only its slice;
- patterns join on their shared variables (hash equi-joins);
- join ORDER is greedy most-constants-first, then connected-only: the
  most selective pattern anchors the plan and every subsequent join
  shares ≥1 variable with what's already bound, so the compiler never
  emits a cartesian product. At runtime AQE broadcasts whichever
  filtered pattern scans turn out small and re-plans skewed joins —
  the compiler stays declarative and lets the optimizer pick physical
  strategies, which is exactly what survives a 100-TB triple table.

Result semantics are SPARQL ``SELECT DISTINCT``: set projection over the
requested variables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS = ("s", "p", "o")


def kg_triple_store(typed_edges: DataFrame) -> DataFrame:
    """The canonical KG as one string (s, p, o) triple table.

    Three predicate families from the typed edge set
    (``kg_typed_edges``: subj = mention id, pred = role/tool-typed link,
    obj_vertex = canonical entity vertex):

      (mention_id, mentioned_by_<role>|mentioned_in_<tool>, vertex)
      (mention_id, in_conv, conv_id)
      (conv_id, mentions, vertex)            -- distinct

    Vertex labels ('e:...'/'m:...'), mention ids ('<conv>#<turn>#<idx>')
    and conv ids ('conv_...') live in disjoint namespaces, so one string
    object column is unambiguous. The two mention-subject families are
    column re-selections of the same scan (no shuffle); the
    conversation-level family is one distinct on (conv_id, vertex) —
    at scale a map-side-combined aggregate keyed far below the edge
    count. Plan shape: union of three projections of ONE edge scan.
    """
    e = typed_edges.where(F.col("obj_vertex").isNotNull())
    link = e.select(
        F.col("subj").alias("s"), F.col("pred").alias("p"),
        F.col("obj_vertex").alias("o"),
    )
    prov = e.select(
        F.col("subj").alias("s"), F.lit("in_conv").alias("p"),
        F.col("conv_id").alias("o"),
    )
    conv = (
        e.select(
            F.col("conv_id").alias("s"), F.lit("mentions").alias("p"),
            F.col("obj_vertex").alias("o"),
        )
        .distinct()
    )
    return link.unionByName(prov).unionByName(conv)


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _pattern_scan(triples: DataFrame, pattern: tuple[str, str, str]) -> tuple[DataFrame, set[str]]:
    """One pattern → a filtered scan projected to its variable columns."""
    cond = F.lit(True)
    var_cols: dict[str, str] = {}  # var name -> first position bound
    for pos, term in zip(_POS, pattern):
        if _is_var(term):
            v = term[1:]
            if v in var_cols:  # repeated var inside one pattern: (?x, p, ?x)
                cond = cond & (F.col(pos) == F.col(var_cols[v]))
            else:
                var_cols[v] = pos
        else:
            cond = cond & (F.col(pos) == F.lit(term))
    scan = triples.where(cond).select(
        *[F.col(pos).alias(v) for v, pos in var_cols.items()]
    )
    return scan, set(var_cols)


def _compile_group(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    filters: list[str] | None = None,
) -> tuple[DataFrame, set[str]]:
    """Compile one connected pattern group to (joined DataFrame, bound vars).

    Greedy join order: anchor on the most-constant (most selective)
    pattern; then always extend with a pattern sharing a bound variable,
    preferring more constants then more shared variables. FILTER
    expressions (Spark SQL booleans over variable names) apply after the
    group's joins — Catalyst pushes each down to the earliest scan whose
    columns it references, the same compilation S2RDF-style engines use.
    """
    if not patterns:
        raise ValueError("empty basic graph pattern")
    scans = [_pattern_scan(triples, pat) for pat in patterns]
    n_const = [3 - len(vs) for _, vs in scans]
    remaining = list(range(len(scans)))
    remaining.sort(key=lambda i: (-n_const[i], i))
    first = remaining.pop(0)
    acc, bound = scans[first]
    bound = set(bound)
    while remaining:
        best = None
        for i in remaining:
            shared = scans[i][1] & bound
            if shared:
                key = (-n_const[i], -len(shared), i)
                if best is None or key < best[0]:
                    best = (key, i, shared)
        if best is None:
            raise ValueError(
                "disconnected basic graph pattern: no shared variable "
                f"between bound {sorted(bound)} and remaining patterns"
            )
        _, i, shared = best
        remaining.remove(i)
        acc = acc.join(scans[i][0], on=sorted(shared), how="inner")
        bound |= scans[i][1]
    for expr in filters or []:
        acc = acc.where(F.expr(expr))
    return acc, bound


def bgp_query(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    select: list[str] | None = None,
    filters: list[str] | None = None,
    optional: list[tuple[str, str, str]] | None = None,
    optional_filters: list[str] | None = None,
    minus: list[tuple[str, str, str]] | None = None,
    minus_filters: list[str] | None = None,
    exists: list[tuple[str, str, str]] | None = None,
    exists_filters: list[str] | None = None,
    not_exists: list[tuple[str, str, str]] | None = None,
    not_exists_filters: list[str] | None = None,
    order_by: list[str] | None = None,
    limit: int | None = None,
    offset: int | None = None,
) -> DataFrame:
    """Match a conjunction of triple patterns; return DISTINCT bindings.

    ``patterns``: (s, p, o) terms; a term starting with ``?`` is a
    variable, anything else is a constant. ``select``: variable names
    (without ``?``) to project; default = every variable in first-
    appearance order. Disconnected pattern sets (a join with no shared
    variable — a cartesian product) are rejected with ``ValueError``.

    SPARQL extensions:

    * ``filters`` — FILTER clauses over the required group: Spark SQL
      boolean expression strings over variable names (e.g.
      ``"pt LIKE 'mentioned_in_%'"``).
    * ``optional`` / ``optional_filters`` — one OPTIONAL group: compiled
      independently (its own greedy join order, its own filters — SPARQL
      scopes a FILTER inside the OPTIONAL braces to that group), then
      LEFT-joined to the required group on their shared variables; its
      exclusive variables come back NULL where the group found no match.
      The optional group must share ≥1 variable with the required group
      (checked), so the left join is an equi-join, never a cross.
    * ``minus`` / ``minus_filters`` — SPARQL MINUS: solutions whose
      bindings on the SHARED variables also satisfy the minus group are
      removed — compiled to a left anti-join on those variables. The
      spec's quirk is preserved: a minus group sharing NO variable with
      the required group removes nothing (every solution is trivially
      incompatible), rather than erroring like a disconnected join.
    * ``exists`` / ``not_exists`` (+ ``_filters``) — SPARQL
      ``FILTER (NOT) EXISTS``: a solution survives iff the group, with
      the solution's shared-variable bindings substituted, has ≥1 (resp.
      0) matches — a LEFT SEMI (resp. LEFT ANTI) join on the shared
      variables. Where MINUS with NO shared variable removes nothing,
      a disjoint EXISTS is a SCALAR gate (SPARQL 1.1 §8.1.1 vs §8.3.3 —
      the classic divergence case): all solutions survive iff the group
      matches anything at all, so the compiler joins on a constant key
      against the group's first row — one broadcast of ≤1 row.
    * ``order_by`` / ``limit`` / ``offset`` — SPARQL solution modifiers,
      applied in spec order (ORDER BY → OFFSET → LIMIT) AFTER the
      DISTINCT projection. ``order_by`` entries are variable names,
      ``-var`` for DESC. ORDER BY+LIMIT compiles to Spark's
      TakeOrderedAndProject: each partition keeps its own top
      (offset+limit) rows and only those reach the driver-side merge —
      no global sort of the full solution set, which is what makes a
      top-k over a 10^12-triple match affordable. For a deterministic
      result the order keys must totally order the solutions (pass every
      projected variable); a partial order leaves tie-breaking
      engine-defined, as in SPARQL itself.
    """
    acc, bound = _compile_group(triples, patterns, filters)

    all_vars: list[str] = []
    seen: set[str] = set()
    for pat in patterns + (optional or []):
        for term in pat:
            if _is_var(term) and term[1:] not in seen:
                seen.add(term[1:])
                all_vars.append(term[1:])

    if optional:
        opt, opt_bound = _compile_group(triples, optional, optional_filters)
        shared = sorted(opt_bound & bound)
        if not shared:
            raise ValueError(
                "OPTIONAL group shares no variable with the required group"
            )
        acc = acc.join(opt, on=shared, how="left")
        bound |= opt_bound

    if minus:
        mg, mg_bound = _compile_group(triples, minus, minus_filters)
        shared = sorted(mg_bound & bound)
        if shared:  # disjoint MINUS removes nothing (SPARQL 1.1 §8.3.3)
            acc = acc.join(mg.select(*shared).distinct(), on=shared, how="left_anti")

    for grp, flt, how in (
        (exists, exists_filters, "left_semi"),
        (not_exists, not_exists_filters, "left_anti"),
    ):
        if not grp:
            continue
        eg, eg_bound = _compile_group(triples, grp, flt)
        shared = sorted(eg_bound & bound)
        if shared:
            acc = acc.join(eg.select(*shared).distinct(), on=shared, how=how)
        else:
            # disjoint (NOT) EXISTS is a scalar gate, not a no-op like MINUS
            probe = F.broadcast(eg.limit(1).select(F.lit(1).alias("_probe")))
            acc = (
                acc.withColumn("_probe", F.lit(1))
                .join(probe, on="_probe", how=how)
                .drop("_probe")
            )

    out = select if select is not None else all_vars
    missing = [v for v in out if v not in bound]
    if missing:
        raise ValueError(f"select variables not bound by any pattern: {missing}")
    res = acc.select(*out).distinct()
    if order_by:
        bad = [v.lstrip("-") for v in order_by if v.lstrip("-") not in out]
        if bad:
            raise ValueError(f"order_by variables not in the projection: {bad}")
        res = res.orderBy(
            *[
                F.col(v[1:]).desc() if v.startswith("-") else F.col(v).asc()
                for v in order_by
            ]
        )
    if offset:
        res = res.offset(offset)
    if limit is not None:
        res = res.limit(limit)
    return res


# ---------------------------------------------------------------------------
# Gate query: the cross-channel entity pattern
# ---------------------------------------------------------------------------

# "Conversations where the SAME canonical entity was mentioned both by
# the user and inside a search tool call" — the archetypal multi-hop
# consumer question over this KG, as a 4-pattern BGP with two join
# variables (?e through the link patterns, ?c through the provenance
# patterns):
BGP_DEMO_PATTERNS = [
    ("?m1", "mentioned_by_user", "?e"),
    ("?m2", "mentioned_in_search", "?e"),
    ("?m1", "in_conv", "?c"),
    ("?m2", "in_conv", "?c"),
]


def kg_bgp_query(spark, sf_dir: str) -> DataFrame:
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators import graph as graph_ops

    typed = graph_ops.kg_typed_edges(
        graph_ops.q_kg_edges(spark, sf_dir), synth.transcripts(spark, sf_dir)
    )
    # In production the triple store is a materialized table and every
    # pattern is a pushed-filter scan of it; checkpoint here so the four
    # pattern branches scan one materialization instead of re-deriving
    # the typed-edge build per branch.
    return bgp_query(
        kg_triple_store(typed).localCheckpoint(), BGP_DEMO_PATTERNS, select=["c", "e"]
    )


def kg_bgp_query_oracle_sql() -> str:
    """DuckDB twin: the same BGP hand-compiled to SQL self-joins over a
    trip CTE mirroring kg_triple_store (link + in_conv + mentions)."""
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators.graph import _kg_edges_named_sql

    return (
        _kg_edges_named_sql()
        + f""",
tr AS ({synth.TRANSCRIPTS_SQL}),
typed AS (
  SELECT k.subj,
         CASE WHEN t.tool IS NOT NULL THEN 'mentioned_in_' || t.tool
              ELSE 'mentioned_by_' || t.role END AS pred,
         k.obj_vertex, k.conv_id
  FROM kge k JOIN tr t ON t.conv_id = k.conv_id AND t.turn_idx = k.turn_idx
  WHERE k.obj_vertex IS NOT NULL
),
trip AS (
  SELECT subj AS s, pred AS p, obj_vertex AS o FROM typed
  UNION ALL
  SELECT subj AS s, 'in_conv' AS p, conv_id AS o FROM typed
  UNION ALL
  SELECT DISTINCT conv_id AS s, 'mentions' AS p, obj_vertex AS o FROM typed
)
SELECT DISTINCT p3.o AS c, p1.o AS e
FROM trip p1
JOIN trip p2 ON p2.p = 'mentioned_in_search' AND p2.o = p1.o
JOIN trip p3 ON p3.p = 'in_conv' AND p3.s = p1.s
JOIN trip p4 ON p4.p = 'in_conv' AND p4.s = p2.s AND p4.o = p3.o
WHERE p1.p = 'mentioned_by_user'
"""
    )


def kg_bgp_topk(spark, sf_dir: str) -> DataFrame:
    """Gate query for the solution modifiers: the demo BGP paged with
    ORDER BY c ASC, e DESC OFFSET 2 LIMIT 5. The two order keys are the
    whole projection, so the page is totally ordered → value-exact
    cross-engine; the Spark plan is TakeOrderedAndProject (per-partition
    top-7, no global sort)."""
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators import graph as graph_ops

    typed = graph_ops.kg_typed_edges(
        graph_ops.q_kg_edges(spark, sf_dir), synth.transcripts(spark, sf_dir)
    )
    return bgp_query(
        kg_triple_store(typed).localCheckpoint(),
        BGP_DEMO_PATTERNS,
        select=["c", "e"],
        order_by=["c", "-e"],
        limit=5,
        offset=2,
    )


def kg_bgp_topk_oracle_sql() -> str:
    return (
        kg_bgp_query_oracle_sql()
        + "ORDER BY c ASC, e DESC LIMIT 5 OFFSET 2\n"
    )


def bgp_ask(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    filters: list[str] | None = None,
) -> DataFrame:
    """SPARQL ASK: one (matched boolean) row — does any solution exist?

    Compiled as the BGP plan capped by LIMIT 1: Spark stops the scan at
    the first produced row (CollectLimit short-circuit), so an ASK over a
    10^12-triple store that matches early reads a few partitions, not the
    table. The count(limit 1) > 0 trick keeps it one job and
    oracle-comparable as a value."""
    acc, _ = _compile_group(triples, patterns, filters)
    probe = acc.limit(1).agg(F.count(F.lit(1)).alias("n"))
    return probe.select((F.col("n") > 0).alias("matched"))


def kg_bgp_ask(spark, sf_dir: str) -> DataFrame:
    """Gate query: two ASKs union-ed — the demo cross-channel pattern
    (expected true) and an impossible predicate (expected false), so the
    gate pins both branches of the boolean."""
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators import graph as graph_ops

    typed = graph_ops.kg_typed_edges(
        graph_ops.q_kg_edges(spark, sf_dir), synth.transcripts(spark, sf_dir)
    )
    store = kg_triple_store(typed).localCheckpoint()
    yes = bgp_ask(store, BGP_DEMO_PATTERNS)
    no = bgp_ask(store, [("?m", "mentioned_by_nobody", "?e")])
    return yes.select(F.lit("demo").alias("ask"), "matched").unionByName(
        no.select(F.lit("impossible").alias("ask"), "matched")
    )


def kg_bgp_ask_oracle_sql() -> str:
    # reuse the demo twin's CTE prefix (kge/typed/trip) and turn its final
    # SELECT into a named solution set; both ASK branches are then real
    # EXISTS probes over the same store — nothing is hardcoded
    head, tail = kg_bgp_query_oracle_sql().rsplit("SELECT DISTINCT", 1)
    return (
        head.rstrip().rstrip(",")
        + ",\ndemo AS (\nSELECT DISTINCT"
        + tail
        + """)
SELECT 'demo' AS ask, EXISTS(SELECT 1 FROM demo) AS matched
UNION ALL
SELECT 'impossible' AS ask,
       EXISTS(SELECT 1 FROM trip WHERE p = 'mentioned_by_nobody') AS matched
"""
    )


# ---------------------------------------------------------------------------
# Gate query: OPTIONAL + FILTER + a predicate variable
# ---------------------------------------------------------------------------

# "Every (conversation, entity) the user mentioned — and, IF the same
# entity also surfaced inside a tool call in that conversation, which
# tool predicate it was": the canonical OPTIONAL use (keep the required
# bindings even when the enrichment is absent). The optional group binds
# the PREDICATE position to a variable and restricts it with a FILTER,
# scoped inside the group as SPARQL scopes braces.
BGP_OPT_REQUIRED = [
    ("?m1", "mentioned_by_user", "?e"),
    ("?m1", "in_conv", "?c"),
]
BGP_OPT_GROUP = [
    ("?m2", "?pt", "?e"),
    ("?m2", "in_conv", "?c"),
]
BGP_OPT_FILTERS = ["pt LIKE 'mentioned_in_%'"]


def kg_bgp_optional(spark, sf_dir: str) -> DataFrame:
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators import graph as graph_ops

    typed = graph_ops.kg_typed_edges(
        graph_ops.q_kg_edges(spark, sf_dir), synth.transcripts(spark, sf_dir)
    )
    out = bgp_query(
        kg_triple_store(typed).localCheckpoint(),
        BGP_OPT_REQUIRED,
        select=["c", "e", "pt"],
        optional=BGP_OPT_GROUP,
        optional_filters=BGP_OPT_FILTERS,
    )
    # NULL-free gate projection: absent OPTIONAL binding -> 'none'
    # (no predicate value collides with it)
    return out.select("c", "e", F.coalesce("pt", F.lit("none")).alias("pt"))


def kg_bgp_optional_oracle_sql() -> str:
    """DuckDB twin: required self-join LEFT JOIN the hand-compiled
    optional group (filter applied inside the subquery, as SPARQL scopes
    a FILTER inside OPTIONAL braces)."""
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators.graph import _kg_edges_named_sql

    return (
        _kg_edges_named_sql()
        + f""",
tr AS ({synth.TRANSCRIPTS_SQL}),
typed AS (
  SELECT k.subj,
         CASE WHEN t.tool IS NOT NULL THEN 'mentioned_in_' || t.tool
              ELSE 'mentioned_by_' || t.role END AS pred,
         k.obj_vertex, k.conv_id
  FROM kge k JOIN tr t ON t.conv_id = k.conv_id AND t.turn_idx = k.turn_idx
  WHERE k.obj_vertex IS NOT NULL
),
trip AS (
  SELECT subj AS s, pred AS p, obj_vertex AS o FROM typed
  UNION ALL
  SELECT subj AS s, 'in_conv' AS p, conv_id AS o FROM typed
  UNION ALL
  SELECT DISTINCT conv_id AS s, 'mentions' AS p, obj_vertex AS o FROM typed
)
SELECT DISTINCT r2.o AS c, r1.o AS e, COALESCE(op.pt, 'none') AS pt
FROM trip r1
JOIN trip r2 ON r2.p = 'in_conv' AND r2.s = r1.s
LEFT JOIN (
  SELECT o1.o AS e, o2.o AS c, o1.p AS pt
  FROM trip o1
  JOIN trip o2 ON o2.p = 'in_conv' AND o2.s = o1.s
  WHERE o1.p LIKE 'mentioned_in_%'
) op ON op.e = r1.o AND op.c = r2.o
WHERE r1.p = 'mentioned_by_user'
"""
    )


# ---------------------------------------------------------------------------
# UNION: alternative pattern groups
# ---------------------------------------------------------------------------


def bgp_union(
    triples: DataFrame,
    branches: list[dict],
    select: list[str],
) -> DataFrame:
    """SPARQL UNION: evaluate alternative groups, set-union the bindings.

    ``branches``: keyword dicts for :func:`bgp_query` (``patterns``
    required; ``filters`` / ``optional`` / ``optional_filters`` allowed
    per branch). ``select`` is mandatory and every branch must bind all
    of it — SPARQL lets branches return disjoint variables with NULL
    padding, but an explicit shared projection keeps results rectangular
    and is what consumers actually union. Compilation is the obvious
    one: each branch is its own join tree, then ``unionByName`` +
    ``distinct`` — at scale the union is free (no shuffle; the final
    distinct is the same exchange ``bgp_query`` already paid per branch,
    now shared across branches).
    """
    if not branches:
        raise ValueError("empty UNION: no branches")
    if not select:
        raise ValueError("UNION requires an explicit select list")
    parts = [bgp_query(triples, select=select, **b) for b in branches]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


# Gate query: "every (conversation, entity) pair where the entity was
# mentioned by the user OR surfaced inside any tool call" — the two
# acquisition channels as UNION branches (the second one predicate-
# variable + FILTER, so this exercises filters inside a branch).
BGP_UNION_BRANCHES = [
    {"patterns": [("?m", "mentioned_by_user", "?e"), ("?m", "in_conv", "?c")]},
    {
        "patterns": [("?m", "?pt", "?e"), ("?m", "in_conv", "?c")],
        "filters": ["pt LIKE 'mentioned_in_%'"],
    },
]


def kg_bgp_union(spark, sf_dir: str) -> DataFrame:
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators import graph as graph_ops

    typed = graph_ops.kg_typed_edges(
        graph_ops.q_kg_edges(spark, sf_dir), synth.transcripts(spark, sf_dir)
    )
    return bgp_union(
        kg_triple_store(typed).localCheckpoint(),
        BGP_UNION_BRANCHES,
        select=["c", "e"],
    )


def kg_bgp_union_oracle_sql() -> str:
    """DuckDB twin: the two branches hand-compiled and UNIONed (SQL UNION
    is already set semantics, matching the final distinct)."""
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators.graph import _kg_edges_named_sql

    return (
        _kg_edges_named_sql()
        + f""",
tr AS ({synth.TRANSCRIPTS_SQL}),
typed AS (
  SELECT k.subj,
         CASE WHEN t.tool IS NOT NULL THEN 'mentioned_in_' || t.tool
              ELSE 'mentioned_by_' || t.role END AS pred,
         k.obj_vertex, k.conv_id
  FROM kge k JOIN tr t ON t.conv_id = k.conv_id AND t.turn_idx = k.turn_idx
  WHERE k.obj_vertex IS NOT NULL
),
trip AS (
  SELECT subj AS s, pred AS p, obj_vertex AS o FROM typed
  UNION ALL
  SELECT subj AS s, 'in_conv' AS p, conv_id AS o FROM typed
  UNION ALL
  SELECT DISTINCT conv_id AS s, 'mentions' AS p, obj_vertex AS o FROM typed
)
SELECT c2.o AS c, b1.o AS e
FROM trip b1 JOIN trip c2 ON c2.p = 'in_conv' AND c2.s = b1.s
WHERE b1.p = 'mentioned_by_user'
UNION
SELECT c2.o AS c, b2.o AS e
FROM trip b2 JOIN trip c2 ON c2.p = 'in_conv' AND c2.s = b2.s
WHERE b2.p LIKE 'mentioned_in_%'
"""
    )


# ---------------------------------------------------------------------------
# Gate query: MINUS (the complement of the OPTIONAL demo)
# ---------------------------------------------------------------------------

# "(conversation, entity) pairs the user mentioned where the entity did
# NOT also surface inside any tool call of that conversation" — the
# negation consumers actually run (find the un-verified claims).
BGP_MINUS_GROUP = [
    ("?m2", "?pt", "?e"),
    ("?m2", "in_conv", "?c"),
]


def kg_bgp_minus(spark, sf_dir: str) -> DataFrame:
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators import graph as graph_ops

    typed = graph_ops.kg_typed_edges(
        graph_ops.q_kg_edges(spark, sf_dir), synth.transcripts(spark, sf_dir)
    )
    return bgp_query(
        kg_triple_store(typed).localCheckpoint(),
        BGP_OPT_REQUIRED,
        select=["c", "e"],
        minus=BGP_MINUS_GROUP,
        minus_filters=BGP_OPT_FILTERS,
    )


def kg_bgp_minus_oracle_sql() -> str:
    """DuckDB twin: the required self-join with a NOT EXISTS over the
    hand-compiled minus group (filter scoped inside, as in the braces)."""
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators.graph import _kg_edges_named_sql

    return (
        _kg_edges_named_sql()
        + f""",
tr AS ({synth.TRANSCRIPTS_SQL}),
typed AS (
  SELECT k.subj,
         CASE WHEN t.tool IS NOT NULL THEN 'mentioned_in_' || t.tool
              ELSE 'mentioned_by_' || t.role END AS pred,
         k.obj_vertex, k.conv_id
  FROM kge k JOIN tr t ON t.conv_id = k.conv_id AND t.turn_idx = k.turn_idx
  WHERE k.obj_vertex IS NOT NULL
),
trip AS (
  SELECT subj AS s, pred AS p, obj_vertex AS o FROM typed
  UNION ALL
  SELECT subj AS s, 'in_conv' AS p, conv_id AS o FROM typed
  UNION ALL
  SELECT DISTINCT conv_id AS s, 'mentions' AS p, obj_vertex AS o FROM typed
)
SELECT DISTINCT r2.o AS c, r1.o AS e
FROM trip r1
JOIN trip r2 ON r2.p = 'in_conv' AND r2.s = r1.s
WHERE r1.p = 'mentioned_by_user'
  AND NOT EXISTS (
    SELECT 1 FROM trip o1 JOIN trip o2 ON o2.p = 'in_conv' AND o2.s = o1.s
    WHERE o1.p LIKE 'mentioned_in_%' AND o1.o = r1.o AND o2.o = r2.o
  )
"""
    )


# ---------------------------------------------------------------------------
# Gate query: FILTER EXISTS (correlated on the entity alone)
# ---------------------------------------------------------------------------

# "(conversation, entity) pairs the user mentioned where the SAME entity
# also surfaced inside a tool call in SOME conversation (not necessarily
# this one)" — the corroboration query. Deliberately correlates on ?e
# only, a narrower scope than the MINUS demo's (?e, ?c): EXISTS semi-joins
# exactly the shared variables, nothing more.
BGP_EXISTS_GROUP = [
    ("?m3", "?pt", "?e"),
]


def kg_bgp_exists(spark, sf_dir: str) -> DataFrame:
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators import graph as graph_ops

    typed = graph_ops.kg_typed_edges(
        graph_ops.q_kg_edges(spark, sf_dir), synth.transcripts(spark, sf_dir)
    )
    return bgp_query(
        kg_triple_store(typed).localCheckpoint(),
        BGP_OPT_REQUIRED,
        select=["c", "e"],
        exists=BGP_EXISTS_GROUP,
        exists_filters=BGP_OPT_FILTERS,
    )


def kg_bgp_exists_oracle_sql() -> str:
    """DuckDB twin: the required self-join with a correlated EXISTS over
    the hand-compiled exists group (correlation on ?e only)."""
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators.graph import _kg_edges_named_sql

    return (
        _kg_edges_named_sql()
        + f""",
tr AS ({synth.TRANSCRIPTS_SQL}),
typed AS (
  SELECT k.subj,
         CASE WHEN t.tool IS NOT NULL THEN 'mentioned_in_' || t.tool
              ELSE 'mentioned_by_' || t.role END AS pred,
         k.obj_vertex, k.conv_id
  FROM kge k JOIN tr t ON t.conv_id = k.conv_id AND t.turn_idx = k.turn_idx
  WHERE k.obj_vertex IS NOT NULL
),
trip AS (
  SELECT subj AS s, pred AS p, obj_vertex AS o FROM typed
  UNION ALL
  SELECT subj AS s, 'in_conv' AS p, conv_id AS o FROM typed
  UNION ALL
  SELECT DISTINCT conv_id AS s, 'mentions' AS p, obj_vertex AS o FROM typed
)
SELECT DISTINCT r2.o AS c, r1.o AS e
FROM trip r1
JOIN trip r2 ON r2.p = 'in_conv' AND r2.s = r1.s
WHERE r1.p = 'mentioned_by_user'
  AND EXISTS (
    SELECT 1 FROM trip o1
    WHERE o1.p LIKE 'mentioned_in_%' AND o1.o = r1.o
  )
"""
    )


# ---------------------------------------------------------------------------
# Aggregates: SELECT ?g (COUNT(DISTINCT ?v) AS ...) ... GROUP BY ?g
# ---------------------------------------------------------------------------


def bgp_aggregate(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    group_by: list[str],
    count_distinct: str,
    alias: str = "n",
    filters: list[str] | None = None,
) -> DataFrame:
    """SPARQL 1.1 aggregation in its safe DISTINCT form:
    ``SELECT ?g (COUNT(DISTINCT ?v) AS n) { ... } GROUP BY ?g``.

    Only COUNT(DISTINCT …) is offered: DISTINCT counting depends only on
    the solution SET, which the equi-join compilation reproduces exactly.
    Plain COUNT aggregates SPARQL's solution MULTISET, whose
    multiplicities this compiler does not track (joins may duplicate a
    solution wherever the spec would not) — offering it would be subtly
    wrong, so it raises instead via this restricted signature. At scale
    the aggregation is one map-side-combined exchange keyed by the
    grouping variables, on top of the same join plan `bgp_query` audits.
    """
    acc, bound = _compile_group(triples, patterns, filters)
    missing = [v for v in [*group_by, count_distinct] if v not in bound]
    if missing:
        raise ValueError(f"aggregate variables not bound by any pattern: {missing}")
    return acc.groupBy(*group_by).agg(
        F.countDistinct(count_distinct).alias(alias)
    )


def kg_bgp_aggregate(spark, sf_dir: str) -> DataFrame:
    """Gate query: distinct user-mentioned entities per conversation."""
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators import graph as graph_ops

    typed = graph_ops.kg_typed_edges(
        graph_ops.q_kg_edges(spark, sf_dir), synth.transcripts(spark, sf_dir)
    )
    return bgp_aggregate(
        kg_triple_store(typed).localCheckpoint(),
        BGP_OPT_REQUIRED,
        group_by=["c"],
        count_distinct="e",
        alias="n_entities",
    )


def kg_bgp_aggregate_oracle_sql() -> str:
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators.graph import _kg_edges_named_sql

    return (
        _kg_edges_named_sql()
        + f""",
tr AS ({synth.TRANSCRIPTS_SQL}),
typed AS (
  SELECT k.subj,
         CASE WHEN t.tool IS NOT NULL THEN 'mentioned_in_' || t.tool
              ELSE 'mentioned_by_' || t.role END AS pred,
         k.obj_vertex, k.conv_id
  FROM kge k JOIN tr t ON t.conv_id = k.conv_id AND t.turn_idx = k.turn_idx
  WHERE k.obj_vertex IS NOT NULL
),
trip AS (
  SELECT subj AS s, pred AS p, obj_vertex AS o FROM typed
  UNION ALL
  SELECT subj AS s, 'in_conv' AS p, conv_id AS o FROM typed
  UNION ALL
  SELECT DISTINCT conv_id AS s, 'mentions' AS p, obj_vertex AS o FROM typed
)
SELECT r2.o AS c, CAST(COUNT(DISTINCT r1.o) AS BIGINT) AS n_entities
FROM trip r1
JOIN trip r2 ON r2.p = 'in_conv' AND r2.s = r1.s
WHERE r1.p = 'mentioned_by_user'
GROUP BY r2.o
"""
    )


# ---------------------------------------------------------------------------
# shared oracle scaffold for the extensions below
# ---------------------------------------------------------------------------


def _trip_sql() -> str:
    """The typed-edge → (s,p,o) triple-store CTE block every BGP oracle
    shares (``kge`` + transcripts join + the three-projection union),
    mirroring :func:`kg_triple_store` over :func:`kg_typed_edges`."""
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators.graph import _kg_edges_named_sql

    return (
        _kg_edges_named_sql()
        + f""",
tr AS ({synth.TRANSCRIPTS_SQL}),
typed AS (
  SELECT k.subj,
         CASE WHEN t.tool IS NOT NULL THEN 'mentioned_in_' || t.tool
              ELSE 'mentioned_by_' || t.role END AS pred,
         k.obj_vertex, k.conv_id
  FROM kge k JOIN tr t ON t.conv_id = k.conv_id AND t.turn_idx = k.turn_idx
  WHERE k.obj_vertex IS NOT NULL
),
trip AS MATERIALIZED (
  SELECT subj AS s, pred AS p, obj_vertex AS o FROM typed
  UNION ALL
  SELECT subj AS s, 'in_conv' AS p, conv_id AS o FROM typed
  UNION ALL
  SELECT DISTINCT conv_id AS s, 'mentions' AS p, obj_vertex AS o FROM typed
)"""
    )


def _gate_triples(spark, sf_dir: str) -> DataFrame:
    """The checkpointed triple store every BGP gate query scans."""
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators import graph as graph_ops

    typed = graph_ops.kg_typed_edges(
        graph_ops.q_kg_edges(spark, sf_dir), synth.transcripts(spark, sf_dir)
    )
    return kg_triple_store(typed).localCheckpoint()


# ---------------------------------------------------------------------------
# VoID statistics: the per-predicate profile a SPARQL optimizer plans from
# ---------------------------------------------------------------------------


def kg_void_stats(spark, sf_dir: str) -> DataFrame:
    """(p, n_triples, n_subj, n_obj, out_fanout, in_fanout) — VoID-style
    property-partition statistics of the triple store (W3C VoID
    ``void:propertyPartition`` / ``void:triples`` / ``void:distinctSubjects``):
    per predicate, the triple count, distinct subjects/objects, and the
    average out/in fanout. These are exactly the cardinalities the BGP
    compiler's greedy join order (and any cost-based SPARQL planner —
    S2RDF's ExtVP selectivities) reads before picking an anchor pattern.

    Plan shape: ONE aggregation over the triple scan keyed by predicate.
    Predicates are few and hot, so the distinct counts matter: Catalyst
    plans COUNT(DISTINCT x) via expand + two-phase aggregation with
    map-side partial dedup, so the hot keys ship deduplicated partials,
    not raw triple streams — the same regime as the gopher/text rollups.
    """
    return void_stats(_gate_triples(spark, sf_dir))


def void_stats(trips: DataFrame) -> DataFrame:
    """The per-predicate profile over any (s, p, o) frame — the core
    ``kg_void_stats`` wraps for the gate's triple store."""
    agg = trips.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("s").alias("n_subj"),
        F.countDistinct("o").alias("n_obj"),
    )
    return agg.select(
        "p",
        "n_triples",
        "n_subj",
        "n_obj",
        F.round(F.col("n_triples") / F.col("n_subj"), 6).alias("out_fanout"),
        F.round(F.col("n_triples") / F.col("n_obj"), 6).alias("in_fanout"),
    )


def kg_void_stats_oracle_sql() -> str:
    return (
        _trip_sql()
        + """
SELECT p, CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(COUNT(DISTINCT s) AS BIGINT) AS n_subj,
       CAST(COUNT(DISTINCT o) AS BIGINT) AS n_obj,
       ROUND(COUNT(*) * 1.0 / COUNT(DISTINCT s), 6) AS out_fanout,
       ROUND(COUNT(*) * 1.0 / COUNT(DISTINCT o), 6) AS in_fanout
FROM trip GROUP BY p
"""
    )


# ---------------------------------------------------------------------------
# CONSTRUCT: BGP match → new triples (the KG *rewriting* surface)
# ---------------------------------------------------------------------------


def bgp_construct(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    template: list[tuple[str, str, str]],
    filters: list[str] | None = None,
) -> DataFrame:
    """SPARQL ``CONSTRUCT { template } WHERE { patterns FILTER ... }``.

    Matches the BGP exactly like :func:`bgp_query`, then instantiates
    every template triple per solution and returns the DISTINCT (s, p, o)
    set — CONSTRUCT output is an RDF *graph*, i.e. a triple set, so the
    final distinct is the spec, not a convenience. Template terms are
    variables (must be bound by the patterns) or constants (typically the
    new predicate being minted). Multiple template triples compile to
    column re-selections of ONE matched solution frame — the join plan is
    paid once, the per-triple projections are free, and the single final
    distinct is one exchange keyed by (s, p, o).

    This is how derived edges enter the KG at scale: match a pattern,
    mint a predicate, append the constructed graph to the triple store
    (cf. SPARQL 1.1 §10.2; the reference has no query layer at all —
    SURVEY §2.11's consumer-surface family).
    """
    acc, bound = _compile_group(triples, patterns, filters)
    parts: list[DataFrame] = []
    for pat in template:
        cols = []
        for pos, term in zip(_POS, pat):
            if _is_var(term):
                v = term[1:]
                if v not in bound:
                    raise ValueError(f"template variable ?{v} not bound")
                cols.append(F.col(v).alias(pos))
            else:
                cols.append(F.lit(term).alias(pos))
        parts.append(acc.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


# Gate query: mint the symmetric entity co-mention relation — the classic
# CONSTRUCT (derive an entity-entity edge from two conv-entity hops).
BGP_CONSTRUCT_PATTERNS = [
    ("?c", "mentions", "?e1"),
    ("?c", "mentions", "?e2"),
]
BGP_CONSTRUCT_FILTERS = ["e1 < e2"]
BGP_CONSTRUCT_TEMPLATE = [
    ("?e1", "co_mentioned_with", "?e2"),
    ("?e2", "co_mentioned_with", "?e1"),
]


def kg_bgp_construct(spark, sf_dir: str) -> DataFrame:
    return bgp_construct(
        _gate_triples(spark, sf_dir),
        BGP_CONSTRUCT_PATTERNS,
        BGP_CONSTRUCT_TEMPLATE,
        filters=BGP_CONSTRUCT_FILTERS,
    )


def kg_bgp_construct_oracle_sql() -> str:
    """DuckDB twin: the pattern self-join instantiated for both template
    directions, UNION (set) for the CONSTRUCT graph semantics."""
    return (
        _trip_sql()
        + """
SELECT t1.o AS s, 'co_mentioned_with' AS p, t2.o AS o
FROM trip t1 JOIN trip t2 ON t2.p = 'mentions' AND t2.s = t1.s
WHERE t1.p = 'mentions' AND t1.o < t2.o
UNION
SELECT t2.o AS s, 'co_mentioned_with' AS p, t1.o AS o
FROM trip t1 JOIN trip t2 ON t2.p = 'mentions' AND t2.s = t1.s
WHERE t1.p = 'mentions' AND t1.o < t2.o
"""
    )


# ---------------------------------------------------------------------------
# Property paths: sequence / inverse / reflexive-transitive closure
# ---------------------------------------------------------------------------

PATH_MAX_HOPS = 3  # closure iteration bound for the gate query


def _path_atom(triples: DataFrame, atom: str) -> DataFrame:
    """One path atom → its (src, dst) pair set. ``p`` walks a predicate
    forward, ``^p`` walks it inverted (SPARQL 1.1 §9.1 ``iri`` / ``^elt``).
    Each atom is a pushed-filter scan of the triple store — constant
    predicate, two-column projection."""
    if atom.startswith("^"):
        return triples.where(F.col("p") == atom[1:]).select(
            F.col("o").alias("src"), F.col("s").alias("dst")
        )
    return triples.where(F.col("p") == atom).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )


def path_edges(triples: DataFrame, seq: list[str]) -> DataFrame:
    """A sequence path ``elt1/elt2/...`` as one DISTINCT (src, dst) edge
    set: fold the atoms with equi-joins on the shared node. The distinct
    matters twice — SPARQL path semantics are reachability (set, not
    bag), and it collapses the fan-out BEFORE the closure loop squares
    it. At scale each fold is one shuffle on the chaining node; AQE
    broadcasts whichever atom scan is small."""
    if not seq:
        raise ValueError("empty path sequence")
    acc = _path_atom(triples, seq[0])
    for atom in seq[1:]:
        nxt = _path_atom(triples, atom)
        acc = (
            acc.alias("a")
            .join(nxt.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
    return acc.distinct()


def bgp_path_closure(
    triples: DataFrame,
    seq: list[str],
    start: DataFrame,
    max_hops: int = PATH_MAX_HOPS,
) -> DataFrame:
    """``start (elt1/elt2/...)* ?x`` — reflexive-transitive closure of a
    sequence path from a seed node set, level-synchronous BFS like
    :func:`~ed_twitter_spark.operators.graph.kg_bfs_hops`.

    Returns (x, hops): every node reachable within ``max_hops``
    applications of the path, with the MINIMUM application count (0 for
    the seeds themselves — SPARQL ``*``; filter ``hops >= 1`` for ``+``
    over an irreflexive step relation). ``hops`` is an engine extension:
    SPARQL exposes only reachability, but the level at which BFS first
    reaches a node is free to emit and is what consumers ask ("how far
    is this conversation from the hub?").

    Scale shape: the step edge set is built ONCE and persisted; each
    level is one join frontier ⋈ edges + one anti-join against the
    visited set. A 100-TB triple store closure would persist `edges`
    partitioned by src and reuse that partitioning every level — the
    single persist here is the local-mode equivalent. The iteration
    bound is explicit (bounded closures are the production-safe form;
    unbounded fixpoints get the driver count-probe loop used by
    connected components in `operators/canonicalize.py`).
    """
    from ed_twitter_spark.caching import persist_tracked

    e = persist_tracked(path_edges(triples, seq))
    visited = start.select(F.col("x"), F.lit(0).alias("hops"))
    frontier = start.select("x")
    for h in range(1, max_hops + 1):
        nxt = persist_tracked(
            frontier.withColumnRenamed("x", "src")
            .join(e, on="src")
            .select(F.col("dst").alias("x"))
            .distinct()
            .join(visited.select("x"), on="x", how="left_anti")
        )
        visited = visited.unionByName(nxt.select("x", F.lit(h).alias("hops")))
        frontier = nxt
    return visited.select("x", F.col("hops").cast("int").alias("hops"))


# Gate query: "conversations within PATH_MAX_HOPS of the hub conversation
# via shared entities" — the path (mentions/^mentions)* seeded at the
# conversation with the most distinct mentioned entities (tie → smaller
# id). Exercises sequence + inverse atoms + the closure loop end-to-end.
BGP_PATH_SEQ = ["mentions", "^mentions"]


def kg_bgp_path(spark, sf_dir: str) -> DataFrame:
    trip = _gate_triples(spark, sf_dir)
    hub = (
        trip.where(F.col("p") == "mentions")
        .groupBy("s")
        .agg(F.countDistinct("o").alias("n"))
        .orderBy(F.desc("n"), F.asc("s"))
        .limit(1)
        .select(F.col("s").alias("x"))
    )
    return bgp_path_closure(trip, BGP_PATH_SEQ, hub)


def kg_bgp_path_oracle_sql() -> str:
    """DuckDB twin: hub CTE + the sequence-path edge set + unrolled BFS
    levels (same shape as the kg_bfs_hops oracle)."""
    levels = ["d0 AS MATERIALIZED (SELECT x, 0 AS hops FROM hub)"]
    union = ["SELECT x, hops FROM d0"]
    seen = "SELECT x FROM d0"
    for h in range(1, PATH_MAX_HOPS + 1):
        levels.append(
            f"""d{h} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS x, {h} AS hops
  FROM pedges e JOIN d{h - 1} f ON f.x = e.src
  WHERE e.dst NOT IN ({seen})
)"""
        )
        union.append(f"SELECT x, hops FROM d{h}")
        seen += f" UNION ALL SELECT x FROM d{h}"
    return (
        _trip_sql()
        + f""",
pedges AS MATERIALIZED (
  SELECT DISTINCT a.s AS src, b.s AS dst
  FROM trip a JOIN trip b ON b.p = 'mentions' AND b.o = a.o
  WHERE a.p = 'mentions'
),
hub AS (
  SELECT s AS x FROM trip WHERE p = 'mentions'
  GROUP BY s ORDER BY COUNT(DISTINCT o) DESC, s LIMIT 1
),
{",".join(levels)}
SELECT x, CAST(hops AS INTEGER) AS hops
FROM ({" UNION ALL ".join(union)}) levels
"""
    )


# ---------------------------------------------------------------------------
# RDFS forward chaining: subPropertyOf saturation (rdfs5 + rdfs7)
# ---------------------------------------------------------------------------

# The predicate ontology for this KG's typed link facts. Tiny by nature
# (ontologies are schema, not data): the two acquisition channels roll up
# through intermediate properties to one root `mentioned`.
RDFS_SUBPROPERTY = [
    ("mentioned_by_user", "mentioned_directly"),
    ("mentioned_by_assistant", "mentioned_directly"),
    ("mentioned_in_search", "mentioned_via_tool"),
    ("mentioned_directly", "mentioned"),
    ("mentioned_via_tool", "mentioned"),
]
RDFS_CLOSURE_ITERS = 2  # covers hierarchy depth ≤ 2^ITERS+... (doubling); 2 is ample for depth-2


def rdfs_subproperty_closure(spark) -> DataFrame:
    """Transitive closure of the subPropertyOf hierarchy (rdfs5), computed
    in-engine by iterated self-join with path doubling: after k rounds
    every path of length ≤ 2^k is present, so RDFS_CLOSURE_ITERS=2 covers
    depth-4 hierarchies (ours is depth 2). Ontology tables are inherently
    tiny — the self-joins broadcast — but the closure stays declarative so
    the same code saturates a million-property ontology on a cluster."""
    c = spark.createDataFrame(RDFS_SUBPROPERTY, "sub string, sup string")
    for _ in range(RDFS_CLOSURE_ITERS):
        step = (
            c.alias("a")
            .join(c.alias("b"), F.col("a.sup") == F.col("b.sub"))
            .select(F.col("a.sub").alias("sub"), F.col("b.sup").alias("sup"))
        )
        c = c.unionByName(step).distinct()
    return c


def rdfs_infer(triples: DataFrame, closure: DataFrame) -> DataFrame:
    """rdfs7: (p subPropertyOf q) ∧ (s p o) → (s q o). Returns the DISTINCT
    *inferred* triples (the delta forward chaining adds to the store).
    One broadcast hash join — the fact table streams, the closure ships
    to every executor, no shuffle of the big side — then one distinct
    keyed (s, p, o). This is the materialized-inference half of an RDFS
    reasoner; saturating the store is `triples ∪ result`."""
    return (
        triples.join(
            F.broadcast(closure), triples["p"] == closure["sub"], "inner"
        )
        .select("s", F.col("sup").alias("p"), "o")
        .distinct()
    )


def kg_rdfs_inference(spark, sf_dir: str) -> DataFrame:
    """Gate query: the full inferred-triple delta over the typed KG."""
    return rdfs_infer(_gate_triples(spark, sf_dir), rdfs_subproperty_closure(spark))


def kg_rdfs_inference_oracle_sql() -> str:
    """DuckDB twin: WITH RECURSIVE closure over the VALUES ontology, then
    the same join + DISTINCT."""
    onto_rows = ", ".join(f"('{a}', '{b}')" for a, b in RDFS_SUBPROPERTY)
    return (
        _trip_sql()
        + f""",
onto(sub, sup) AS (VALUES {onto_rows}),
closure AS (
  WITH RECURSIVE r(sub, sup) AS (
    SELECT sub, sup FROM onto
    UNION
    SELECT r.sub, o.sup FROM r JOIN onto o ON o.sub = r.sup
  )
  SELECT sub, sup FROM r
)
SELECT DISTINCT t.s AS s, c.sup AS p, t.o AS o
FROM trip t JOIN closure c ON c.sub = t.p
"""
    )


# ---------------------------------------------------------------------------
# SPARQL DESCRIBE — the fourth query form
# ---------------------------------------------------------------------------


def bgp_describe(triples: DataFrame, resource: DataFrame) -> DataFrame:
    """SPARQL DESCRIBE: the sub-graph about a resource — every triple
    where it appears as subject or object (the spec leaves the exact
    description to the implementation; symmetric incidence is the
    standard concise-bounded choice for a flat store). ``resource`` is a
    one-row (r string) frame; each incidence side is a broadcast hash
    semi-join the optimizer folds into the triple scan as a pushed
    filter, so DESCRIBE over a 10^12-triple store reads two filtered
    slices, never the table."""
    r = resource.select(F.col("r"))
    on_s = triples.join(
        F.broadcast(r.select(F.col("r").alias("s"))), on="s"
    ).select("s", "p", "o")
    on_o = triples.join(
        F.broadcast(r.select(F.col("r").alias("o"))), on="o"
    ).select("s", "p", "o")
    return on_s.union(on_o).distinct()


def kg_bgp_describe(spark, sf_dir: str) -> DataFrame:
    """Gate query: DESCRIBE the busiest entity vertex (most link triples,
    tie-break min id — the same deterministic hub rule as kg_star_query,
    so the query is parameterless). Completes the SPARQL query-form set:
    SELECT (kg_bgp_query), CONSTRUCT (kg_bgp_construct), ASK
    (kg_bgp_ask), DESCRIBE."""
    store = _gate_triples(spark, sf_dir)
    hub = (
        store.where(F.col("p").startswith("mentioned_"))
        .groupBy("o")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("o"))
        .limit(1)
        .select(F.col("o").alias("r"))
    )
    return bgp_describe(store, hub)


def kg_bgp_describe_oracle_sql() -> str:
    return (
        _trip_sql()
        + """,
hub AS (
  SELECT o AS r FROM (
    SELECT o, COUNT(*) AS n,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, o) AS rn
    FROM trip WHERE p LIKE 'mentioned_%' GROUP BY o
  ) WHERE rn = 1
)
SELECT DISTINCT t.s, t.p, t.o
FROM trip t, hub h
WHERE t.s = h.r OR t.o = h.r
"""
    )
