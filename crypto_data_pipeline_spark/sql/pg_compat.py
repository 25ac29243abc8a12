"""Run the reference's PostgreSQL analysis file VERBATIM on Spark.

The reference's users don't call a DataFrame API — they execute
`sql/analysis_queries.sql` against PostgreSQL (reference
`sql/analysis_queries.sql:1-88`). This module closes that last
switch-over gap: `run_reference_sql(spark, sf_dir)` registers a
`coin_history` view over the engine's tables and executes the
reference file's statements through `spark.sql`, translating exactly
the PostgreSQL-isms the file uses (documented below, loud failure on
anything else). The parity test proves both statements reproduce the
engine's own `monthly_avg_price` / `drop_recovery` results row for
row — same Spark session, so the comparison is exact, not
float-tolerant.

Translated dialect constructs:

  * ``SELECT DISTINCT ON (k, ...) <list> FROM <src> ORDER BY k...,
    <rest>`` → a ``row_number() OVER (PARTITION BY k ORDER BY <rest>)
    = 1`` subquery — the standard rewrite; PostgreSQL itself documents
    DISTINCT ON as "keep the first row of each set per ORDER BY".
  * JSON operators ``expr->'a'->'b'->>'c'`` →
    ``get_json_object(expr, '$.a.b.c')``.
  * ``::numeric`` / ``::float`` casts → ``CAST(... AS DOUBLE)``
    (the reference's NUMERIC values flow into float64 pandas anyway,
    reference `crypto_app/db.py:363-364`).
  * ``ROUND(AVG(...), n)`` → ``ROUND(1e-9 + AVG(...), n)``: PostgreSQL
    rounds NUMERIC ties half-away-from-zero in exact decimal;
    float64 averages of 2-decimal prices land a few ulp BELOW .xx5,
    so an unnudged double round would break ties downward. The nudge
    reproduces the decimal semantics on positive aggregates (same
    rule, same constant, as the engine's monthly_avg — see
    `operators/timeseries.py:monthly_avg`). Non-aggregate ROUNDs are
    left untouched.

The ``coin_history`` view maps the engine's storage to the reference
schema: one row per (coin_id, fetch_date) from the silver history
(price_usd = the day's max observed value, NULL-filtered exactly like
the reference's ingestion), and ``response_data`` carrying the
entity's LATEST payload re-shaped to the reference's
``market_data.market_cap.usd`` JSON layout. The reference stores the
full API payload per row and reads only the latest row's market cap
(sql/analysis_queries.sql:71-80); the engine stores payloads
event-level, so the view denormalizes the latest one — DISTINCT ON
then picks it regardless of which date row wins.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

REFERENCE_SQL_PATH = "/root/reference/sql/analysis_queries.sql"

_WS = " \t\r\n"


def _strip_comments(sql: str) -> str:
    """Remove ``--`` comments, inline ones included (quote-aware): the
    downstream depth/quote scanners must never see comment text — an
    apostrophe or ';' inside a comment would corrupt statement
    splitting."""
    out_lines = []
    for line in sql.splitlines():
        in_q = False
        cut = len(line)
        for i, c in enumerate(line):
            if in_q:
                in_q = c != "'"
            elif c == "'":
                in_q = True
            elif c == "-" and line[i : i + 2] == "--":
                cut = i
                break
        out_lines.append(line[:cut])
    return "\n".join(out_lines)


def _find_matching(s: str, i: int) -> int:
    """Index of the ')' matching the '(' at s[i] (quote-aware)."""
    depth, j, in_q = 0, i, False
    while j < len(s):
        c = s[j]
        if in_q:
            in_q = c != "'"
        elif c == "'":
            in_q = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return j
        j += 1
    raise ValueError("unbalanced parentheses in SQL")


def _token_at_depth0(s: str, token: str) -> int:
    """First index of word ``token`` at paren depth 0 (quote-aware),
    -1 if absent."""
    pat = re.compile(rf"\b{token}\b", re.IGNORECASE)
    depth, in_q = 0, False
    for m in pat.finditer(s):
        depth, in_q = 0, False
        for c in s[: m.start()]:
            if in_q:
                in_q = c != "'"
            elif c == "'":
                in_q = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
        if depth == 0 and not in_q:
            return m.start()
    return -1


def _rewrite_distinct_on(sql: str) -> str:
    """``SELECT DISTINCT ON (k) <list> FROM <src> ORDER BY k, <rest>``
    → row_number-over-partition subquery. Handles the construct inside
    a parenthesized CTE body (the reference's usage); raises on forms
    outside that shape so unsupported SQL fails loud, not wrong."""
    while True:
        m = re.search(r"\bSELECT\s+DISTINCT\s+ON\s*\(", sql, re.IGNORECASE)
        if m is None:
            return sql
        keys_open = sql.index("(", m.end() - 1)
        keys_close = _find_matching(sql, keys_open)
        keys = sql[keys_open + 1 : keys_close].strip()

        rest = sql[keys_close + 1 :]
        from_i = _token_at_depth0(rest, "FROM")
        if from_i < 0:
            raise ValueError("DISTINCT ON without FROM is not supported")
        select_list = rest[:from_i].strip()
        after_from = rest[from_i + 4 :]
        order_i = _token_at_depth0(after_from, "ORDER")
        if order_i < 0:
            raise ValueError("DISTINCT ON requires an ORDER BY")
        src = after_from[:order_i].strip()
        after_order = after_from[order_i:]
        om = re.match(r"ORDER\s+BY\s+", after_order, re.IGNORECASE)
        tail = after_order[om.end() :]
        # the statement/CTE body ends at the first depth-0 ')' or ';'
        end, closer = len(tail), None
        depth, in_q = 0, False
        for j, c in enumerate(tail):
            if in_q:
                in_q = c != "'"
            elif c == "'":
                in_q = True
            elif c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    end, closer = j, ")"
                    break
                depth -= 1
            elif c == ";" and depth == 0:
                end, closer = j, ";"
                break
        if closer != ")":
            # top-level DISTINCT ON: PostgreSQL also guarantees the
            # result ORDER; the row_number rewrite can't preserve it
            # once the select-list projects the order columns away —
            # fail loud rather than silently reorder
            raise ValueError(
                "top-level DISTINCT ON result ordering is not preserved by "
                "the rewrite; wrap the query in a CTE/subquery"
            )
        order_items = [x.strip() for x in tail[:end].split(",")]
        nkeys = len([k for k in keys.split(",") if k.strip()])
        if [x.split()[0] for x in order_items[:nkeys]] != [
            k.strip() for k in keys.split(",")
        ]:
            raise ValueError(
                "DISTINCT ON keys must be the ORDER BY prefix (PostgreSQL rule)"
            )
        inner_order = ", ".join(order_items[nkeys:]) or keys
        rewritten = (
            f"SELECT {select_list} FROM (SELECT *, row_number() OVER "
            f"(PARTITION BY {keys} ORDER BY {inner_order}) AS __pg_rn "
            f"FROM {src}) WHERE __pg_rn = 1 "
        )
        sql = sql[: m.start()] + rewritten + tail[end:]


def _rewrite_json_ops(sql: str) -> str:
    """``base->'a'->'b'->>'c'`` → ``get_json_object(base, '$.a.b.c')``."""
    pat = re.compile(r"([A-Za-z_][A-Za-z0-9_.]*)((?:\s*->\s*'[^']+')*)\s*->>\s*'([^']+)'")

    def sub(m: re.Match) -> str:
        base, mids, leaf = m.group(1), m.group(2), m.group(3)
        parts = re.findall(r"'([^']+)'", mids) + [leaf]
        return f"get_json_object({base}, '$.{'.'.join(parts)}')"

    return pat.sub(sub, sql)


def _quote_mask(s: str) -> list[bool]:
    """mask[i] is True iff s[i] sits inside a single-quoted literal
    (the opening/closing quotes themselves count as inside)."""
    mask, in_q = [False] * len(s), False
    for i, c in enumerate(s):
        if in_q:
            mask[i] = True
            if c == "'":
                in_q = False
        elif c == "'":
            mask[i] = True
            in_q = True
    return mask


def _rewrite_casts(sql: str) -> str:
    """``(expr)::numeric`` / ``ident::numeric`` (also int/float/double)
    → ``CAST(expr AS DOUBLE)`` (INT for ::int). The trailing
    ``(?![A-Za-z0-9_])`` guard makes unknown types (``::interval``,
    ``::float4``) fail loud instead of silently corrupting; the
    back-scan for a parenthesized cast target skips string-literal
    content."""
    cast_re = re.compile(
        r"::\s*(numeric|float8?|double precision|int(?:eger)?)(?![A-Za-z0-9_])",
        re.IGNORECASE,
    )
    out = sql
    while True:
        m = cast_re.search(out)
        if m is None:
            if re.search(r"::", out):
                i = out.index("::")
                raise ValueError(f"unsupported ::cast near: {out[i:i+40]!r}")
            return out
        target = "INT" if m.group(1).lower().startswith("int") else "DOUBLE"
        mask = _quote_mask(out)
        i = m.start() - 1
        while i >= 0 and out[i] in _WS:
            i -= 1
        if out[i] == ")":
            # scan back to the matching '(' — literal-content parens
            # don't count
            depth, j = 0, i
            while j >= 0:
                c = out[j]
                if mask[j]:
                    j -= 1
                    continue
                if c == ")":
                    depth += 1
                elif c == "(":
                    depth -= 1
                    if depth == 0:
                        break
                j -= 1
            if j < 0:
                raise ValueError("unbalanced parentheses before ::cast")
            expr = out[j + 1 : i]
            start = j
        else:
            em = re.search(r"[A-Za-z_][A-Za-z0-9_.]*$", out[: i + 1])
            if em is None:
                raise ValueError(f"cannot resolve cast target near: {out[max(0,i-30):i+1]!r}")
            expr = em.group(0)
            start = em.start()
        out = out[:start] + f"CAST({expr} AS {target})" + out[m.end() :]


def _rewrite_round_avg(sql: str) -> str:
    return re.sub(r"\bROUND\s*\(\s*AVG\s*\(", "ROUND(1e-9 + AVG(", sql, flags=re.IGNORECASE)


def transpile_pg(sql: str) -> str:
    """PostgreSQL → Spark SQL for the reference dialect subset (module
    docstring). Order matters: JSON ops first (their output feeds the
    casts), DISTINCT ON last (operates on statement structure)."""
    out = _strip_comments(sql)
    out = _rewrite_json_ops(out)
    out = _rewrite_casts(out)
    out = _rewrite_round_avg(out)
    out = _rewrite_distinct_on(out)
    return out


def split_statements(sql: str) -> list[str]:
    stmts, depth, in_q, cur = [], 0, False, []
    for c in sql:
        if in_q:
            in_q = c != "'"
        elif c == "'":
            in_q = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == ";" and depth == 0:
            s = "".join(cur).strip()
            if s:
                stmts.append(s)
            cur = []
            continue
        cur.append(c)
    s = "".join(cur).strip()
    if s:
        stmts.append(s)
    return stmts


def register_reference_views(spark: SparkSession, sf_dir: str) -> None:
    """Create the ``coin_history`` temp view mapping engine storage to
    the reference schema (module docstring)."""
    from crypto_data_pipeline_spark.plans.core_queries import _history
    from crypto_data_pipeline_spark.sources.tables import load_table

    hist = _history(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    latest = ev.groupBy(F.col("user_id").alias("entity_id")).agg(
        F.max_by("props", F.struct("ts", "event_id")).alias("_props")
    )
    usd = (F.get_json_object("_props", "$.k").cast("double") * F.lit(5e10)).cast("long")
    payload = latest.select(
        "entity_id",
        F.coalesce(
            F.format_string('{"market_data":{"market_cap":{"usd":%d}}}', usd),
            F.lit("{}"),
        ).alias("response_data"),
    )
    # payload is one row per entity — entity-proportional, so the join
    # strategy is AQE's call, not a forced broadcast
    view = hist.join(payload, "entity_id", "left").select(
        F.col("entity_id").alias("coin_id"),
        F.col("fetch_date"),
        F.col("price").alias("price_usd"),
        "response_data",
    )
    view.createOrReplaceTempView("coin_history")


def register_reference_views_from_bronze(spark: SparkSession, root: str) -> None:
    """The REAL-corpus ``coin_history`` view: one row per published
    JSON file under ``root`` (the reference's data/ tree), through the
    same S2 bronze scan the silver pipeline uses. Column mapping is
    the reference's own load path (load_data.py:55-64 →
    create_tables.sql): price_usd quantized at the NUMERIC(24,8)
    boundary exactly like coin_history_silver, and ``response_data``
    carrying THIS ROW'S full payload as a JSON string — the reference
    stores the whole API document per row and Query 2's DISTINCT ON
    reads the latest row's market cap out of it, so unlike the
    synthetic view (which denormalizes one latest payload per entity)
    no reshaping is needed: the real table has the real per-day
    payloads."""
    from crypto_data_pipeline_spark.sources.json_dir import read_bronze_json

    bronze = read_bronze_json(spark, root)
    view = bronze.select(
        "coin_id",
        "fetch_date",
        F.round("price_usd", 8).alias("price_usd"),
        F.to_json("response").alias("response_data"),
    )
    view.createOrReplaceTempView("coin_history")


def run_reference_sql(
    spark: SparkSession,
    sf_dir: str,
    path: str = REFERENCE_SQL_PATH,
    bronze_root: str | None = None,
) -> list[DataFrame]:
    """Execute every statement of the reference SQL file on Spark,
    returning one DataFrame per statement. With ``bronze_root`` the
    ``coin_history`` view is registered from a real bronze JSON tree
    (the reference's own data/ corpus) instead of the synthetic
    ``sf_dir`` tables."""
    if bronze_root is not None:
        register_reference_views_from_bronze(spark, bronze_root)
    else:
        register_reference_views(spark, sf_dir)
    with open(path) as f:
        sql = f.read()
    return [spark.sql(stmt) for stmt in split_statements(transpile_pg(sql))]


def extract_named_query(sql_text: str, name: str) -> str:
    """Slice one named query out of a SQL file using the reference's
    ``-- BEGIN <name>`` / ``-- END <name>`` markers — a verbatim mirror
    of ``run_analysis_query`` (/root/reference/crypto_app/db.py:301-348),
    including its works-only-with-markers behavior: the extraction
    starts AFTER the line holding the BEGIN marker and stops at the
    first END marker; a file without the markers (the reference's own
    shipped analysis_queries.sql has none) raises KeyError, it does
    not fall back to whole-file execution."""
    import re

    # whole-line marker match: a plain substring find would let
    # name='monthly_avg' silently extract '-- BEGIN monthly_avg_extended'
    # (one deliberate deviation from the reference's find(), which has
    # that prefix-collision bug)
    begin = re.search(
        rf"^-- BEGIN {re.escape(name)}[ \t]*\r?$", sql_text, re.MULTILINE
    )
    if begin is None:
        raise KeyError(f"query not found: {name}")
    # a BEGIN marker on the file's final line with no trailing newline:
    # find() returns -1 and `-1 + 1 = 0` would restart the END scan at
    # the file head, silently extracting the wrong region in a
    # malformed file — treat it as an empty block at EOF instead
    nl = sql_text.find("\n", begin.start())
    start = len(sql_text) if nl == -1 else nl + 1
    end = re.compile(
        rf"^-- END {re.escape(name)}[ \t]*\r?$", re.MULTILINE
    ).search(sql_text, start)
    if end is None:
        raise KeyError(f"end marker not found for query: {name}")
    return sql_text[start:end.start()].strip()


def run_named_reference_query(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    path: str = REFERENCE_SQL_PATH,
    bronze_root: str | None = None,
) -> DataFrame:
    """``run_analysis_query(name)`` on the Spark engine: extract the
    marked query, transpile the PostgreSQL dialect, run it against the
    reference-schema views (from ``bronze_root``'s real JSON tree when
    given, else the synthetic ``sf_dir`` mapping). Statements inside
    the marked block beyond the first are rejected — the marker
    contract is one query."""
    with open(path) as f:
        sql = f.read()
    stmts = split_statements(transpile_pg(extract_named_query(sql, name)))
    if len(stmts) != 1:
        raise ValueError(
            f"marked block {name!r} holds {len(stmts)} statements; expected 1"
        )
    if bronze_root is not None:
        register_reference_views_from_bronze(spark, bronze_root)
    else:
        register_reference_views(spark, sf_dir)
    return spark.sql(stmts[0])
