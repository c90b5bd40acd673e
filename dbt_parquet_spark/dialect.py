"""DuckDB-dialect compatibility for model SQL — so a reference user's
dbt-model SQL runs unchanged on the Spark engine ("switch and run").

Spark 4's SQL front-end already accepts most DuckDB-isms the reference's own
repo uses (verified): ``expr::TYPE`` casts (reference
examples/animals/models/animals_str.sql), ``ORDER BY ALL`` (reference
impl.py:241), ``GROUP BY ALL``, ``len(…)``. What remains are DuckDB's
list-function NAMES, registered here as SQL function aliases
(CREATE TEMPORARY FUNCTION … RETURN …) over Spark built-ins.

DuckDB's 1-based list subscript ``arr[i]`` (the reference's own catalog
macro idiom, reference macros/catalog.sql:17-18 ``file_parts[num_parts]``)
is rewritten at the tokenizer level to ``element_at(arr, i)`` — 1-based in
BOTH engines — because Spark parses ``arr[i]`` 0-based and a ported model
would otherwise be silently wrong (the worst failure mode). Slices
``arr[lo:hi]`` become ``slice(...)`` and bare list literals ``[1, 2]``
become ``array(1, 2)``. Struct subscripts are rare in reference models; use
dot access when porting (``s['f']`` would be rewritten to ``element_at``,
which Spark rejects on structs — a loud parse error, never a wrong value).

Two clause-level rewrites complete the surface: the ``* EXCLUDE (…)`` star
modifier becomes Spark's ``* EXCEPT (…)``, and ``QUALIFY <pred>`` — which
Spark's parser rejects outright — becomes a wrapped subquery with the
predicate as a select-list column (see _rewrite_qualify).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, returns, body). \\Q…\\E quoting makes split's regex
# separator behave like DuckDB's literal separator.
_COMPAT_FUNCTIONS = {
    "string_split": (
        "(s STRING, sep STRING)",
        "ARRAY<STRING>",
        r"split(s, concat('\\Q', sep, '\\E'))",
    ),
    "string_split_regex": ("(s STRING, sep STRING)", "ARRAY<STRING>", "split(s, sep)"),
    "list_contains": ("(a ARRAY<STRING>, x STRING)", "BOOLEAN", "array_contains(a, x)"),
    "list_distinct": ("(a ARRAY<STRING>)", "ARRAY<STRING>", "array_distinct(a)"),
    "list_sort": ("(a ARRAY<STRING>)", "ARRAY<STRING>", "sort_array(a)"),
    "list_unique": ("(a ARRAY<STRING>)", "INT", "size(array_distinct(a))"),
    "regexp_matches": ("(s STRING, p STRING)", "BOOLEAN", "s RLIKE p"),
    # native startswith: a LIKE-pattern body would mis-match prefixes
    # containing %, _ or \ (DuckDB's starts_with is a literal comparison)
    "starts_with": ("(s STRING, p STRING)", "BOOLEAN", "startswith(s, p)"),
}


import re

# textual rewrites applied OUTSIDE single-quoted strings: DuckDB types/idioms
# Spark's parser rejects. (name, pattern, replacement)
_REWRITES = (
    ("varchar", re.compile(r"\bVARCHAR\b(?!\s*\()", re.IGNORECASE), "STRING"),
    ("text-type", re.compile(r"::\s*TEXT\b", re.IGNORECASE), "::STRING"),
    ("int-types", re.compile(r"\b(U?HUGEINT)\b", re.IGNORECASE), "DECIMAL(38,0)"),
    # DuckDB len() accepts lists; Spark's is string-only. Rewrite the
    # list-valued compositions (the reference's catalog.sql idiom) to size();
    # bare len(string) stays native.
    (
        "len-of-list",
        re.compile(r"\blen\s*\(\s*(?=(string_split|list_|split|array|collect_))", re.IGNORECASE),
        "size(",
    ),
    # DuckDB star modifier: `* EXCLUDE (a, b)` / `* EXCLUDE a` → Spark's
    # `* EXCEPT (a, b)`. Anchored on the preceding `*` so the window-frame
    # EXCLUDE keyword (unsupported in Spark anyway) is never touched.
    (
        "star-exclude-parens",
        re.compile(r"(\*\s*)EXCLUDE(\s*\()", re.IGNORECASE),
        r"\1EXCEPT\2",
    ),
    (
        "star-exclude-bare",
        re.compile(r"(\*\s*)EXCLUDE\s+([A-Za-z_]\w*)", re.IGNORECASE),
        r"\1EXCEPT (\2)",
    ),
)


def _strip_comments(sql: str) -> str:
    """Remove `--` line comments and `/* */` block comments, string-aware
    (a `--` inside a quoted literal is data, and an apostrophe inside a
    comment must NOT open a string — it would silently swallow the rest of
    the statement from every later rewriting pass)."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in "'\"":
            j = _skip_string(sql, i)
            out.append(sql[i:j])
            i = j
        elif c == "-" and sql[i : i + 2] == "--":
            j = sql.find("\n", i)
            i = n if j < 0 else j  # keep the newline itself
        elif c == "/" and sql[i : i + 2] == "/*":
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
            out.append(" ")
        else:
            out.append(c)
            i += 1
    return "".join(out)


def translate_sql(sql: str) -> str:
    """Rewrite DuckDB-dialect fragments Spark's parser rejects or would
    silently mis-evaluate: bare VARCHAR/TEXT/HUGEINT types, len() of lists,
    QUALIFY clauses, and — critically — 1-based list subscripts (see module
    docstring). Quote-aware: single-quoted literals pass through untouched;
    comments are stripped first (their apostrophes would otherwise be
    parsed as string openers by every downstream pass)."""
    sql = _strip_comments(sql)
    parts = re.split(r"('(?:[^']|'')*')", sql)  # odd indices are string literals
    for i in range(0, len(parts), 2):
        for _, pat, repl in _REWRITES:
            parts[i] = pat.sub(repl, parts[i])
    return _rewrite_qualify(_rewrite_subscripts("".join(parts)))


# --- 1-based subscript rewriting (tokenizer-level) -------------------------

_IDENT_CHARS = re.compile(r"[\w.$\"]")


def _skip_string(sql: str, i: int) -> int:
    """i points at the opening quote; returns index just past the literal
    (handles '' escapes)."""
    q = sql[i]
    j = i + 1
    n = len(sql)
    while j < n:
        if sql[j] == q:
            if q == "'" and j + 1 < n and sql[j + 1] == "'":
                j += 2
                continue
            return j + 1
        j += 1
    return n


def _match_bracket(sql: str, i: int) -> int:
    """i points at '['; returns the index of the matching ']' (nesting- and
    string-aware). Raises on unbalanced brackets."""
    depth = 0
    j = i
    n = len(sql)
    while j < n:
        c = sql[j]
        if c in "'\"":
            j = _skip_string(sql, j)
            continue
        if c == "[":
            depth += 1
        elif c == "]":
            depth -= 1
            if depth == 0:
                return j
        j += 1
    raise ValueError(f"unbalanced '[' at offset {i} in SQL: {sql[i:i+40]!r}")


def _top_level_colon(inner: str) -> int:
    """Index of a top-level ':' (slice separator) in bracket content, or -1."""
    depth = 0
    j = 0
    while j < len(inner):
        c = inner[j]
        if c in "'\"":
            j = _skip_string(inner, j)
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == ":" and depth == 0:
            return j
        j += 1
    return -1


def _pop_base(out: list[str]) -> str | None:
    """Pop the trailing operand (identifier chain, quoted identifier, or a
    balanced-paren unit plus its function name) off the emitted-unit list.
    Returns it as a string, or None if what precedes '[' is not an operand
    (then the bracket is a DuckDB list literal)."""
    ws = []
    while out and out[-1].isspace():
        ws.append(out.pop())
    if not out:
        out.extend(reversed(ws))
        return None
    last = out[-1]
    base_units: list[str] = []
    if last.endswith(")"):
        # balanced-paren unit(s): multi-char rewritten units are internally
        # balanced; single chars carry the live paren depth
        depth = 0
        while out:
            u = out.pop()
            if len(u) == 1:
                if u == ")":
                    depth += 1
                elif u == "(":
                    depth -= 1
            base_units.append(u)
            if depth == 0:
                break
        # include a preceding identifier chain (the function name)
        while out and (len(out[-1]) > 1 or _IDENT_CHARS.match(out[-1])):
            if len(out[-1]) > 1 and not out[-1].startswith('"'):
                break  # a prior rewritten unit, not part of the name
            base_units.append(out.pop())
    elif _IDENT_CHARS.match(last[-1]) or last.startswith('"') or last.startswith("try_element_at("):
        # identifier chain / quoted ident / previously rewritten subscript
        while out and (
            (len(out[-1]) == 1 and _IDENT_CHARS.match(out[-1]))
            or out[-1].startswith('"')
            or out[-1].startswith("try_element_at(")
            or out[-1].startswith("slice(")
        ):
            base_units.append(out.pop())
    else:
        out.extend(reversed(ws))
        return None
    if not base_units:
        out.extend(reversed(ws))
        return None
    base = "".join(reversed(base_units))
    # a bare SQL keyword before '[' (e.g. "SELECT [1,2]") is not an operand
    if base.upper() in _KEYWORDS_BEFORE_LITERAL:
        out.append(base)
        out.extend(reversed(ws))
        return None
    return base


_KEYWORDS_BEFORE_LITERAL = {
    "SELECT", "WHERE", "WHEN", "THEN", "ELSE", "AND", "OR", "NOT", "IN",
    "ON", "BY", "AS", "FROM", "HAVING", "RETURN", "UNION", "ALL", "DISTINCT",
}


def _rewrite_subscripts(sql: str) -> str:
    """Rewrite DuckDB subscript syntax into portable Spark calls:

    - ``base[i]``      → ``try_element_at(base, i)`` (1-based in both
      engines, and NULL — not an ANSI error — when out of bounds, matching
      DuckDB's subscript semantics)
    - ``base[lo:hi]``  → ``slice(base, lo, hi-lo+1)`` (both ends inclusive,
      matching DuckDB; an open upper bound derives its length from size())
    - ``[a, b, c]``    → ``array(a, b, c)``; ``ARRAY[a, b]`` likewise
    """
    out: list[str] = []
    i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if c in "'\"":
            j = _skip_string(sql, i)
            out.append(sql[i:j])
            i = j
        elif c == "[":
            j = _match_bracket(sql, i)
            inner = _rewrite_subscripts(sql[i + 1 : j])
            base = _pop_base(out)
            if base is None or base.upper() == "ARRAY":
                out.append(f"array({inner})")
            else:
                colon = _top_level_colon(inner)
                if colon < 0:
                    out.append(f"try_element_at({base}, {inner})")
                else:
                    lo = inner[:colon].strip() or "1"
                    hi = inner[colon + 1 :].strip()
                    length = f"({hi})-({lo})+1" if hi else f"size({base})-({lo})+1"
                    out.append(f"slice({base}, {lo}, {length})")
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


# --- QUALIFY rewriting (Spark 4 OSS has no QUALIFY clause) -----------------

_PRED_END_KEYWORDS = {"ORDER", "LIMIT", "UNION", "EXCEPT", "INTERSECT", "OFFSET", "WINDOW"}


def _rewrite_qualify(sql: str) -> str:
    """Rewrite DuckDB/Snowflake-style ``QUALIFY <pred>`` — post-window
    filtering Spark's parser rejects — into a wrapped subquery:

        SELECT <list> FROM ... QUALIFY <pred> [tail]
      → SELECT * EXCEPT (__qualify) FROM (
            SELECT <list>, (<pred>) AS __qualify FROM ...
        ) WHERE __qualify [tail]

    The predicate moves INTO the select list (window functions are legal
    there, and Spark's lateral column aliases resolve references to sibling
    aliases like ``rn = 1``), and the outer WHERE does the filtering.
    Handles nesting (innermost first via repeated passes) and leaves ORDER
    BY / LIMIT tails outside the wrapper. String-literal aware."""
    while True:
        n = len(sql)
        depth = 0
        last_select: dict[int, int] = {}
        first_from: dict[int, int] = {}
        qstart = qend = qdepth = None
        i = 0
        while i < n:
            c = sql[i]
            if c in "'\"":
                i = _skip_string(sql, i)
                continue
            if c == "(":
                depth += 1
                i += 1
                continue
            if c == ")":
                last_select.pop(depth, None)
                first_from.pop(depth, None)
                depth -= 1
                i += 1
                continue
            if c.isalpha() or c == "_":
                j = i
                while j < n and (sql[j].isalnum() or sql[j] == "_"):
                    j += 1
                w = sql[i:j].upper()
                if w == "SELECT":
                    last_select[depth] = i
                    first_from.pop(depth, None)
                elif w == "FROM" and depth in last_select and depth not in first_from:
                    first_from[depth] = i
                elif w == "QUALIFY":
                    qstart, qend, qdepth = i, j, depth
                    break
                i = j
                continue
            i += 1
        if qstart is None:
            return sql
        sel = last_select.get(qdepth)
        frm = first_from.get(qdepth)
        if sel is None or frm is None:
            return sql  # not a recognizable SELECT — leave untouched (loud parse error downstream)
        # predicate extends to the next same-level ORDER/LIMIT/setop keyword,
        # an enclosing ')', or end of string
        i = qend
        d2 = 0
        pend = n
        while i < n:
            c = sql[i]
            if c in "'\"":
                i = _skip_string(sql, i)
                continue
            if c == "(":
                d2 += 1
                i += 1
                continue
            if c == ")":
                if d2 == 0:
                    pend = i
                    break
                d2 -= 1
                i += 1
                continue
            if d2 == 0 and (c.isalpha() or c == "_"):
                j = i
                while j < n and (sql[j].isalnum() or sql[j] == "_"):
                    j += 1
                if sql[i:j].upper() in _PRED_END_KEYWORDS:
                    pend = i
                    break
                i = j
                continue
            i += 1
        pred = sql[qend:pend].strip()
        inner = sql[sel:frm] + ", (" + pred + ") AS __qualify " + sql[frm:qstart]
        sql = (
            sql[:sel]
            + "SELECT * EXCEPT (__qualify) FROM ("
            + inner
            + ") WHERE __qualify "
            + sql[pend:]
        )


def register_duckdb_compat(spark: SparkSession) -> list[str]:
    """Register the alias functions on the session (idempotent). Returns the
    registered names."""
    names = []
    for name, (sig, ret, body) in _COMPAT_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURNS {ret} RETURN {body}"
        )
        names.append(name)
    return names
