"""Shared executed-plan scanners for the round-7 Catalyst-rewrite
hazard class (VERDICT r7 item 1).

Two rewrites can silently clone an expensive expression into a
per-element or per-row evaluation context:

1. **Fold inlined into a lambda body** (CollapseProject): a single-use
   alias holding a fold (``aggregate``/``reduce``) gets substituted
   into its consumer; if the consumer is a higher-order-function
   lambda, the fold re-evaluates per ELEMENT — Θ(d²) per row (the
   ``normalized()`` finding, functions/vector.py:54).
2. **Fold inlined into a Filter condition** (predicate pushdown): a
   trailing ``filter(fold_output.isNotNull())`` is pushed below the
   projection and the pushed Filter inlines the whole fold; with a
   full-input reference inside the lambda that's Θ(n²) per row (the
   ``mm_neardup`` finding, operators/multimodal.py:267). The fix
   pattern is a cheap row-level PRE-filter (``octet_length >= 4``,
   ``size(tokens(text)) > 0``) before the fold.

These scanners work on ``executedPlan().toString()`` so they see the
plan AFTER every rewrite — the only place the hazard is visible.
"""

from __future__ import annotations

import re

#: expression names that evaluate a whole-array fold per invocation —
#: the expensive class that must never be cloned into a per-element or
#: per-row re-evaluation context. (``transform``/``filter`` HOFs are
#: per-element by design and fine to nest.)
FOLD_FUNCS = ("aggregate(", "reduce(")


def lambda_bodies(plan: str) -> list[str]:
    """Every ``lambdafunction(...)`` BODY (its first, balanced-paren
    argument) in an executed-plan string. Regexes can't balance
    parens, so each body is scanned explicitly.

    A body never spans lines in tree output, so the scan also stops at
    a newline: scan-node metadata strings are TRUNCATED at
    ``spark.sql.maxMetadataStringLength`` (``...`` mid-expression on
    ``FileScan``/``InMemoryTableScan`` lines), and an unbalanced
    truncated body would otherwise swallow the rest of the plan —
    turning every later ``aggregate(`` in unrelated operators into a
    false positive. Expressions that matter (Project/Filter operator
    lines) print in full; only scan metadata truncates, and post-scan
    predicates always also appear as full ``Filter`` operator
    lines."""
    bodies = []
    for m in re.finditer(r"lambdafunction\(", plan):
        depth, start = 1, m.end()
        j = start
        for j in range(start, len(plan)):
            c = plan[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            elif c == "," and depth == 1:
                break
            elif c == "\n":
                break  # truncated print — body cannot really span lines
        bodies.append(plan[start:j])
    return bodies


def folds_in_lambda_bodies(plan: str) -> list[str]:
    """Lambda bodies containing a fold — hazard shape 1. A fold as a
    HOF *argument* (e.g. ``array_repeat(sqrt(aggregate(...)), n)``
    feeding ``zip_with``) is fine: arguments evaluate once per row;
    only the BODY re-evaluates per element."""
    return [b for b in lambda_bodies(plan) if any(f in b for f in FOLD_FUNCS)]


#: length-proportional string/array functions: applied to a row COLUMN
#: inside a lambda body they re-run per element — Θ(T²) per row (the
#: round-8 shingle finding: split+trim-filter re-ran per shingle
#: position, 85× at T=1000). Applied to a lambda VARIABLE they are
#: per-element by design and fine.
EXPENSIVE_FUNCS = (
    "split(",
    "hex(",
    "unhex(",
    "md5(",
    "sha1(",
    "sha2(",
    "crc32(",
    "regexp_extract(",
    "regexp_extract_all(",
    "regexp_replace(",
    "regexp_count(",
    "sentences(",
    "unbase64(",
    "base64(",
    "translate(",
    "lower(",
    "upper(",
    "reverse(",
    "sort_array(",
    "array_sort(",
    "array_distinct(",
)

#: printed lambda variables (``lambda x_1#447``) — their #N attribute
#: refs are O(1) reads, not re-evaluations
_LAMBDA_VAR = re.compile(r"lambda \w+#\d+")
_COLUMN_ATTR = re.compile(r"\w+#\d+")


def expensive_exprs_in_lambda_bodies(plan: str) -> list[str]:
    """Lambda bodies where a length-proportional function is applied
    over a row COLUMN attribute (hazard: re-evaluated per element).
    Detection per occurrence: take the function's balanced-paren
    argument span, erase every lambda-variable token, and flag if a
    ``name#N`` attribute reference remains — i.e. the expensive call
    consumes row data, not (only) lambda variables. The fix is
    ``exprs.bind``: evaluate once per row, pass as a lambda var."""
    bad = []
    for b in lambda_bodies(plan):
        for f in EXPENSIVE_FUNCS:
            for m in re.finditer(re.escape(f), b):
                depth, start = 1, m.end()
                j = start
                for j in range(start, len(b)):
                    c = b[j]
                    if c == "(":
                        depth += 1
                    elif c == ")":
                        depth -= 1
                        if depth == 0:
                            break
                span = _LAMBDA_VAR.sub("", b[start:j])
                if _COLUMN_ATTR.search(span):
                    bad.append(b[max(0, m.start() - 40) : j + 1])
    return bad


def folds_under_null_checks_in_filters(plan: str) -> list[str]:
    """Executed-plan ``Filter`` lines where a fold sits under a
    NULL-check (``isnotnull``/``isnull``) — hazard shape 2, the
    bd1afd1 form: ``filter(fold_output.isNotNull())`` pushed below the
    projection re-evaluates the whole fold just to test null-ness,
    and the inline clones any referenced alias into the fold's lambda
    (the Θ(bytes²) ladder finding). Null-ness of a fold output is
    always decidable from row-level properties of its inputs, so the
    cheap pre-filter equivalent ALWAYS exists — this shape is never
    necessary.

    A fold appearing in a Filter condition as the PREDICATE itself
    (e.g. the x9 quality gate's ``aggregate(array_sort(tokens)) ≤
    threshold`` — Gopher top-token dominance) is NOT flagged: it is
    the query's semantics, evaluated once per row, same cost as in a
    Project — there is nowhere cheaper for it to run. (Folds inside
    lambda BODIES are flagged everywhere, Filter lines included, by
    :func:`folds_in_lambda_bodies`.)

    Executed plans print one operator per line (``+- Filter (cond)``);
    parquet ``PushedFilters:`` lists can't carry folds and the
    word-boundary match skips them."""
    bad = []
    for line in plan.splitlines():
        if not re.search(r"(?:^|[^A-Za-z])Filter ", line):
            continue
        for m in re.finditer(r"(?:isnotnull|isnull)\(", line):
            depth, start = 1, m.end()
            j = start
            for j in range(start, len(line)):
                c = line[j]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
            span = line[start:j]
            if any(f in span for f in FOLD_FUNCS):
                bad.append(line.strip())
                break
    return bad
