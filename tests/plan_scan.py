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
    parens, so each body is scanned explicitly."""
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
        bodies.append(plan[start:j])
    return bodies


def folds_in_lambda_bodies(plan: str) -> list[str]:
    """Lambda bodies containing a fold — hazard shape 1. A fold as a
    HOF *argument* (e.g. ``array_repeat(sqrt(aggregate(...)), n)``
    feeding ``zip_with``) is fine: arguments evaluate once per row;
    only the BODY re-evaluates per element."""
    return [b for b in lambda_bodies(plan) if any(f in b for f in FOLD_FUNCS)]


def folds_in_filter_conditions(plan: str) -> list[str]:
    """Executed-plan ``Filter`` operator lines whose condition contains
    a fold — hazard shape 2 (the pushed-Filter inline). Executed plans
    print one operator per line (``+- Filter (cond)``, ``*(2) Filter
    ...``); parquet ``PushedFilters:`` lists can't carry folds and the
    word-boundary match skips them."""
    bad = []
    for line in plan.splitlines():
        if re.search(r"(?:^|[^A-Za-z])Filter ", line) and any(
            f in line for f in FOLD_FUNCS
        ):
            bad.append(line.strip())
    return bad
