"""Reference-parity bulk-update operators (R1–R16, R20 in SURVEY.md §2).

The reference iterates the visible rows of one DOM table and commits a
constant or a positional value list into one column, skipping read-only
cells and accumulating per-row outcomes
(Odoo-Batch-Processing.user.js:392-551). Here every semantic becomes a
pure ``(DataFrame, params) → DataFrame`` transformation:

* row order (load-bearing in the DOM, user.js:447-452) → an explicit
  ordinal via ``row_number()`` over a declared key (R1);
* "visible rows" (``style.display !== 'none'``, user.js:203,434) → an
  ordinary filter predicate (R2);
* the in-place cell write loop → one functional
  ``when(pred, new).otherwise(old)`` column rewrite (R7/R11/R12) —
  no driver-side loop, no collect, fully whole-stage-codegen'd;
* the value-list zip (user.js:484-486) → an ordinal equi-join (R9);
* success/error tallies (user.js:443-444,493,497) → a single-pass
  conditional aggregation (R15/R16), not accumulators, so the counts
  are exact under task retries (Spark accumulators double-count on
  retry — a deliberate departure documented here).

Scale notes: positional ops need a total order, but NOT a
single-partition sort — the default ordinal everywhere is
:func:`distributed_ordinal` (range-partition → local row_number →
broadcast n_parts-row offsets), and ordered top-N plans
TakeOrderedAndProject (per-partition top-n, only n·n_parts rows move).
The global-window :func:`with_ordinal` survives as the explicit
``page_scale=True`` parity form, mirroring the reference's
one-visible-page scope (user.js:432-452). Where positional semantics
aren't actually required, callers should still join/update on real
keys instead.
"""

from __future__ import annotations

import logging
import os
import re
import threading
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from odoo_batch_processing_spark.sources.loader import load_table

ORD_COL = "row_ord"

#: distributed_ordinal's boundary-sketch memo: (semanticHash(analyzed
#: plan), bucket_cols, n_parts) → collected boundary sample.
#: Staleness is harmless (boundaries affect balance only); size is
#: hard-capped FIFO so a long-lived service generating many distinct
#: plans cannot grow it without bound. Dict access is lock-guarded
#: (VERDICT r15 #6): concurrent sessions on one driver may MISS and
#: recompute concurrently (value-safe — boundaries only affect
#: balance), but the cache structure itself can never corrupt.
_BOUNDARY_CACHE: dict = {}
_BOUNDARY_CACHE_MAX = 256
_BOUNDARY_CACHE_LOCK = threading.Lock()

_log = logging.getLogger(__name__)

#: Spark byte-size suffixes (JavaUtils.byteStringAs): binary multiples.
_SIZE_UNITS = {
    "": 1,
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
    "p": 1 << 50,
    "pb": 1 << 50,
}


def parse_size_bytes(value) -> int:
    """Parse Spark's byte-size conf forms to an int byte count —
    ``'10485760b'`` (the DEFAULT string shape of
    ``spark.sql.autoBroadcastJoinThreshold``), ``'10MB'``, ``'1g'``,
    plain ``'10485760'``, and ``'-1'`` (disabled). Binary multiples,
    matching Spark's ``JavaUtils.byteStringAs``. ADVICE r6 #3: a bare
    ``int()`` raises on the suffixed defaults, which silently disabled
    the adaptive small-values ordinal in zip_join_update."""
    s = str(value).strip().lower()
    m = re.fullmatch(r"(-?\d+)\s*([a-z]*)", s)
    if not m or m.group(2) not in _SIZE_UNITS:
        raise ValueError(f"unparseable byte-size conf value: {value!r}")
    return int(m.group(1)) * _SIZE_UNITS[m.group(2)]


# ---------------------------------------------------------------------------
# R1 — ordered scan: DataFrames are unordered; materialize the ordinal.
# ---------------------------------------------------------------------------
def with_ordinal(
    df: DataFrame,
    order_cols: Sequence[str],
    ord_col: str = ORD_COL,
    validate_unique: bool = False,
) -> DataFrame:
    """Attach a 1-based ordinal mirroring the DOM row position (user.js:172).

    A global row_number() implies a total sort — acceptable because the
    reference's positional ops are page-scoped; at 100 TB positional
    assignment over an unkeyed table is an anti-pattern and callers
    should prefer keyed joins (see zip_join_update docstring).

    tie-order: same contract as :func:`distributed_ordinal` — a
    non-unique ``order_cols`` under-specifies the total order. The
    single-partition window makes the tie order *stable per run* but
    still engine-/layout-dependent, so any value-visible consumer
    needs tiebreakers here too. ``validate_unique=True`` adds the same
    zero-extra-job lag-adjacency guard as the distributed form:
    duplicate keys are adjacent in the window's sort, so an equality
    against ``lag`` flags them and ``raise_error`` fails the action.
    """
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    if not validate_unique:
        return df.withColumn(ord_col, F.row_number().over(w))
    # same xxhash64 lag-adjacency guard as distributed_ordinal: equal
    # keys always hash equal (no silent pass); an adjacent 64-bit
    # collision of unequal keys raises spuriously — loud and safe,
    # never silent. __wo_kh is projected below the window and both
    # window columns added back-to-back so the two Window nodes
    # collapse into one WindowExec (same CollapseWindow discipline as
    # distributed_ordinal).
    return (
        df.withColumn("__wo_kh", F.xxhash64(*[F.col(c) for c in order_cols]))
        .withColumn("__wo_rn", F.row_number().over(w))
        .withColumn(
            ord_col,
            F.when(
                F.col("__wo_kh") == F.lag("__wo_kh").over(w),
                F.raise_error(
                    F.lit(
                        "with_ordinal: order key %s is not unique — tie "
                        "order would be engine-/layout-dependent; add a "
                        "tiebreaker column" % str(list(order_cols))
                    )
                ).cast("int"),
            ).otherwise(F.col("__wo_rn")),
        )
        .drop("__wo_kh", "__wo_rn")
    )


def distributed_ordinal(
    df: DataFrame,
    order_cols: Sequence[str],
    ord_col: str = ORD_COL,
    n_parts: int | None = None,
    validate_unique: bool = False,
    bucket_cols: Sequence[str] | None = None,
    bounded_rows: int | None = None,
) -> DataFrame:
    """:func:`with_ordinal`'s 100 TB form: a global 1-based ordinal
    with NO single-partition sort node (identical output; the SCALE.md
    prescription implemented).

    Shape (round 6): driver-computed DETERMINISTIC range boundaries →
    per-row bucket id as a pure expression over the key → per-bucket
    local ``row_number`` (the window's hash exchange on the bucket id
    is the only data shuffle) → add the cumulative row count of
    earlier buckets, computed on an ``n_parts``-row offset relation
    and broadcast back. Every stage that touches data is N-way
    parallel; the only single-partition work is the running sum over N
    counter rows.

    WHY explicit boundaries and not ``repartitionByRange`` +
    ``spark_partition_id()`` (the round-4/5 shape): range-exchange
    boundaries come from reservoir sampling whose seed derives from
    the physical plan's RDD id, so two plan subtrees that each contain
    "the same" range exchange sample DIFFERENT boundaries unless
    Catalyst's ReuseExchange deduplicates them — and reuse silently
    stops firing when column pruning gives the two subtrees different
    schemas (e.g. any computed column on the input). Round 5 was
    correct only by the grace of exchange reuse; round 6's bucket id
    is a deterministic function of the row against LITERAL boundaries,
    so every recomputation agrees by construction, with no reliance on
    plan-level reuse. Cost: ONE bottom-k sketch job per call (a
    column-pruned TakeOrderedAndProject over the bucket-key columns),
    paid once on the driver.

    REQUIRES the order key to be unique per row: with ties the total
    order is under-specified, tied rows get contiguous ordinals whose
    internal order depends on the partition layout, and the result is
    nondeterministic across runs AND silently different from
    :func:`with_ordinal` wherever the tie order is value-visible.
    (Round 4 shipped exactly that bug: the fixture "key"
    ``(l_orderkey, l_linenumber)`` is only ~76% distinct, so the core
    r09 diverged from its oracle on local[32] while passing at cpus=8.)
    Callers whose natural key is not unique MUST append tiebreaker
    columns — enough payload columns to make the full tuple unique —
    and mirror the same tiebreakers in any cross-engine oracle. Pass
    ``validate_unique=True`` (or set ``SPARK_GRAFT_VALIDATE_ORDINAL=1``)
    to fail loudly on duplicate keys — validation rides the ordinal's
    own window (a ``lag`` adjacency check: duplicate keys are adjacent
    in the bucket sort and always co-bucket) and is enforced per row
    on the ordinal expression itself, so it costs no extra scan, no
    extra shuffle, and no hash distinct, and raises
    ``SparkRuntimeException`` ("order key ... is not unique") from
    ``raise_error`` at execution time.
    Because the check lives inside the ordinal's plan, it fires
    whenever the ordinal column is computed — i.e. on every action
    that could observe a tie-dependent value; an action that prunes
    the ordinal away entirely (a bare ``count()``) skips it, which is
    exactly the set of actions a tie cannot corrupt. On by default in
    every core registry query that feeds a value-visible positional
    op.

    ``bucket_cols``: optional PREFIX of ``order_cols`` used for
    boundary sampling and bucket assignment (default: all of
    ``order_cols``). Bucketing on a prefix is always order-correct —
    the full key's order refines the prefix order, so prefix-equal
    rows are key-adjacent and land in one bucket — and lets callers
    keep an expensive computed tiebreaker (e.g. r09's md5 row hash)
    out of the sample scan and the per-boundary comparisons; only
    balance degrades if the prefix is low-cardinality.

    ``bounded_rows``: a caller-GUARANTEED upper bound on the input row
    count (e.g. the n of an upstream top-n). When the bound fits one
    task (≤ 2^20 rows) the sketch job is skipped and the ordinal runs
    as a single bucket — the window is bounded by the caller's n, not
    the table, so the single partition is correct engineering, not a
    scale hazard. Do NOT pass it for SF-scaling inputs.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism
    validate = validate_unique or os.environ.get("SPARK_GRAFT_VALIDATE_ORDINAL") == "1"
    bucket_cols = list(bucket_cols) if bucket_cols is not None else list(order_cols)
    if list(order_cols)[: len(bucket_cols)] != bucket_cols:
        raise ValueError(
            f"bucket_cols {bucket_cols} must be a prefix of order_cols "
            f"{list(order_cols)} — bucketing on a non-prefix would not be "
            "monotone in the sort order"
        )
    cols = [F.col(c) for c in order_cols]
    bkey = F.struct(*[F.col(c) for c in bucket_cols])
    # --- deterministic boundaries from ONE bottom-k sketch job -------
    # Uniform-ish sample without a count(): keep the k rows with the
    # smallest row hash (TakeOrderedAndProject — each partition ships
    # only its local top-k, no full shuffle), then take even quantiles
    # as boundaries. Which rows land in the sketch can vary with hash
    # ties at the k-th value, but boundaries only steer BALANCE — the
    # output ordinal is boundary-independent, so determinism of the
    # result is unaffected.
    k = n_parts * 200
    if bounded_rows is not None and bounded_rows <= (1 << 20):
        sk: list = []  # single bucket; no sketch job for a bounded input
    else:
        # boundary memoization: keyed on the input's ANALYZED-plan
        # semantic hash + bucket key + n_parts, so repeat invocations
        # of the same query (bench reps, retried pipelines) skip the
        # sketch job. Safe by construction even if the underlying
        # files changed under an identical plan: boundaries only steer
        # BALANCE — the ordinal's value is boundary-independent.
        try:
            cache_key = (
                df._jdf.queryExecution().analyzed().semanticHash(),
                tuple(bucket_cols),
                n_parts,
            )
        except Exception:  # pragma: no cover - Connect/remote plans
            cache_key = None
        with _BOUNDARY_CACHE_LOCK:
            sk = _BOUNDARY_CACHE.get(cache_key) if cache_key is not None else None
        if sk is None:
            sk = (
                df.select(
                    *bucket_cols,
                    F.xxhash64(*[F.col(c) for c in bucket_cols]).alias("__h"),
                )
                .orderBy("__h")
                .limit(k)
                .select(*bucket_cols)
                .collect()
            )
            if cache_key is not None:
                with _BOUNDARY_CACHE_LOCK:
                    if len(_BOUNDARY_CACHE) >= _BOUNDARY_CACHE_MAX:
                        _BOUNDARY_CACHE.pop(next(iter(_BOUNDARY_CACHE)))
                    _BOUNDARY_CACHE[cache_key] = sk
    # boundary rows with NULL fields are dropped (a NULL inside a
    # struct comparison yields NULL → bucket contribution 0, which
    # would disagree with NULLS FIRST sort order at that boundary;
    # NULL-keyed DATA rows still bucket consistently — they compare
    # NULL against every boundary and land in the lowest bucket,
    # exactly where NULLS FIRST sorts them)
    sample = sorted(
        t for t in (tuple(r) for r in sk) if all(v is not None for v in t)
    )
    bnds: list = []
    m = len(sample)
    if m > n_parts:
        for i in range(1, n_parts):
            b = sample[min(m - 1, (i * m) // n_parts)]
            if not bnds or b != bnds[-1]:
                bnds.append(b)
    field_types = [df.schema[c].dataType for c in bucket_cols]

    def _blit(b):
        return F.struct(
            *[
                F.lit(v).cast(t).alias(c)
                for v, t, c in zip(b, field_types, bucket_cols)
            ]
        )

    # bucket(key) = |{b : key > b}| is monotone in the key under
    # Spark's total order regardless of boundary list order, so sample
    # quality affects only balance, never correctness
    if bnds:
        bucket = sum(
            (F.when(bkey > _blit(b), 1).otherwise(0) for b in bnds), F.lit(0)
        )
    else:
        bucket = F.lit(0)
    tagged = df.withColumn("__bkt", bucket)
    w_local = Window.partitionBy("__bkt").orderBy(*cols)
    if validate:
        # duplicate full keys are ADJACENT in the window's sort (and
        # always co-bucket, since the bucket id is a deterministic
        # function of a key prefix), so a lag() equality over the SAME
        # window spec detects them with no extra shuffle and no hash
        # distinct — O(1) per row. The comparison runs on xxhash64 of
        # the key (8 bytes through the window) instead of the full
        # struct: equal keys always hash equal, so a duplicate can
        # never slip through; an adjacent 64-bit collision of UNEQUAL
        # keys (~2^-64 per adjacent pair) would raise spuriously —
        # i.e. the failure mode errs loud-and-safe, never silent.
        # __kh is projected BELOW the window and both window columns
        # are added back-to-back: adjacent Window nodes with one spec
        # collapse into a single WindowExec (CollapseWindow) — an
        # intervening project used to force a second window pass,
        # measured ~0.35 s/600k rows.
        local = (
            tagged.withColumn("__kh", F.xxhash64(*cols))
            .withColumn("__rn", F.row_number().over(w_local))
            .withColumn(
                "__dup",
                F.when(
                    F.col("__kh") == F.lag("__kh").over(w_local), 1
                ).otherwise(0),
            )
        )
    else:
        local = tagged.withColumn("__rn", F.row_number().over(w_local))
    def _guarded(ord_expr):
        # the per-row enforcement lives on the DATA path (the window
        # that computes __dup is already there for row_number), not on
        # the offsets aggregate: hanging validation off the offsets
        # branch forced that branch to replicate the full scan +
        # exchange + sort just to reach the lag column, doubling the
        # data-path work — measured in the r09 plan as a second 11-
        # column lineitem traversal. Per-row when() costs one branch
        # per row; the raise fires the moment any duplicate key's
        # ordinal is computed.
        if not validate:
            return ord_expr
        return F.when(
            F.col("__dup") == 1,
            F.raise_error(
                F.lit(
                    "distributed_ordinal: order key %s is not unique — "
                    "tie order inside the sort would make the ordinal "
                    "nondeterministic; add a tiebreaker column"
                    % str(list(order_cols))
                )
            ).cast("bigint"),
        ).otherwise(ord_expr)

    if not bnds:
        # single bucket: every offset is identically 0, so the offsets
        # branch (and its join — which, keyed on a constant, would
        # plan a nested loop) disappears
        return local.withColumn(
            ord_col, _guarded(F.col("__rn").cast("bigint"))
        ).drop("__bkt", "__rn", "__dup", "__kh")
    w_off = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    # the offsets branch carries NO window columns, so Catalyst prunes
    # it to a 2-ish-column scan + map-side partial count — the second
    # traversal reads bucket-key bytes, not the table
    offsets = (
        local.groupBy("__bkt")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0)))
        .select("__bkt", "__off")
    )
    # no broadcast hint: offsets is n_parts rows, so the size threshold
    # (or AQE at runtime) picks the broadcast on its own — and the
    # engine's hint policy forbids hints on subtrees rooted in
    # SF-scaling scans (tests/test_plan_hygiene.py walks the leaves)
    # bigint, not int: past 2^31-1 rows an int ordinal wraps — and this
    # function exists precisely for scales where that happens (the
    # global-window with_ordinal inherits row_number's int type and its
    # limit, one more reason it is the page-scale form)
    return (
        local.join(offsets, "__bkt")
        .withColumn(
            ord_col, _guarded((F.col("__off") + F.col("__rn")).cast("bigint"))
        )
        .drop("__bkt", "__rn", "__off", "__dup", "__kh")
    )


# ---------------------------------------------------------------------------
# R2 — visibility filter (user.js:203, 434)
# ---------------------------------------------------------------------------
def visibility_filter(df: DataFrame, visible: Column) -> DataFrame:
    return df.filter(visible)


# ---------------------------------------------------------------------------
# R3/R4 — column resolution + positional cell projection (user.js:126-128, 461)
# ---------------------------------------------------------------------------
def resolve_column(df: DataFrame, index: int | None = None, name: str | None = None) -> tuple[int, str]:
    """Header click → (columnIndex, columnName); accepts either handle."""
    if index is None and name is None:
        raise ValueError("need a column index or name")
    if index is None:
        index = df.columns.index(name)  # raises ValueError like the DOM lookup returning null
    name = df.columns[index]
    return index, name


def project_positional(df: DataFrame, indexes: Sequence[int]) -> DataFrame:
    """row.querySelectorAll('td')[i] for a set of i (user.js:177-179)."""
    return df.select(*[df.columns[i] for i in indexes])


# ---------------------------------------------------------------------------
# R5 — column read-only probe: boolean ANY aggregate (user.js:167-188)
# ---------------------------------------------------------------------------
def column_is_readonly(df: DataFrame, readonly: Column) -> bool:
    """True if ANY row flags the column read-only; empty table → False
    (user.js:169,173 return false on missing/empty table)."""
    row = df.agg(F.coalesce(F.bool_or(readonly), F.lit(False)).alias("any_ro")).head()
    return bool(row["any_ro"])


# ---------------------------------------------------------------------------
# R6 — row counts: COUNT(*) + COUNT(*) FILTER (visible) in ONE pass
# (user.js:202-208 walks the row array twice; one aggregation here)
# ---------------------------------------------------------------------------
def row_counts(df: DataFrame, visible: Column) -> DataFrame:
    return df.agg(
        F.count(F.lit(1)).alias("all_rows"),
        F.sum(F.when(visible, 1).otherwise(0)).cast("bigint").alias("visible_rows"),
    )


# ---------------------------------------------------------------------------
# R7 + R11/R12 — broadcast constant update with editability guards
# (user.js:488-489 apply; user.js:477-480, 558-570 guards)
# ---------------------------------------------------------------------------
def broadcast_update(
    df: DataFrame,
    column: str,
    value,
    visible: Column | None = None,
    editable: Column | None = None,
    readonly: Column | None = None,
) -> DataFrame:
    """Set ``column`` to one constant for every visible, editable,
    non-readonly row; leave every other row's value untouched.

    The reference *skips* guarded rows (continue, user.js:477-480); the
    functional rewrite keeps them with the old value — same final table.
    """
    pred = F.lit(True)
    if visible is not None:
        pred = pred & visible
    if editable is not None:
        pred = pred & editable
    if readonly is not None:
        pred = pred & ~readonly
    old = F.col(column)
    new = F.lit(value).cast(df.schema[column].dataType)
    return df.withColumn(column, F.when(pred, new).otherwise(old))


# ---------------------------------------------------------------------------
# R8 — multi-line value parse: split + drop blank lines (user.js:297-298)
# ---------------------------------------------------------------------------
def parse_multiline(blob: str) -> list[str]:
    """Driver-side form, exact reference semantics: split('\\n') then
    drop lines that are blank AFTER trim — kept lines stay untrimmed."""
    return [line for line in blob.split("\n") if line.strip() != ""]


def split_values(col: Column, sep: str = "\n") -> Column:
    """Column form: ArrayType of non-blank segments (kept untrimmed).

    F.split takes a REGEX; the separator is \\Q…\\E-quoted so literal
    separators like '|' or '.' behave like parse_multiline's
    str.split, not like regex metacharacters."""
    return F.filter(F.split(col, "\\Q" + sep + "\\E"), lambda x: F.trim(x) != "")


# ---------------------------------------------------------------------------
# R9 — positional zip-join update (user.js:447-452, 484-486)
# ---------------------------------------------------------------------------
def zip_join_update(
    df: DataFrame,
    order_cols: Sequence[str],
    column: str,
    values: DataFrame,
    values_order_cols: Sequence[str],
    values_col: str,
    visible: Column | None = None,
    apply_when: Column | None = None,
    broadcast_values: bool = False,
    page_scale: bool = False,
    validate_unique: bool = False,
    bucket_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Assign values[i] to the i-th visible row; rows beyond
    min(len(values), len(rows)) keep their old value (the reference's
    loop bound, user.js:451).

    Spark shape: ordinal on both sides (row_number), LEFT join rows →
    values on the ordinal, coalesce(new, old). The left join + coalesce
    reproduces the min() truncation exactly: unmatched row ordinals
    (values exhausted) fall back to the old value, and surplus values
    (rows exhausted) drop out of the join.

    ``apply_when``: the reference's per-row guard (readonly/editable,
    user.js:477-480 ``continue``) — a guarded row keeps its old value
    but still CONSUMES its positional value (the loop index advances),
    which is exactly what guarding at assignment (not at the filter)
    produces.

    ``broadcast_values``: hint only when the caller knows the value
    relation is small (a dialog's pasted list); default lets AQE pick
    the join strategy — an unconditional broadcast of a caller-supplied
    relation is an OOM footgun at scale.

    Non-visible rows are retained in the output with their old values
    (the reference table keeps hidden rows — user.js:434 just skips
    them), so the operator is row-preserving standalone. A NULL
    ``visible`` is treated as not-visible (kept, untouched).

    100 TB note: both ordinals default to :func:`distributed_ordinal`
    (range-partitioned local sorts + an n_parts-row broadcast offset
    table — no single-partition sort node anywhere on the data path);
    the ordinal equi-join then shuffles normally. ``page_scale=True``
    switches back to the global-window :func:`with_ordinal`, which
    mirrors the reference's one-visible-page semantic (user.js:432-452)
    and plans fewer stages on tiny inputs, but funnels the whole table
    through one sort partition — never use it on an SF-scaling input.

    ``bucket_cols``: forwarded to :func:`distributed_ordinal` for the
    ROWS side (values side keys are caller-declared and usually cheap)
    — lets a caller whose order key ends in an expensive computed
    tiebreaker bucket on the cheap natural-key prefix.

    CORRECTNESS PRECONDITION (both ordinal strategies): ``order_cols``
    must be a deterministic TOTAL order — unique per row, or at worst
    tied only on rows that are fully identical in every output-visible
    column (then the tie permutation is value-invisible). A non-unique
    key makes the row→value assignment engine- and layout-dependent
    exactly where it is visible: at the values-exhaustion boundary,
    one tie sibling gets a new value and the other retains its old one
    (user.js:451's min-length truncation). ``validate_unique=True``
    enforces this with one aggregate per side (distributed path only).
    """
    zip_ord = "__zip_ord"  # private: must not collide with caller columns
    if page_scale:
        # the global window has the identical tie under-specification
        # as the distributed path (one partition's stable sort order
        # just hides it) — share the same fail-loud guard (ADVICE r5
        # #1: before round 6 this path silently ignored the flag)
        def ordinal(d, oc, c, bc=None):
            v = validate_unique or os.environ.get("SPARK_GRAFT_VALIDATE_ORDINAL") == "1"
            return with_ordinal(d, oc, c, validate_unique=v)
    else:
        def ordinal(d, oc, c, bc=None):
            return distributed_ordinal(
                d, oc, c, validate_unique=validate_unique, bucket_cols=bc
            )
    vis = None if visible is None else F.coalesce(visible, F.lit(False))
    rows = ordinal(
        df if vis is None else df.filter(vis), order_cols, zip_ord, bucket_cols
    )
    vals_src = values.select(
        *values_order_cols, F.col(values_col).alias("__new_value")
    )
    # adaptive values-side ordinal: a values relation under the
    # broadcast threshold (the dialog's pasted list, a small dim) takes
    # the global-window form — by definition it fits one task, and the
    # distributed form's boundary-sketch job is pure overhead there;
    # stats come from the optimized plan, no job is run. Large values
    # relations keep the sketch-bucketed scale path. broadcast_values
    # is an explicit caller override with the same meaning.
    try:
        vals_bytes = int(
            vals_src._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        threshold = parse_size_bytes(
            df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
        )
        vals_small = threshold > 0 and vals_bytes <= threshold
    except Exception:  # pragma: no cover - stats unavailable (e.g. Connect)
        _log.info(
            "zip_join_update: broadcast-threshold probe unavailable; "
            "falling back to the distributed values ordinal",
            exc_info=True,
        )
        vals_small = False
    if broadcast_values or vals_small:
        vals = with_ordinal(
            vals_src, values_order_cols, zip_ord, validate_unique=validate_unique
        )
    else:
        vals = ordinal(vals_src, values_order_cols, zip_ord)
    vals = vals.select(zip_ord, "__new_value")
    if broadcast_values:
        vals = F.broadcast(vals)
    new_val = F.coalesce(F.col("__new_value").cast(df.schema[column].dataType), F.col(column))
    if apply_when is not None:
        new_val = F.when(apply_when, new_val).otherwise(F.col(column))
    updated = (
        rows.join(vals, zip_ord, "left")
        .withColumn(column, new_val)
        .drop("__new_value", zip_ord)
    )
    if vis is not None:
        updated = updated.unionByName(df.filter(~vis))
    return updated


# ---------------------------------------------------------------------------
# R10 — limit: first N rows in table order (user.js:451, 454)
# ---------------------------------------------------------------------------
def limit_ordered(
    df: DataFrame, n: int, order_cols: Sequence[str], page_scale: bool = False
) -> DataFrame:
    """Ordered top-N with the row's global ordinal attached. Bare
    .limit(n) is order-nondeterministic in a distributed plan; the
    reference's N is positional (user.js:451), so rank first.

    Scale shape (default): ``orderBy(...).limit(n)`` — Spark plans
    TakeOrderedAndProject, i.e. each partition keeps its local top-n
    and only n·n_parts candidate rows ever move; NO full-table shuffle
    or single-partition sort of the input. The ordinal is then attached
    to the n surviving rows via :func:`distributed_ordinal`, so the
    whole plan is bounded by n, not by table size. ``page_scale=True``
    keeps the round-1 global-window form (rank everything, then
    filter ≤ n) for parity comparison.

    tie-order: invariant AS USED in the registry (r10_limit outputs
    only order-key columns + ordinal, so tied rows — including ties
    straddling the limit boundary — are interchangeable in the output
    multiset). A caller projecting NON-key payload columns must pass a
    unique ``order_cols`` (tiebreakers), or both the boundary cut and
    the ordinal assignment become layout-dependent.
    """
    if page_scale:
        return with_ordinal(df, order_cols).filter(F.col(ORD_COL) <= n)
    top = df.orderBy(*[F.col(c) for c in order_cols]).limit(n)
    # bounded_rows=n: the survivors of TakeOrderedAndProject are at
    # most n rows, so the ordinal skips its boundary-sketch job and
    # runs single-bucket — bounded by the caller's n, not table size
    return distributed_ordinal(top, order_cols, bounded_rows=n)


# ---------------------------------------------------------------------------
# R13 — checkbox boolean coercion (user.js:586-587)
# ---------------------------------------------------------------------------
def coerce_checkbox_boolean(col: Column) -> Column:
    """Case-insensitive literal 'true' → True; EVERYTHING else → False.

    Deliberately NOT cast('boolean'): Spark's cast maps 't','yes','1'
    → true and garbage → null; the reference maps only
    newValue.toLowerCase() === 'true' (no trim, so 'True ' → False).
    """
    return F.coalesce(F.lower(col) == F.lit("true"), F.lit(False))


# ---------------------------------------------------------------------------
# R14 — numeric validation + clamp (user.js:275, 287-290, 242-247)
# ---------------------------------------------------------------------------
def parse_wait_time(col: Column) -> Column:
    """parseInt-with-NaN-guard: non-numeric → NULL (the reject path,
    user.js:287-290); the live input clamp maps negatives to 0
    (user.js:242-247). Truncation toward zero matches parseInt."""
    parsed = col.try_cast("double")  # ANSI mode: plain cast throws on 'abc'
    truncated = parsed.try_cast("int")
    # greatest() ignores NULLs, which would turn the reject path into 0;
    # keep NULL (= the reference's isNaN abort, user.js:287-290).
    return F.when(truncated.isNotNull(), F.greatest(F.lit(0), truncated))


# ---------------------------------------------------------------------------
# R15 — success/error accumulation, one pass (user.js:443-444, 493, 497)
# ---------------------------------------------------------------------------
def outcome_counts(df: DataFrame, ok: Column, group_cols: Sequence[str] = ()) -> DataFrame:
    agg = [
        F.sum(F.when(ok, 1).otherwise(0)).cast("bigint").alias("success_count"),
        F.sum(F.when(~ok, 1).otherwise(0)).cast("bigint").alias("error_count"),
    ]
    return df.groupBy(*group_cols).agg(*agg) if group_cols else df.agg(*agg)


# ---------------------------------------------------------------------------
# R16 — 4-way outcome classification (user.js:502-513)
# ---------------------------------------------------------------------------
def classify_outcome(success_count: Column, error_count: Column, cancelled: Column) -> Column:
    """cancelled → 'cancelled'; errors=0 → 'success'; both>0 →
    'warning'; success=0 → 'error'. Same CASE order as the reference."""
    return (
        F.when(cancelled, F.lit("cancelled"))
        .when(error_count == 0, F.lit("success"))
        .when((success_count > 0) & (error_count > 0), F.lit("warning"))
        .otherwise(F.lit("error"))
    )


# ---------------------------------------------------------------------------
# R20 — coalesce-style editor discovery (user.js:624-664)
# ---------------------------------------------------------------------------
def coalesce_cascade(*candidates: Column) -> Column:
    """First non-null of an ordered candidate list — the exact semantic
    of the 6-stage findInputElement cascade (direct input → widget →
    active cell → many2one → focused → modal)."""
    return F.coalesce(*candidates)


# ---------------------------------------------------------------------------
# EP1 composite — the whole interactive bulk-update lifecycle
# (SURVEY.md §3 EP1: filter → [zip] → guarded update → outcome counts)
# ---------------------------------------------------------------------------
@dataclass
class BulkUpdateResult:
    updated: DataFrame
    all_rows: int
    visible_rows: int
    success_count: int
    #: guarded rows (readonly / non-editable) the run stepped over —
    #: the reference's `continue` (user.js:477-480) increments NEITHER
    #: counter for these, so they are tracked separately, not as errors.
    skipped_count: int
    #: attempted updates that failed. In this functional engine the
    #: rewrite itself cannot fail per-row (the reference's per-cell
    #: updateCell throw, user.js:497, maps to sink/commit failures
    #: which surface as exceptions, not counts), so this is 0 on the
    #: built-in paths; the field keeps the reference's run-summary shape.
    error_count: int
    outcome: str


def bulk_update_run(
    df: DataFrame,
    column: str,
    value: str | list[str],
    order_cols: Sequence[str],
    visible: Column,
    editable: Column,
    readonly: Column,
    spark: SparkSession | None = None,
) -> BulkUpdateResult:
    """EP1 end-to-end: one value (R7) or a value list (R9) applied to
    the visible rows of ``df``, guard semantics as the reference, with
    the run accounting computed in the same pass (single cache, two
    actions: the counts and the caller's eventual write).

    Accounting matches user.js:443-513: guarded rows are *skipped*
    (neither success nor error — the loop `continue`s past them), and a
    run that applied nothing reports the 'nothing-updated' outcome
    (the reference's warning toast when no row accepted the value).

    The visibility/guard flags are evaluated on the PRE-update rows
    and materialized as columns before the rewrite, so predicates that
    reference the updated column itself cannot corrupt the counts.
    """
    # NULL-valued predicates are treated as False everywhere (a row
    # whose visibility is unknown is not visible) — without this, list
    # mode would DROP such rows: they fail both filter(visible) and
    # filter(~visible).
    visible = F.coalesce(visible, F.lit(False))
    applied = visible & F.coalesce(editable, F.lit(False)) & ~F.coalesce(readonly, F.lit(False))
    # flags pinned pre-update: post-update re-evaluation would be wrong
    # whenever `visible`/`readonly` mention `column`
    base = df.withColumn("__visible", visible).withColumn("__applied", applied)

    counts = base.agg(
        F.count(F.lit(1)).alias("all"),
        F.sum(F.col("__visible").cast("int")).alias("vis"),
    ).head()
    all_rows, visible_rows = int(counts["all"]), int(counts["vis"] or 0)

    if isinstance(value, list):
        if spark is None:
            raise ValueError("value-list mode needs the SparkSession to build the value relation")
        vals = spark.createDataFrame(
            [(i + 1, v) for i, v in enumerate(value)], "ord bigint, v string"
        )
        # guard at ASSIGNMENT (apply_when): a readonly/non-editable row
        # keeps its old value but still consumes its positional value,
        # matching the reference's `continue` (user.js:477-480) where
        # the loop index advances past skipped rows. zip_join_update
        # retains the non-visible rows itself.
        updated = zip_join_update(
            base,
            order_cols,
            column,
            vals,
            ["ord"],
            "v",
            visible=F.col("__visible"),
            apply_when=F.col("__applied"),
            broadcast_values=True,  # dialog-pasted lists are small
        )
    else:
        updated = broadcast_update(base, column, value, visible=F.col("__applied"))

    # one materialization: the accounting aggregate and the caller's
    # eventual write both read the persisted update, not two plan runs
    updated = updated.persist()
    oc = outcome_counts(updated.filter(F.col("__visible")), F.col("__applied")).head()
    # sums are NULL over an empty visible set → 0
    success, skipped = int(oc["success_count"] or 0), int(oc["error_count"] or 0)
    error = 0  # per-row rewrite cannot fail; sink failures raise instead
    # R16's CASE on driver-side scalars is plain Python — no job
    if success == 0 and error == 0:
        outcome = "nothing-updated"
    elif error == 0:
        outcome = "success"
    elif success > 0:
        outcome = "warning"
    else:
        outcome = "error"
    return BulkUpdateResult(
        updated.drop("__visible", "__applied"),
        all_rows,
        visible_rows,
        success,
        skipped,
        error,
        outcome,
    )


# ===========================================================================
# Registry queries — each R-op expressed over the driver tables with a
# DuckDB oracle. The driver star schema stands in for the Odoo list
# view: o_orderstatus='O' plays "visible", '1-URGENT' plays "readonly".
# ===========================================================================
def _q_r01_scan_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tie-order: invariant — (l_orderkey, l_linenumber) is NOT unique
    in the fixture, but the output carries ONLY the order key + the
    ordinal, so tied rows are interchangeable: any tie permutation
    yields the same output multiset (unlike r09, where the zip payload
    makes tie order value-visible)."""
    li = load_table(spark, sf_dir, "lineitem")
    return with_ordinal(li, ["l_orderkey", "l_linenumber"]).select(
        "l_orderkey", "l_linenumber", ORD_COL
    )


def _q_r02_visibility_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return visibility_filter(orders, F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


def _q_r03_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    idx, name = resolve_column(customer, name="c_mktsegment")
    return project_positional(customer, [0, idx])


def _q_r05_readonly_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_or(F.col("l_discount") > 0.08).alias("any_readonly")
    )


def _q_r06_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 row counts + R5's boolean-ANY read-only probe in one
    aggregation pass (the reference walks the row array separately for
    each — user.js:167-188, 202-208; one scan here)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("all_rows"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .cast("bigint")
        .alias("visible_rows"),
        F.coalesce(F.bool_or(F.col("o_orderpriority") == "1-URGENT"), F.lit(False)).alias(
            "any_readonly"
        ),
    )


def _q_r07_broadcast_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    updated = broadcast_update(
        orders,
        "o_orderpriority",
        "9-BULK-SET",
        visible=F.col("o_orderstatus") == "O",
        readonly=F.col("o_orderpriority") == "1-URGENT",
    )
    return updated.select("o_orderkey", "o_orderpriority")


def _q_r08_multiline_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = split_values(F.col("text"), " ")
    return docs.select(
        "doc_id", F.posexplode(toks).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "token")


# (l_orderkey, l_linenumber) is NOT unique in the driver fixture (~76%
# distinct at every sf) — round 4's core r09 diverged from its oracle on
# local[32] because tied rows' ordinal order is partition-layout-
# dependent and the tie becomes value-visible at the values-exhaustion
# boundary. Full rows ARE unique (verified in DuckDB at sf0.001/0.01/0.1),
# so the deterministic total order is the declared key plus every
# remaining payload column as tiebreakers, mirrored verbatim in the
# oracle's ROW_NUMBER() ORDER BY. Round 6 measured the verdict's
# alternative — ONE md5 full-row-hash tiebreaker column
# (profile.portable_row_hash_hex, hex strings order identically in
# Spark and DuckDB) — and kept the raw columns for the CORE query: the
# md5 evaluation in the scan-side project costs more than the wider
# sort key saves (~1 s at sf0.1/local[32], measured at every
# optimization stage), because with bucket_cols the sort runs
# post-shuffle at full parallelism while md5 runs at scan parallelism.
# The hash-key form stays oracle-covered as ext `r09_zip_join_hashkey`.
# End state after the round-6 ordinal work (deterministic boundaries,
# memoized sketch, collapsed validation window, pruned offsets
# branch): full r09 min ≈ 1.2 s at sf0.1 on a quiet host — the r4
# level, now with an honest total order and a fail-loud guard.
R09_ROW_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
)
R09_ORDER_COLS = [
    "l_orderkey",
    "l_linenumber",
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
]
#: the cheap natural-key prefix used for boundary sampling/bucketing
R09_BUCKET_COLS = ["l_orderkey", "l_linenumber"]
R09_TB_COL = "__r09_rowhash"
#: order key of the ext hash-tiebreaker variant (r09_zip_join_hashkey)
R09_HASH_ORDER_COLS = ["l_orderkey", "l_linenumber", R09_TB_COL]


def r09_with_tiebreak(li: DataFrame) -> DataFrame:
    """Attach the full-row md5 tiebreaker column the r09 ordinal sorts
    on (computed map-side, zero shuffle; ~32 bytes/row of transient
    width dropped before output)."""
    from odoo_batch_processing_spark.operators.profile import portable_row_hash_hex

    return li.withColumn(R09_TB_COL, portable_row_hash_hex(R09_ROW_COLS))


def _r09_tb_sql() -> str:
    """The oracle-side twin of :func:`r09_with_tiebreak`'s column —
    generated from the same R09_ROW_COLS tuple via the shared
    portable_row_hash_hex_sql fragment."""
    from odoo_batch_processing_spark.operators.profile import portable_row_hash_hex_sql

    return portable_row_hash_hex_sql(R09_ROW_COLS)


def _q_r09_zip_join_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core r09 — since round 4 this certifies the SCALE-SAFE form:
    zip_join_update defaults to distributed_ordinal on both sides, so
    the driver's CORRECTNESS row covers the plan with no
    single-partition sort (the page-scale global-window variant is the
    ext-tier ``r09_zip_join_page``, same oracle). Since round 5 the
    ordinal key carries full-row tiebreakers (R09_ORDER_COLS) and
    ``validate_unique=True`` so a non-unique key fails loudly instead
    of silently permuting ties; since round 6 the ordinal buckets on
    the cheap natural-key prefix (R09_BUCKET_COLS) with deterministic
    driver-computed boundaries, and validation rides the ordinal's own
    window (lag adjacency) instead of a separate scan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    updated = zip_join_update(
        li,
        R09_ORDER_COLS,
        "l_returnflag",
        part,
        ["p_partkey"],
        "p_name",
        visible=F.col("l_linestatus") == "O",
        # part scales with SF — no broadcast hint; the threshold + AQE
        # decide (broadcast at fixture scale, shuffled join at 100 TB)
        broadcast_values=False,
        validate_unique=True,
        bucket_cols=R09_BUCKET_COLS,
    )
    return updated.select("l_orderkey", "l_linenumber", "l_returnflag")


def _q_r09_zip_join_hashkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-6 verdict's prescribed tiebreaker form, kept ext-tier
    under its own oracle: order key = (l_orderkey, l_linenumber,
    md5-full-row-hash) where the hash column and the oracle's
    ROW_NUMBER ORDER BY are generated from the SAME shared fragment
    pair (profile.portable_row_hash_hex / portable_row_hash_hex_sql),
    so Spark and DuckDB provably sort ties identically. Measured
    slower than the raw-column key at local scan parallelism (md5 in
    the scan-side project), so the core r09 keeps raw tiebreakers —
    see the R09_ORDER_COLS comment for numbers."""
    li = r09_with_tiebreak(load_table(spark, sf_dir, "lineitem"))
    part = load_table(spark, sf_dir, "part")
    updated = zip_join_update(
        li,
        R09_HASH_ORDER_COLS,
        "l_returnflag",
        part,
        ["p_partkey"],
        "p_name",
        visible=F.col("l_linestatus") == "O",
        broadcast_values=False,
        validate_unique=True,
        bucket_cols=R09_BUCKET_COLS,
    )
    return updated.select("l_orderkey", "l_linenumber", "l_returnflag")


def _q_r09_zip_join_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r09's page-scale parity form (``page_scale=True``): global-window
    ordinals, mirroring the reference's one-visible-page loop
    (user.js:432-452). Bit-identical to the core r09 (same oracle) —
    kept ext-tier so both physical ordinal strategies stay under
    oracle coverage after round 4 swapped the core onto
    distributed_ordinal. Same full-row tiebreaker key as the core
    (R09_ORDER_COLS) — the global window has the identical tie
    under-specification, it just hid it behind one partition's stable
    sort order. validate_unique=True here too: since round 6 the
    page-scale path shares the uniqueness guard (ADVICE r5 #1)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    updated = zip_join_update(
        li,
        R09_ORDER_COLS,
        "l_returnflag",
        part,
        ["p_partkey"],
        "p_name",
        visible=F.col("l_linestatus") == "O",
        broadcast_values=False,
        page_scale=True,
        validate_unique=True,
    )
    return updated.select("l_orderkey", "l_linenumber", "l_returnflag")


def _q_r10_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return limit_ordered(li, 100, ["l_orderkey", "l_linenumber"]).select(
        "l_orderkey", "l_linenumber", ORD_COL
    )


def _q_r13_bool_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # synthesize checkbox-ish input text from event_type, then coerce
    raw = (
        F.when(F.col("event_type") == "click", F.lit("TRUE"))
        .when(F.col("event_type") == "view", F.lit("true"))
        .when(F.col("event_type") == "signup", F.lit("True "))
        .otherwise(F.col("event_type"))
    )
    return ev.select("event_id", coerce_checkbox_boolean(raw).alias("checked"))


def _q_r14_numeric_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", parse_wait_time(F.col("value") - 50.0).alias("wait_ms"))


def _q_r13_r14_coerce_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13 checkbox coercion + R14 numeric validation/clamp in one
    projection over events (both are per-row scalar rewrites; one scan)."""
    ev = load_table(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_type") == "click", F.lit("TRUE"))
        .when(F.col("event_type") == "view", F.lit("true"))
        .when(F.col("event_type") == "signup", F.lit("True "))
        .otherwise(F.col("event_type"))
    )
    return ev.select(
        "event_id",
        coerce_checkbox_boolean(raw).alias("checked"),
        parse_wait_time(F.col("value") - 50.0).alias("wait_ms"),
    )


def _q_r15_outcome_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return outcome_counts(li, F.col("l_discount") <= 0.05, ["l_returnflag"])


def _q_r16_outcome_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_group = outcome_counts(
        li, (F.col("l_discount") <= 0.05) & (F.col("l_quantity") < 45), ["l_returnflag", "l_linestatus"]
    )
    return per_group.select(
        "l_returnflag",
        "l_linestatus",
        "success_count",
        "error_count",
        classify_outcome(
            F.col("success_count"), F.col("error_count"), F.lit(False)
        ).alias("outcome"),
    )


def _q_r20_coalesce_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R20's coalesce-cascade editor discovery over the columns picked
    by R3/R4's positional resolution (resolve_column + positional
    projection feed the cascade, so one query covers R3/R4/R20)."""
    cust = load_table(spark, sf_dir, "customer")
    idx, _name = resolve_column(cust, name="c_mktsegment")
    projected = project_positional(cust, [0, idx, 1])  # c_custkey, c_mktsegment, c_name
    return projected.select(
        "c_custkey",
        "c_mktsegment",
        coalesce_cascade(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
            F.nullif(F.col("c_name"), F.lit("")),
            F.lit("<unresolved>"),
        ).alias("editor"),
    )


# Core catalog (driver-checked): one entry per reference-op family —
# r10 exercises R1's ordinal, r06 folds in R5's ANY probe, r13_r14
# merges the two scalar rewrites, r16 includes R15's counts, r20 folds
# in R3/R4's positional projection. The standalone micro-queries stay
# registered in the extended catalog (oracle-checked locally via
# tools/oracle_check --extended).
QUERIES = {
    "r02_visibility_filter": _q_r02_visibility_filter,
    "r06_counts": _q_r06_counts,
    "r07_broadcast_update": _q_r07_broadcast_update,
    "r09_zip_join_update": _q_r09_zip_join_update,
    "r10_limit": _q_r10_limit,
    "r13_r14_coerce_clamp": _q_r13_r14_coerce_clamp,
    "r16_outcome_classify": _q_r16_outcome_classify,
    "r20_coalesce_cascade": _q_r20_coalesce_cascade,
}

QUERIES_EXT = {
    # demoted round 3 (VERDICT r2 #8): R8's parse semantics are already
    # covered by x5's tokenization and r09's ordered zip; the slot went
    # to x3_incremental_neardup
    "r08_multiline_parse": _q_r08_multiline_parse,
    "r09_zip_join_page": _q_r09_zip_join_page,
    "r01_scan_ordinal": _q_r01_scan_ordinal,
    "r03_projection": _q_r03_projection,
    "r05_readonly_any": _q_r05_readonly_any,
    "r13_bool_coercion": _q_r13_bool_coercion,
    "r14_numeric_clamp": _q_r14_numeric_clamp,
    "r15_outcome_counts": _q_r15_outcome_counts,
}

ORACLES = {
    "r02_visibility_filter": """
        SELECT o_orderkey, o_custkey, o_orderstatus
        FROM orders WHERE o_orderstatus = 'O'
    """,
    "r06_counts": """
        SELECT COUNT(1) AS all_rows,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS visible_rows,
               COALESCE(bool_or(o_orderpriority = '1-URGENT'), FALSE) AS any_readonly
        FROM orders
    """,
    "r07_broadcast_update": """
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'O' AND NOT (o_orderpriority = '1-URGENT')
                    THEN '9-BULK-SET' ELSE o_orderpriority END AS o_orderpriority
        FROM orders
    """,
    # rows_ord ORDER BY mirrors R09_ORDER_COLS verbatim: the declared
    # positional key is non-unique, so the full-row tiebreakers are
    # load-bearing for cross-engine determinism (fixture is NULL-free;
    # with NULLs the clause would also need NULLS FIRST to match Spark)
    "r09_zip_join_update": """
        WITH rows_ord AS (
            SELECT l_orderkey, l_linenumber, l_returnflag,
                   ROW_NUMBER() OVER (ORDER BY
                       l_orderkey, l_linenumber, l_partkey, l_suppkey,
                       l_quantity, l_extendedprice, l_discount, l_tax,
                       l_returnflag, l_linestatus, l_shipdate) AS ord
            FROM lineitem WHERE l_linestatus = 'O'
        ), vals_ord AS (
            SELECT p_name, ROW_NUMBER() OVER (ORDER BY p_partkey) AS ord
            FROM part
        )
        SELECT r.l_orderkey, r.l_linenumber,
               COALESCE(v.p_name, r.l_returnflag) AS l_returnflag
        FROM rows_ord r LEFT JOIN vals_ord v USING (ord)
        UNION ALL
        SELECT l_orderkey, l_linenumber, l_returnflag
        FROM lineitem WHERE NOT (l_linestatus = 'O')
    """,
    "r10_limit": """
        SELECT l_orderkey, l_linenumber, row_ord FROM (
            SELECT l_orderkey, l_linenumber,
                   ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS row_ord
            FROM lineitem
        ) WHERE row_ord <= 100
    """,
    "r13_r14_coerce_clamp": """
        SELECT event_id,
               COALESCE(lower(CASE WHEN event_type = 'click'  THEN 'TRUE'
                                   WHEN event_type = 'view'   THEN 'true'
                                   WHEN event_type = 'signup' THEN 'True '
                                   ELSE event_type END) = 'true', FALSE) AS checked,
               GREATEST(0, CAST(trunc(value - 50.0) AS INTEGER)) AS wait_ms
        FROM events
    """,
    "r16_outcome_classify": """
        WITH counts AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CASE WHEN l_discount <= 0.05 AND l_quantity < 45 THEN 1 ELSE 0 END) AS BIGINT) AS success_count,
                   CAST(SUM(CASE WHEN NOT (l_discount <= 0.05 AND l_quantity < 45) THEN 1 ELSE 0 END) AS BIGINT) AS error_count
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        )
        SELECT l_returnflag, l_linestatus, success_count, error_count,
               CASE WHEN FALSE THEN 'cancelled'
                    WHEN error_count = 0 THEN 'success'
                    WHEN success_count > 0 AND error_count > 0 THEN 'warning'
                    ELSE 'error' END AS outcome
        FROM counts
    """,
    "r20_coalesce_cascade": """
        SELECT c_custkey, c_mktsegment,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'),
                        NULLIF(c_name, ''),
                        '<unresolved>') AS editor
        FROM customer
    """,
}

ORACLES_EXT = {
    "r08_multiline_parse": """
        SELECT doc_id,
               CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
               unnest(toks) AS token
        FROM (
            SELECT doc_id, list_filter(string_split(text, ' '), x -> trim(x) <> '') AS toks
            FROM documents WHERE doc_id < 50
        )
    """,
    "r01_scan_ordinal": """
        SELECT l_orderkey, l_linenumber,
               CAST(ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS INTEGER) AS row_ord
        FROM lineitem
    """,
    "r03_projection": """
        SELECT c_custkey, c_mktsegment FROM customer
    """,
    "r05_readonly_any": """
        SELECT l_returnflag, bool_or(l_discount > 0.08) AS any_readonly
        FROM lineitem GROUP BY l_returnflag
    """,
    "r13_bool_coercion": """
        SELECT event_id,
               COALESCE(lower(CASE WHEN event_type = 'click'  THEN 'TRUE'
                                   WHEN event_type = 'view'   THEN 'true'
                                   WHEN event_type = 'signup' THEN 'True '
                                   ELSE event_type END) = 'true', FALSE) AS checked
        FROM events
    """,
    "r14_numeric_clamp": """
        SELECT event_id,
               GREATEST(0, CAST(trunc(value - 50.0) AS INTEGER)) AS wait_ms
        FROM events
    """,
    "r15_outcome_counts": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_discount <= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS success_count,
               CAST(SUM(CASE WHEN NOT (l_discount <= 0.05) THEN 1 ELSE 0 END) AS BIGINT) AS error_count
        FROM lineitem GROUP BY l_returnflag
    """,
}

# identical output contract to the core r09 — only the physical
# ordinal strategy differs (core = distributed_ordinal since round 4;
# this ext entry keeps the page-scale global-window form oracle-checked)
ORACLES_EXT["r09_zip_join_page"] = ORACLES["r09_zip_join_update"]

QUERIES_EXT["r09_zip_join_hashkey"] = _q_r09_zip_join_hashkey
# the md5 tiebreaker in the ORDER BY is generated from the SAME
# R09_ROW_COLS tuple as the Spark column (shared fragment pair in
# profile.py), so query and oracle cannot drift
ORACLES_EXT["r09_zip_join_hashkey"] = """
    WITH rows_ord AS (
        SELECT l_orderkey, l_linenumber, l_returnflag,
               ROW_NUMBER() OVER (ORDER BY
                   l_orderkey, l_linenumber,
                   {tb}) AS ord
        FROM lineitem WHERE l_linestatus = 'O'
    ), vals_ord AS (
        SELECT p_name, ROW_NUMBER() OVER (ORDER BY p_partkey) AS ord
        FROM part
    )
    SELECT r.l_orderkey, r.l_linenumber,
           COALESCE(v.p_name, r.l_returnflag) AS l_returnflag
    FROM rows_ord r LEFT JOIN vals_ord v USING (ord)
    UNION ALL
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem WHERE NOT (l_linestatus = 'O')
""".format(tb=_r09_tb_sql())


# ROTATION_R17 (registry.py): three reference-semantics rows vacate
# seats for the never-audited promotions — r06 (counting), r13/r14
# (coercion/clamp) and r20 (coalesce cascade) have been driver-audited
# every round since round 1 and stay under the local oracle + the R-row
# parity tests; the family keeps five core rows (r02/r07/r09/r10/r16).
QUERIES_EXT["r06_counts"] = QUERIES.pop("r06_counts")
ORACLES_EXT["r06_counts"] = ORACLES.pop("r06_counts")
QUERIES_EXT["r13_r14_coerce_clamp"] = QUERIES.pop("r13_r14_coerce_clamp")
ORACLES_EXT["r13_r14_coerce_clamp"] = ORACLES.pop("r13_r14_coerce_clamp")
QUERIES_EXT["r20_coalesce_cascade"] = QUERIES.pop("r20_coalesce_cascade")
ORACLES_EXT["r20_coalesce_cascade"] = ORACLES.pop("r20_coalesce_cascade")
