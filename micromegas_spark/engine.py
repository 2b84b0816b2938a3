"""Engine facade — the analogue of the reference's query service session
(rust/analytics/src/lakehouse/query.rs:207-256 make_session_context +
flight_sql_service_impl.rs query-range headers).

``Engine.query(sql, begin_ns, end_ns)`` is the client surface: every
registered view is (re)registered as a temp view bounded to the query range
before ``spark.sql`` runs — the Spark-idiomatic equivalent of the
reference's TableScanRewrite analyzer rule (table_scan_rewrite.rs:59-72,
SURVEY §4: option (a), bake the range into the view DataFrames).

``Engine.view_instance(view_set, instance, begin, end)`` is the JIT path
(SURVEY §3.2): a manifest-checked lazy materialization keyed by
(view_set, instance, insert-bucket) whose staleness hash is the source
event count — stale or missing buckets are rebuilt by the view's builder
(e.g. the thread-span call-tree job) before the partition-pruned read.
"""

from __future__ import annotations

from micromegas_spark.flightsql.errors import InvalidArgument

import json
import os
import threading
import time
import uuid
from collections.abc import Callable
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from micromegas_spark.functions import register_all
from micromegas_spark.session import configure

# builder(begin_ns|None, end_ns|None) -> DataFrame
ViewBuilder = Callable[[int | None, int | None], DataFrame]

# Temp views are SESSION-global, so two Engines (or two threads on one
# Engine) planning concurrently on one SparkSession could resolve each
# other's range-bounded views. Spark analyzes eagerly inside spark.sql()
# — each temp view's logical plan is SUBSTITUTED into the returned
# DataFrame at that moment — so holding this lock across
# (prepare_views → spark.sql) makes register+analyze atomic: once
# resolve() returns, later view replacement cannot retarget the plan.
# The lock serializes only ms-scale driver planning, never execution
# (the reference gets the same isolation from a fresh SessionContext
# per query, rust/analytics/src/lakehouse/query.rs:207-256).
_PLAN_LOCK = threading.RLock()


@contextmanager
def job_group(sc_or_df, query_id: str | None = None, description: str = ""):
    """Scope Spark job-group attribution (#1406 audit) to a block: set on
    entry, CLEARED on exit — a group left ambient on the thread would
    attribute the NEXT query's jobs to this query_id. Pass a DataFrame
    returned by resolve() to key off its ``_mm_query_id`` (no-op when the
    DataFrame wasn't produced by the engine), or an explicit
    (SparkContext, query_id)."""
    if isinstance(sc_or_df, DataFrame):
        sc = sc_or_df.sparkSession.sparkContext
        query_id = getattr(sc_or_df, "_mm_query_id", None)
        if not query_id:
            yield
            return
    else:
        sc = sc_or_df
    sc.setJobGroup(query_id, description.strip()[:128])
    try:
        yield
    finally:
        # setLocalProperty(None) removes the property JVM-side — the
        # thread returns to unattributed, never to a stale group
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)


def ensure_begin_non_decreasing(df: DataFrame, col: str, context: str) -> None:
    """Write-time batch-order check (reference #1429: thread_spans gained
    ``ensure_begin_non_decreasing`` on the produced batch; net_spans
    certifies the same order): validate that ``col`` never DECREASES in
    the builder's own row order. The builders sort each group by begin
    before emitting, and the JIT read path (like the reference's
    ScanOrdering::Concatenated) relies on that — an out-of-order batch is
    a builder bug worth failing loudly at write, not a corrupt partition
    discovered at query time.

    Row order is taken per Spark partition (monotonically_increasing_id
    is partition-prefixed, so ordering by it inside spark_partition_id
    reconstructs physical row order); a JIT partition is bounded by
    max_nb_objects, so this is one cheap bounded job per build."""
    from pyspark.sql import Window

    tagged = df.select(
        F.col(col).alias("_b"),
        F.spark_partition_id().alias("_p"),
        F.monotonically_increasing_id().alias("_i"),
    )
    w = Window.partitionBy("_p").orderBy("_i")
    n_bad = (
        tagged.withColumn("_prev", F.lag("_b").over(w))
        .where(F.col("_prev") > F.col("_b"))
        .count()
    )
    if n_bad:
        raise RuntimeError(
            f"JIT partition {context}: {n_bad} row(s) with decreasing "
            f"{col!r} in builder output — the begin-sorted batch contract "
            "(#1429 ensure_begin_non_decreasing) is violated"
        )


def attributed_iter(sc, query_id: str, description: str, inner, check=None):
    """Re-pin the job group around EVERY pull of ``inner``: Flight resumes
    result generators on gRPC serving threads where OTHER queries may run
    between pulls, so a set-once group would attribute this stream's late
    batches to whichever query ran last on the thread (and vice versa).
    ``check`` (optional) runs before each pull — the server passes the
    engine's spill-budget guard so an over-budget query aborts between
    batches instead of exhausting the scratch volume."""
    it = iter(inner)
    while True:
        if check is not None:
            check()
        with job_group(sc, query_id, description):
            try:
                item = next(it)
            except StopIteration:
                return
        yield item


def _sql_data_spans(sql: str) -> list[bool]:
    """Mark every character of ``sql`` that is DATA rather than live
    statement text, per the Spark SQL grammar: single-quoted strings ('')
    escaping), double-quoted strings (Spark's default non-ANSI mode reads
    "..." as a string literal; under ANSI it's an identifier — either way
    not a function call, with "" escaping), backtick-quoted identifiers
    (`` escaping), `--` line comments, and bracketed comments (nested,
    as Spark has allowed since 3.0). Inside ' and " spans a backslash
    escapes the next character ('it\\'s'), per Spark's DEFAULT string
    parsing (SqlBaseLexer.g4 STRING); backticks take no backslash escape.
    Caveat: under spark.sql.parser.escapedStringLiterals=true (Hive
    compatibility) backslash is a literal character — input written for
    that mode is unsupported here and may desync the scanner. The
    view_instance rewrite consults this so occurrences inside any of
    those spans are never counted as calls."""
    n = len(sql)
    data = [False] * n
    i = 0
    while i < n:
        c = sql[i]
        if c in ("'", '"', "`"):
            j = i + 1
            while j < n:
                if c != "`" and sql[j] == "\\":  # backslash escape
                    j += 2
                    continue
                if sql[j] == c:
                    if j + 1 < n and sql[j + 1] == c:  # doubled = escape
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i, min(j + 1, n)):
                data[k] = True
            i = j + 1
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":
            j = i
            while j < n and sql[j] != "\n":
                data[j] = True
                j += 1
            i = j
        elif c == "/" and i + 1 < n and sql[i + 1] == "*":
            depth, j = 1, i + 2
            while j < n and depth:
                if sql[j] == "/" and j + 1 < n and sql[j + 1] == "*":
                    depth += 1
                    j += 2
                elif sql[j] == "*" and j + 1 < n and sql[j + 1] == "/":
                    depth -= 1
                    j += 2
                else:
                    j += 1
            for k in range(i, min(j, n)):
                data[k] = True
            i = j
        else:
            i += 1
    return data


@dataclass
class JitViewSet:
    """Per-instance lazily-materialized view set (thread_spans-style).

    - ``source(instance)``      → the instance's raw event DataFrame
    - ``count(instance, b, e)`` → source hash for staleness (object count)
    - ``build(instance, b, e)`` → the decoded/derived DataFrame to cache

    Block-aware mode (reference #1429, event-time JIT grouping): when
    ``list_blocks``/``build_blocks`` are provided, view_instance() cuts
    JIT partitions from the instance's *block list ordered by event time*
    (``(begin_ns, end_ns)``) instead of fixed insert-time buckets — see
    ``group_blocks_into_partitions``. ``list_blocks(instance, b, e)``
    returns block descriptors ``{block_id, begin_ns, end_ns, insert_ns,
    nb_objects}`` whose EVENT range overlaps [b, e); ``build_blocks(
    instance, block_ids)`` builds the derived DataFrame from exactly those
    blocks' events (the builder time-sorts the concatenated events, so
    call trees span block boundaries and overlapping blocks — a producer
    stamping the replacement block's begin before closing the outgoing
    one — interleave correctly: the gap-only ``begin <= last_end``
    contiguity of the reference's fix falls out of the sort rather than a
    per-block merge)."""

    name: str
    source_count: Callable[[str, int, int], int]
    build: Callable[[str, int, int], DataFrame]
    time_column: str
    # block-aware JIT (optional; enables the event-time grouping path)
    list_blocks: Callable[[str, int, int], list] | None = None
    build_blocks: Callable[[str, list], DataFrame] | None = None
    max_nb_objects: int = 100_000
    # write-time ensure_begin_non_decreasing (reference #1429: both
    # thread_spans and net_spans certify their produced batches are
    # begin-sorted): when True, a newly built JIT partition is validated
    # non-decreasing on time_column in its builder row order before the
    # parquet write, catching builder regressions that would corrupt the
    # certified scan order
    ensure_begin_non_decreasing: bool = False


def group_blocks_into_partitions(
    blocks: list[dict], max_nb_objects: int
) -> list[list[dict]]:
    """Cut a stream's blocks into JIT partitions by EVENT time with
    insert-safe cuts (reference #1429; jit_partitions.rs
    group_blocks_into_partitions after the fix).

    Blocks are sorted by ``(begin_ns, end_ns)`` — event time, not
    registration order — so a stream whose blocks were registered out of
    event-time order still yields partitions holding event-contiguous
    blocks (call trees assemble across block boundaries inside one
    partition). Because event-time order can put blocks with out-of-order
    ``insert_ns`` on either side of a size-based cut, a cut is taken only
    at *insert-safe* points: every block in the partition being closed
    inserted no later than every remaining block (prefix-max insert ≤
    suffix-min insert). When the soft ``max_nb_objects`` limit is reached
    at an unsafe index, the cut falls back to the most recent safe index
    inside the open partition, or — failing any — the partition grows past
    the soft limit until the next safe point. This keeps partitions'
    insert-time ranges non-overlapping (the reference's
    lakehouse_partitions_no_overlap exclusion constraint)."""
    if not blocks:
        return []
    bs = sorted(blocks, key=lambda b: (b["begin_ns"], b["end_ns"]))
    n = len(bs)
    # suffix min of insert_ns: cut after index i is insert-safe iff
    # max(insert[0..i]) <= min(insert[i+1..])
    suffix_min = [0] * n
    m = None
    for i in range(n - 1, -1, -1):
        m = bs[i]["insert_ns"] if m is None else min(m, bs[i]["insert_ns"])
        suffix_min[i] = m

    parts: list[list[dict]] = []
    start = 0
    while start < n:
        prefix_max = None
        count = 0
        last_safe = -1  # most recent safe cut index within this partition
        cut = None
        for i in range(start, n):
            nb = bs[i]["nb_objects"]
            # cut BEFORE accumulating the block that would overflow
            # (reference partition.rs: full = nb_objects + block > max &&
            # i > start), so partitions stay <= max_nb_objects whenever a
            # safe cut exists; last_safe < i, so >= start implies i > start
            if count + nb > max_nb_objects and last_safe >= start:
                cut = last_safe
                break
            prefix_max = (
                bs[i]["insert_ns"]
                if prefix_max is None
                else max(prefix_max, bs[i]["insert_ns"])
            )
            count += nb
            safe = i == n - 1 or prefix_max <= suffix_min[i + 1]
            if safe:
                last_safe = i
                if count >= max_nb_objects:
                    # at/over the limit with no earlier safe point (one
                    # oversized block, or growth across an unsafe stretch
                    # — reference logs debug! there): cut at the first
                    # safe index once the limit is reached
                    cut = i
                    break
        if cut is None:
            cut = last_safe if last_safe >= start else n - 1
        parts.append(bs[start : cut + 1])
        start = cut + 1
    return parts


class Engine:
    QUERY_LOG_MAX = 1000  # rotation cap for the self-observability log

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str | None = None,
        admin: bool = True,
        max_spill_mb: float | None = None,
    ):
        self.spark = configure(spark)
        register_all(spark)
        self.warehouse = warehouse or os.path.join(os.getcwd(), ".warehouse")
        # spill budget (reference MICROMEGAS_DATAFUSION_MAX_TEMP_DIRECTORY_MB,
        # CHANGELOG.md:11): cap a query's disk spill so one runaway sort
        # can't exhaust the shared scratch volume. None = unlimited.
        # Enforced between result-batch pulls via the #1406 job-group task
        # metrics (check_spill_budget) — the Spark analogue of the
        # reference's disk-manager allocation check.
        if max_spill_mb is None:
            env = os.environ.get("MICROMEGAS_SPARK_MAX_SPILL_MB")
            max_spill_mb = float(env) if env else None
        self.max_spill_mb = max_spill_mb
        # admin gating parity (reference query.rs:150-175: admin UDTFs are
        # simply NOT REGISTERED for non-admin sessions, so calling one
        # reports "not found" — functions-reference.md:5). Non-admin
        # engines raise the same way from the partition-admin surface.
        self.admin = admin
        # URI-addressed warehouse (fslayer.py): plain path, file://, or an
        # object-store scheme — the JIT cache and the Lakehouse share the
        # manifest-is-the-commit discipline, so no code path relies on
        # rename existing on the store
        from micromegas_spark.fslayer import WarehouseFS

        self.fs = WarehouseFS(self.warehouse)
        self.fs.mkdirs(self.fs.url())
        self._views: dict[str, ViewBuilder] = {}
        self._time_columns: dict[str, str] = {}
        self._jit: dict[str, JitViewSet] = {}
        # bounded: a long-lived engine must not grow per-query driver
        # state without limit (and the view re-materialization cost is
        # proportional to the log length)
        from collections import deque

        self._query_log: "deque[tuple]" = deque(maxlen=self.QUERY_LOG_MAX)

    # -- global views --------------------------------------------------------

    def register_view(
        self, name: str, builder: ViewBuilder, time_column: str | None = None
    ) -> None:
        """Register a view-set builder. ``time_column`` (epoch-ns BIGINT)
    enables the per-view time filter (P5: point views get
    ``time BETWEEN``; the builder itself may prune partitions)."""
        if name.lower() == "query_log":
            raise InvalidArgument(
                "'query_log' is the engine's self-observability view and "
                "cannot be shadowed by a registered view"
            )
        self._views[name] = builder
        if time_column:
            self._time_columns[name] = time_column

    def register_table(self, name: str, df: DataFrame, time_column: str | None = None) -> None:
        self.register_view(name, lambda b, e, _df=df: _df, time_column)

    def prepare_views(
        self, sql: str, begin_ns: int | None = None, end_ns: int | None = None
    ) -> None:
        """(Re)register every view the statement may read, range-bounded.
        Factored out of query() so the prepared-statement paths (which
        must run spark.sql themselves to bind parameters) get IDENTICAL
        resolution — including the lazy query_log and admin-catalog
        views keyed on the statement's OWN text, not a placeholder."""
        # lazy: materializing the log view costs O(len(log)) driver work,
        # so only refresh it when the statement can actually read it
        # (case-insensitive: Spark resolves view names case-insensitively;
        # word-bounded so 'my_query_log_2' or a string literal containing
        # the token doesn't trigger the O(len(log)) refresh — a FALSE
        # positive only wastes work, a quoted-identifier miss is benign)
        import re as _re

        low = sql.lower()
        if _re.search(r"\bquery_log\b", low):
            self._register_query_log_view()
        # SQL spellings of the catalog introspection functions: the
        # reference registers list_partitions/list_view_sets for EVERY
        # session (query.rs:113-120 — OUTSIDE the is_admin block; its
        # functions-reference.md marks only retire/materialize/regenerate/
        # retire_partition_by_file as 'Requires admin'). Registered lazily
        # on reference so unrelated statements never pay the catalog scan;
        # the admin gate lives solely on the mutating surface
        # (require_admin in client.py / Lakehouse).
        for name, build in (
            ("list_partitions", lambda: self.lakehouse.partitions_df()),
            (
                "list_view_sets",
                lambda: self.spark.createDataFrame(
                    [(v,) for v in self.lakehouse.list_view_sets()],
                    "view_set_name STRING",
                ),
            ),
        ):
            if _re.search(rf"\b{name}\b", low):
                build().createOrReplaceTempView(name)
        for name, builder in self._views.items():
            df = builder(begin_ns, end_ns)
            tc = self._time_columns.get(name)
            if tc is not None:
                if begin_ns is not None:
                    df = df.where(F.col(tc) >= begin_ns)
                if end_ns is not None:
                    df = df.where(F.col(tc) < end_ns)
            df.createOrReplaceTempView(name)

    def log_query(
        self,
        sql: str,
        begin_ns: int | None,
        end_ns: int | None,
        plan_ms: float,
        query_id: str | None = None,
        error_class: str = "ok",
    ) -> None:
        """Append one audit record (see query_log); the prepared-statement
        paths call this with THEIR sql so every executed statement leaves
        a record, not just direct query() calls. ``query_id`` correlates
        the record with client-facing error messages and server logs;
        ``error_class`` is 'ok' or the #1435 classification
        (user/resource/unimplemented/internal) when planning failed."""
        self._query_log.append(
            (
                time.time_ns(),
                sql.strip(),
                begin_ns,
                end_ns,
                round(plan_ms, 3),
                query_id or "",
                error_class,
            )
        )

    def _rewrite_view_instance(
        self, sql: str, begin_ns: int | None, end_ns: int | None
    ) -> str:
        """SQL spelling of the JIT path — ``FROM view_instance('set',
        'instance')`` inside arbitrary statements (the reference's primary
        documented UX; view_instance_table_function.rs:49-70 evaluates the
        two args at plan time from literals exactly like this). Each
        distinct literal call materializes through the existing Python
        view_instance() (manifest-cached parquet, block-aware when the
        view set declares blocks), registers a deterministic temp view,
        and the call text is substituted with the view name — the scan
        never routes through a Python UDTF (udtfs.py:11 documents why
        that spelling is the scale anti-pattern).

        Non-literal arguments are the CALLER's error (the reference
        rejects them at plan time too): any view_instance( call not in
        two-string-literal form raises InvalidArgument (#1435 'user').
        Occurrences inside SQL string literals ('' / "" escaping per the
        Spark grammar, which treats double-quoted text as strings in its
        default non-ANSI mode), backtick-quoted identifiers, `--` line
        comments and (nested) bracketed comments are DATA, not calls —
        the rewrite lexes those spans first and touches only live text.
        Call detection is identifier-anchored so e.g.
        my_view_instance(...) is someone else's function, never rewritten
        mid-identifier. Runs under _PLAN_LOCK like all planning; the
        temp-view name is keyed on (set, instance) — sanitized + a short
        stable hash so distinct keys can never alias one slot — and
        repeat queries reuse one registration (register+analyze is
        atomic under the lock, so a later re-register cannot retarget an
        already-analyzed plan)."""
        import hashlib as _hashlib
        import re as _re

        if "view_instance" not in sql.lower():
            return sql
        self._reject_escaped_string_literals("view_instance()")
        in_data = _sql_data_spans(sql)
        # one arg literal = single-quoted with '' escaping (Spark grammar)
        _arg = r"'((?:[^']|'')*)'"
        lit = _re.compile(
            r"(?<![A-Za-z0-9_])view_instance\s*\(\s*%s\s*,\s*%s\s*\)" % (_arg, _arg),
            _re.I,
        )
        calls = [
            m
            for m in _re.finditer(
                r"(?<![A-Za-z0-9_])view_instance\s*\(", sql, _re.I
            )
            if not in_data[m.start()]
        ]
        matches = [m for m in lit.finditer(sql) if not in_data[m.start()]]
        if len(calls) != len(matches):
            raise InvalidArgument(
                "view_instance() requires two string-literal arguments "
                "(view_set, instance_id) — they are evaluated at plan time"
            )
        if not matches:
            return sql
        made: dict[tuple, str] = {}

        def name_for(key: tuple) -> str:
            if key not in made:
                df = self.view_instance(
                    key[0],
                    key[1],
                    begin_ns if begin_ns is not None else 0,
                    end_ns if end_ns is not None else 2**62,
                )
                # sanitized-for-readability + stable hash-for-uniqueness:
                # the [^w]→_ sanitizer alone maps distinct keys (e.g.
                # ('a','b-c') vs ('a','b_c')) to one name, which would let
                # a later createOrReplaceTempView retarget the earlier
                # substitution in the same statement
                tag = _hashlib.sha1(
                    ("\x00".join(key)).encode("utf-8")
                ).hexdigest()[:8]
                name = "_vi_" + _re.sub(
                    r"[^A-Za-z0-9_]", "_", f"{key[0]}__{key[1]}"
                ) + "_" + tag
                df.createOrReplaceTempView(name)
                made[key] = name
            return made[key]

        out, last = [], 0
        for m in matches:
            out.append(sql[last : m.start()])
            # undo the SQL grammar's '' escaping — the literal's VALUE is
            # the instance key, not its source spelling
            out.append(
                name_for(
                    (
                        m.group(1).replace("''", "'"),
                        m.group(2).replace("''", "'"),
                    )
                )
            )
            last = m.end()
        out.append(sql[last:])
        return "".join(out)

    def _reject_escaped_string_literals(self, what: str) -> None:
        """The plan-time literal scanner (_sql_data_spans) lexes backslash
        escapes per Spark's DEFAULT string grammar; under
        spark.sql.parser.escapedStringLiterals=true (Hive compatibility)
        backslash is a literal character, so the scanner could silently
        desync on input written for that mode. Refuse loudly instead —
        the docstring caveat promoted to an error. Checked whenever the
        rewritten function name appears at all: the scanner itself is
        what decides whether an occurrence is live, and under the
        unsupported mode its verdict can't be trusted."""
        if (
            self.spark.conf.get(
                "spark.sql.parser.escapedStringLiterals", "false"
            ).lower()
            == "true"
        ):
            raise InvalidArgument(
                f"{what} cannot be rewritten under "
                "spark.sql.parser.escapedStringLiterals=true — the "
                "plan-time literal scanner assumes Spark's default string "
                "grammar (backslash escapes); unset the conf or use the "
                "Python API directly"
            )

    # admin table functions whose SQL spelling returns the op's task log
    # (S11); all take (view, begin, end) string literals, materialize/
    # regenerate additionally a trailing integer (delta seconds).
    _ADMIN_TABLE_FNS = (
        "materialize_partitions",
        "regenerate_partitions",
        "retire_partitions",
    )

    def _rewrite_admin_calls(
        self, sql: str, created_views: list | None = None
    ) -> str:
        """SQL spelling of the partition-admin surface — the reference's
        documented admin UX (functions-reference.md 'Requires admin';
        materialize/retire/regenerate `*_table_function.rs`): each call
        RETURNS the operation's progress log as a (time, msg) relation
        (TaskLogExecPlan, dfext/task_log_exec_plan.rs:35-60 — SURVEY §2.1
        S11; the Spark-side semantics and the documented streaming delta
        live in materialize/tasklog.py).

        Same lexing/substitution contract as _rewrite_view_instance:
        string/comment spans are data, calls are identifier-anchored,
        arguments must be literals (evaluated at plan time, like the
        reference's exp_to_string/exp_to_timestamp), and each call runs
        ONCE — eagerly, in ascending source position, so a statement
        mixing functions (retire then materialize) observes its own
        left-to-right order against the shared catalog. Argument errors
        (non-literal args, non-positive delta, unknown view) raise BEFORE
        any op runs — all calls validate first, like the reference's
        plan-time argument evaluation; a failure of the op ITSELF becomes
        the log's final row and the statement still succeeds (the
        reference's spawner writes the task error as the last log entry,
        materialize_partitions_table_function.rs). Admin gating is
        require_admin's "not found" parity: a non-admin session never has
        these functions registered. Timestamps accept ISO strings or raw
        epoch-ns integer spellings; materialize/regenerate take a
        trailing positive integer partition delta in seconds. Each log's
        temp view is recorded in ``created_views`` so resolve() can drop
        it once the statement is analyzed — the log must not stay
        queryable by later statements (or by a non-admin Engine sharing
        the SparkSession)."""
        import hashlib as _hashlib
        import re as _re

        from micromegas_spark.materialize.tasklog import TaskLog
        from micromegas_spark.timeutils import to_epoch_ns

        low = sql.lower()
        live = [f for f in self._ADMIN_TABLE_FNS if f in low]
        if not live:
            return sql
        self._reject_escaped_string_literals("partition-admin table functions")
        _arg = r"'((?:[^']|'')*)'"

        def _ns(lit: str) -> int:
            lit = lit.replace("''", "'").strip()
            if _re.fullmatch(r"-?\d+", lit):
                return int(lit)
            return to_epoch_ns(lit)

        in_data = _sql_data_spans(sql)
        matches: list[tuple] = []  # (match, fn)
        for fn in live:
            calls = [
                m
                for m in _re.finditer(rf"(?<![A-Za-z0-9_]){fn}\s*\(", sql, _re.I)
                if not in_data[m.start()]
            ]
            if not calls:
                continue
            self.require_admin(fn)
            tail = r"" if fn == "retire_partitions" else r"\s*,\s*(-?\d+)"
            lit = _re.compile(
                rf"(?<![A-Za-z0-9_]){fn}\s*\(\s*{_arg}\s*,\s*{_arg}\s*,\s*{_arg}{tail}\s*\)",
                _re.I,
            )
            found = [m for m in lit.finditer(sql) if not in_data[m.start()]]
            if len(calls) != len(found):
                raise InvalidArgument(
                    f"{fn}() requires literal arguments "
                    f"(view_name, begin, end{'' if fn == 'retire_partitions' else ', partition_delta_seconds'})"
                    " — they are evaluated at plan time"
                )
            matches += [(m, fn) for m in found]
        if not matches:
            return sql
        matches.sort(key=lambda t: t[0].start())

        # validation pass: every call's arguments check out before ANY op
        # runs, so a bad third call can't leave the first two half-applied
        todo = []
        for m, fn in matches:
            view = m.group(1).replace("''", "'")
            begin_ns, end_ns = _ns(m.group(2)), _ns(m.group(3))
            if fn == "retire_partitions":
                todo.append((m, fn, (view, begin_ns, end_ns)))
                continue
            delta = int(m.group(4))
            if delta <= 0:
                # materialize_range's bucket loop requires a positive
                # stride — 0 would divide by zero, negative never ends
                raise InvalidArgument(
                    f"{fn}(): partition_delta_seconds must be a positive "
                    f"integer, got {delta}"
                )
            spec = self.batch_view(view)  # unknown view raises at plan time
            todo.append((m, fn, (spec, begin_ns, end_ns, delta * 1_000_000_000)))

        pieces, last = [], 0
        for i, (m, fn, op_args) in enumerate(todo):
            log = TaskLog()
            op = {
                "retire_partitions": self.lakehouse.retire_partitions,
                "materialize_partitions": self.lakehouse.materialize_range,
                "regenerate_partitions": self.lakehouse.regenerate_partitions,
            }[fn]
            try:
                op(*op_args, log)
            except Exception as e:
                # the task's own failure is the log's final row; the
                # statement succeeds and returns the log (reference
                # producers catch and write the error, then close)
                log.write(f"error: {e}")
            tag = _hashlib.sha1(
                f"{fn}\x00{m.group(0)}\x00{i}".encode("utf-8")
            ).hexdigest()[:8]
            name = f"_tasklog_{fn}_{tag}"
            log.to_df(self.spark).createOrReplaceTempView(name)
            if created_views is not None:
                created_views.append(name)
            pieces.append(sql[last : m.start()])
            pieces.append(name)
            last = m.end()
        pieces.append(sql[last:])
        return "".join(pieces)

    def parse_streamable_admin_call(self, sql: str):
        """The served path's STREAMING-eligible admin spelling: a statement
        that is exactly one admin table-function call selected whole —
        ``SELECT * FROM <fn>('view', 'begin', 'end'[, delta])`` — parsed,
        validated and returned as ``(fn, op, op_args)`` ready to run with
        a caller-provided TaskLog; ``None`` for anything else (projections,
        joins, WHERE, composed statements), which falls back to the
        at-completion rewrite (_rewrite_admin_calls). This mirrors the
        reference, whose TaskLogExecPlan streams exactly when the admin
        call IS the plan root (task_log_exec_plan.rs:35-60); a composed
        statement needs the full relation before Spark can plan over it.

        Validation parity with the rewrite: admin gating first ("not
        found" for non-admin), positive delta, view resolved at plan
        time. Arity mismatches (materialize without a delta, retire with
        one) return None so the rewrite raises its single authoritative
        literal-arguments error."""
        import re as _re

        from micromegas_spark.timeutils import to_epoch_ns

        _a = r"'((?:[^']|'')*)'"
        m = _re.fullmatch(
            r"\s*SELECT\s+\*\s+FROM\s+"
            r"(materialize_partitions|regenerate_partitions|retire_partitions)"
            rf"\s*\(\s*{_a}\s*,\s*{_a}\s*,\s*{_a}\s*(?:,\s*(-?\d+)\s*)?\)\s*;?\s*",
            sql,
            _re.I,
        )
        if not m:
            return None
        fn = m.group(1).lower()
        has_delta = m.group(5) is not None
        if (fn == "retire_partitions") == has_delta:
            return None  # wrong arity → the rewrite's error path owns it
        self.require_admin(fn)

        def _ns(lit: str) -> int:
            lit = lit.replace("''", "'").strip()
            if _re.fullmatch(r"-?\d+", lit):
                return int(lit)
            return to_epoch_ns(lit)

        view = m.group(2).replace("''", "'")
        begin_ns, end_ns = _ns(m.group(3)), _ns(m.group(4))
        if fn == "retire_partitions":
            return fn, self.lakehouse.retire_partitions, (view, begin_ns, end_ns)
        delta = int(m.group(5))
        if delta <= 0:
            raise InvalidArgument(
                f"{fn}(): partition_delta_seconds must be a positive "
                f"integer, got {delta}"
            )
        op = (
            self.lakehouse.materialize_range
            if fn == "materialize_partitions"
            else self.lakehouse.regenerate_partitions
        )
        spec = self.batch_view(view)  # unknown view raises at plan time
        return fn, op, (spec, begin_ns, end_ns, delta * 1_000_000_000)

    def resolve(
        self,
        sql: str,
        begin_ns: int | None = None,
        end_ns: int | None = None,
        args: dict | None = None,
        query_id: str | None = None,
    ) -> DataFrame:
        """Atomically bind views to [begin, end) and analyze the statement.
        Every execution path (query(), the client's prepared-statement and
        convenience lookups) funnels here so concurrent queries with
        different ranges each resolve against their OWN bounds — see
        _PLAN_LOCK. Returns the eagerly-analyzed DataFrame; execution
        stays lazy and unserialized."""
        query_id = query_id or uuid.uuid4().hex[:16]
        # job-group attribution for the per-query resource audit
        # (reference #1406 QueryAuditRecord): the group opens BEFORE
        # prepare_views so JIT materialization / query_log-view jobs the
        # planning itself triggers attribute to the query that caused
        # them, and it is CLEARED on exit so later jobs on this thread
        # never inherit a stale id. Execution-time jobs re-attribute at
        # the call sites that actually collect (job_group(df) in
        # Client/server/CLI paths, keyed off df._mm_query_id).
        with _PLAN_LOCK, job_group(self.spark.sparkContext, query_id, sql):
            t0 = time.time()
            tasklog_views: list[str] = []
            try:
                # the reference's primary documented UX is SQL-spelled
                # view_instance (view_instance_table_function.rs:49-70,
                # args evaluated at PLAN time) — rewrite literal calls to
                # pre-materialized temp views so reference queries run
                # verbatim with zero data through Python
                exec_sql = self._rewrite_view_instance(sql, begin_ns, end_ns)
                # admin table functions (S11): literal calls run NOW and
                # are substituted with their task-log relations
                exec_sql = self._rewrite_admin_calls(exec_sql, tasklog_views)
                self.prepare_views(exec_sql, begin_ns, end_ns)
                out = (
                    self.spark.sql(exec_sql, args=args)
                    if args
                    else self.spark.sql(exec_sql)
                )
            except Exception as e:
                # failed plans still leave an audit record with the #1435
                # classification, so query_failed-style monitoring can key
                # on error_class == 'internal' only
                from micromegas_spark.flightsql.errors import classify_exception

                self.log_query(
                    sql, begin_ns, end_ns, (time.time() - t0) * 1000.0,
                    query_id, classify_exception(e),
                )
                raise
            finally:
                # task-log temp views are statement-scoped: the analyzed
                # plan above holds the resolved LocalRelation, so the
                # catalog name can (and must) go away — otherwise the
                # admin op's output stays queryable by later statements,
                # including by a non-admin Engine on the same session
                for name in tasklog_views:
                    try:
                        self.spark.catalog.dropTempView(name)
                    except Exception:
                        pass
            # self-observability: the reference's analytics service emits a
            # span per executed query into its own telemetry ("sql spans
            # on", query.rs:207-256; spans land in the lake like any
            # process's). The facade records (time, sql, range, plan_ms,
            # query_id) — queryable via query_log(), the engine observing
            # itself.
            self.log_query(
                sql, begin_ns, end_ns, (time.time() - t0) * 1000.0, query_id
            )
        out._mm_query_id = query_id
        return out

    def query(self, sql: str, begin_ns: int | None = None, end_ns: int | None = None) -> DataFrame:
        """Full SQL over all registered views, range-bounded out-of-band —
        the reference's ``client.query(sql, begin, end)``
        (python/micromegas/micromegas/flightsql/client.py:312-370)."""
        return self.resolve(sql, begin_ns, end_ns)

    def _metrics_by_query_id(self, query_ids: set[str]) -> dict[str, dict]:
        """Per-query resource audit (reference #1406: QueryAuditRecord
        gains peak-memory / spill attribution). One pass over the Spark
        app-status KVStore: jobs are matched to queries by job group
        (resolve() sets group = query_id), then their stages' task metrics
        aggregate into peak execution memory, memory/disk spill and
        shuffle-write bytes. Works headless (the AppStatusListener runs
        with spark.ui.enabled=false); cost is O(jobs + stages) driver-side
        reads, paid only when the audit is actually asked for."""
        out: dict[str, dict] = {}
        if not query_ids:
            return out
        try:
            jvm = self.spark.sparkContext._jvm
            store = self.spark.sparkContext._jsc.sc().statusStore().store()

            def _view(cls):
                return store.view(jvm.java.lang.Class.forName(cls)).closeableIterator()

            stage_to_qid: dict[int, str] = {}
            jobs = _view("org.apache.spark.status.JobDataWrapper")
            while jobs.hasNext():
                info = jobs.next().info()
                jg = info.jobGroup()
                if not (jg.isDefined() and jg.get() in query_ids):
                    continue
                qid = jg.get()
                sids = info.stageIds()
                for i in range(sids.size()):
                    stage_to_qid[sids.apply(i)] = qid
            stages = _view("org.apache.spark.status.StageDataWrapper")
            while stages.hasNext():
                info = stages.next().info()
                qid = stage_to_qid.get(info.stageId())
                if qid is None:
                    continue
                m = out.setdefault(
                    qid,
                    {
                        "peak_execution_memory_bytes": 0,
                        "memory_spill_bytes": 0,
                        "disk_spill_bytes": 0,
                        "shuffle_write_bytes": 0,
                        "n_stages": 0,
                    },
                )
                m["n_stages"] += 1
                m["peak_execution_memory_bytes"] = max(
                    m["peak_execution_memory_bytes"], info.peakExecutionMemory()
                )
                m["memory_spill_bytes"] += info.memoryBytesSpilled()
                m["disk_spill_bytes"] += info.diskBytesSpilled()
                m["shuffle_write_bytes"] += info.shuffleWriteBytes()
        except Exception:
            # audit is best-effort observability: a store-layout change
            # must degrade to empty metrics, never fail the query path
            return out
        return out

    def query_metrics(self, query_id: str) -> dict:
        """Resource audit for one executed query (see _metrics_by_query_id);
        zeros if nothing ran (yet) under that id."""
        return self._metrics_by_query_id({query_id}).get(
            query_id,
            {
                "peak_execution_memory_bytes": 0,
                "memory_spill_bytes": 0,
                "disk_spill_bytes": 0,
                "shuffle_write_bytes": 0,
                "n_stages": 0,
            },
        )

    def check_spill_budget(self, query_id: str) -> None:
        """Abort a query whose attributed disk spill exceeds the engine's
        budget (reference MICROMEGAS_DATAFUSION_MAX_TEMP_DIRECTORY_MB):
        cancels the query's running jobs and raises a resource-classified
        error, so clients see ``[error_class=resource]`` — the same class
        as OOM — instead of waiting for the volume to ENOSPC. Called
        between result-batch pulls by the server stream (cheap: one
        driver-side KVStore walk); a no-op when no budget is set."""
        if self.max_spill_mb is None:
            return
        from micromegas_spark.flightsql.errors import SpillBudgetExceeded

        spill = self.query_metrics(query_id)["disk_spill_bytes"]
        if spill > self.max_spill_mb * 1024 * 1024:
            try:
                self.spark.sparkContext.cancelJobGroup(query_id)
            except Exception:
                pass  # cancellation is best-effort; the raise is the abort
            raise SpillBudgetExceeded(
                f"query spilled {spill} bytes to disk, over the "
                f"{self.max_spill_mb} MB budget"
            )

    def _register_query_log_view(self) -> DataFrame:
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        schema = StructType(
            [
                StructField("time_ns", LongType()),
                StructField("sql", StringType()),
                StructField("begin_ns", LongType()),
                StructField("end_ns", LongType()),
                StructField("plan_ms", DoubleType()),
                # QueryAuditRecord parity (#1435/#1406): correlatable id,
                # error class, and per-query resource attribution
                StructField("query_id", StringType()),
                StructField("error_class", StringType()),
                StructField("peak_execution_memory_bytes", LongType()),
                StructField("memory_spill_bytes", LongType()),
                StructField("disk_spill_bytes", LongType()),
                StructField("shuffle_write_bytes", LongType()),
                # audit-log parity (query-audit-log.md): one structured
                # JSON record per query under the reference's dedicated
                # target, so the documented jsonb_get/jsonb_as_f64 audit
                # queries run verbatim over this view
                StructField("target", StringType()),
                StructField("msg", StringType()),
            ]
        )
        metrics = self._metrics_by_query_id(
            {rec[5] for rec in self._query_log if rec[5]}
        )
        zero = {
            "peak_execution_memory_bytes": 0,
            "memory_spill_bytes": 0,
            "disk_spill_bytes": 0,
            "shuffle_write_bytes": 0,
        }
        rows = [
            (
                t,
                sql,
                b,
                e,
                ms,
                qid,
                ecls,
                m["peak_execution_memory_bytes"],
                m["memory_spill_bytes"],
                m["disk_spill_bytes"],
                m["shuffle_write_bytes"],
                "flightsql_query_audit",
                json.dumps(
                    {
                        "sql": sql,
                        "begin_ns": b,
                        "end_ns": e,
                        "total_ms": ms,
                        "query_id": qid,
                        "error_class": ecls,
                        "peak_execution_memory_bytes": m[
                            "peak_execution_memory_bytes"
                        ],
                        "memory_spill_bytes": m["memory_spill_bytes"],
                        "disk_spill_bytes": m["disk_spill_bytes"],
                        "client": "micromegas_spark",
                    },
                    separators=(",", ":"),
                ),
            )
            for (t, sql, b, e, ms, qid, ecls) in self._query_log
            for m in (metrics.get(qid, zero),)
        ]
        df = self.spark.createDataFrame(rows, schema)
        df.createOrReplaceTempView("query_log")
        return df

    def query_log(self) -> DataFrame:
        """Query history as a DataFrame (time_ns, sql, begin_ns, end_ns,
        plan_ms), also registered as the ``query_log`` temp view. The
        view is refreshed lazily — at the start of any query() whose SQL
        references query_log, and on every query_log() call — so SQL
        over it always sees all prior queries without paying the
        O(len(log)) materialization on unrelated statements. The log
        rotates at QUERY_LOG_MAX entries; the in-flight query itself is
        appended after it is planned."""
        return self._register_query_log_view()

    def failure_counters(self) -> dict[str, int]:
        """The #1435 monitoring contract over the audit log:
        ``query_failed`` counts ONLY genuine service failures
        (error_class == 'internal'), so alerting on it never fires for a
        caller's typo or a budget kill; the 'user'/'resource' classes
        keep their own visibility through ``query_failed_user`` /
        ``query_failed_resource`` (count-only, exactly like the
        reference's counters — flight_sql_service_impl.rs's
        query_failed/query_failed_user/query_failed_resource split).
        Driver-side scan of the bounded in-memory log: O(QUERY_LOG_MAX)."""
        counts = {"query_failed": 0, "query_failed_user": 0, "query_failed_resource": 0}
        for rec in self._query_log:
            cls = rec[6]
            if cls == "internal":
                counts["query_failed"] += 1
            elif cls == "user":
                counts["query_failed_user"] += 1
            elif cls == "resource":
                counts["query_failed_resource"] += 1
        return counts

    @classmethod
    def from_test_tables(cls, spark: SparkSession, sf_dir: str, warehouse: str | None = None) -> "Engine":
        """Bootstrap an Engine over the driver's synthetic tables
        (TESTDATA.md) so the full SQL surface works immediately:
        ``Engine.from_test_tables(spark, sf).query("SELECT ...", b, e)``.
        The events table gets its epoch-µs column as the range key."""
        from micromegas_spark.sources.tables import TEST_TABLES, load_table

        eng = cls(spark, warehouse)
        for name in TEST_TABLES:
            df = load_table(spark, sf_dir, name)
            # range key must match query()'s documented epoch-ns units:
            # events.ts is the raw ns column (ts_us is the µs convenience)
            eng.register_table(name, df, time_column="ts" if name == "events" else None)
        return eng

    # -- lakehouse / batch views ----------------------------------------------

    def require_admin(self, fn_name: str) -> None:
        """Gate for the partition-admin surface: in a non-admin session
        the reference never registers the admin UDTFs, so invoking one
        fails as unknown (query.rs:150-175) — mirror that exact
        user-visible behavior rather than a permission error."""
        if not self.admin:
            raise LookupError(f"function {fn_name!r} not found")

    @property
    def lakehouse(self):
        """Lazily-built partition catalog over this engine's warehouse —
        the admin surface (retire/materialize/regenerate) delegates here
        (the reference's admin UDFs mutate the same catalog,
        query.rs:150-175)."""
        if not hasattr(self, "_lakehouse"):
            from micromegas_spark.materialize import Lakehouse

            self._lakehouse = Lakehouse(self.spark, self.warehouse)
        return self._lakehouse

    def register_batch_view(self, spec) -> None:
        """Register a BatchViewSpec so client admin calls can address it by
        view name (the reference's view_factory registry role)."""
        if not hasattr(self, "_batch_views"):
            self._batch_views: dict[str, object] = {}
        self._batch_views[spec.name] = spec

    def batch_view(self, name: str):
        specs = getattr(self, "_batch_views", {})
        if name not in specs:
            # deliberately a KeyError (LookupError): the server's admin
            # boundary maps LookupError to the reference's "not found"
            # surface (query.rs:150-175 non-admin parity), not to #1435
            # classification
            raise KeyError(
                f"unknown batch view {name!r}; register_batch_view() it first "
                f"(known: {sorted(specs)})"
            )
        return specs[name]

    # -- JIT view instances ----------------------------------------------------

    def register_jit_view_set(self, vs: JitViewSet) -> None:
        self._jit[vs.name] = vs

    def _jit_manifest(self, view_set: str, instance: str) -> str:
        d = self.fs.url("_jit", view_set)
        self.fs.mkdirs(d)
        return f"{d}/{instance}.json"

    def _jit_manifest_load(self, murl: str) -> dict:
        if self.fs.exists(murl):
            return json.loads(self.fs.read_bytes(murl))
        return {}

    def _jit_manifest_save(self, murl: str, manifest: dict) -> None:
        # the JIT cache's commit point — same contract as the Lakehouse
        # manifest (fslayer.py): atomic swap on POSIX/HDFS, single PUT on
        # object stores; partition data dirs are write-once unique paths
        self.fs.write_bytes_atomic(murl, json.dumps(manifest).encode())

    def _jit_manifest_save_merged(
        self, murl: str, updates: dict, deletes=()
    ) -> None:
        """Key-level merge commit for the JIT manifests: re-read the
        CURRENT file at save time and apply only this run's updates and
        deletions on top, so two processes building DIFFERENT buckets of
        one instance no longer clobber each other's entries. (The prior
        whole-dict save from a stale load lost the rival's bucket — a
        CORRECT outcome, since JIT entries self-heal through the
        per-bucket source-hash check and vacuum_jit_orphans sweeps the
        orphaned dir, but a wasted rebuild; the lakehouse needs the full
        generation CAS because its partitions are not self-healing in
        the same way.) Residual simultaneous-write window: at most the
        rival's newest entries, rebuilt by its next read."""
        current = self._jit_manifest_load(murl)
        current.update(updates)
        for k in deletes:
            current.pop(k, None)
        self._jit_manifest_save(murl, current)

    def vacuum_jit_orphans(
        self, view_set: str, instance: str, min_age_seconds: float = 3600.0
    ) -> int:
        """JIT twin of Lakehouse.vacuum_orphans: sweep cached-partition
        dirs no manifest entry references (a crash between the parquet
        write and the manifest save leaves an invisible orphan under
        ``<warehouse>/<view_set>/instance=<i>/``). The grace window
        protects an in-flight build on deployments without flock; the
        manifests (bucket-mode and block-mode) are the source of truth,
        so committed dirs are never touched. Returns dirs removed."""
        mpath = self._jit_manifest(view_set, instance)
        live = set()
        for suffix in ("", ".blocks"):
            for ent in self._jit_manifest_load(mpath + suffix).values():
                # canon, not norm_url: manifests written by older code may
                # spell the same dir relative/plain/file:// (ADVICE r10)
                live.add(self.fs.canon(ent["path"]))
        root = self.fs.url(view_set, f"instance={instance}")
        if not self.fs.exists(root):
            return 0
        removed = 0
        now = time.time()
        for name in self.fs.listdir(root):
            url = f"{root}/{name}"
            if self.fs.canon(url) in live:
                continue
            # unknown age (no mtime anywhere under the dir — common for
            # object-store dir markers) means possibly in-flight: skip,
            # never treat as infinitely old (ADVICE r10)
            mtime = self.fs.newest_mtime(url)
            if mtime is None or now - mtime < min_age_seconds:
                continue
            self.fs.rmtree(url)
            removed += 1
        return removed

    def view_instance(
        self, view_set: str, instance: str, begin_ns: int, end_ns: int,
        bucket_ns: int = 3_600 * 10**9,
    ) -> DataFrame:
        """JIT materialization (materialized_view.rs:69-72, log_view.rs:
        148-210, jit_partitions.rs:59-95): bucket the range by insert time,
        rebuild stale/missing buckets (source-count hash), then read the
        union of cached parquet partitions filtered to the range.

        Block-aware view sets (``JitViewSet.list_blocks`` set) instead cut
        partitions from the event-time-ordered block list with insert-safe
        cuts (reference #1429) — see _view_instance_blocks."""
        if view_set not in self._jit:
            raise InvalidArgument(
                f"unknown JIT view set {view_set!r} "
                f"(known: {sorted(self._jit)})"
            )
        vs = self._jit[view_set]
        if vs.list_blocks is not None:
            return self._view_instance_blocks(vs, instance, begin_ns, end_ns)
        mpath = self._jit_manifest(view_set, instance)
        manifest: dict[str, dict] = self._jit_manifest_load(mpath)

        paths = []
        b = begin_ns - begin_ns % bucket_ns
        updates: dict[str, dict] = {}
        stale_dirs: list[str] = []
        while b < end_ns:
            key = str(b)
            cur = vs.source_count(instance, b, b + bucket_ns)
            ent = manifest.get(key)
            if cur > 0 and (ent is None or ent["hash"] != cur):
                df = vs.build(instance, b, b + bucket_ns)
                # write-once unique dir; the manifest save below commits
                pdir = self.fs.unique_dir_url(
                    view_set, f"instance={instance}", f"bucket={b}"
                )
                df.write.mode("overwrite").parquet(pdir)
                if ent is not None:
                    stale_dirs.append(ent["path"])
                # schema in the manifest: warm reads skip per-call parquet
                # footer/schema inference (a measured ~0.1 s driver cost
                # per view_instance on the JIT trio)
                manifest[key] = updates[key] = {
                    "hash": cur, "path": pdir, "schema": df.schema.json()
                }
            if cur > 0:
                paths.append(manifest[key]["path"])
            b += bucket_ns
        if updates:
            # merge-commit: only THIS run's buckets, on the freshest file
            self._jit_manifest_save_merged(mpath, updates)
            for d in stale_dirs:  # unreachable after the commit
                self.fs.rmtree(d)
        if not paths:
            return self.spark.range(0).select()
        used = [e for e in manifest.values() if e.get("path") in set(paths)]
        df = self._read_manifest_parquet(paths, used)
        return df.where(
            (F.col(vs.time_column) >= begin_ns) & (F.col(vs.time_column) < end_ns)
        )

    def _read_manifest_parquet(self, paths: list[str], entries: list[dict]):
        """Read cached JIT partitions, using the manifest-recorded schema
        when every entry agrees — skips the per-call footer/schema
        inference a plain spark.read.parquet pays (driver-side listing +
        footer reads, measured ~0.1 s per warm view_instance). Entries
        written before the schema field (or disagreeing) fall back to
        inference."""
        from pyspark.sql.types import StructType

        sjs = {e.get("schema") for e in entries}
        if len(sjs) == 1 and None not in sjs:
            schema = StructType.fromJson(json.loads(sjs.pop()))
            return self.spark.read.schema(schema).parquet(*paths)
        return self.spark.read.parquet(*paths)

    def _view_instance_blocks(
        self, vs: JitViewSet, instance: str, begin_ns: int, end_ns: int
    ) -> DataFrame:
        """Event-time JIT grouping (reference #1429, jit_partitions.rs
        group_blocks_into_partitions + RetireMatch::Overlap):

        1. list the instance's blocks overlapping [begin, end) by EVENT
           time, cut partitions via group_blocks_into_partitions (event-
           time order, insert-safe cuts);
        2. reuse a cached partition iff its block set is identical (key =
           hash over sorted (block_id, nb_objects) — staleness by content,
           matching the reference's is_jit_partition_up_to_date);
        3. a moved cut point between runs can leave a stale cached
           partition that merely OVERLAPS (not contains) a new one, so
           retirement matches by inclusive insert-range intersection —
           RetireMatch::Overlap with this run's partitions protected by
           identity (same_run_ranges), not range shape.
        """
        import hashlib

        blocks = list(vs.list_blocks(instance, begin_ns, end_ns))
        mpath = self._jit_manifest(vs.name, instance) + ".blocks"
        manifest: dict[str, dict] = self._jit_manifest_load(mpath)

        groups = group_blocks_into_partitions(blocks, vs.max_nb_objects)
        paths: list[str] = []
        run_keys: set[str] = set()
        updates: dict[str, dict] = {}
        for grp in groups:
            ident = sorted((str(b["block_id"]), int(b["nb_objects"])) for b in grp)
            key = hashlib.sha1(json.dumps(ident).encode()).hexdigest()[:16]
            run_keys.add(key)
            ent = manifest.get(key)
            if ent is None:
                df = vs.build_blocks(instance, [b["block_id"] for b in grp])
                # write-once unique dir; the manifest save below commits
                pdir = self.fs.unique_dir_url(
                    vs.name, f"instance={instance}", f"part={key}"
                )
                if vs.ensure_begin_non_decreasing:
                    # bounded by max_nb_objects per partition, so the
                    # validation pass is cheap by design; persist so the
                    # builder lineage isn't re-executed by the write.
                    # unpersist in finally: a failed order check or write
                    # must not leak the cached partition for the session's
                    # lifetime. The check certifies within-partition order
                    # only — the builder contract (JitViewSet docstring)
                    # is one begin-sorted output partition per block
                    # group, matching the reference where each written
                    # batch is independently validated (#1429); readers
                    # re-sort across partitions when they need a total
                    # order.
                    from pyspark import StorageLevel

                    df = df.persist(StorageLevel.MEMORY_AND_DISK)
                    try:
                        ensure_begin_non_decreasing(
                            df, vs.time_column, f"{vs.name}/{instance}/{key}"
                        )
                        df.write.mode("overwrite").parquet(pdir)
                    finally:
                        df.unpersist(blocking=False)
                else:
                    df.write.mode("overwrite").parquet(pdir)
                manifest[key] = updates[key] = {
                    "path": pdir,
                    "begin_ns": min(b["begin_ns"] for b in grp),
                    "end_ns": max(b["end_ns"] for b in grp),
                    "insert_min": min(b["insert_ns"] for b in grp),
                    "insert_max": max(b["insert_ns"] for b in grp),
                    "schema": df.schema.json(),
                }
            paths.append(manifest[key]["path"])
        # RetireMatch::Overlap — inclusive-bounds insert-range intersection
        # (tstzrange(..., '[]') && ... in the reference: half-open ranges
        # would miss degenerate and touching shapes); partitions this run
        # wrote or reused are protected by identity, not range shape.
        retired_dirs: list[str] = []
        deletes: list[str] = []
        for key in [k for k in manifest if k not in run_keys]:
            ent = manifest[key]
            stale = any(
                ent["insert_min"] <= manifest[k]["insert_max"]
                and manifest[k]["insert_min"] <= ent["insert_max"]
                for k in run_keys
            )
            if stale:
                retired_dirs.append(ent["path"])
                del manifest[key]
                deletes.append(key)
        if updates or deletes:
            # merge-commit: this run's new partitions + its retirements,
            # applied on the freshest file (a rival's concurrent entries
            # survive; any overlap is retired by the next read's scan)
            self._jit_manifest_save_merged(mpath, updates, deletes)
            for d in retired_dirs:  # unreachable after the commit
                self.fs.rmtree(d)
        if not paths:
            return self.spark.range(0).select()
        used = [e for e in manifest.values() if e.get("path") in set(paths)]
        df = self._read_manifest_parquet(paths, used)
        return df.where(
            (F.col(vs.time_column) >= begin_ns) & (F.col(vs.time_column) < end_ns)
        )
