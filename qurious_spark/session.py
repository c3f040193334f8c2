"""Session layer: the engine's primary entry point.

Mirrors the reference's ``ExecuteSession`` (qurious/src/execution/session.rs:74-93)
— parse, resolve tables, plan, execute — but Spark-first: we hand the
(possibly dialect-rewritten) SQL to Spark's parser/Catalyst and only keep the
pieces Spark does not give us for free:

- a managed in-memory table catalog with INSERT / UPDATE / DELETE semantics
  (reference: qurious/src/datasource/memory.rs:24-145, session.rs:128-151;
  note the reference plans UPDATE but refuses to execute it — we implement it
  correctly per SURVEY.md §7.4.6),
- the dialect shim for ``read_csv/read_json/read_parquet`` table functions and
  ``COPY ... FROM`` (reference: qurious/src/planner/sql.rs:751-774, 324-375),
- an ``information_schema.tables`` view + SHOW TABLES parity
  (reference: qurious/src/execution/information_schema.rs:12-46).

Scale notes (100 TB): the session never collects to the driver; managed-table
mutations build union/filter plans lazily and checkpoint (the shim in
qurious_spark/checkpoint.py: local by default, reliable when
SPARK_GRAFT_CHECKPOINT_DIR is set) after a
mutation-depth threshold so plan size stays bounded (SURVEY.md §7.4.5).
"""

from __future__ import annotations

import itertools
import os
import re
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qurious_spark.dialect import (
    DdlDmlStatement,
    fold_interval_quantity,
    parse_ddl_dml,
    rewrite_qualify,
    rewrite_table_functions,
)
from qurious_spark.checkpoint import checkpoint as _checkpoint

_lock = threading.Lock()

DEFAULT_CATALOG = "qurious"  # reference: qurious/src/execution/config.rs:1-13
DEFAULT_SCHEMA = "public"

# Mutation depth after which a managed table is checkpointed so INSERT-as-union
# chains don't grow the logical plan unboundedly (SURVEY.md §7.4.5).
CHECKPOINT_EVERY = 16

# Time-travel history: versions retained per managed table (bounded ring).
SNAPSHOT_KEEP = 8


def _env_bool(name: str, default: str) -> str:
    """Normalize a boolean-ish env var to the 'true'/'false' Spark expects.

    Accepts 1/0, yes/no, on/off, true/false in any case with whitespace; a
    value like '0' or 'off' passed verbatim into spark.sql.adaptive.enabled
    would otherwise fail at QUERY time with an opaque
    IllegalArgumentException instead of at session build (ADVICE r10)."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    v = raw.strip().lower()
    if v in ("true", "1", "yes", "on"):
        return "true"
    if v in ("false", "0", "no", "off"):
        return "false"
    raise ValueError(
        f"{name}={raw!r} is not a recognized boolean "
        "(use true/false, 1/0, yes/no, or on/off)"
    )


_SIZE_SUFFIX = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(text: str) -> int | None:
    """Parse a Spark byte-size conf string ('64m', '-1', '67108864', '1g')
    to bytes; None if unparseable. Needed so semantically-equal spellings
    ('64m' vs '67108864') compare equal instead of raising spuriously."""
    v = text.strip().lower()
    # Spark also accepts two/three-letter suffixes ('64mb', '64mib'); fold
    # them onto the single-letter table so '64m' == '64mb' == '67108864'
    # (ADVICE r11: '64mb' previously parsed to None and raised spuriously).
    if len(v) > 2 and v.endswith("ib") and v[-3] in "kmgt":
        v = v[:-2]
    elif len(v) > 1 and v.endswith("b") and v[-2] in "kmgt":
        v = v[:-1]
    mult = 1
    if v and v[-1] in _SIZE_SUFFIX:
        mult = _SIZE_SUFFIX[v[-1]]
        v = v[:-1]
    try:
        return int(v) * mult
    except ValueError:
        return None


# (conf key, env var, value kind) rows checked when get_spark reuses an
# already-active session: a perturbation env var set AFTER the session was
# built would otherwise be silently ignored and an "independence gate" run
# that way would report a vacuous pass (ADVICE r10). Covers all five
# perturbation axes: AQE, ANSI, broadcast threshold, shuffle width, and
# core count. The gates export the env before the first get_spark, so this
# check only fires on misuse.
_ENV_CONF_CHECKS: tuple[tuple[str, str, str], ...] = (
    ("spark.sql.adaptive.enabled", "SPARK_GRAFT_AQE", "bool"),
    ("spark.sql.ansi.enabled", "SPARK_GRAFT_ANSI", "bool"),
    ("spark.sql.autoBroadcastJoinThreshold", "SPARK_GRAFT_BROADCAST_THRESHOLD", "bytes"),
    ("spark.sql.shuffle.partitions", "SPARK_GRAFT_SHUFFLE_PARTITIONS", "raw"),
    ("spark.default.parallelism", "SPARK_GRAFT_CPUS", "raw"),
    ("spark.sql.session.timeZone", "SPARK_GRAFT_SESSION_TZ", "raw"),
    ("spark.sql.codegen.wholeStage", "SPARK_GRAFT_CODEGEN", "bool"),
    (
        "spark.sql.execution.arrow.maxRecordsPerBatch",
        "SPARK_GRAFT_ARROW_BATCH",
        "raw",
    ),
    ("spark.sql.files.maxPartitionBytes", "SPARK_GRAFT_MAX_PARTITION_BYTES", "bytes"),
)


def _check_env_conf(active: SparkSession) -> None:
    """Raise if an explicitly-set perturbation env var disagrees with the
    already-active session's conf — the env can only take effect in a fresh
    process, and silently returning the old session would make a
    perturbation-gate run vacuous."""
    for key, env, kind in _ENV_CONF_CHECKS:
        raw = os.environ.get(env)
        if raw is None:
            continue
        want = _env_bool(env, "true") if kind == "bool" else raw.strip()
        have = active.conf.get(key, None)
        if have is None:
            continue
        if kind == "bytes":
            # compare numerically: '64m' == '67108864' == '64mb'
            wb, hb = _parse_bytes(want), _parse_bytes(have)
            same = wb is not None and wb == hb
        else:
            same = have.strip().lower() == want.lower()
        if not same:
            raise RuntimeError(
                f"{env}={raw!r} requests {key}={want} but the active "
                f"SparkSession has {key}={have}; perturbation env vars "
                "require a fresh process (set them before the first "
                "get_spark call)"
            )


def get_spark(app_name: str = "qurious_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Defaults target local[$SPARK_GRAFT_CPUS] for tests while keeping every
    setting cluster-appropriate: AQE on (runtime re-planning, skew-join
    handling, partition coalescing), Arrow transfer on (pandas UDF hot path),
    UTC session timezone (stable vs the DuckDB oracle).
    """
    with _lock:
        active = SparkSession.getActiveSession()
        if active is not None:
            _check_env_conf(active)
            return active
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = master or f"local[{cpus}]"
        # Scan-split sizing: Spark's 128m default is right for cluster-scale
        # parquet; local test data is a few MB per file, so benchmarks set
        # this smaller to actually use the cores (TESTDATA is ~11 MB/table).
        max_part = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m")
        return (
            SparkSession.builder.appName(app_name)
            .master(master)
            .config(
                "spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus),
            )
            .config("spark.default.parallelism", cpus)
            # AQE on by default; the AQE-independence gate sets this to
            # "false" to prove results don't depend on runtime re-planning
            # (coalesced partitions, skew-join splits, join-strategy flips).
            .config(
                "spark.sql.adaptive.enabled",
                _env_bool("SPARK_GRAFT_AQE", "true"),
            )
            # ANSI SQL mode: Spark 4.x defaults this to true (strict
            # overflow/cast/divide-by-zero); every driver-green round to
            # date therefore ran under ANSI=true. The ANSI-independence
            # gate sets SPARK_GRAFT_ANSI=false (a Spark 3.x cluster's
            # default) to prove results don't depend on the mode either
            # way — the one config axis a real cluster migration flips.
            .config(
                "spark.sql.ansi.enabled",
                _env_bool("SPARK_GRAFT_ANSI", "true"),
            )
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            # Whole-stage codegen on by default (Spark's default). The
            # codegen-independence gate sets SPARK_GRAFT_CODEGEN=false to
            # prove results don't depend on the compiled vs interpreted
            # expression path — a real cluster falls back to interpreted
            # execution per-stage whenever generated code exceeds the JIT
            # limits (spark.sql.codegen.fallback), so both paths must agree.
            .config(
                "spark.sql.codegen.wholeStage",
                _env_bool("SPARK_GRAFT_CODEGEN", "true"),
            )
            # Arrow batch size for pandas_udf/mapInPandas transfer (Spark
            # default 10000). The batch-size-independence gate sets a tiny
            # value (e.g. 64) so every Arrow-backed operator — winnowing,
            # multimodal decoders, UDAFs — processes many small batches per
            # partition instead of one big one, proving no computation
            # accidentally depends on batch boundaries. At 100 TB the
            # records-per-batch a stage sees is an executor-memory tuning
            # knob, never a semantics input.
            .config(
                "spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"),
            )
            # UTC session timezone by default (stable vs the DuckDB oracle).
            # The TZ-independence gate (VERDICT r11 task 5) sets
            # SPARK_GRAFT_SESSION_TZ to a non-UTC zone (e.g.
            # America/New_York — what a real cluster inherits from its
            # hosts) to prove results don't depend on the session zone:
            # testdata timestamps are parquet timestamp[us] without
            # isAdjustedToUTC, read as TIMESTAMP_NTZ, so wall-clock values
            # and EXTRACT/date_trunc/window over them must be zone-invariant.
            .config(
                "spark.sql.session.timeZone",
                os.environ.get("SPARK_GRAFT_SESSION_TZ", "UTC"),
            )
            .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
            .config("spark.ui.enabled", "false")
            # 64 MB default keeps every TPC-H-shaped dimension broadcast; a
            # cluster deployment (or the join-strategy-independence gate,
            # which sets -1 to force sort-merge everywhere) overrides by env.
            .config(
                "spark.sql.autoBroadcastJoinThreshold",
                os.environ.get(
                    "SPARK_GRAFT_BROADCAST_THRESHOLD", str(64 * 1024 * 1024)
                ),
            )
            .config("spark.sql.files.maxPartitionBytes", max_part)
            # reliable-checkpoint mode (SPARK_GRAFT_CHECKPOINT_DIR, see
            # qurious_spark/checkpoint.py) writes a full RDD copy per
            # checkpoint; without this cleaner flag Spark NEVER deletes
            # them, so an iterative CC run or a long streaming job grows
            # the checkpoint volume without bound. No-op for the default
            # localCheckpoint path.
            .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
            # bucketed saveAsTable targets (sources/bucketing.py) land here,
            # not in the repo working tree
            .config(
                "spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/qurious_spark_warehouse"),
            )
            # testdata events.parquet carries timestamp[ns]; Spark has no nanos
            # type, so read as long and convert in the plan (readers.py).
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .getOrCreate()
        )


class ManagedTable:
    """An in-memory managed table: name -> DataFrame + per-column defaults.

    Spark analogue of the reference's ``MemoryTable``
    (qurious/src/datasource/memory.rs:24-28): holds current contents as a
    DataFrame (lazy plan), supports insert (union with column alignment,
    default fill, cast — reference qurious/src/planner/sql.rs:790-873),
    delete (anti-filter) and update (masked projection — the plan shape the
    reference builds at qurious/src/planner/sql.rs:377-432).
    """

    def __init__(
        self,
        name: str,
        df: DataFrame,
        defaults: dict[str, object] | None = None,
        notnull: set[str] | None = None,
    ):
        self.name = name
        self.df = df
        self.defaults = defaults or {}
        self.notnull = notnull or set()
        self._mutations = 0
        # Session-scoped time travel: version -> snapshot DataFrame.
        # DataFrames are immutable plans, so a snapshot is just the df
        # reference at mutation time (no copy); the every-16 checkpoint in
        # _bump keeps old lineages shallow. Bounded ring: SNAPSHOT_KEEP.
        self.version = 0
        self.snapshots: dict[int, DataFrame] = {0: df}

    def as_of(self, version: int) -> DataFrame:
        if version not in self.snapshots:
            kept = sorted(self.snapshots)
            raise ValueError(
                f"version {version} of {self.name} not available (kept: {kept})"
            )
        return self.snapshots[version]

    def _check_notnull(self, df: DataFrame, op: str) -> None:
        """Enforce NOT NULL on incoming rows (the reference parses the
        constraint but never enforces it — qurious/src/planner/sql.rs; we
        implement it correctly per SURVEY §7.4.6). One count job."""
        cols = [c for c in self.notnull if c in df.columns]
        if not cols:
            return
        cond = None
        for c in cols:
            cond = F.col(c).isNull() if cond is None else cond | F.col(c).isNull()
        if df.filter(cond).limit(1).count():
            raise ValueError(
                f"{op}: NOT NULL constraint violated on {self.name} ({', '.join(sorted(cols))})"
            )

    def _bump(self) -> None:
        self._mutations += 1
        if self._mutations % CHECKPOINT_EVERY == 0:
            # Truncate the union/filter plan chain; eager=True materializes
            # the table now so later reads plan against a flat scan instead
            # of the accumulated union/filter lineage.
            self.df = _checkpoint(self.df, eager=True)
        self.version += 1
        self.snapshots[self.version] = self.df
        for v in [v for v in self.snapshots if v <= self.version - SNAPSHOT_KEEP]:
            del self.snapshots[v]

    def insert_df(self, source: DataFrame, columns: list[str] | None = None) -> int:
        """INSERT INTO .. [(cols)] SELECT/VALUES: align columns, fill
        defaults, cast to target types, then union."""
        target_schema = self.df.schema
        n = source.count()
        if columns:
            if len(columns) != len(source.columns):
                raise ValueError(
                    f"INSERT column list has {len(columns)} columns but source has {len(source.columns)}"
                )
            source = source.toDF(*columns)
        else:
            if len(source.columns) != len(target_schema):
                raise ValueError(
                    f"INSERT source has {len(source.columns)} columns, table {self.name} has {len(target_schema)}"
                )
            source = source.toDF(*[f.name for f in target_schema])
        exprs = []
        for field in target_schema:
            if field.name in source.columns:
                exprs.append(F.col(field.name).cast(field.dataType).alias(field.name))
            elif field.name in self.defaults:
                exprs.append(F.lit(self.defaults[field.name]).cast(field.dataType).alias(field.name))
            else:
                exprs.append(F.lit(None).cast(field.dataType).alias(field.name))
        aligned = source.select(*exprs)
        self._check_notnull(aligned, "INSERT")
        self.df = self.df.unionByName(aligned)
        self._bump()
        return n

    def delete_where(self, predicate: str | None) -> None:
        if predicate is None:
            self.df = self.df.limit(0)
        else:
            self.df = self.df.filter(~F.coalesce(F.expr(predicate), F.lit(False)))
        self._bump()

    def replace_df(self, source: DataFrame) -> None:
        """Replace the table's contents wholesale (a versioned mutation like
        any other — time travel keeps the prior snapshot). Used by set-based
        rewrites such as the streaming SCD2 sink, where the new state is a
        full recomputation rather than a row-level patch."""
        target_schema = self.df.schema
        missing = [f.name for f in target_schema if f.name not in source.columns]
        if missing:
            raise ValueError(f"replace_df source lacks columns: {missing}")
        aligned = source.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in target_schema]
        )
        self._check_notnull(aligned, "REPLACE")
        self.df = aligned
        self._bump()

    def update_set(self, assignments: dict[str, str], predicate: str | None) -> None:
        cond = F.expr(predicate) if predicate else F.lit(True)
        exprs = []
        for field in self.df.schema:
            if field.name in assignments:
                new_val = F.expr(assignments[field.name]).cast(field.dataType)
                exprs.append(F.when(cond, new_val).otherwise(F.col(field.name)).alias(field.name))
            else:
                exprs.append(F.col(field.name))
        updated = self.df.select(*exprs)
        if self.notnull & set(assignments):
            self._check_notnull(updated, "UPDATE")
        self.df = updated
        self._bump()


class Session:
    """Engine session: ``sql()`` / ``register_table()`` / ``register_udf()``.

    The reference exposes three entry points (SURVEY.md §3): SQL text, a thin
    DataFrame API, and programmatic plans. Here entry point A is ``sql()``
    (dialect shim + Spark SQL); B and C are simply PySpark DataFrames, which
    ``table()`` hands back.
    """

    _instances = itertools.count()

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        self.tables: dict[str, ManagedTable] = {}
        # distinguishes this Session's information_schema temp view from
        # other Session objects sharing the same SparkSession (temp views
        # are session-global in Spark)
        self._id = next(Session._instances)

    # ------------------------------------------------------------------ #
    # catalog
    # ------------------------------------------------------------------ #
    def register_table(self, name: str, source: DataFrame | str, **options) -> None:
        """Register a DataFrame or a file path (csv/json/parquet by suffix)."""
        if isinstance(source, str):
            from qurious_spark.sources.readers import read_auto

            df = read_auto(self.spark, source, **options)
        else:
            df = source
        self._put_table(name, ManagedTable(name, df))

    def register_udf(self, name: str, fn, return_type) -> None:
        """Register a vectorized scalar UDF (Arrow-backed pandas_udf — the
        Spark analogue of the reference's Arrow-native UDF trait,
        qurious/src/functions/mod.rs:10-21)."""
        from pyspark.sql.functions import pandas_udf

        self.spark.udf.register(name, pandas_udf(fn, return_type))

    def register_udaf(self, name: str, fn, return_type) -> None:
        """Register a grouped-aggregate pandas UDF (Series -> scalar), usable
        in ``GROUP BY`` queries and ``agg()``. Beyond the reference (no UDAF
        trait exists there — SURVEY.md §2.5); Arrow-batched like the scalar
        path: each group's column arrives as one pandas Series per batch and
        aggregates JVM-side-partitioned, Python-side-reduced."""
        from pyspark.sql.functions import PandasUDFType, pandas_udf

        self.spark.udf.register(
            name, pandas_udf(fn, return_type, PandasUDFType.GROUPED_AGG)
        )

    @staticmethod
    def _normalize_name(name: str) -> str:
        """Resolve bare/partial/full table references to the bare name —
        the reference accepts t / public.t / qurious.public.t with defaults
        catalog=qurious, schema=public (table_relation.rs:8-38,
        config.rs:1-13)."""
        parts = name.lower().split(".")
        if len(parts) == 3 and parts[0] == DEFAULT_CATALOG and parts[1] == DEFAULT_SCHEMA:
            return parts[2]
        if len(parts) == 2 and parts[0] == DEFAULT_SCHEMA:
            return parts[1]
        return name.lower()

    def table(self, name: str) -> DataFrame:
        key = self._normalize_name(name)
        if key in self.tables:
            return self.tables[key].df
        return self.spark.table(name)

    def frame(self, name: str):
        """Fluent builder over a table (reference entry points B/C —
        qurious_spark.dataframe.QFrame)."""
        from qurious_spark.dataframe import QFrame

        return QFrame(self.table(name))

    def _put_table(self, name: str, mt: ManagedTable) -> None:
        key = self._normalize_name(name)
        self.tables[key] = mt
        mt.df.createOrReplaceTempView(key)

    def replace_table_data(self, name: str, df: DataFrame) -> None:
        """Replace a managed table's contents with ``df`` (versioned — the
        prior state stays reachable via time travel)."""
        mt = self._get_managed(name)
        mt.replace_df(df)
        self._put_table(mt.name, mt)

    def _explain(self, inner_sql: str, mode: str) -> DataFrame:
        """``EXPLAIN [FORMATTED|EXTENDED|CODEGEN|COST] <query>`` — one row
        per plan line. Beyond the reference (which exposes no EXPLAIN);
        the query goes through the full dialect shim first, so table
        functions / interval folding / managed tables are planned exactly
        as they would execute. DDL/DML under EXPLAIN is rejected up front:
        ``self.sql`` on an INSERT/UPDATE/DELETE/MERGE would EXECUTE the
        mutation as a side effect of rendering its plan (round-5 advisor
        finding), and Spark itself has no no-op plan for our managed-table
        statements to render."""
        if parse_ddl_dml(inner_sql) is not None:
            raise ValueError(
                "EXPLAIN of a DDL/DML statement is not supported: managed-"
                "table mutations have no renderable no-op plan (explaining "
                "would execute the statement). EXPLAIN the inner SELECT "
                "instead."
            )
        df = self.sql(inner_sql)
        try:
            jvm = self.spark._jvm
            plan = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), mode
            )
        except Exception:  # pragma: no cover — fallback across Spark minors
            plan = df._jdf.queryExecution().toString()
        rows = [(line,) for line in plan.rstrip("\n").split("\n")]
        return self.spark.createDataFrame(rows, "plan_line string")

    def _drop_table(self, name: str, if_exists: bool) -> None:
        key = self._normalize_name(name)
        if key not in self.tables:
            if if_exists:
                return
            raise ValueError(f"table not found: {name}")
        del self.tables[key]
        self.spark.catalog.dropTempView(key)

    # ------------------------------------------------------------------ #
    # SQL entry point
    # ------------------------------------------------------------------ #
    def sql(self, text: str) -> DataFrame:
        """Execute one SQL statement (reference dialect accepted)."""
        stmt = parse_ddl_dml(text)
        if stmt is not None:
            return self._execute_ddl_dml(stmt)
        m = re.match(
            r"^\s*EXPLAIN\s+(?:(FORMATTED|EXTENDED|CODEGEN|COST)\s+)?(.+)$",
            text,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            return self._explain(m.group(2), (m.group(1) or "formatted").lower())
        pre_qualify = fold_interval_quantity(rewrite_table_functions(self, text))
        rewritten = rewrite_qualify(pre_qualify)
        # QUALIFY predicates windowing over a SELECT alias need the wrapped
        # desugar (Spark rejects lateral alias refs in windows) — staged
        # here, used by the analysis-failure retry at the execution point
        qualify_fallback = (
            rewrite_qualify(pre_qualify, wrap=True)
            if rewritten is not pre_qualify and rewritten != pre_qualify
            else None
        )
        if rewritten.strip().upper().startswith("SHOW TABLES"):
            return self._show_tables()
        # information_schema.tables is a real queryable relation in the
        # reference (information_schema.rs:12-46; SHOW TABLES is sugar over
        # it, session.rs:78-81) — materialize it as a temp view on demand so
        # arbitrary SELECTs against it work too.
        info_view = None
        if re.search(r"\binformation_schema\s*\.\s*tables\b", rewritten, re.IGNORECASE):
            # substitute only OUTSIDE quoted spans — string literals ('..')
            # AND quoted identifiers (".." / `..`); the view name is
            # per-Session so concurrent Session objects sharing one
            # SparkSession don't clobber each other's catalogs
            view = f"q_information_schema_tables_{self._id}"
            parts = re.split(r"('(?:[^']|'')*'|\"[^\"]*\"|`[^`]*`)", rewritten)
            replaced = False
            for i in range(0, len(parts), 2):  # even chunks are unquoted
                new = re.sub(
                    r"\binformation_schema\s*\.\s*tables\b",
                    view,
                    parts[i],
                    flags=re.IGNORECASE,
                )
                replaced = replaced or new != parts[i]
                parts[i] = new
            if replaced:
                self._show_tables().createOrReplaceTempView(view)
                rewritten = "".join(parts)
                info_view = view
        rewritten = self._rewrite_time_travel(rewritten)
        m_hist = re.match(
            r"^\s*DESCRIBE\s+HISTORY\s+([\w.]+)\s*;?\s*$", rewritten, re.IGNORECASE
        )
        if m_hist:
            return self._describe_history(m_hist.group(1))
        try:
            df = self.spark.sql(self._dequalify(rewritten))
        except Exception as e:
            if qualify_fallback is not None and "LATERAL_COLUMN_ALIAS" in str(e):
                # re-enter with the wrapped QUALIFY desugar (no QUALIFY
                # keyword left in it, so this cannot recurse)
                return self.sql(qualify_fallback)
            raise
        if info_view is not None:
            # the returned plan resolved the view during analysis; dropping
            # it immediately keeps the shared SparkSession catalog from
            # accumulating one view per Session object
            self.spark.catalog.dropTempView(info_view)
        return df

    def _describe_history(self, name: str) -> DataFrame:
        """Delta-style DESCRIBE HISTORY: retained snapshot versions of a
        managed table (bounded ring — see ManagedTable.snapshots)."""
        mt = self._get_managed(name)
        rows = [
            (v, v == mt.version) for v in sorted(mt.snapshots, reverse=True)
        ]
        return self.spark.createDataFrame(rows, "version bigint, is_current boolean")

    def _rewrite_time_travel(self, text: str) -> str:
        """``FROM t VERSION AS OF n`` over a managed table -> temp view of
        that snapshot (session-scoped time travel; Delta-style syntax,
        bounded history — see ManagedTable.snapshots)."""
        import re

        def repl(m: re.Match) -> str:
            key = self._normalize_name(m.group(1))
            if key not in self.tables:
                return m.group(0)
            version = int(m.group(2))
            view = f"__asof_{key}_v{version}"
            self.tables[key].as_of(version).createOrReplaceTempView(view)
            return view

        return re.sub(
            r"\b([\w.]+)\s+VERSION\s+AS\s+OF\s+(\d+)", repl, text, flags=re.IGNORECASE
        )

    def _dequalify(self, text: str) -> str:
        """Strip default-catalog/schema qualifiers off managed-table
        references (qurious.public.t / public.t → t) so they resolve to the
        bare temp views — the reference's bare/partial/full name forms
        (table_relation.rs:8-38)."""
        import re

        for key in self.tables:
            text = re.sub(
                rf"\b(?:{DEFAULT_CATALOG}\.)?{DEFAULT_SCHEMA}\.({re.escape(key)})\b",
                r"\1",
                text,
                flags=re.IGNORECASE,
            )
        return text

    def _show_tables(self) -> DataFrame:
        """SHOW TABLES parity: the reference rewrites it to a select over
        information_schema.tables (session.rs:78-81)."""
        rows = [
            (DEFAULT_CATALOG, DEFAULT_SCHEMA, t.name, "BASE TABLE")
            for t in self.tables.values()
        ]
        return self.spark.createDataFrame(
            rows or [],
            "table_catalog string, table_schema string, table_name string, table_type string",
        )

    def _execute_ddl_dml(self, stmt: DdlDmlStatement) -> DataFrame:
        kind = stmt.kind
        if kind == "create_table":
            # qualified names resolve to the same table identity as bare
            # ones (table_relation.rs:8-38): CREATE public.t must collide
            # with an existing t
            if self._normalize_name(stmt.table) in self.tables:
                if stmt.if_not_exists:
                    return self._count_df(0)
                raise ValueError(f"table already exists: {stmt.table}")
            if stmt.query:  # CTAS
                df = self.sql(stmt.query)
            else:
                schema_ddl = ", ".join(f"{c} {t}" for c, t, _ in stmt.columns)
                df = self.spark.createDataFrame([], schema_ddl)
            from qurious_spark.dialect import NotNull

            defaults: dict[str, object] = {}
            notnull: set[str] = set()
            for c, _, d in stmt.columns or []:
                if isinstance(d, NotNull):
                    notnull.add(c)
                    d = d.default
                if d is not None:
                    defaults[c] = d
            self._put_table(
                stmt.table, ManagedTable(stmt.table, df, defaults, notnull)
            )
            return self._count_df(0)
        if kind == "drop_table":
            self._drop_table(stmt.table, stmt.if_exists)
            return self._count_df(0)
        if kind == "insert":
            mt = self._get_managed(stmt.table)
            if stmt.query.strip().upper().startswith("VALUES"):
                source = self.spark.sql(f"SELECT * FROM ({stmt.query})")
            else:
                source = self.sql(stmt.query)
            n = mt.insert_df(source, stmt.columns_list)
            self._put_table(mt.name, mt)
            return self._count_df(n)
        if kind == "delete":
            mt = self._get_managed(stmt.table)
            mt.delete_where(stmt.predicate)
            self._put_table(mt.name, mt)
            return self._count_df(0)
        if kind == "update":
            mt = self._get_managed(stmt.table)
            mt.update_set(stmt.assignments, stmt.predicate)
            self._put_table(mt.name, mt)
            return self._count_df(0)
        if kind == "merge":
            return self._execute_merge(stmt)
        if kind == "copy_to":
            df = self.table(stmt.table)
            fmt = stmt.options.get("format", "parquet")
            writer = df.write.mode("overwrite")
            if fmt == "csv":
                writer = (
                    writer.option("header", str(stmt.options.get("header", True)).lower())
                    # RFC-4180 doubled-quote escaping, matching read_csv_like
                    # and DuckDB; Spark's writer default (backslash) produced
                    # files our own reader mis-parsed on embedded quotes
                    .option("escape", '"')
                    # the writer strips unquoted cell whitespace by default —
                    # lossy for values like ' a ' (the reader preserves it)
                    .option("ignoreLeadingWhiteSpace", "false")
                    .option("ignoreTrailingWhiteSpace", "false")
                )
                if stmt.options.get("delimiter"):
                    writer = writer.option("sep", stmt.options["delimiter"])
                writer.csv(stmt.path)
            elif fmt == "json":
                writer.json(stmt.path)
            elif fmt == "orc":
                writer.orc(stmt.path)
            else:
                writer.parquet(stmt.path)
            return self._count_df(df.count())
        if kind == "copy_from":
            from qurious_spark.sources.readers import read_csv_like

            mt = self._get_managed(stmt.table)
            src = read_csv_like(
                self.spark,
                stmt.path,
                delimiter=stmt.options.get("delimiter", ","),
                header=stmt.options.get("header", False),
                schema=mt.df.schema,
                multiline=bool(stmt.options.get("multiline", False)),
            )
            n = mt.insert_df(src)
            self._put_table(mt.name, mt)
            return self._count_df(n)
        raise ValueError(f"unsupported statement kind: {kind}")

    def merge_into(self, merge_sql: str, source_df: DataFrame | None = None) -> DataFrame:
        """Programmatic MERGE: like ``sql()`` but binds the USING source to
        ``source_df`` directly (no temp-view indirection) — needed inside
        ``foreachBatch``, where the micro-batch DataFrame lives in a cloned
        session whose temp views the outer session cannot see."""
        stmt = parse_ddl_dml(merge_sql)
        if stmt is None or stmt.kind != "merge":
            raise ValueError("merge_into expects a MERGE INTO statement")
        return self._execute_merge(stmt, source_df)

    def _execute_merge(
        self, stmt: DdlDmlStatement, source_df: DataFrame | None = None
    ) -> DataFrame:
        """MERGE INTO: SQL:2003 upsert over a managed table (beyond the
        reference, whose DML stops at INSERT/DELETE — session.rs:128-151).

        Plan shape (scale): ONE left outer join on the merge condition
        handles every MATCHED arm (first-match-wins via a single when-chain
        per column), ONE left anti join produces the NOT MATCHED inserts;
        both are key-equi joins Catalyst can run as broadcast or shuffle
        hash. No collect; the new table state stays a lazy plan.
        """
        mt = self._get_managed(stmt.table)
        talias = stmt.alias or "t"
        salias = stmt.source_alias or "s"
        if source_df is not None:
            src = source_df
        else:
            src = self.sql(stmt.source) if stmt.source_is_query else self.table(stmt.source)
        if "__m" in src.columns:
            raise ValueError("MERGE: source may not contain a __m column")
        cond = F.expr(stmt.on_cond)
        target = mt.df.alias(talias)
        source = src.withColumn("__m", F.lit(True)).alias(salias)

        # SQL-standard cardinality check: a target row may match at most one
        # source row (nondeterministic update otherwise). One count job.
        dup = (
            mt.df.withColumn("__tid", F.monotonically_increasing_id())
            .alias(talias)
            .join(source, cond, "inner")
            .groupBy("__tid")
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError("MERGE: a target row matched more than one source row")

        joined = target.join(source, cond, "left")
        matched = F.col(f"{salias}.__m").isNotNull()
        m_clauses = [c for c in stmt.clauses if c.matched]
        nm_clauses = [c for c in stmt.clauses if not c.matched]

        # winning MATCHED arm per row (first match wins), -1 = no arm applies
        winner = F.lit(-1)
        chain = None
        for i, c in enumerate(m_clauses):
            arm = matched & (F.expr(c.cond) if c.cond else F.lit(True))
            chain = (chain.when(arm, i) if chain is not None else F.when(arm, i))
        if chain is not None:
            winner = chain.otherwise(F.lit(-1))
        joined = joined.withColumn("__w", winner)
        delete_arms = [i for i, c in enumerate(m_clauses) if c.action == "delete"]
        kept = joined
        if delete_arms:
            kept = joined.filter(~F.col("__w").isin(delete_arms))
        out_cols = []
        for field in mt.df.schema:
            val = F.col(f"{talias}.{field.name}")
            upd = None
            for i, c in enumerate(m_clauses):
                if c.action == "update" and field.name in c.assignments:
                    v = F.expr(c.assignments[field.name]).cast(field.dataType)
                    upd = (upd.when(F.col("__w") == i, v) if upd is not None
                           else F.when(F.col("__w") == i, v))
            out_cols.append((upd.otherwise(val) if upd is not None else val).alias(field.name))
        updated = kept.select(*out_cols)
        # NOT NULL applies to matched-update arms too, not just inserts —
        # an UPDATE SET x = NULL on a constrained column must fail the same
        # way INSERT/UPDATE do. Only pay the count job when an update arm
        # actually assigns a constrained column.
        updated_cols = {
            name
            for c in m_clauses
            if c.action == "update"
            for name in c.assignments
        }
        if mt.notnull & updated_cols:
            mt._check_notnull(updated, "MERGE")

        # NOT MATCHED side: anti-join source against target, then the
        # first applicable insert arm builds each target column.
        inserted = None
        if nm_clauses:
            anti = src.alias(salias).join(target, cond, "left_anti")
            nm_winner = None
            for i, c in enumerate(nm_clauses):
                arm = F.expr(c.cond) if c.cond else F.lit(True)
                nm_winner = (nm_winner.when(arm, i) if nm_winner is not None
                             else F.when(arm, i))
            anti = anti.withColumn("__w", nm_winner.otherwise(F.lit(-1))).filter(
                F.col("__w") >= 0
            )
            ins_cols = []
            for field in mt.df.schema:
                per_arm = None
                for i, c in enumerate(nm_clauses):
                    if c.insert_values is None:  # INSERT *
                        v = (F.col(f"{salias}.{field.name}") if field.name in src.columns
                             else F.lit(mt.defaults.get(field.name)))
                    else:
                        cols = c.insert_columns or [f.name for f in mt.df.schema]
                        if field.name in cols:
                            v = F.expr(c.insert_values[cols.index(field.name)])
                        else:
                            v = F.lit(mt.defaults.get(field.name))
                    v = v.cast(field.dataType)
                    per_arm = (per_arm.when(F.col("__w") == i, v) if per_arm is not None
                               else F.when(F.col("__w") == i, v))
                ins_cols.append(per_arm.alias(field.name))
            inserted = anti.select(*ins_cols)
            mt._check_notnull(inserted, "MERGE")

        mt.df = updated.unionByName(inserted) if inserted is not None else updated
        mt._bump()
        self._put_table(mt.name, mt)
        return self._count_df(src.count())

    def _get_managed(self, name: str) -> ManagedTable:
        key = self._normalize_name(name)
        if key not in self.tables:
            raise ValueError(f"not a managed table: {name}")
        return self.tables[key]

    def _count_df(self, n: int) -> DataFrame:
        """DML result shape: single `count` column (reference:
        qurious/src/utils/batch.rs:13 make_count_batch)."""
        return self.spark.createDataFrame([(n,)], "count bigint")
