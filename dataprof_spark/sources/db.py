"""DB query source with sampling pushdown (reference S9 +
dataprof-db/src/sampling.rs:86-157, security/sql_validation.rs).

The reference profiles large DB tables by pushing the sampling INTO
the database: Random → ``ORDER BY RANDOM(seed) LIMIT n``, Systematic
→ ``ROW_NUMBER() OVER () % step``, Reservoir → ``TABLESAMPLE``,
Stratified → per-stratum ROW_NUMBER, Temporal → time-ordered
systematic. This module is the pure-Python generator of those
pushdown queries plus the identifier/base-query validation layer, and
a thin ``read_db_sample`` wrapper that hands the generated SQL to
``spark.read.format("jdbc")`` via the `query` option — Spark then
executes the sample server-side instead of pulling the full table.

At 100 TB the pushdown is the whole point: a JDBC scan of the full
table to sample 10k rows driver-side would move the table over the
wire; the generated query moves only the sample.

No JDBC endpoint exists in this sandbox, so the generator is tested
two ways (tests/test_db_sampling.py): string contracts against the
reference's expected shapes, and EXECUTION of the generated SQL
against DuckDB for the dialect-portable strategies — the queries must
actually run and return the right row counts.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")
# Keywords are matched on WORD BOUNDARIES, not substrings: the
# reference's substring scan (sql_validation.rs) rejects conventional
# identifiers — created_at contains CREATE, updated_at contains UPDATE
# — which are exactly the columns the temporal strategy targets
# (dates.DATE_NAME_HINTS). `\b` treats `_` as a word char, so
# \bCREATE\b does not fire inside CREATED_AT but still fires on
# `schema.drop` (dot is a boundary). Symbol patterns stay substring.
_DANGEROUS_WORDS_RE = re.compile(
    r"\b(DROP|DELETE|INSERT|UPDATE|TRUNCATE|ALTER|CREATE|GRANT|REVOKE"
    r"|EXEC|EXECUTE|UNION|INFORMATION_SCHEMA|XP_CMDSHELL|WAITFOR|SLEEP"
    r"|LOAD_FILE|ATTACH)\b"
)
_DANGEROUS_SYMBOLS = ("--", "/*", ";")


def _scan_dangerous(upper: str) -> str | None:
    m = _DANGEROUS_WORDS_RE.search(upper)
    if m:
        return m.group(1)
    for sym in _DANGEROUS_SYMBOLS:
        if sym in upper:
            return sym
    return None


class SqlValidationError(ValueError):
    """Identifier/base-query failed the injection-prevention rules."""


def validate_identifier(identifier: str) -> str:
    """Table/column-name validation (sql_validation.rs:7-103)."""
    ident = identifier.strip()
    if not ident:
        raise SqlValidationError("SQL identifier cannot be empty")
    if len(ident) > 128:
        raise SqlValidationError("SQL identifier too long (max 128 chars)")
    quoted = (
        (ident.startswith('"') and ident.endswith('"'))
        or (ident.startswith("`") and ident.endswith("`"))
        or (ident.startswith("[") and ident.endswith("]"))
    )
    if quoted:
        inner = ident[1:-1]
        if not inner or ident[0] in inner or any(
            bad in inner for bad in (";", "--", "/*", "*/")
        ):
            raise SqlValidationError(
                "Invalid characters in quoted identifier"
            )
    elif not _IDENT_RE.match(ident):
        raise SqlValidationError(
            f"Invalid SQL identifier {identifier!r}: only alphanumeric, "
            "underscore, and dot allowed"
        )
    kw = _scan_dangerous(ident.upper())
    if kw:
        raise SqlValidationError(
            f"SQL identifier contains dangerous keyword: {kw}"
        )
    return ident


def validate_base_query(query: str) -> str:
    """SELECT-only base-query validation (sql_validation.rs:105-165)."""
    q = query.strip()
    if not q:
        raise SqlValidationError("Query cannot be empty")
    if len(q) > 10_000:
        raise SqlValidationError("Query too long (max 10000 chars)")
    upper = q.upper()
    if not upper.startswith("SELECT"):
        raise SqlValidationError(
            "Only SELECT queries are allowed for sampling"
        )
    kw = _scan_dangerous(upper)
    if kw:
        raise SqlValidationError(
            f"Query contains dangerous SQL pattern: {kw}"
        )
    return q


def _source(base: str) -> tuple[str, bool]:
    """(validated source clause, is_subquery)."""
    if base.strip().upper().startswith("SELECT"):
        return f"({validate_base_query(base)}) AS sample_subquery", True
    return validate_identifier(base), False


@dataclass
class SamplingConfig:
    """Sampling pushdown configuration (sampling.rs:8-45).

    ``dialect``: 'ansi' (default) emits the reference's SQL verbatim
    (DuckDB-oracle-verified); 'derby' emits the equivalent for Apache
    Derby — MOD() for %, FETCH FIRST for LIMIT, RAND(seed) for
    RANDOM(seed), correlation-qualified stars — so the generated SQL
    can be EXECUTED live through spark.read.jdbc against the Derby
    driver Spark bundles (tests/test_db_sampling.py). Derby's window
    functions accept only an empty OVER(), so temporal/stratified
    (which need OVER(ORDER BY ...)) are refused with a clear error
    rather than generated-and-broken."""

    strategy: str = "reservoir"  # random|systematic|reservoir|stratified|temporal|multistage
    sample_size: int = 10_000
    seed: int | None = None
    stratify_column: str | None = None
    temporal_column: str | None = None
    dialect: str = "ansi"
    extra: dict = field(default_factory=dict)

    # dialect helpers -------------------------------------------------
    def _limit(self, n: int) -> str:
        if self.dialect == "derby":
            return f"FETCH FIRST {n} ROWS ONLY"
        return f"LIMIT {n}"

    def _mod(self, a: str, b: int) -> str:
        if self.dialect == "derby":
            return f"MOD({a}, {b})"
        return f"{a} % {b}"

    def _rand(self, seed: int) -> str:
        if self.dialect == "derby":
            return f"RAND({seed})"
        return f"RANDOM({seed})"

    def generate_sample_query(self, base: str, total_rows: int) -> str:
        """The SQL to run server-side (sampling.rs:84-157). When the
        table is no larger than the sample, the base query passes
        through unchanged."""
        if self.dialect not in ("ansi", "derby"):
            raise SqlValidationError(
                f"unknown SQL dialect {self.dialect!r}"
            )
        if total_rows <= self.sample_size:
            return (
                validate_base_query(base)
                if base.strip().upper().startswith("SELECT")
                else f"SELECT * FROM {validate_identifier(base)}"
            )
        strat = self.strategy.lower()
        src, is_sub = _source(base)
        seed = self.seed if self.seed is not None else 42
        if strat == "random":
            return (
                f"SELECT * FROM {src} ORDER BY {self._rand(seed)} "
                f"{self._limit(self.sample_size)}"
            )
        if strat in ("systematic", "multistage"):
            # MultiStage degrades to Systematic at the SQL layer
            # (sampling.rs:147-151); the in-memory MultiStage pipeline
            # with the refusal contract lives in operators/sampling.py.
            step = math.ceil(total_rows / self.sample_size)
            inner = f"({validate_base_query(base)})" if is_sub else src
            star = "base.*" if self.dialect == "derby" else "*"
            alias = " base" if self.dialect == "derby" else ""
            return (
                f"SELECT * FROM (SELECT {star}, ROW_NUMBER() OVER () AS rn "
                f"FROM {inner}{alias}) AS numbered "
                f"WHERE {self._mod('rn', step)} = 1"
            )
        if strat == "reservoir":
            if is_sub or self.dialect == "derby":
                # TABLESAMPLE needs a physical table (and Derby has no
                # TABLESAMPLE at all); fall back to seeded-random
                # (sampling.rs:160-169)
                return (
                    f"SELECT * FROM {src} ORDER BY {self._rand(seed)} "
                    f"{self._limit(self.sample_size)}"
                )
            # floor the percentage at 0.01: ":.2f" formatting rounds
            # tiny fractions (10k rows of 10^9+) to 0.00, sampling
            # nothing at exactly the scale this pushdown targets — the
            # LIMIT stays the authoritative size bound
            pct = min(100.0, self.sample_size / total_rows * 100.0)
            pct = max(pct, 0.01)
            return (
                f"SELECT * FROM {src} TABLESAMPLE SYSTEM ({pct:.2f}) "
                f"LIMIT {self.sample_size}"
            )
        if strat in ("stratified", "temporal") and self.dialect == "derby":
            if strat == "stratified" and not self.stratify_column:
                pass  # degrades to random below — derby-safe
            else:
                raise SqlValidationError(
                    f"{strat} sampling needs ROW_NUMBER() OVER(ORDER "
                    "BY ...), which Apache Derby does not implement "
                    "(ERROR 0A000); use systematic or random"
                )
        if strat == "stratified":
            if not self.stratify_column:
                return SamplingConfig(
                    strategy="random", sample_size=self.sample_size,
                    seed=self.seed, dialect=self.dialect,
                ).generate_sample_query(base, total_rows)
            col = validate_identifier(self.stratify_column)
            per_stratum = max(1, self.sample_size // 10)
            inner = f"({validate_base_query(base)}) AS base_query" if is_sub else src
            return (
                "SELECT * FROM (SELECT *, ROW_NUMBER() OVER("
                f"PARTITION BY {col} ORDER BY RANDOM()) AS stratum_rn "
                f"FROM {inner}) AS stratified "
                f"WHERE stratum_rn <= {per_stratum} "
                f"LIMIT {self.sample_size}"
            )
        if strat == "temporal":
            if not self.temporal_column:
                raise SqlValidationError(
                    "temporal sampling requires temporal_column"
                )
            col = validate_identifier(self.temporal_column)
            step = math.ceil(total_rows / self.sample_size)
            inner = f"({validate_base_query(base)}) AS base_query" if is_sub else src
            return (
                "SELECT * FROM (SELECT *, ROW_NUMBER() OVER("
                f"ORDER BY {col}) AS time_rn FROM {inner}) AS temporal "
                f"WHERE time_rn % {step} = 1 LIMIT {self.sample_size}"
            )
        raise SqlValidationError(f"unknown sampling strategy {self.strategy!r}")


def count_query(base: str) -> str:
    """Server-side COUNT(*) used to size the sample."""
    src, _ = _source(base)
    return f"SELECT COUNT(*) AS n FROM {src}"


def read_db_sample(
    spark,
    jdbc_url: str,
    base: str,
    config: SamplingConfig | None = None,
    total_rows: int | None = None,
    **jdbc_options,
):
    """Sampled JDBC read: push the generated sample query to the DB.

    Spark executes `query` server-side (predicate + sampling pushdown
    by construction); only the sample crosses the wire. When
    total_rows is not supplied, one COUNT(*) round-trip sizes the
    sampling step first.
    """
    config = config or SamplingConfig()
    if total_rows is None:
        # positional: engines disagree on alias case (Derby uppercases
        # unquoted identifiers, so the row key is "N" not "n")
        total_rows = (
            spark.read.format("jdbc")
            .option("url", jdbc_url)
            .option("query", count_query(base))
            .options(**jdbc_options)
            .load()
            .collect()[0][0]
        )
    sql = config.generate_sample_query(base, total_rows)
    return (
        spark.read.format("jdbc")
        .option("url", jdbc_url)
        .option("query", sql)
        .options(**jdbc_options)
        .load()
    )


def test_connection(
    spark, jdbc_url: str, timeout_s: int = 5, driver: str | None = None
) -> bool:
    """Connection validity check — sync twin of the reference's
    test_connection_async (database_async.rs:112-145): open, validate,
    close. Uses java.sql.DriverManager through the running session's
    JVM, so it exercises the exact driver/classpath spark.read.jdbc
    will use. False on any failure (never raises)."""
    try:
        jvm = spark._jvm
        if driver:
            jvm.java.lang.Class.forName(driver)
        conn = jvm.java.sql.DriverManager.getConnection(jdbc_url)
        try:
            return bool(conn.isValid(timeout_s))
        finally:
            conn.close()
    except Exception:
        return False


def table_schema(spark, jdbc_url: str, table: str, **jdbc_options) -> list[str]:
    """Column names for a table — twin of get_table_schema_async
    (database_async.rs:172-199, returns Vec<String>). Spark fetches
    the schema with a zero-row probe (SELECT * ... WHERE 1=0) —
    no data crosses the wire."""
    return (
        spark.read.format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", validate_identifier(table))
        .options(**jdbc_options)
        .load()
        .columns
    )


def count_table_rows(spark, jdbc_url: str, table: str, **jdbc_options) -> int:
    """Server-side COUNT(*) — twin of count_table_rows_async; one
    scalar crosses the wire."""
    return int(
        spark.read.format("jdbc")
        .option("url", jdbc_url)
        .option("query", count_query(table))
        .options(**jdbc_options)
        .load()
        .collect()[0][0]
    )
