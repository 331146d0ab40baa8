"""Sandboxed agent entry point (reference AgentGuard,
python/dataprof/agent.py:120-440) — the headline API for letting an
LLM agent profile model-supplied paths safely.

Recast for the Spark engine: the guard validates paths BEFORE any
Spark job is planned (path allow-list, traversal/symlink rejection,
network-scheme refusal, file-size ceiling), applies the policy's row
cap as a hard `limit` on the scan, and redacts errors so a rejected
path never describes the host filesystem back to the model. The
fail-closed LLM-context rules from sources/report.py apply on top
(allow_samples gates raw values entirely).
"""

from __future__ import annotations

import os
import pathlib
from dataclasses import dataclass
from typing import Sequence

_NETWORK_SCHEMES = (
    "http://", "https://", "ftp://", "s3://", "s3a://", "gs://",
    "hdfs://", "wasb://", "abfs://", "jdbc:",
)


class PathNotAllowedError(PermissionError):
    """Source escapes the sandbox / wrong scheme / not a regular file."""


class ResourceLimitExceededError(RuntimeError):
    """Source exceeds a policy ceiling (checked before any read)."""


@dataclass(frozen=True)
class SandboxPolicy:
    """Limits applied to every call made through an AgentGuard.

    Conservative by default: small, local, quick — widened on purpose
    (agent.py:120-183 contract). `roots` is required; a guard without
    one enforces nothing.
    """

    roots: tuple[pathlib.Path, ...]
    max_file_bytes: int = 256 * 1024 * 1024
    max_rows: int = 1_000_000
    follow_symlinks: bool = False
    allow_network: bool = False
    allow_samples: bool = False

    @classmethod
    def for_roots(cls, roots: Sequence[str] | str, **kw) -> "SandboxPolicy":
        items = [roots] if isinstance(roots, (str, os.PathLike)) else list(roots)
        resolved = []
        for r in items:
            p = pathlib.Path(r).expanduser().resolve()
            if not p.is_dir():
                raise ValueError(
                    f"sandbox root is not an existing directory: {p}"
                )
            resolved.append(p)
        if not resolved:
            raise ValueError(
                "SandboxPolicy requires at least one root; an unrooted "
                "guard sandboxes nothing"
            )
        for name in ("max_file_bytes", "max_rows"):
            if name in kw and kw[name] <= 0:
                raise ValueError(f"{name} must be positive")
        return cls(roots=tuple(resolved), **kw)


class AgentGuard:
    """Routes every model-supplied source through the policy."""

    def __init__(self, policy: SandboxPolicy) -> None:
        self._policy = policy

    @property
    def policy(self) -> SandboxPolicy:
        return self._policy

    # ---------------------------------------------------- path handling
    def resolve_path(self, source: str | os.PathLike) -> pathlib.Path:
        """Resolve inside the sandbox or raise a REDACTED error.

        Relative paths resolve against the roots (never the CWD);
        traversal and escaping symlinks are rejected AFTER full
        resolution so `a/../../etc/x` and a symlink to `/etc/x` fail
        the same check (agent.py:202-270).
        """
        if not isinstance(source, (str, os.PathLike)):
            raise PathNotAllowedError(
                f"expected a file path, got {type(source).__name__}"
            )
        raw = os.fspath(source)
        self._reject_network(raw)
        candidate = pathlib.Path(raw).expanduser()
        attempts = (
            [candidate]
            if candidate.is_absolute()
            else [root / candidate for root in self._policy.roots]
        )
        attempted = resolved = None
        for attempt in attempts:
            try:
                r = attempt.resolve(strict=True)
            except (OSError, RuntimeError):
                continue
            attempted, resolved = attempt, r
            if self._containing_root(r) is not None:
                break
        if resolved is None:
            # "not found" whether missing or unreadable: telling them
            # apart describes the host filesystem to the model
            raise PathNotAllowedError(
                f"no such file inside the sandbox: {candidate.name}"
            )
        root = self._containing_root(resolved)
        if root is None:
            raise PathNotAllowedError(
                f"path is outside the sandbox: {candidate.name}"
            )
        if not self._policy.follow_symlinks and self._traverses_symlink(
            attempted, resolved
        ):
            raise PathNotAllowedError(
                f"path is a symlink and symlinks are disabled: "
                f"{candidate.name}"
            )
        if not resolved.is_file():
            raise PathNotAllowedError(f"not a regular file: {candidate.name}")
        size = resolved.stat().st_size
        if size > self._policy.max_file_bytes:
            raise ResourceLimitExceededError(
                f"file is {size} bytes, over the "
                f"{self._policy.max_file_bytes}-byte limit"
            )
        return resolved

    def _containing_root(self, p: pathlib.Path) -> pathlib.Path | None:
        for root in self._policy.roots:
            try:
                p.relative_to(root)
                return root
            except ValueError:
                continue
        return None

    @staticmethod
    def _traverses_symlink(attempted, resolved) -> bool:
        if attempted.is_symlink():
            return True
        try:
            folded = os.path.normcase(os.path.normpath(attempted))
            return folded != os.path.normcase(str(resolved))
        except OSError:
            return True

    def _reject_network(self, raw: str) -> None:
        if self._policy.allow_network:
            return
        low = raw.lower()
        for scheme in _NETWORK_SCHEMES:
            if low.startswith(scheme):
                # name the scheme, not the URL — URLs carry credentials
                raise PathNotAllowedError(
                    "network access is disabled; refusing a "
                    f"{scheme.rstrip(':/')} source"
                )

    # ------------------------------------------------- guarded entries
    def _read(self, spark, source):
        path = self.resolve_path(source)
        suffix = path.suffix.lower()
        if suffix == ".parquet":
            df = spark.read.parquet(str(path))
        elif suffix in (".csv", ".tsv"):
            from dataprof_spark.sources import readers

            df = readers.read_csv_robust(spark, str(path)).df
        elif suffix in (".json", ".jsonl", ".ndjson"):
            from dataprof_spark.sources import readers

            df = readers.read_jsonl(spark, str(path)).df
        else:
            raise PathNotAllowedError(f"unsupported format: {suffix}")
        # the policy row cap is a hard limit in the PLAN, so no job
        # can scan past it regardless of what the engine does next
        return df.limit(self._policy.max_rows)

    def profile(self, spark, source):
        """Guarded column profile of a model-supplied path."""
        from dataprof_spark.operators import profiler

        return profiler.profile(self._read(spark, source))

    def quality(self, spark, source, key_col: str | None = None):
        """Guarded quality assessment."""
        from dataprof_spark.operators import quality

        return quality.assess(self._read(spark, source), key_col=key_col)

    def llm_context(self, spark, source, token_budget: int = 2000) -> str:
        """Guarded, fail-closed LLM context. Raw sample values are
        included ONLY when the policy opts in (allow_samples)."""
        from dataprof_spark.operators import profiler
        from dataprof_spark.sources import report

        profiles = profiler.profile(self._read(spark, source))
        if not self._policy.allow_samples:
            for p in profiles:
                p.top_values = []
                p.stats.pop("bottom_values", None)
        rep = report.ProfileReport.from_profiles(
            str(pathlib.Path(os.fspath(source)).name), profiles,
            patterns_scanned=False,
        )
        return rep.to_llm_context(token_budget)
