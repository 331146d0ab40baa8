"""AgentGuard sandbox contract (reference python/dataprof/agent.py:
120-440): path allow-list after full resolution, symlink/traversal/
network refusal, size + row ceilings, redacted errors, fail-closed
LLM context."""

from __future__ import annotations

import os

import pytest

from dataprof_spark.sources.agent_guard import (
    AgentGuard,
    PathNotAllowedError,
    ResourceLimitExceededError,
    SandboxPolicy,
)


@pytest.fixture()
def sandbox(tmp_path):
    root = tmp_path / "root"
    root.mkdir()
    (root / "data.csv").write_text("a,b\n1,2\n3,4\n")
    outside = tmp_path / "secret.csv"
    outside.write_text("pw\nhunter2\n")
    return root, outside


def test_policy_requires_roots(tmp_path):
    with pytest.raises(ValueError, match="at least one root"):
        SandboxPolicy.for_roots([])
    with pytest.raises(ValueError, match="not an existing directory"):
        SandboxPolicy.for_roots(str(tmp_path / "nope"))


def test_relative_resolves_against_roots_not_cwd(sandbox):
    root, _ = sandbox
    guard = AgentGuard(SandboxPolicy.for_roots(str(root)))
    assert guard.resolve_path("data.csv") == root / "data.csv"


def test_traversal_and_outside_paths_rejected_redacted(sandbox):
    root, outside = sandbox
    guard = AgentGuard(SandboxPolicy.for_roots(str(root)))
    for bad in (f"../{outside.name}", str(outside)):
        with pytest.raises(PathNotAllowedError) as e:
            guard.resolve_path(bad)
        # redaction: the host path never appears in the message
        assert str(outside.parent) not in str(e.value)


def test_symlink_escape_rejected_unless_enabled(sandbox):
    root, outside = sandbox
    link = root / "innocent.csv"
    os.symlink(outside, link)
    guard = AgentGuard(SandboxPolicy.for_roots(str(root)))
    with pytest.raises(PathNotAllowedError):
        guard.resolve_path("innocent.csv")
    # even in-root symlinks are refused by default (repointable later)
    os.symlink(root / "data.csv", root / "alias.csv")
    with pytest.raises(PathNotAllowedError):
        guard.resolve_path("alias.csv")


def test_network_schemes_refused_without_leaking_url(sandbox):
    root, _ = sandbox
    guard = AgentGuard(SandboxPolicy.for_roots(str(root)))
    with pytest.raises(PathNotAllowedError) as e:
        guard.resolve_path("s3://bucket/secret-key@path")
    assert "bucket" not in str(e.value)


def test_file_size_ceiling(sandbox):
    root, _ = sandbox
    guard = AgentGuard(
        SandboxPolicy.for_roots(str(root), max_file_bytes=4)
    )
    with pytest.raises(ResourceLimitExceededError):
        guard.resolve_path("data.csv")


def test_guarded_profile_and_row_cap(spark, sandbox):
    root, _ = sandbox
    guard = AgentGuard(SandboxPolicy.for_roots(str(root), max_rows=1))
    profiles = guard.profile(spark, "data.csv")
    by_name = {p.name: p for p in profiles}
    assert by_name["a"].total_count == 1  # hard cap in the plan


def test_llm_context_fail_closed_samples(spark, sandbox):
    root, _ = sandbox
    closed = AgentGuard(SandboxPolicy.for_roots(str(root)))
    ctx = closed.llm_context(spark, "data.csv")
    assert "DID NOT RUN" in ctx  # pattern scan disclosure
    assert "e.g." not in ctx     # no raw samples without opt-in
