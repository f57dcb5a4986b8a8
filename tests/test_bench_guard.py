"""Pin the bench.py A/B-receipt stale guard (r12 ADVICE, medium).

The guard must fail toward stale: an unknown git_rev (git exits 128
with empty stdout) or a dirty measured surface must mark the receipt
stale; only a receipt whose stamped rev matches the working tree on
every measured file is folded in fresh.  No Spark needed.
"""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _load_bench()


@pytest.fixture()
def fake_repo(tmp_path):
    """A throwaway git repo with one measured-surface file committed."""
    repo = tmp_path / "repo"
    pkg = repo / "topic_store_spark"
    pkg.mkdir(parents=True)
    (pkg / "mod.py").write_text("x = 1\n")
    (repo / "NOTES.md").write_text("docs only\n")
    env = {**os.environ,
           "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t"}

    def git(*args):
        return subprocess.run(
            ["git", "-C", str(repo), *args], env=env,
            capture_output=True, text=True, check=True).stdout.strip()

    git("init", "-q")
    git("add", "-A")
    git("commit", "-qm", "base")
    return repo, git


def test_fresh_when_rev_matches_clean_tree(bench, fake_repo):
    repo, git = fake_repo
    rev = git("rev-parse", "--short", "HEAD")
    ab = {"git_rev": rev}
    bench.mark_receipt_stale_if_surface_changed(ab, str(repo))
    assert "stale" not in ab


def test_docs_only_commit_keeps_receipt_fresh(bench, fake_repo):
    repo, git = fake_repo
    rev = git("rev-parse", "--short", "HEAD")
    (repo / "NOTES.md").write_text("docs changed\n")
    git("add", "-A")
    git("commit", "-qm", "docs")
    ab = {"git_rev": rev}
    bench.mark_receipt_stale_if_surface_changed(ab, str(repo))
    assert "stale" not in ab


def test_unknown_rev_marks_stale(bench, fake_repo):
    """git diff <bogus rev> exits 128 with empty stdout — the r12 bug
    read that as 'no change'; it must read as stale."""
    repo, _git = fake_repo
    ab = {"git_rev": "deadbeef0000"}
    bench.mark_receipt_stale_if_surface_changed(ab, str(repo))
    assert ab.get("stale") is True
    assert "deadbeef0000" in ab["stale_note"]


def test_committed_surface_change_marks_stale(bench, fake_repo):
    repo, git = fake_repo
    rev = git("rev-parse", "--short", "HEAD")
    (repo / "topic_store_spark" / "mod.py").write_text("x = 2\n")
    git("add", "-A")
    git("commit", "-qm", "surface change")
    ab = {"git_rev": rev}
    bench.mark_receipt_stale_if_surface_changed(ab, str(repo))
    assert ab.get("stale") is True


def test_dirty_working_tree_marks_stale(bench, fake_repo):
    """Uncommitted edits to a measured surface invalidate the receipt
    even when the stamped rev equals HEAD (r12 ADVICE)."""
    repo, git = fake_repo
    rev = git("rev-parse", "--short", "HEAD")
    (repo / "topic_store_spark" / "mod.py").write_text("x = 3\n")  # not committed
    ab = {"git_rev": rev}
    bench.mark_receipt_stale_if_surface_changed(ab, str(repo))
    assert ab.get("stale") is True


def test_missing_rev_marks_stale(bench, fake_repo):
    repo, _git = fake_repo
    for bad in ({}, {"git_rev": ""}, {"git_rev": "unknown"}):
        ab = dict(bad)
        bench.mark_receipt_stale_if_surface_changed(ab, str(repo))
        assert ab.get("stale") is True, bad


def test_not_a_git_repo_marks_stale(bench, tmp_path):
    ab = {"git_rev": "abc1234"}
    bench.mark_receipt_stale_if_surface_changed(ab, str(tmp_path))
    assert ab.get("stale") is True
