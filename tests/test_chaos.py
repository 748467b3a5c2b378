"""Fault-tolerance parity tests (reference: ServerBreaker chaos suite,
``MasterImplTest.java:125-194``; speculation ``TaskManagerImpl.java:43``;
retry cap ``TaskManagerImpl.java:42``; first-wins commit
``DistrStorage.java:213-233``).

Each scenario runs in a subprocess because speculation/retry are
SparkContext-level configs; see tests/_chaos_job.py for the jobs.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

JOB = os.path.join(os.path.dirname(__file__), "_chaos_job.py")


def run_job(mode: str, timeout: int = 240) -> str:
    proc = subprocess.run(
        [sys.executable, JOB, mode],
        capture_output=True,
        text=True,
        timeout=timeout,
        env={**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(JOB))},
    )
    assert proc.returncode == 0, f"{mode}: rc={proc.returncode}\n{proc.stderr[-2000:]}"
    assert "RESULT ok" in proc.stdout, proc.stdout
    return proc.stdout


@pytest.mark.slow
def test_speculation_rescues_hung_task():
    run_job("speculation")


@pytest.mark.slow
def test_retry_recovers_failed_task():
    run_job("retry")


@pytest.mark.slow
def test_commit_protocol_exactly_once_under_retry():
    run_job("commit")
