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


@pytest.mark.slow
def test_worker_process_kill_recovers():
    """ServerBreaker KILL analog: SIGKILL a real worker OS process mid-task
    (not an injected exception); the scheduler must detect process death,
    retry, and land the exact result (see _chaos_job.mode_worker_kill)."""
    run_job("worker_kill")


def test_status_tracker_health_surface(spark):
    """The reference's health-check chain (Master -> TaskManager -> Worker
    ping forwarding, master/MasterImpl.java:93-105, healthcheck.proto:8-25)
    maps to Spark's StatusTracker: liveness = the context answering at all,
    readiness = executors registered, progress = active job/stage ids
    while work runs. This smoke demonstrates each probe a k8s
    liveness/readiness hook would call (SURVEY.md §3 entry point 3)."""
    import threading
    import time

    st = spark.sparkContext.statusTracker()

    # readiness: the "worker layer" is up (local mode: the driver executor).
    # Executor enumeration lives on the JVM tracker; the Python wrapper
    # exposes the job/stage surface only.
    jvm_tracker = spark.sparkContext._jsc.sc().statusTracker()
    assert len(jvm_tracker.getExecutorInfos()) >= 1

    # idle: no active jobs
    before = st.getActiveJobsIds()

    seen_active = []

    def probe():
        deadline = time.time() + 30
        while time.time() < deadline:
            jobs = st.getActiveJobsIds()
            if jobs:
                seen_active.extend(jobs)
                return
            time.sleep(0.01)

    t = threading.Thread(target=probe)
    t.start()
    # progress: a running job becomes visible to the tracker
    spark.range(2_000_000).selectExpr("sum(id * id)").collect()
    t.join()
    assert seen_active, "active job never appeared in the status tracker"
    jid = seen_active[0]
    info = st.getJobInfo(jid)
    assert info is None or info.status in ("SUCCEEDED", "RUNNING", "FAILED")
    assert jid not in before


def test_observed_metrics_surface(spark):
    """Per-job metric observability (`df.observe`): the accumulator-backed
    analog of the reference's per-task progress reporting
    (`TaskManagerImpl.java` tracks per-task completion; Spark attaches
    named aggregates to a plan node and reports them with job completion
    — zero extra jobs, zero extra scans). A 100 TB pipeline uses this for
    row-count/quality telemetry instead of re-running `count()`s."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    obs = Observation("li_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias(
            "high_discount_rows"
        ),
    )
    # one real job over the observed frame; metrics ride along for free
    n_returned = observed.filter(F.col("l_quantity") >= 1).count()
    got = obs.get
    assert got["rows_seen"] == li.count()
    assert got["rows_seen"] >= n_returned
    exact = li.filter(F.col("l_discount") > 0.05).count()
    assert got["high_discount_rows"] == exact
