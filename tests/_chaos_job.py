"""Subprocess chaos jobs (driven by test_chaos.py). Each mode builds its
own SparkSession because fault-tolerance knobs (speculation, task retries)
are SparkContext-level and cannot be changed on the shared test session.

Reference parity: speculative re-execution + first-wins commit
(``TaskManagerImpl.java:43,275-316``, ``DistrStorage.java:213-233``) and
retry-with-cap (``TaskManagerImpl.java:42``) — reproduced as Spark config,
verified by injected faults (the ServerBreaker analog,
``serverbreaker/ServerBreakerImpl.java:10-41``).
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark import TaskContext
from pyspark.sql import SparkSession


def build(master: str, extra: dict[str, str]) -> SparkSession:
    b = (
        SparkSession.builder.master(master)
        .appName("chaos")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()


def mode_speculation() -> None:
    """Speculation enabled + straggler task: results must stay exactly-once.

    Single-machine constraint, verified empirically (also under
    local-cluster): the scheduler refuses to place a speculative copy on a
    host that already runs an attempt (TaskSetManager.dequeueSpeculativeTask),
    so a speculative WIN is unobservable here — that part of the contract
    is carried by the retry and commit scenarios. What this scenario pins
    down is that the speculation machinery (straggler detection scanning
    every 100ms against a 1.2x multiplier) does not duplicate or lose rows
    for a job with a straggling-but-successful task — the hazard class the
    salted_agg retry-stability fix addresses."""
    spark = build(
        "local[8]",
        {
            "spark.speculation": "true",
            "spark.speculation.interval": "100ms",
            "spark.speculation.multiplier": "1.2",
            "spark.speculation.quantile": "0.25",
        },
    )
    sc = spark.sparkContext
    assert sc.getConf().get("spark.speculation") == "true"

    def straggler(it):
        ctx = TaskContext.get()
        if ctx.partitionId() == 3 and ctx.attemptNumber() == 0:
            time.sleep(5)  # flagged speculatable many times over
        return it

    total = sc.parallelize(range(800), 8).mapPartitions(straggler).sum()
    assert total == sum(range(800)), f"duplicate/lost rows: {total}"
    print(f"RESULT ok total={total}")


def mode_retry() -> None:
    """A task fails its first attempt (injected); the retry cap
    (local[8,4] = 4 attempts, reference MAX_ATTEMPT=3+1) must re-run it and
    the job must produce the exact result."""
    spark = build("local[8,4]", {})
    sc = spark.sparkContext

    def fail_first_attempt(it):
        ctx = TaskContext.get()
        if ctx.partitionId() == 2 and ctx.attemptNumber() == 0:
            raise RuntimeError("injected chaos failure")
        return it

    total = sc.parallelize(range(100), 8).mapPartitions(fail_first_attempt).sum()
    assert total == sum(range(100)), total
    print(f"RESULT ok total={total}")


def mode_worker_kill() -> None:
    """A worker PROCESS dies mid-task (SIGKILL, not a Python exception) —
    the ServerBreaker KILL scenario (``serverbreaker/ServerBreakerImpl.java:
    10-41`` kills whole worker pods). ``local[N]`` cannot kill an executor
    JVM without killing the driver, but the Python worker that runs this
    task IS a real separate OS process: SIGKILL-ing it exercises the
    process-death detection path (worker socket drops, task fails with
    "Python worker exited unexpectedly" — no Python traceback to hand
    back), scheduler retry, and exactly-once results after a hard kill.

    The kill fires only on attempt 0 of one partition; the fresh worker
    spawned for the retry sees attemptNumber 1 and completes."""
    import os
    import signal

    spark = build("local[8,4]", {})
    sc = spark.sparkContext

    def die_hard(it):
        ctx = TaskContext.get()
        rows = list(it)
        if ctx.partitionId() == 2 and ctx.attemptNumber() == 0:
            os.kill(os.getpid(), signal.SIGKILL)  # process death, not raise
        return rows

    total = sc.parallelize(range(500), 8).mapPartitions(die_hard).sum()
    assert total == sum(range(500)), f"duplicate/lost rows after kill: {total}"
    print(f"RESULT ok total={total}")


def mode_commit() -> None:
    """Exactly-once sink under retry: a write task fails after producing
    rows on its first attempt; the commit protocol must discard the failed
    attempt's output (no duplicates, no gaps) — the reference's first-wins
    dedup-move, as Spark's OutputCommitter."""
    spark = build("local[8,4]", {})

    def fail_first_attempt(it):
        ctx = TaskContext.get()
        rows = list(it)
        if ctx.partitionId() == 1 and ctx.attemptNumber() == 0:
            raise RuntimeError("injected chaos failure mid-write")
        return rows

    df = spark.range(0, 1000, 1, 8)
    poisoned = df.rdd.mapPartitions(fail_first_attempt).toDF()
    dest = tempfile.mkdtemp() + "/out"
    poisoned.write.parquet(dest)
    back = spark.read.parquet(dest)
    n, s = back.count(), back.agg({"id": "sum"}).head()[0]
    assert n == 1000 and s == sum(range(1000)), (n, s)
    print(f"RESULT ok n={n} sum={s}")


if __name__ == "__main__":
    {
        "speculation": mode_speculation,
        "retry": mode_retry,
        "commit": mode_commit,
        "worker_kill": mode_worker_kill,
    }[sys.argv[1]]()
