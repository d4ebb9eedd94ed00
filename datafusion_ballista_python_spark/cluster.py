"""Scheduler / Executor compatibility shims (reference ``src/scheduler.rs`` /
``src/executor.rs``).

On Ballista these embed a scheduler/executor server in the Python process
(SURVEY §2.12).  On Spark the scheduler *is* the driver and executors are
JVM workers, so these classes translate the reference's process-management
surface into SparkSession configuration: constructing a ``Scheduler`` yields
a master URL that ``BallistaContext``/``SparkSession`` can attach to, and
``Executor`` records concurrency that maps to local-mode thread count.

They deliberately do NOT block the process the way the reference does
(``scheduler.rs:64-70`` blocks into a server loop) — documented deviation.
"""

from __future__ import annotations

import os

from .session import build_session


class Scheduler:
    """Embedded-scheduler shim (reference ``src/scheduler.rs:33-71``).

    Reference defaults replicated as recorded attributes: PullStaged task
    policy, RoundRobin distribution, in-memory cluster state, event-loop
    buffer 1000 (scheduler.rs:47-61).  On Spark, scheduling policy is the
    DAGScheduler's; these attributes are informational.
    """

    def __init__(
        self,
        bind_host: str = "0.0.0.0",
        bind_port: int = 50050,
        external_host: str = "localhost",
    ):
        self.bind_host = bind_host
        self.bind_port = bind_port
        self.external_host = external_host
        self.task_policy = "PullStaged"
        self.distribution = "RoundRobin"
        self.event_loop_buffer_size = 1000

    @property
    def master_url(self) -> str:
        """The Spark master this 'scheduler' corresponds to."""
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        return f"local[{cpus}]"

    def session(self, **kwargs):
        """Start/attach the driver session (the actual Spark 'scheduler')."""
        return build_session(master=self.master_url, **kwargs)

    def start_api(self, spark, port: int = 0):
        """Serve the reference scheduler's REST/metrics API
        (scheduler.md REST table, metrics.md prometheus set) for the given
        session; returns the server (``.port``, ``.shutdown()``)."""
        from .metrics import start_scheduler_api

        return start_scheduler_api(spark, port=port)


class Executor:
    """Embedded-executor shim (reference ``src/executor.rs:29-75``).

    Reference defaults recorded: ``concurrent_tasks`` defaults to all cores
    (tuning-guide.md:53-54), shuffle job-data TTL 3600 s with cleanup every
    1800 s (executor.rs:67-68).  Spark's shuffle service manages lifecycle;
    local-mode concurrency comes from the master thread count.
    """

    def __init__(
        self,
        scheduler_host: str = "localhost",
        scheduler_port: int = 50050,
        bind_host: str = "0.0.0.0",
        bind_port: int = 50051,
        grpc_port: int = 50052,
        concurrent_tasks: int | None = None,
    ):
        self.scheduler_host = scheduler_host
        self.scheduler_port = scheduler_port
        self.bind_host = bind_host
        self.bind_port = bind_port
        self.grpc_port = grpc_port
        self.concurrent_tasks = concurrent_tasks or os.cpu_count()
        self.job_data_ttl_seconds = 3600
        self.job_data_clean_up_interval_seconds = 1800
