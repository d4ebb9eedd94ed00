"""Executor bring-up parity (reference examples/run-executor.py).
Executors are Spark worker processes; the shim validates arguments and
reports the spark-submit / standalone-worker equivalent."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root import shim (unneeded once pip-installed)


from ballista import Executor

executor = Executor(
    scheduler_host="localhost",
    scheduler_port=50050,
    bind_host="127.0.0.1",
    bind_port=50051,
    grpc_port=50052,
    concurrent_tasks=1,
)
print(executor)
