"""Scheduler bring-up parity (reference examples/run-scheduler.py).
On Spark there is no separate scheduler process — the driver owns
scheduling — so Scheduler is a documented shim that validates arguments
and reports the Spark-native equivalent."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root import shim (unneeded once pip-installed)


from ballista import Scheduler

scheduler = Scheduler(
    bind_host="127.0.0.1",
    bind_port=50050,
    external_host="127.0.0.1",
)
print(scheduler)
