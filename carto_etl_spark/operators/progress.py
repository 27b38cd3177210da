"""Distributed progress observation (reference D9 at cluster scale).

The reference's observer fires per chunk on the driver
(/root/reference/etl/etl.py:159-164,288).  In a distributed engine the
equivalent signal is task completion across the cluster; PySpark's official
introspection surface is ``SparkContext.statusTracker()``, so this module
polls it from a daemon thread while actions run and forwards progress to the
same ``{"type", "msg"}`` callback shape — an existing carto-etl observer
keeps working while actually reporting executor progress."""

from __future__ import annotations

import threading
import time
from typing import Any, Callable


class ProgressReporter:
    """Samples active stages and emits observer events:

    - ``progress``: "stage <id>: <completed>/<total> tasks" whenever the
      completed-task count of an active stage advances;
    - ``error``: any stage with failed tasks.

    Use as a context manager around job actions::

        with ProgressReporter(spark, observer):
            job.run()
    """

    def __init__(self, spark, observer: Callable[[dict], Any],
                 interval_s: float = 0.5):
        self.spark = spark
        self.observer = observer
        self.interval_s = interval_s
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._seen: dict[int, int] = {}

    def _poll_once(self) -> None:
        tracker = self.spark.sparkContext.statusTracker()
        for stage_id in tracker.getActiveStageIds():
            info = tracker.getStageInfo(stage_id)
            if info is None:
                continue
            done = info.numCompletedTasks
            if self._seen.get(stage_id) != done:
                self._seen[stage_id] = done
                self.observer(
                    {
                        "type": "progress",
                        "msg": f"stage {stage_id}: {done}/{info.numTasks} tasks",
                    }
                )
            if info.numFailedTasks:
                self.observer(
                    {
                        "type": "error",
                        "msg": f"stage {stage_id}: {info.numFailedTasks} failed tasks",
                    }
                )

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                self._poll_once()
            except Exception:  # noqa: BLE001 — progress must never kill a job
                pass
            time.sleep(self.interval_s)

    def __enter__(self) -> "ProgressReporter":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
        # final sample so short jobs still report
        try:
            self._poll_once()
        except Exception:  # noqa: BLE001
            pass
