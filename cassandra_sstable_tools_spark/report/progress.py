"""Progress sink (operator S8).

Reference: ProgressBar.java:8-96 -- a 30-cell block bar on interactive
consoles, plain percent lines in batch mode, with an ETA extrapolated from
elapsed time. The reference updates it from collector read loops
(cli/PartitionSizeStatisticsCollector.java:61-64); the Spark analog is the
job-level task counter from ``SparkContext.statusTracker``, sampled by a
daemon thread while an action runs (progress is a DRIVER-side concern; the
executors never see it).

Rendering is byte-compatible with the reference (same format strings,
including the trailing blank line at 100% and the ``\\033[2K\\r`` erase-line
prefix in interactive mode); ETA reuses X3 ``human_date_diff`` with the
reference's ``ceil`` rounding.
"""

from __future__ import annotations

import sys
import threading
import time
from contextlib import contextmanager
from math import ceil

from cassandra_sstable_tools_spark.functions.humanize import human_date_diff

_FULL_BAR = "█" * 30
_EMPTY_BAR = "░" * 30


class ProgressBar:
    """Mirror of the reference ProgressBar (updateProgress contract:
    re-renders only when the integer percentage changes; freezes at 100)."""

    def __init__(self, title: str, interactive: bool, out=None, clock=None) -> None:
        self.title = title
        self.interactive = interactive
        self._out = out if out is not None else sys.stderr
        self._clock = clock if clock is not None else (lambda: time.time() * 1000.0)
        self._last_percentage = -1
        self._start_time = self._clock()

    def update_progress(self, percent_complete: float) -> None:
        if self._last_percentage == 100:
            return
        percentage = int(percent_complete * 100)
        if percentage == self._last_percentage:
            return
        self._last_percentage = percentage
        elapsed = self._clock() - self._start_time
        # reference: Math.round(Math.ceil(elapsed / pct - elapsed))
        eta = round(ceil(elapsed / percent_complete - elapsed)) if percent_complete else 0
        str_eta = human_date_diff(0, eta)
        if self.interactive:
            if percentage == 100:
                self._out.write(f"\033[2K\r{self.title} {_FULL_BAR} ({percentage}%)\n\n")
            else:
                cols = int(percent_complete * 30)
                bar = _FULL_BAR[: cols] + _EMPTY_BAR[cols:]
                self._out.write(
                    f"\033[2K\r{self.title} {bar} ({percentage}%) ETA: {str_eta}"
                )
        else:
            if percentage == 100:
                self._out.write(f"{self.title} ({percentage}%)\n\n")
            else:
                self._out.write(f"{self.title} ({percentage}%) ETA: {str_eta}\n")
        self._out.flush()


@contextmanager
def job_progress(spark, title: str, interactive: bool = False, out=None,
                 poll_s: float = 0.1):
    """Drive a ProgressBar from Spark's statusTracker while the wrapped
    action runs; always finishes the bar at 100% on clean exit. Zero cost on
    the executors -- the sampler is one driver daemon thread."""
    bar = ProgressBar(title, interactive, out=out)
    tracker = spark.sparkContext.statusTracker()
    stop = threading.Event()

    def sample() -> None:
        while not stop.wait(poll_s):
            total = done = 0
            for jid in tracker.getActiveJobsIds():
                job = tracker.getJobInfo(jid)
                if job is None:
                    continue
                for sid in job.stageIds:
                    stage = tracker.getStageInfo(sid)
                    if stage is None or stage.numTasks == 0:
                        continue
                    total += stage.numTasks
                    done += stage.numCompletedTasks
            if total:
                # cap below 1.0: only the clean exit renders the 100% line
                bar.update_progress(min(done / total, 0.99))

    t = threading.Thread(target=sample, daemon=True)
    t.start()
    try:
        yield bar
        bar.update_progress(1.0)
    finally:
        stop.set()
        t.join(timeout=1.0)
