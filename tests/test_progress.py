"""S8 progress sink: byte-exact rendering vs the reference ProgressBar
(ProgressBar.java:50-96 format strings, re-render-on-integer-change and
freeze-at-100 contract) plus the statusTracker-driven wiring."""

from __future__ import annotations

import io

from cassandra_sstable_tools_spark.report.progress import ProgressBar, job_progress


class _Clock:
    def __init__(self) -> None:
        self.now = 0.0

    def __call__(self) -> float:
        return self.now


def test_batch_mode_lines():
    out, clock = io.StringIO(), _Clock()
    bar = ProgressBar("Analyzing SSTables", interactive=False, out=out, clock=clock)
    clock.now = 1000.0  # 1s elapsed at 25% -> ETA 3s
    bar.update_progress(0.25)
    clock.now = 2000.0
    bar.update_progress(1.0)
    assert out.getvalue() == (
        "Analyzing SSTables (25%) ETA: 0m 3s\n"
        "Analyzing SSTables (100%)\n\n"
    )


def test_interactive_mode_bar():
    out, clock = io.StringIO(), _Clock()
    bar = ProgressBar("t", interactive=True, out=out, clock=clock)
    clock.now = 1000.0
    bar.update_progress(0.5)  # 15 full + 15 empty cells, ETA 1s
    assert out.getvalue() == "\033[2K\rt " + "█" * 15 + "░" * 15 + " (50%) ETA: 0m 1s"
    out.truncate(0); out.seek(0)
    bar.update_progress(1.0)
    assert out.getvalue() == "\033[2K\rt " + "█" * 30 + " (100%)\n\n"


def test_rerenders_only_on_integer_change_and_freezes_at_100():
    out, clock = io.StringIO(), _Clock()
    bar = ProgressBar("t", interactive=False, out=out, clock=clock)
    clock.now = 1000.0
    bar.update_progress(0.101)
    bar.update_progress(0.105)  # still 10% -> no output
    assert out.getvalue().count("\n") == 1
    bar.update_progress(1.0)
    bar.update_progress(0.5)  # frozen after 100
    assert out.getvalue().endswith("(100%)\n\n")
    assert "(50%)" not in out.getvalue()


def test_job_progress_wraps_a_real_action(spark, sf_dir):
    from cassandra_sstable_tools_spark.sources.tpch_adapter import load_table

    out = io.StringIO()
    with job_progress(spark, "scan", interactive=False, out=out, poll_s=0.01):
        load_table(spark, sf_dir, "lineitem").count()
    assert out.getvalue().endswith("scan (100%)\n\n")
