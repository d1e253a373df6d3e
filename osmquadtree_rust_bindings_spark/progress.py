"""Live progress/metrics bridge — the reference's Messenger protocol over
Spark's public StatusTracker.

The reference registers a Python object whose methods the engine calls
back during long operations (``register_messenger``; Messenger protocol
``message`` / ``start_progress_percent`` / ``start_progress_bytes``,
/root/reference/src/messaging.rs:110-191; ProgressPercent/ProgressBytes
method shapes ``set_message`` / ``progress_percent`` / ``progress_bytes``
/ ``finish``, src/messaging.rs:9-108; the default printing implementation
and module-level registration, reference ``__init__.py:68-94``).

Spark-first mapping: the engine never hand-schedules work, so progress
comes from the scheduler itself — :class:`JobProgress` tags the calling
thread's jobs with a job group (``setJobGroup``), polls
``sc.statusTracker()`` for that group's stages on a daemon thread, and
feeds completed/total task percentages to the registered messenger.
Everything is public PySpark API (no listener-interface py4j callbacks,
which are fragile across Spark versions).  The per-byte variant is
driver-side (catalog file walks), matching the reference's use for file
scans.
"""

from __future__ import annotations

import threading
import time


class ProgressPercent:
    """Default printing ProgressPercent (reference __init__.py shape)."""

    def __init__(self, message: str):
        self.message = message
        self.percent = 0.0

    def set_message(self, new_message: str) -> None:
        self.message = new_message

    def progress_percent(self, percent: float) -> None:
        self.percent = percent
        bar = "=" * int(max(0.0, min(100.0, percent)) / 2)
        print(f"\r[{bar:<50.50}] {percent:5.1f}% {self.message}", end="")

    def finish(self) -> None:
        print()


class ProgressBytes:
    """Default printing ProgressBytes."""

    def __init__(self, message: str, total_bytes: int):
        from osmquadtree_rust_bindings_spark.functions.format import (
            bytes_str,
        )

        self._bytes_str = bytes_str
        self.message = message
        self.total_bytes = max(int(total_bytes), 1)
        self.bytes = 0

    def set_message(self, new_message: str) -> None:
        self.message = new_message

    def progress_bytes(self, nbytes: int) -> None:
        self.bytes = int(nbytes)
        frac = max(0.0, min(1.0, self.bytes / self.total_bytes))
        bar = "=" * int(frac * 50)
        print(f"\r[{bar:<50.50}] {self._bytes_str(self.bytes)} / "
              f"{self._bytes_str(self.total_bytes)} {self.message}", end="")

    def finish(self) -> None:
        print()


class Messenger:
    """The callback protocol object (reference __init__.py:68-80):
    ``message`` collects+prints; the two starters hand back progress
    sinks.  Subclass / duck-type to redirect (tests use a recorder)."""

    def __init__(self):
        self.messages: list[str] = []

    def message(self, message: str) -> None:
        self.messages.append(message)
        print(message)

    def start_progress_percent(self, message: str) -> ProgressPercent:
        return ProgressPercent(message)

    def start_progress_bytes(self, message: str,
                             total_bytes: int) -> ProgressBytes:
        return ProgressBytes(message, total_bytes)


_messenger: Messenger | None = None


def register_messenger(m) -> None:
    """Module-level registration, like the reference's
    ``rust.register_messenger(messenger)`` (__init__.py:93-94)."""
    global _messenger
    _messenger = m


def get_messenger() -> Messenger:
    global _messenger
    if _messenger is None:
        _messenger = Messenger()
    return _messenger


class JobProgress:
    """Context manager: live percent for the Spark jobs the wrapped block
    submits FROM THIS THREAD (job groups are thread-local, so jobs kicked
    off on other driver threads are not attributed).

    Percent = 100 * completed tasks / total tasks over every stage of
    every job in the group so far — jobs discovered later grow the
    denominator, so the bar can stall but the final ``finish()`` always
    lands at 100.  Polling is a daemon thread over
    ``sc.statusTracker()`` (SparkStageInfo.numCompletedTasks/numTasks);
    ticks are emitted at most every ``interval`` seconds and only when
    the percentage moves, mirroring the reference's 2s rate limit
    (src/messaging.rs:37-47)."""

    def __init__(self, spark, message: str, messenger=None,
                 interval: float = 0.5):
        self.spark = spark
        self.message = message
        self.messenger = messenger or get_messenger()
        self.interval = interval
        self.group = f"osmqt-progress-{id(self)}-{time.time_ns()}"
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.pp = None

    def _percent(self) -> float | None:
        st = self.spark.sparkContext.statusTracker()
        done = total = 0
        for jid in st.getJobIdsForGroup(self.group):
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is None or si.numTasks <= 0:
                    continue
                total += si.numTasks
                done += min(si.numCompletedTasks, si.numTasks)
        if total == 0:
            return None
        return 100.0 * done / total

    def _poll(self) -> None:
        last = -1.0
        while not self._stop.wait(self.interval):
            try:
                pct = self._percent()
            except Exception:
                return  # context tearing down
            if pct is not None and pct > last:
                last = pct
                self.pp.progress_percent(pct)

    def __enter__(self):
        self.pp = self.messenger.start_progress_percent(self.message)
        self.spark.sparkContext.setJobGroup(self.group, self.message)
        self._thread = threading.Thread(target=self._poll, daemon=True)
        self._thread.start()
        return self.pp

    def __exit__(self, exc_type, exc, tb):
        self._stop.set()
        self._thread.join(timeout=5)
        self.spark.sparkContext.setJobGroup("", "")
        if exc_type is None:
            self.pp.progress_percent(100.0)
        self.pp.finish()
        return False


def job_progress(spark, message: str, messenger=None,
                 interval: float = 0.5) -> JobProgress:
    """``with job_progress(spark, "stage calcqts"): df.write...``"""
    return JobProgress(spark, message, messenger, interval)
