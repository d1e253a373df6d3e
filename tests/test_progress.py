"""Messenger/progress bridge (reference src/messaging.rs protocol) over
Spark's StatusTracker."""

from osmquadtree_rust_bindings_spark import progress as P
from osmquadtree_rust_bindings_spark.checkpoint import Lineage


class RecordingMessenger:
    """Duck-typed Messenger capturing every callback (the protocol the
    reference registers: message / start_progress_percent /
    start_progress_bytes)."""

    def __init__(self):
        self.messages = []
        self.ticks = []
        self.finished = []

    def message(self, m):
        self.messages.append(m)

    def start_progress_percent(self, m):
        rec = self

        class PP:
            def set_message(self, m2):
                pass

            def progress_percent(self, p):
                rec.ticks.append(p)

            def finish(self):
                rec.finished.append(m)

        return PP()

    def start_progress_bytes(self, m, total):
        return self.start_progress_percent(m)


def test_job_progress_percent_ticks(spark):
    rec = RecordingMessenger()
    with P.job_progress(spark, "hash rollup", messenger=rec,
                        interval=0.02):
        spark.range(0, 4_000_000, 1, 64).selectExpr(
            "bit_xor(xxhash64(id, id + 1)) as s").collect()
    assert rec.finished == ["hash rollup"]
    assert rec.ticks, "no progress ticks emitted"
    assert rec.ticks[-1] == 100.0
    assert all(0.0 <= t <= 100.0 for t in rec.ticks)
    assert all(b >= a for a, b in zip(rec.ticks, rec.ticks[1:])), \
        "percent must be monotone nondecreasing"


def test_job_progress_finish_on_error(spark):
    rec = RecordingMessenger()
    try:
        with P.job_progress(spark, "boom", messenger=rec, interval=0.02):
            raise RuntimeError("stage failed")
    except RuntimeError:
        pass
    # finish() still fires, but no synthetic 100% on failure — and no
    # Spark job ran inside, so no ticks at all
    assert rec.finished == ["boom"]
    assert rec.ticks == []


def test_lineage_stage_reports_through_registered_messenger(spark,
                                                            tmp_path):
    rec = RecordingMessenger()
    P.register_messenger(rec)
    try:
        lin = Lineage(str(tmp_path), "runp")
        df = lin.run_stage(spark, "s1",
                           lambda: spark.range(100).toDF("id"))
        assert df.count() == 100
        assert rec.finished == ["stage s1"]  # live percent ran the stage
        # resume: the skip is announced through the messenger
        lin.run_stage(spark, "s1", lambda: spark.range(100).toDF("id"))
        assert any("skipping" in m for m in rec.messages)
    finally:
        P.register_messenger(None)


def test_default_messenger_collects(capsys):
    m = P.Messenger()
    m.message("hello")
    pp = m.start_progress_percent("work")
    pp.progress_percent(50.0)
    pp.finish()
    pb = m.start_progress_bytes("scan", 1 << 20)
    pb.progress_bytes(1 << 19)
    pb.finish()
    assert m.messages == ["hello"]
    out = capsys.readouterr().out
    assert "hello" in out and "50.0%" in out and "512" in out
