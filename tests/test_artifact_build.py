"""`finish_artifact_build` teardown contract (r11 ADVICE): the
artifact root must never outlive a failed build, and a timed-out
query must be fully terminated BEFORE the root is deleted (stop() is
asynchronous — deleting first can race in-flight stream writers)."""

from __future__ import annotations

import os

import pytest

from spark_cdc_replication_spark.streaming import finish_artifact_build


class FakeQuery:
    """Stands in for a StreamingQuery; records the call order so the
    stop-before-rmtree sequencing is assertable."""

    def __init__(self, outcomes):
        # outcomes: per-awaitTermination-call result; an Exception
        # instance is raised, anything else returned
        self.outcomes = list(outcomes)
        self.calls: list[str] = []

    def awaitTermination(self, timeout=None):
        self.calls.append(f"await({timeout})")
        out = self.outcomes.pop(0)
        if isinstance(out, Exception):
            raise out
        return out

    def stop(self):
        self.calls.append("stop")


def _root(tmp_path):
    root = tmp_path / "artifact_root"
    root.mkdir()
    (root / "partial.parquet").write_text("half-built")
    return str(root)


def test_success_leaves_root_intact(tmp_path):
    root = _root(tmp_path)
    q = FakeQuery([True])
    finish_artifact_build(q, root, timeout_s=300, what="x")
    assert os.path.isdir(root)
    assert q.calls == ["await(300)"]


def test_timeout_stops_then_awaits_then_cleans(tmp_path):
    root = _root(tmp_path)
    q = FakeQuery([False, True])
    with pytest.raises(TimeoutError, match="x build did not finish"):
        finish_artifact_build(q, root, timeout_s=300, what="x")
    # stop() precedes the BOUNDED re-await (r12 ADVICE: unbounded
    # could hang forever on a wedged sink), which precedes rmtree —
    # the rmtree-vs-in-flight-writer race the helper exists to close
    assert q.calls == ["await(300)", "stop", "await(300)"]
    assert not os.path.exists(root)


def test_timeout_with_wedged_sink_warns_cleans_and_raises(tmp_path):
    """r12 ADVICE: if even the post-stop bounded re-await does not
    confirm termination, the helper must surface the TimeoutError
    (with a warning) instead of blocking the caller forever."""
    root = _root(tmp_path)
    q = FakeQuery([False, False])
    with pytest.warns(RuntimeWarning, match="did not confirm termination"):
        with pytest.raises(TimeoutError, match="x build did not finish"):
            finish_artifact_build(q, root, timeout_s=300, what="x")
    assert q.calls == ["await(300)", "stop", "await(300)"]
    assert not os.path.exists(root)


def test_timeout_cleans_even_if_reawait_raises(tmp_path):
    root = _root(tmp_path)
    q = FakeQuery([False, RuntimeError("terminated with error")])
    with pytest.raises(TimeoutError):
        finish_artifact_build(q, root, timeout_s=300, what="x")
    assert not os.path.exists(root)


def test_streaming_error_cleans_root_and_reraises(tmp_path):
    root = _root(tmp_path)
    boom = RuntimeError("stream died")
    q = FakeQuery([boom])
    with pytest.raises(RuntimeError, match="stream died"):
        finish_artifact_build(q, root, timeout_s=300, what="x")
    # the half-built root must not linger for a later session to
    # mistake for a committed artifact
    assert not os.path.exists(root)
