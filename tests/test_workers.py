"""Worker-process orchestration contract (pipeline.workers): isolated step
execution, live queue log streaming, error sentinel (SURVEY.md 2.1/5)."""

import numpy as np
import pytest

from babelbrain_tpu.pipeline.workers import (
    ERROR_SENTINEL,
    QueueWriter,
    calculate_mask_process,
    run_step_in_process,
)


def _ok_step(x, y=1):
    print("CTS:L2:S1: doing work")
    return x + y


def _boom_step():
    print("before the crash")
    raise ValueError("synthetic failure")


def _array_step(n):
    return np.ones((n, n, n), np.float32)


class TestRunStepInProcess:
    def test_result_and_live_logs(self):
        logs = []
        out = run_step_in_process(_ok_step, 2, y=3, on_log=logs.append)
        assert out == 5
        assert any("CTS:L2:S1" in ln for ln in logs)

    def test_error_sentinel_and_traceback(self):
        logs = []
        with pytest.raises(RuntimeError) as exc:
            run_step_in_process(_boom_step, on_log=logs.append)
        assert "synthetic failure" in str(exc.value)
        assert any(ln.strip() == ERROR_SENTINEL for ln in logs)
        assert any("before the crash" in ln for ln in logs)

    def test_large_array_result_no_deadlock(self):
        out = run_step_in_process(_array_step, 64)
        assert out.shape == (64, 64, 64)
        assert out.dtype == np.float32


def test_queue_writer_line_buffering():
    class Q:
        def __init__(self):
            self.items = []

        def put(self, x):
            self.items.append(x)

    q = Q()
    w = QueueWriter(q)
    w.write("partial")
    assert q.items == []
    w.write(" line\nsecond\ntail")
    assert q.items == ["partial line", "second"]
    w.flush()
    assert q.items[-1] == "tail"


def test_calculate_mask_process_roundtrip():
    """Step 1 runs out-of-process and returns the Step1Result."""
    n = 64
    aff = np.diag([2.0, 2.0, 2.0, 1.0])
    aff[:3, 3] = -64.0
    ii = np.indices((n, n, n)).astype(float)
    r = np.linalg.norm(ii * 2.0 - 64.0, axis=0)
    labels = np.zeros((n, n, n), np.int32)
    labels[r < 40] = 5
    labels[r < 36] = 7
    labels[r < 30] = 2
    logs = []
    res = calculate_mask_process(
        on_log=logs.append,
        labels_data=labels,
        labels_affine=aff,
        target_ras=[0, 0, 20],
        direction_ras=[0, 0, -1],
        frequency=500e3,
        ppw=6.0,
        shape=(48, 48, 80),
    )
    assert res.mask.shape == (48, 48, 80)
    assert res.mask[tuple(res.target_idx)] == 5
