"""Telemetry contract (utils.telemetry): install UUID persistence, consent
levels, 15-event batching, opt-out env (`Telemetry/Telemetry.py:10-109`)."""

import json
import os

from babelbrain_tpu.utils.telemetry import Telemetry


def test_install_id_persists(tmp_path):
    t1 = Telemetry(str(tmp_path))
    uid = t1.install_id
    t2 = Telemetry(str(tmp_path))
    assert t2.install_id == uid
    assert len(uid) == 36


def test_batching_and_flush(tmp_path):
    t = Telemetry(str(tmp_path))
    for i in range(14):
        t.event(f"CTS:L2:S1: stage {i}", duration_s=0.1)
    path = tmp_path / "events.jsonl"
    assert not path.exists()  # below the batch threshold
    t.event("CTS:L2:S1: stage 14", duration_s=0.1)
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 15
    ev = json.loads(lines[0])
    assert ev["label"].startswith("CTS:")
    assert ev["id"] == t.install_id


def test_opt_out_env(tmp_path, monkeypatch):
    monkeypatch.setenv("BBT_TELEMETRY", "0")
    t = Telemetry(str(tmp_path))
    t.event("CTS:L2:S1: x")
    t.flush()
    assert not (tmp_path / "events.jsonl").exists()


def test_consent_levels(tmp_path):
    t = Telemetry(str(tmp_path))
    t.set_level("off")
    assert not t.enabled
    t2 = Telemetry(str(tmp_path))
    assert t2.level == "off"  # persisted
    t2.set_level("full")
    t2.event("CTS:L2:S2: y", duration_s=1.0, grid=(64, 64, 64))
    t2.flush()
    ev = json.loads((tmp_path / "events.jsonl").read_text().strip())
    assert ev["grid"] == [64, 64, 64]
    # minimal drops extra fields
    t2.set_level("minimal")
    t2.event("CTS:L2:S2: z", grid=(1, 1, 1))
    t2.flush()
    last = json.loads(
        (tmp_path / "events.jsonl").read_text().strip().splitlines()[-1]
    )
    assert "grid" not in last


def test_stage_timer_feeds_telemetry(tmp_path, monkeypatch):
    monkeypatch.setenv("BBT_TELEMETRY_DIR", str(tmp_path))
    import babelbrain_tpu.utils.telemetry as tel

    monkeypatch.setattr(tel, "_GLOBAL", None)
    from babelbrain_tpu.utils.timing import stage_timer

    with stage_timer("unit test stage", level=2, step=9, quiet=True):
        pass
    tel.get_telemetry().flush()
    ev = json.loads((tmp_path / "events.jsonl").read_text().strip())
    assert ev["label"] == "CTS:L2:S9: unit test stage"
    assert ev["duration_s"] >= 0
