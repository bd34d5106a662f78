"""Fail-closed enablement contract for the Pallas kernels.

Round 4's bench crash (an unvalidated kernel ON by default, gate failing
open on timeout) is the scenario these tests pin: without a committed
passing on-device verdict for the CURRENT implementation hash, the Pallas
strategies must stay off unless explicitly forced.
"""

import json

import pytest

from tinygp_tpu.solvers.quasisep import pallas_gate


@pytest.fixture
def fresh_gate(monkeypatch, tmp_path):
    monkeypatch.setattr(
        pallas_gate, "VERDICT_PATH", str(tmp_path / "verdicts.json")
    )
    monkeypatch.setattr(pallas_gate, "_cache", {})
    return tmp_path / "verdicts.json"


def test_no_verdict_means_disabled(fresh_gate, monkeypatch):
    monkeypatch.delenv("TINYGP_TPU_PALLAS_SCAN", raising=False)
    assert not pallas_gate.verdict_ok()
    assert not pallas_gate.enabled()


def test_env_overrides_beat_verdict(fresh_gate, monkeypatch):
    monkeypatch.setenv("TINYGP_TPU_PALLAS_SCAN", "1")
    assert pallas_gate.enabled()
    pallas_gate.record_verdict(True, "pass")
    monkeypatch.setenv("TINYGP_TPU_PALLAS_SCAN", "0")
    assert not pallas_gate.enabled()


def test_passing_verdict_enables(fresh_gate, monkeypatch):
    monkeypatch.delenv("TINYGP_TPU_PALLAS_SCAN", raising=False)
    fp = pallas_gate.record_verdict(True, "parity ok, 2x", t_on_s=1e-4)
    assert pallas_gate.verdict_ok()
    assert pallas_gate.enabled()
    entry = json.loads(fresh_gate.read_text())[fp]
    assert entry["ok"] and entry["t_on_s"] == 1e-4


def test_failing_verdict_disables(fresh_gate, monkeypatch):
    monkeypatch.delenv("TINYGP_TPU_PALLAS_SCAN", raising=False)
    pallas_gate.record_verdict(False, "gate timeout -> fail closed")
    assert not pallas_gate.enabled()


def test_fingerprint_tracks_kernel_files(fresh_gate):
    # The fingerprint must cover every file that defines kernel behavior —
    # round 4's gate cache missed pallas_loglik.py and kept a stale pass
    # across the edit that broke lowering.
    assert set(pallas_gate._FILES) >= {
        "pallas_scan.py",
        "scan.py",
        "pallas_loglik.py",
    }
    fp = pallas_gate.fingerprint()
    assert isinstance(fp, str) and len(fp) == 16


def test_committed_verdict_file_matches_tree():
    """The committed verdict, when present, must be for THIS tree.

    A stale entry is harmless (fail-closed: no match -> disabled), but a
    matching entry asserts the kernels were validated on hardware for the
    exact sources being shipped — this is what the driver's bench run
    inherits.
    """
    verdicts = pallas_gate._load()
    if not verdicts:
        pytest.skip("no committed verdict yet (kernels default OFF)")
    fp = pallas_gate.fingerprint()
    if fp not in verdicts:
        pytest.fail(
            "pallas_verdicts.json has entries but none for the current "
            "implementation hash — kernel sources changed after the last "
            "on-device gate run; re-run benchmarks/pallas_scan_flip.py on "
            "the TPU and commit the result (kernels are OFF until then)"
        )
