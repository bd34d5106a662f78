"""Fail-closed enablement for the Pallas TPU kernels.

Round 4's official bench crashed because an unvalidated-on-hardware Pallas
kernel was ON by default and the A/B gate failed *open* on a timeout
(BENCH_r04: "Cannot store scalars to VMEM" during Mosaic lowering). The
contract here inverts that: a Pallas strategy may only become the default
when a **passing on-device verdict for the exact current implementation**
exists. The verdict lives in a committed JSON next to this module, keyed by
a fingerprint of (jaxlib version, every file that defines kernel behavior),
so

- any edit to a kernel file invalidates the verdict -> the library falls
  back to the validated XLA strategy until a new on-device A/B passes;
- a fresh checkout (the driver's bench) inherits the builder's validated
  verdict instead of re-running a cold gate against its timeout.

Explicit env overrides still exist for tests and benchmarks:
``TINYGP_TPU_PALLAS_SCAN=1`` forces ON (the gate's own ON leg needs this),
``=0`` forces OFF; *unset* means "ON iff the committed verdict passes".
"""

from __future__ import annotations

__all__ = ["fingerprint", "verdict_ok", "record_verdict", "VERDICT_PATH"]

import hashlib
import json
import os

_HERE = os.path.dirname(os.path.abspath(__file__))

#: Committed record of on-device gate outcomes, keyed by fingerprint().
VERDICT_PATH = os.path.join(_HERE, "pallas_verdicts.json")

#: Every file whose content changes kernel behavior. scan.py supplies the
#: combine monoids the kernels inline, so it is part of the fingerprint.
_FILES = ("pallas_scan.py", "scan.py", "pallas_loglik.py")

_cache: dict[str, object] = {}


def fingerprint() -> str:
    """Hash of jaxlib version + the kernel-defining sources (16 hex)."""
    fp = _cache.get("fp")
    if fp is None:
        import jaxlib

        h = hashlib.sha256()
        h.update(getattr(jaxlib, "__version__", "?").encode())
        for rel in _FILES:
            with open(os.path.join(_HERE, rel), "rb") as f:
                h.update(f.read())
        fp = h.hexdigest()[:16]
        _cache["fp"] = fp
    return fp


def _load() -> dict:
    try:
        with open(VERDICT_PATH) as f:
            return json.load(f)
    except Exception:  # noqa: BLE001 - absent/corrupt file = no verdicts
        return {}


def verdict_ok() -> bool:
    """True iff a committed PASSING on-device verdict matches this tree."""
    ok = _cache.get("ok")
    if ok is None:
        entry = _load().get(fingerprint())
        ok = bool(entry and entry.get("ok"))
        _cache["ok"] = ok
    return ok


def record_verdict(ok: bool, why: str, **extra) -> str:
    """Persist a gate outcome for the current fingerprint; returns the key.

    Called by the on-device A/B gate (``benchmarks/pallas_scan_flip.py``)
    after it has measured value parity + speed on real hardware. Only a
    committed passing entry turns the Pallas default on for library users.
    """
    fp = fingerprint()
    verdicts = _load()
    verdicts[fp] = {"ok": bool(ok), "why": why, **extra}
    with open(VERDICT_PATH, "w") as f:
        json.dump(verdicts, f, indent=2, sort_keys=True)
        f.write("\n")
    _cache["ok"] = bool(ok)
    return fp


def enabled(env_var: str = "TINYGP_TPU_PALLAS_SCAN") -> bool:
    """Fail-closed enablement: env 1 -> on, 0 -> off, unset -> verdict."""
    flag = os.environ.get(env_var)
    if flag == "1":
        return True
    if flag is not None:
        return False
    return verdict_ok()
