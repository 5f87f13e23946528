"""Certified-serving configuration resolver.

The certification harness (scripts/certify_fast_sampler.py, SPEEDUP.md)
publishes, per guidance setting, an independent-seed validation artifact
``artifacts/certification/validation_w{w}_calibrated.indep.json`` listing
which fast-sampler configurations are CERTIFIED against an independent
exact-chain reference, plus the committed checkpoint + spectral-calibration
sidecars they are certified FOR.  This module turns that artifact tree into
one callable: "give me the certified serving configuration for guidance w",
with the same stamp-verification semantics as
``bench.certified_serving_summary`` — every pairing is checked against the
md5 of the committed checkpoint, and any mismatch is a hard error (the
round-3 failure mode: certified numbers quoting a lost model's artifacts).

Consumed by ``sample_power_spectra.py --serving [w]`` (the reference's
zero-configuration inference entry point, code/sample_power_spectra.py:
361-388, upgraded to serve the certified fast path) and usable as a library
API.  Calibrations are model-specific (measured: they do NOT transfer
across retrains — scripts/calibration_transfer_diff.py), hence the hard
fingerprint gate rather than a warning.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import re
from typing import Optional


class ServingConfigError(RuntimeError):
    """A certified serving configuration could not be resolved safely."""


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    """One certified fast-serving row, fully resolved to runnable pieces."""

    guide_w: float
    steps: int                     # strided-DDPM step count
    model_path: str                # committed certification checkpoint
    calibration_path: str          # matching spectral-calibration npz
    config: str                    # row label from the validation artifact
    expected_maps_per_min: float   # certified throughput (v5e chip)
    max_err_vs_indep_pct: float    # certified spectral error vs indep ref
    checkpoint_fingerprint: str    # md5 the whole chain is stamped with


def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def default_artifact_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "certification",
    )


def resolve_serving_config(
    guide_w: float, art_dir: Optional[str] = None
) -> ServingConfig:
    """Resolve the committed certified serving row for ``guide_w``.

    Selection mirrors ``bench.certified_serving_summary``: among the rows in
    ``certified_configs_independent`` (the independent-seed, full-battery
    certification list), the highest-throughput one wins.  Raises
    :class:`ServingConfigError` when no artifact exists for this guidance,
    when any fingerprint (validation artifact or calibration sidecar) does
    not match the committed checkpoint, or when the calibration sidecar the
    row was certified with is missing.
    """
    if float(guide_w) != int(guide_w):
        raise ServingConfigError(
            f"no certified serving row exists for guide_w={guide_w}: "
            "certification artifacts are per integer guidance setting "
            "(committed: w=0 and w=2)"
        )
    w = int(guide_w)
    art_dir = art_dir or default_artifact_dir()
    val_path = os.path.join(
        art_dir, f"validation_w{w}_calibrated.indep.json"
    )
    if not os.path.exists(val_path):
        raise ServingConfigError(
            f"no certification artifact for guide_w={w}: {val_path} "
            "not found (run scripts/run_w2_certification.sh)"
        )
    model_path = os.path.join(art_dir, "model", "train_state.msgpack")
    if not os.path.exists(model_path):
        raise ServingConfigError(
            f"committed certification checkpoint missing: {model_path}"
        )
    ckpt_md5 = _md5(model_path)

    with open(val_path) as f:
        d = json.load(f)
    fp = d.get("checkpoint_fingerprint")
    if fp != ckpt_md5:
        raise ServingConfigError(
            f"certification artifact {val_path} is stamped for checkpoint "
            f"{fp!r} but the committed checkpoint is {ckpt_md5!r} — the "
            "certified rows were produced by a different model; re-run "
            "scripts/run_w2_certification.sh"
        )
    certified = set(d.get("certified_configs_independent") or [])
    rows = [r for r in d.get("rows", []) if r["config"] in certified]
    if not rows:
        raise ServingConfigError(
            f"{val_path} carries no independently-certified rows for "
            f"guide_w={w}"
        )
    best = max(rows, key=lambda r: r["maps_per_min"])
    m = re.search(r"strided DDPM (\d+)", best["config"])
    steps = int(best.get("steps") or (m and m.group(1)) or 0)
    if steps <= 0:
        raise ServingConfigError(
            f"cannot determine the step count of certified row "
            f"{best['config']!r} in {val_path}"
        )
    calib_path = os.path.join(art_dir, f"calib_w{w}_{steps}.npz")
    if not os.path.exists(calib_path):
        raise ServingConfigError(
            f"certified row {best['config']!r} needs the spectral "
            f"calibration sidecar {calib_path}, which is missing"
        )
    from .diffusion.calibration import load_calibration_meta

    calib_fp = load_calibration_meta(calib_path).get(
        "checkpoint_fingerprint"
    )
    if calib_fp is not None and calib_fp != ckpt_md5:
        raise ServingConfigError(
            f"calibration {calib_path} is stamped for checkpoint "
            f"{calib_fp!r}, not the committed one ({ckpt_md5!r}) — "
            "calibrations are model-specific; refit with "
            "scripts/run_w2_certification.sh"
        )
    return ServingConfig(
        guide_w=float(w),
        steps=steps,
        model_path=model_path,
        calibration_path=calib_path,
        config=best["config"],
        expected_maps_per_min=float(best["maps_per_min"]),
        max_err_vs_indep_pct=float(best["max_err_vs_indep_pct"]),
        checkpoint_fingerprint=ckpt_md5,
    )
