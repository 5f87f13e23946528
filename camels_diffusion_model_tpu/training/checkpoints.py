"""Checkpointing: model weights + full resumable training state.

Parity and improvement over the reference: the reference saves bare model
``state_dict`` files every 25 epochs (``weights/model_epoch_{N}.pth``,
train_diffusion_paper.py:476-478) with NO optimizer state and NO resume path
(SURVEY §5).  This module keeps the weights-file naming contract
(``weights/model_epoch_{N}.msgpack``) and the ``param_min.npy`` /
``param_max.npy`` sidecars, and ADDS a full training checkpoint (params,
batch_stats, optimizer state, epoch, RNG key) enabling exact resume — the
auxiliary capability the reference lacks.

Serialization is flax msgpack (host-independent, no pickle).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def weights_checkpoint_plan(
    style: str, ep: int, n_epoch: int, every: int
) -> tuple:
    """Mode-specific weights-file cadence/naming (returns (save, filename)).

    "plus1":  (ep+1) % every == 0 or last epoch; ``model_epoch_{ep+1}``
              (code/ conditional scripts, paper.py:476-478).
    "list25": the reference's FIXED epoch list {25, 50, 75, 100} scaled by
              ``every/25`` — i.e. (ep+1) in {every, 2*every, 3*every, 4*every}
              — NO forced last-epoch save, NO saves past the 4th multiple
              (train_diffusion.py:154 hard-codes [25, 50, 75, 100]), and the
              reference's own off-by-one name ``model_epoch_{ep}``
              (train_diffusion.py:154-155).
    "mod0":   ep % every == 0 or last epoch; ``model_epoch_{ep}``
              (initial.py:175-176, initial2/main/26thNovCode).
    """
    last = ep == n_epoch - 1
    if style == "mod0":
        return (ep % every == 0 or last), f"model_epoch_{ep}.msgpack"
    if style == "list25":
        in_list = (ep + 1) in {every, 2 * every, 3 * every, 4 * every}
        return in_list, f"model_epoch_{ep}.msgpack"
    if style == "plus1":
        return ((ep + 1) % every == 0 or last), f"model_epoch_{ep + 1}.msgpack"
    raise ValueError(f"unknown ckpt_style {style!r}")


def save_model_weights(variables: Dict[str, Any], path: str) -> None:
    """Save inference variables ({'params', 'batch_stats'}) to msgpack."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats") or {}),
    }
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_model_weights(template: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Load weights into the structure of ``template`` (from ``model.init``)."""
    with open(path, "rb") as f:
        data = f.read()
    payload = {
        "params": template["params"],
        "batch_stats": template.get("batch_stats") or {},
    }
    restored = serialization.from_bytes(payload, data)
    out = {"params": restored["params"]}
    if template.get("batch_stats"):
        out["batch_stats"] = restored["batch_stats"]
    return out


def save_train_checkpoint(state, epoch: int, rng, path: str) -> None:
    """Full resumable checkpoint: params, batch_stats, opt_state, step, epoch, rng."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats or {}),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
        "rng": np.asarray(jax.device_get(rng)),
    }
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_train_checkpoint(state, path: str):
    """Restore a TrainState saved by :func:`save_train_checkpoint`.

    Returns (state, epoch, rng)."""
    with open(path, "rb") as f:
        data = f.read()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats or {},
        "opt_state": state.opt_state,
        "step": 0,
        "epoch": 0,
        "rng": np.zeros(2, np.uint32),
    }
    restored = serialization.from_bytes(template, data)
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"] or None,
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return state, int(restored["epoch"]), jax.numpy.asarray(restored["rng"])
