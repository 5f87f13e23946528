"""Tests: train step, LR schedule, checkpoints, loss decreases on overfit."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camels_diffusion_model_tpu.models import ContextUnet
from camels_diffusion_model_tpu.training import (
    create_train_state,
    linear_decay_schedule,
    load_model_weights,
    load_train_checkpoint,
    make_eval_step,
    make_train_step,
    save_model_weights,
    save_train_checkpoint,
)


@pytest.fixture(scope="module")
def setup():
    height, timesteps = 16, 8
    model = ContextUnet(in_channels=1, n_feat=8, n_cfeat=3, height=height, levels=2)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, height, height, 1), np.float32),
        np.array([0.5], np.float32),
    )
    return model, variables, height, timesteps


def test_linear_decay_schedule():
    sched = linear_decay_schedule(1e-3, 10, 5)
    assert np.isclose(sched(0), 1e-3)
    assert np.isclose(sched(5), 1e-3 * 0.9)  # epoch 1
    assert np.isclose(sched(49), 1e-3 * 0.1)  # epoch 9


def test_train_step_reduces_loss(setup):
    model, variables, height, timesteps = setup
    state = create_train_state(model, variables, 1e-3, 50, 1)
    step = make_train_step(model, timesteps)
    rs = np.random.RandomState(0)
    x = rs.rand(8, height, height, 1).astype(np.float32)
    c = rs.rand(8, 3).astype(np.float32)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        key, k = jax.random.split(key)
        state, metrics = step(state, x, c, k)
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert state.step == 30


def test_remat_step_matches_plain(setup):
    # remat only changes the backward-pass memory/recompute schedule
    # (jax.checkpoint; "convs" = save-only-conv-outputs policy over the
    # blocks.saveable names); params, batch stats, and metrics must be
    # identical in every mode.
    model, variables, height, timesteps = setup
    rs = np.random.RandomState(3)
    x = rs.rand(8, height, height, 1).astype(np.float32)
    c = rs.rand(8, 3).astype(np.float32)
    outs = []
    for remat in (False, True, "convs"):
        state = create_train_state(model, variables, 1e-3, 50, 1)
        step = make_train_step(model, timesteps, remat=remat)
        key = jax.random.PRNGKey(5)
        for _ in range(3):
            key, k = jax.random.split(key)
            state, metrics = step(state, x, c, k)
        outs.append((state, metrics))
    (s0, m0) = outs[0]
    for s1, m1 in outs[1:]:
        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                                   rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            s0.params, s1.params,
        )


def test_batch_stats_update(setup):
    model, variables, height, timesteps = setup
    state = create_train_state(model, variables, 1e-3, 10, 1)
    step = make_train_step(model, timesteps)
    before = jax.tree_util.tree_leaves(state.batch_stats)
    x = np.random.RandomState(0).rand(4, height, height, 1).astype(np.float32)
    c = np.random.RandomState(1).rand(4, 3).astype(np.float32)
    state, _ = step(state, x, c, jax.random.PRNGKey(0))
    after = jax.tree_util.tree_leaves(state.batch_stats)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed


def test_eval_step_runs(setup):
    model, variables, height, timesteps = setup
    state = create_train_state(model, variables, 1e-3, 10, 1)
    eval_step = make_eval_step(model, timesteps)
    x = np.random.RandomState(0).rand(4, height, height, 1).astype(np.float32)
    c = np.random.RandomState(1).rand(4, 3).astype(np.float32)
    m = eval_step(state.params, state.batch_stats, x, c, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert m["per_sample_mse"].shape == (4,)
    assert np.isclose(float(m["loss"]), float(np.mean(m["per_sample_mse"])))


def test_weights_roundtrip(setup, tmp_path):
    model, variables, height, timesteps = setup
    path = str(tmp_path / "w.msgpack")
    save_model_weights(variables, path)
    template = jax.tree_util.tree_map(np.zeros_like, variables)
    restored = load_model_weights(template, path)
    for a, b in zip(
        jax.tree_util.tree_leaves(variables["params"]),
        jax.tree_util.tree_leaves(restored["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_train_checkpoint_resume(setup, tmp_path):
    model, variables, height, timesteps = setup
    state = create_train_state(model, variables, 1e-3, 10, 1)
    step = make_train_step(model, timesteps)
    x = np.random.RandomState(0).rand(4, height, height, 1).astype(np.float32)
    c = np.random.RandomState(1).rand(4, 3).astype(np.float32)
    state, _ = step(state, x, c, jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.msgpack")
    save_train_checkpoint(state, epoch=1, rng=jax.random.PRNGKey(7), path=path)

    fresh = create_train_state(model, variables, 1e-3, 10, 1)
    restored, epoch, rng = load_train_checkpoint(fresh, path)
    assert epoch == 1
    assert int(restored.step) == int(state.step)
    np.testing.assert_array_equal(np.asarray(rng), np.asarray(jax.random.PRNGKey(7)))
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # optimizer moments restored too
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_weights_checkpoint_plan():
    """Mode-specific weights cadence/naming (paper.py:476-478,
    train_diffusion.py:154-155, initial.py:175-176)."""
    from camels_diffusion_model_tpu.training.checkpoints import (
        weights_checkpoint_plan,
    )

    # plus1 (code/ conditional scripts): every 25 by (ep+1), + last epoch
    assert weights_checkpoint_plan("plus1", 24, 100, 25) == (
        True, "model_epoch_25.msgpack")
    assert weights_checkpoint_plan("plus1", 25, 100, 25)[0] is False
    assert weights_checkpoint_plan("plus1", 9, 10, 25) == (
        True, "model_epoch_10.msgpack")
    # list25 (train_diffusion.py): name uses ep (the reference's off-by-one),
    # NO forced last-epoch save, and the FIXED 4-entry list {25,50,75,100} —
    # no saves past the 4th multiple (train_diffusion.py:154)
    assert weights_checkpoint_plan("list25", 24, 100, 25) == (
        True, "model_epoch_24.msgpack")
    assert weights_checkpoint_plan("list25", 99, 200, 25)[0] is True
    assert weights_checkpoint_plan("list25", 124, 200, 25)[0] is False
    assert weights_checkpoint_plan("list25", 9, 10, 25)[0] is False
    # mod0 (initial.py & co): ep % 4 == 0 or last, name ep
    assert weights_checkpoint_plan("mod0", 0, 10, 4) == (
        True, "model_epoch_0.msgpack")
    assert weights_checkpoint_plan("mod0", 9, 10, 4) == (
        True, "model_epoch_9.msgpack")
    assert weights_checkpoint_plan("mod0", 3, 10, 4)[0] is False
