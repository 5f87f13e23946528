"""2-D (data x space) mesh tests: spatial model parallelism for the conv
stack via XLA SPMD — the growth path for resolutions whose activations
exceed one chip's HBM (SURVEY §5; the reference has no model parallelism,
it only hard-codes bigger variants — initial.py:15-75, main.py:15-85).

XLA's SPMD partitioner derives the halo exchanges for conv windows, the
cross-shard GroupNorm/BatchNorm statistics, and the bottleneck global-pool
collectives from the input shardings alone; these tests pin the semantic
guarantee that the spatially-sharded program computes the SAME numbers as
a single device, on the 3-level deep variant where the capability matters.
"""

import numpy as np

import jax
import jax.numpy as jnp

from camels_diffusion_model_tpu.models import ContextUnet
from camels_diffusion_model_tpu.parallel import (
    make_mesh_2d,
    replicate,
    shard_batch_spatial,
    spatial_sharding,
)
from camels_diffusion_model_tpu.training import create_train_state, make_train_step


def _deep_tiny(height=16):
    # 3-level variant (the 128x128 family) at test size: bottleneck H/8.
    return ContextUnet.deep(n_cfeat=3, n_feat=8, height=height)


def test_mesh_2d_shapes_and_sharding():
    mesh = make_mesh_2d(4, 2)
    assert mesh.devices.shape == (4, 2)
    x = np.random.RandomState(0).randn(8, 16, 16, 1).astype(np.float32)
    c = np.random.RandomState(1).rand(8, 3).astype(np.float32)
    xs, cs = shard_batch_spatial(mesh, x, c)
    assert xs.sharding == spatial_sharding(mesh, 4)
    np.testing.assert_allclose(np.asarray(xs), x)
    np.testing.assert_allclose(np.asarray(cs), c)


def test_spatial_sharded_forward_matches_single_device():
    """Forward of the 3-level deep model on a (2 batch x 4 space) mesh —
    each height shard is 4 rows wide, so every conv window, the two
    down-pools, and the global bottleneck pool all cross shard edges."""
    height = 16
    model = _deep_tiny(height)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, height, height, 1), np.float32),
        np.array([0.5], np.float32),
    )
    x = np.random.RandomState(0).randn(4, height, height, 1).astype(np.float32)
    t = np.array([0.5], np.float32)
    c = np.random.RandomState(1).rand(4, 3).astype(np.float32)

    fwd = jax.jit(lambda v, x, t, c: model.apply(v, x, t, c))
    ref = np.asarray(fwd(variables, x, t, c))

    mesh = make_mesh_2d(2, 4)
    vs = replicate(mesh, variables)
    xs, cs = shard_batch_spatial(mesh, x, c)
    out = np.asarray(fwd(vs, xs, t, cs))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_spatial_sharded_train_step_matches_single_device():
    """Full training step (fwd + bwd + Adam, BatchNorm batch stats) over a
    (4 data x 2 space) mesh computes the same update as one device."""
    height, timesteps = 16, 8
    model = _deep_tiny(height)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, height, height, 1), np.float32),
        np.array([0.5], np.float32),
    )
    x = np.random.RandomState(0).randn(8, height, height, 1).astype(np.float32)
    c = np.random.RandomState(1).rand(8, 3).astype(np.float32)
    key = jax.random.PRNGKey(2)

    def run(sharded):
        state = create_train_state(model, variables, 1e-4, 2, 4)
        step = make_train_step(model, timesteps)
        if sharded:
            mesh = make_mesh_2d(4, 2)
            state = replicate(mesh, state)
            xs, cs = shard_batch_spatial(mesh, x, c)
        else:
            xs, cs = x, c
        state, metrics = step(state, xs, cs, key)
        return float(metrics["loss"]), jax.device_get(state.params)

    loss_s, params_s = run(True)
    loss_1, params_1 = run(False)
    assert np.isclose(loss_s, loss_1, rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_s), jax.tree_util.tree_leaves(params_1)
    ):
        # cross-shard reduction order differs; Adam's rsqrt amplifies it
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_spatial_sharded_sampling_matches_single_device():
    """The jitted sampler scan with a spatially-sharded carry produces the
    single-device output (threefry noise is position-deterministic, so the
    trajectories agree to float tolerance)."""
    from camels_diffusion_model_tpu.diffusion import make_schedule, sample_ddpm
    from camels_diffusion_model_tpu.models.fold_bn import fold_inference

    height, timesteps = 16, 6
    model = _deep_tiny(height)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, height, height, 1), np.float32),
        np.array([0.5], np.float32),
    )
    inf_model, inf_vars = fold_inference(model, variables)
    sched = make_schedule(timesteps)
    c = np.random.RandomState(1).rand(4, 3).astype(np.float32)

    ref = sample_ddpm(
        inf_model, inf_vars, sched, jax.random.PRNGKey(3),
        n_sample=4, size=height, params=c, guide_w=2.0,
    ).x

    mesh = make_mesh_2d(2, 4)
    out = sample_ddpm(
        inf_model, replicate(mesh, inf_vars), sched, jax.random.PRNGKey(3),
        n_sample=4, size=height, params=c, guide_w=2.0,
        mesh=mesh, spatial=True,
    ).x
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
