"""Unit tests: ContextUnet shapes, conditioning semantics, encode/decode split."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camels_diffusion_model_tpu.models import ContextUnet, EmbedFC, count_params


def _init(model, h, b=2):
    x = np.zeros((b, h, h, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, np.array([0.5], np.float32))
    return variables


def test_canonical_shapes():
    model = ContextUnet(n_feat=8, n_cfeat=3, height=16, levels=2)
    variables = _init(model, 16)
    x = np.random.RandomState(0).randn(2, 16, 16, 1).astype(np.float32)
    c = np.random.RandomState(1).rand(2, 3).astype(np.float32)
    out = model.apply(variables, x, np.array([0.5], np.float32), c)
    assert out.shape == (2, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_deep_and_big_variants():
    for factory in (ContextUnet.deep, ContextUnet.big):
        model = factory(n_cfeat=2, n_feat=8, height=16)
        assert model.levels == 3
        variables = _init(model, 16)
        x = np.random.RandomState(0).randn(1, 16, 16, 1).astype(np.float32)
        out = np.asarray(
            model.apply(variables, x, np.array([0.5], np.float32))
        )
        assert out.shape == (1, 16, 16, 1)
        # tanh output head
        assert out.min() >= -1.0 and out.max() <= 1.0


def test_structure_canonical():
    """Layer shapes mirror the reference architecture
    (train_diffusion_paper.py:16-47) at n_feat=8, n_cfeat=3, h=16."""
    model = ContextUnet(n_feat=8, n_cfeat=3, height=16, levels=2)
    p = _init(model, 16)["params"]
    n = 8
    # init_conv: 1 -> n with learned 1x1 shortcut
    assert p["init_conv"]["conv1"]["conv"]["kernel"].shape == (3, 3, 1, n)
    assert p["init_conv"]["shortcut"]["kernel"].shape == (1, 1, 1, n)
    # down path: n->n then n->2n
    assert p["down1"]["block1"]["conv1"]["conv"]["kernel"].shape == (3, 3, n, n)
    assert p["down2"]["block1"]["conv1"]["conv"]["kernel"].shape == (3, 3, n, 2 * n)
    # embeds: t/c -> 2n and n
    assert p["timeembed1"]["fc1"]["kernel"].shape == (1, 2 * n)
    assert p["timeembed2"]["fc1"]["kernel"].shape == (1, n)
    assert p["contextembed1"]["fc1"]["kernel"].shape == (3, 2 * n)
    # up0: bottleneck 2n -> 2n with kernel h//4
    assert p["up0_conv"]["kernel"].shape == (4, 4, 2 * n, 2 * n)
    # up1 consumes 4n (2n up + 2n skip), up2 consumes 2n
    assert p["up1"]["upconv"]["kernel"].shape == (2, 2, 4 * n, n)
    assert p["up2"]["upconv"]["kernel"].shape == (2, 2, 2 * n, n)
    # out head: 2n -> n -> 1
    assert p["out_conv1"]["kernel"].shape == (3, 3, 2 * n, n)
    assert p["out_conv2"]["kernel"].shape == (3, 3, n, 1)


def test_none_context_equals_zeros(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    x = np.random.RandomState(0).randn(2, 16, 16, 1).astype(np.float32)
    t = np.array([0.3], np.float32)
    a = model.apply(variables, x, t)
    b = model.apply(variables, x, t, np.zeros((2, 3), np.float32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_encode_decode_matches_call(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    x = np.random.RandomState(0).randn(2, 16, 16, 1).astype(np.float32)
    c = np.random.RandomState(1).rand(2, 3).astype(np.float32)
    t = np.array([0.7], np.float32)
    full = model.apply(variables, x, t, c)
    enc = model.apply(variables, x, method="encode")
    split = model.apply(variables, enc, t, c, method="decode")
    np.testing.assert_allclose(np.asarray(full), np.asarray(split), atol=1e-6)


def test_scalar_time_broadcasts(tiny_model_and_vars):
    """A single normalized timestep broadcasts over the batch exactly like
    per-sample identical timesteps (reference EmbedFC view(-1,1) semantics)."""
    model, variables = tiny_model_and_vars
    x = np.random.RandomState(0).randn(3, 16, 16, 1).astype(np.float32)
    c = np.random.RandomState(1).rand(3, 3).astype(np.float32)
    a = model.apply(variables, x, np.array([0.4], np.float32), c)
    b = model.apply(variables, x, np.full((3,), 0.4, np.float32), c)
    # XLA:CPU uses a slightly different vectorized erf for the two batch
    # shapes (~1e-3); semantics, not bit-equality, is what's under test.
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)


def test_embedfc_flatten():
    m = EmbedFC(input_dim=4, emb_dim=6)
    v = m.init(jax.random.PRNGKey(0), np.zeros((2, 4), np.float32))
    out = m.apply(v, np.zeros((2, 2, 2), np.float32))  # flattens to (2, 4)
    assert out.shape == (2, 6)


def test_param_count_positive(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    n = count_params(variables)
    assert n > 10_000


def test_batch_stats_collection_exists(tiny_model_and_vars):
    _, variables = tiny_model_and_vars
    assert "batch_stats" in variables


def test_stochastic_shortcut_mode():
    """Reference-faithful mode: a fresh random 1x1 shortcut per forward
    (diffusion_utilities.py:54) — different 'shortcut' RNG keys give
    different outputs; same key reproduces."""
    import jax

    model = ContextUnet(
        n_feat=8, n_cfeat=3, height=16, levels=2, shortcut="stochastic"
    )
    x0 = np.zeros((1, 16, 16, 1), np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "shortcut": jax.random.PRNGKey(1)},
        x0, np.array([0.5], np.float32),
    )
    # no learned shortcut parameter in this mode
    assert "shortcut" not in variables["params"]["init_conv"]
    x = np.random.RandomState(0).randn(2, 16, 16, 1).astype(np.float32)
    t = np.array([0.5], np.float32)
    c = np.random.RandomState(1).rand(2, 3).astype(np.float32)
    a = model.apply(variables, x, t, c, rngs={"shortcut": jax.random.PRNGKey(2)})
    b = model.apply(variables, x, t, c, rngs={"shortcut": jax.random.PRNGKey(3)})
    same = model.apply(variables, x, t, c, rngs={"shortcut": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(a), np.asarray(same), atol=1e-6)


def test_fold_bn_matches_unfolded(tiny_model_and_vars):
    """BatchNorm folding (models/fold_bn.py) is bit-level-faithful fp32 math:
    the folded inference model reproduces the unfolded train=False forward."""
    import jax
    from camels_diffusion_model_tpu.models.fold_bn import fold_inference

    model, variables = tiny_model_and_vars
    # Make the running stats non-trivial first (a few train-mode steps).
    rs = np.random.RandomState(0)
    x = rs.randn(4, 16, 16, 1).astype(np.float32)
    t = np.array([0.5], np.float32)
    c = rs.rand(4, 3).astype(np.float32)
    vars_mut = variables
    for _ in range(3):
        _, mutated = model.apply(
            vars_mut, x + rs.randn(*x.shape).astype(np.float32), t, c,
            train=True, mutable=["batch_stats"],
        )
        vars_mut = {"params": vars_mut["params"], "batch_stats": mutated["batch_stats"]}

    want = model.apply(vars_mut, x, t, c)
    inf_model, inf_vars = fold_inference(model, vars_mut)
    assert inf_model.fold_bn and "batch_stats" not in inf_vars
    got = inf_model.apply(inf_vars, x, t, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # init structure of the folded model matches the folded params tree
    ref_struct = jax.tree_util.tree_structure(
        inf_model.init(jax.random.PRNGKey(0), x[:1], t)
    )
    assert jax.tree_util.tree_structure(inf_vars) == ref_struct
    # idempotent
    again_model, again_vars = fold_inference(inf_model, inf_vars)
    assert again_model is inf_model and again_vars is inf_vars
    # every folded leaf must be a committed device array — numpy leaves get
    # re-transferred host->device on every jitted call, which made the folded
    # sampler 100x slower over the tunneled TPU runtime (regression guard)
    for leaf in jax.tree_util.tree_leaves(inf_vars):
        assert isinstance(leaf, jax.Array), type(leaf)


def test_decode_with_precomputed_film_matches_inline(tiny_model_and_vars):
    """decode(film=...) with tables from time_embed/context_embed equals the
    inline-embedding decode — the sampler hot path's correctness contract."""
    import jax.numpy as jnp

    model, variables = tiny_model_and_vars
    rs = np.random.RandomState(1)
    x = rs.randn(3, 16, 16, 1).astype(np.float32)
    t = np.array([0.4], np.float32)
    c = rs.rand(3, 3).astype(np.float32)
    enc = model.apply(variables, x, method="encode")
    want = model.apply(variables, enc, t, c, method="decode")
    cemb1, cemb2 = model.apply(variables, jnp.asarray(c), method="context_embed")
    temb1, temb2 = model.apply(
        variables, jnp.asarray(t).reshape(-1, 1), method="time_embed"
    )
    got = model.apply(
        variables, enc, film=(cemb1, temb1, cemb2, temb2), method="decode"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
