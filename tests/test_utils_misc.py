"""Tests: image-norm helpers, MapDataset, GIF plotting, spectrum glue, full
trajectory ELBO — the long-tail inventory items."""

import os

import numpy as np
import pytest

from camels_diffusion_model_tpu.data import MapDataset, verify_dataset
from camels_diffusion_model_tpu.utils import gen_tst_context, norm_all, norm_batch, unorm
from camels_diffusion_model_tpu.utils import viz


def test_unorm_range():
    rs = np.random.RandomState(0)
    x = rs.randn(8, 8, 1)
    u = unorm(x)
    assert np.isclose(u.min(), 0.0) and np.isclose(u.max(), 1.0)


def test_norm_batch():
    rs = np.random.RandomState(1)
    x = rs.randn(3, 8, 8, 1)
    n = norm_batch(x)
    for i in range(3):
        assert np.isclose(n[i].min(), 0.0) and np.isclose(n[i].max(), 1.0)


def test_norm_all():
    rs = np.random.RandomState(2)
    store = rs.randn(4, 2, 8, 8, 1)
    n = norm_all(store, 4, 2)
    assert n.shape == store.shape
    assert np.isclose(n[0, 0].min(), 0.0)


def test_gen_tst_context():
    n, vec = gen_tst_context()
    assert n == 36
    assert vec.shape == (36, 5)
    np.testing.assert_array_equal(vec[0], [1, 0, 0, 0, 0])
    np.testing.assert_array_equal(vec[5], [0, 0, 0, 0, 0])


def test_map_dataset_and_verify():
    rs = np.random.RandomState(3)
    maps = np.abs(rs.lognormal(0, 1, (6, 16, 16))).astype(np.float32)
    ds = MapDataset(maps)
    assert len(ds) == 6
    img = ds[0]
    assert img.shape == (16, 16, 1)
    assert img.min() >= -1.0 - 1e-6 and img.max() <= 1.0 + 1e-6
    assert ds.getshapes() == (6, 16, 16, 1)
    assert verify_dataset(ds) == []


def test_map_dataset_from_file(tmp_path):
    maps = np.abs(np.random.RandomState(0).rand(3, 8, 8)).astype(np.float32)
    path = str(tmp_path / "maps.npy")
    np.save(path, maps)
    ds = MapDataset(path)
    assert len(ds) == 3


def test_plot_sample_gif(tmp_path):
    rs = np.random.RandomState(4)
    store = rs.randn(3, 4, 8, 8).astype(np.float32)
    viz.plot_sample_gif(store, n_sample=4, nrows=2, save_dir=str(tmp_path),
                        fn="traj", w=0.0, save=True)
    assert os.path.exists(tmp_path / "traj_w0.0.gif")


def test_plot_grid(tmp_path):
    rs = np.random.RandomState(5)
    x = rs.randn(4, 8, 8, 1).astype(np.float32)
    viz.plot_grid(x, n_sample=4, n_rows=2, save_dir=str(tmp_path) + "/", w=1.0)
    assert os.path.exists(str(tmp_path) + "/run_image_w1.0.png")


def test_paper1_plot_style(tmp_path):
    """paper1's publication styling (the ONLY behavioral diff of
    train_diffusion_paper1.py vs paper.py: fontsize 25/28, no bold, metric
    suffix dropped — paper1.py:506-542, :887-900) renders both figures."""
    st = viz._PLOT_STYLES["paper1"]
    assert (st["label_fs"], st["legend_fs"], st["title_fs"]) == (25, 25, 28)
    assert st["weight"] == "normal" and st["tick_fs"] == 16
    losses = [1.0, 0.5, 0.25, 0.2]
    for style in ("default", "paper1"):
        d = tmp_path / style
        os.makedirs(d)
        viz.plot_training_metrics(
            str(d), 4, losses, [0.6, 0.3], [5.0, 4.0], [5.5, 4.5],
            [1.0, 0.9], [1.1, 0.95], [0.2, 0.18], [0.22, 0.19],
            eval_every=2, style=style,
        )
        assert os.path.exists(d / "training_metrics.png")
        bins = np.linspace(0, 1, 8)
        viz.plot_distribution_comparison(
            bins, bins, bins * 0.1, bins * 1.1, bins * 0.12,
            output_dir=str(d), style=style,
        )
        assert os.path.exists(d / "distribution_comparison.png")


def test_compare_power_spectra_contract(tmp_path):
    from camels_diffusion_model_tpu.ops.spectrum import compare_power_spectra

    rs = np.random.RandomState(6)
    orig = rs.randn(3, 16, 16).astype(np.float32)
    gen = rs.randn(3, 16, 16).astype(np.float32)
    k, om, gm = compare_power_spectra(orig, gen, str(tmp_path))
    assert os.path.exists(tmp_path / "power_spectrum_comparison.png")
    assert k.shape == om.shape == gm.shape


def test_elbo_full_trajectory():
    import jax
    import jax.numpy as jnp

    from camels_diffusion_model_tpu import make_schedule
    from camels_diffusion_model_tpu.diffusion.likelihood import (
        elbo_full_trajectory_batch,
    )

    class ZeroModel:
        def apply(self, variables, x, t, c, **kw):
            return jnp.zeros_like(x)

        def __hash__(self):
            return hash("Z2")

        def __eq__(self, other):
            return isinstance(other, ZeroModel)

    T = 30
    sched = make_schedule(T)
    # The t=1 weight is ~1/beta_1 and mse concentration scales with pixel
    # count, so use enough pixels/samples for a tight statistical check.
    x = np.zeros((8, 32, 32, 1), np.float32)
    c = np.zeros((8, 2), np.float32)
    got = np.asarray(
        elbo_full_trajectory_batch(
            ZeroModel(), {}, sched.beta, sched.alpha_bar,
            jnp.asarray(x), jnp.asarray(c), jax.random.PRNGKey(0),
        )
    )
    ab = np.asarray(sched.alpha_bar)
    want = np.mean([0.5 * (1 / (1 - ab[t]) - 1) for t in range(1, T + 1)])
    np.testing.assert_allclose(got.mean(), want, rtol=0.1)
