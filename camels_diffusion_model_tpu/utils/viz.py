"""Visualization and image-artifact writers (matplotlib, host-side).

Reproduces the reference's ~15 PNG artifact types per run (README.md:115-130):
image grids (`save_image` parity with torchvision's default grid layout),
viridis-colormap sample/reconstruction figures
(train_diffusion_paper.py:688-770), the 4-panel training-metrics figure
(:495-546), distribution comparison (:861-905), guidance-metrics figure
(:1077-1105), parameter-sensitivity figures (:1107-1215), and both
power-spectrum comparison plots (diffusion_utilities.py:370-448 styled
log-log and sample_power_spectra.py:286-338).

All functions take NHWC arrays (or (B, H, W)) and write PNGs; no device work.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def _to_bhw(images: np.ndarray) -> np.ndarray:
    images = np.asarray(images)
    if images.ndim == 4:  # NHWC
        images = images[..., 0]
    return images


def save_image_grid(
    images: np.ndarray, path: str, nrow: int = 8, padding: int = 2
) -> None:
    """torchvision ``save_image`` parity: row-major grid with 2px padding,
    values clamped to [0, 1], grayscale PNG."""
    imgs = np.clip(_to_bhw(images), 0.0, 1.0)
    b, h, w = imgs.shape
    ncol = min(nrow, b)
    nrows = -(-b // ncol)
    grid = np.zeros(
        (nrows * h + (nrows + 1) * padding, ncol * w + (ncol + 1) * padding),
        np.float32,
    )
    for idx in range(b):
        r, c = divmod(idx, ncol)
        y = r * h + (r + 1) * padding
        x = c * w + (c + 1) * padding
        grid[y : y + h, x : x + w] = imgs[idx]
    plt.imsave(path, grid, cmap="gray", vmin=0.0, vmax=1.0)


def _viridis_panel_grid(nrows: int, ncols: int, scale: float = 3.0):
    """Axes grid for viridis map panels, all frames/ticks off."""
    fig, axes = plt.subplots(nrows, ncols, figsize=(scale * ncols, scale * nrows))
    axes = np.atleast_1d(axes).reshape(nrows, ncols)
    for ax in axes.flat:
        ax.set_axis_off()
    return fig, axes


def visualize_viridis_style(
    samples: np.ndarray, output_path: str, nrow: int = 5, title: str = "CAMELS"
) -> None:
    """Viridis-colormap sample grid with a rotated figure-side label.

    Same artifact as the reference's viridis grid
    (train_diffusion_paper.py:688-728); original layout code built on this
    module's subplots-array idiom.
    """
    maps = _to_bhw(samples)[:25]
    ncols = nrow
    nrows = -(-len(maps) // ncols)
    fig, axes = _viridis_panel_grid(nrows, ncols)
    for ax, img in zip(axes.flat, maps):
        ax.imshow(img, cmap="viridis")
    fig.subplots_adjust(left=0.1)
    fig.text(
        0.05, 0.5, title, rotation="vertical", va="center",
        fontsize=16, fontweight="bold",
    )
    fig.savefig(output_path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def visualize_reconstruction_comparison(
    original: np.ndarray, reconstructed: np.ndarray, output_path: str
) -> None:
    """Two-row original-vs-reconstruction viridis figure with row labels over
    the middle column (artifact parity with train_diffusion_paper.py:730-770)."""
    rows = [
        ("Original Images", _to_bhw(original)[:5]),
        ("Reconstructed Images", _to_bhw(reconstructed)[:5]),
    ]
    fig, axes = _viridis_panel_grid(2, 5)
    for r, (label, maps) in enumerate(rows):
        for ax, img in zip(axes[r], maps):
            ax.imshow(img, cmap="viridis")
        axes[r, 2].set_title(label, fontsize=16, fontweight="bold", pad=20)
    fig.tight_layout()
    fig.savefig(output_path, dpi=150, bbox_inches="tight")
    plt.close(fig)


# Figure-font styles: "default" is paper.py's; "paper1" is the large-font
# publication variant (train_diffusion_paper1.py — the ONLY behavioral diff
# from paper.py: fontsize 25/28, no bold, metric suffix dropped from series
# labels, tick labelsize 16 on the distribution figure).
_PLOT_STYLES = {
    "default": dict(label_fs=14, legend_fs=16, title_fs=18, weight="bold",
                    series_suffix=True, dist_legend_fs=16, tick_fs=None),
    "paper1": dict(label_fs=25, legend_fs=25, title_fs=28, weight="normal",
                   series_suffix=False, dist_legend_fs=22, tick_fs=16),
}


def plot_training_metrics(
    output_dir: str,
    n_epoch: int,
    loss_log: Sequence[float],
    val_loss_log: Sequence[float],
    likelihood_log: Sequence[float],
    val_likelihood_log: Sequence[float],
    elbo_log: Sequence[float],
    val_elbo_log: Sequence[float],
    bpd_log: Sequence[float],
    val_bpd_log: Sequence[float],
    eval_every: int = 5,
    elbo_per_epoch: bool = False,
    style: str = "default",
) -> None:
    """4-panel loss/NLL/ELBO/BPD figure (train_diffusion_paper.py:495-546).

    ``elbo_per_epoch``: the elbo/spectrum_indiv modes log training ELBO/BPD
    every epoch (continuous curves over 1..n_epoch,
    train_diffusion_elbo.py:466-483); paper modes only at eval points.
    ``style="paper1"`` selects the large-font variant
    (train_diffusion_paper1.py:506-542)."""
    st = _PLOT_STYLES[style]

    def _lab(series, metric):
        return f"{series} {metric}" if st["series_suffix"] else series

    plt.figure(figsize=(15, 10))
    eval_epochs = list(range(0, n_epoch, eval_every))
    if (n_epoch - 1) % eval_every != 0:
        eval_epochs.append(n_epoch - 1)
    eval_x = [e + 1 for e in eval_epochs]

    def _trim(xs, ys):
        # Guard against resumed runs with partial eval logs.
        n = min(len(xs), len(ys))
        return xs[:n], ys[:n]

    plt.subplot(2, 2, 1)
    plt.plot(range(1, n_epoch + 1), np.log(loss_log), color="orange",
             label=_lab("Training", "Loss"), linewidth=2)
    if val_loss_log:
        xs, ys = _trim(eval_x, val_loss_log)
        plt.plot(xs, np.log(ys), "o-", color="blue",
                 label=_lab("Validation", "Loss"), linewidth=2, markersize=6)
    plt.xlabel("Epoch", fontsize=st["label_fs"])
    plt.ylabel("Log Loss", fontsize=st["label_fs"])
    plt.legend(fontsize=st["legend_fs"])
    plt.grid(True, alpha=0.7)
    plt.title("Training Metrics", fontsize=st["title_fs"], fontweight=st["weight"])

    plt.subplot(2, 2, 2)
    if likelihood_log:
        xs, ys = _trim(eval_x, likelihood_log)
        plt.plot(xs, ys, "o-", color="orange",
                 label=_lab("Training", "NLL"), linewidth=2, markersize=6)
    if val_likelihood_log:
        xs, ys = _trim(eval_x, val_likelihood_log)
        plt.plot(xs, ys, "o-", color="blue",
                 label=_lab("Validation", "NLL"), linewidth=2, markersize=6)
    plt.xlabel("Epoch", fontsize=st["label_fs"])
    plt.ylabel("NLL", fontsize=st["label_fs"])
    plt.legend(fontsize=st["legend_fs"])
    plt.grid(True, alpha=0.7)
    plt.title("Negative Log Likelihood Evolution", fontsize=st["title_fs"], fontweight=st["weight"])

    plt.subplot(2, 2, 3)
    if elbo_log:
        if elbo_per_epoch:
            xs, ys = range(1, len(elbo_log) + 1), elbo_log
        else:
            xs, ys = _trim(eval_x, elbo_log)
        plt.plot(xs, ys, color="orange", label=_lab("Training", "ELBO"), linewidth=2)
    if val_elbo_log:
        xs, ys = _trim(eval_x, val_elbo_log)
        plt.plot(xs, ys, "o-", color="blue",
                 label=_lab("Validation", "ELBO"), linewidth=2, markersize=6)
    plt.xlabel("Epoch", fontsize=st["label_fs"])
    plt.ylabel("ELBO", fontsize=st["label_fs"])
    plt.legend(fontsize=st["legend_fs"])
    plt.grid(True, alpha=0.7)
    plt.title("ELBO Evolution", fontsize=st["title_fs"], fontweight=st["weight"])

    plt.subplot(2, 2, 4)
    if bpd_log:
        if elbo_per_epoch:
            xs, ys = range(1, len(bpd_log) + 1), bpd_log
        else:
            xs, ys = _trim(eval_x, bpd_log)
        plt.plot(xs, ys, color="orange", label=_lab("Training", "BPD"), linewidth=2)
    if val_bpd_log:
        xs, ys = _trim(eval_x, val_bpd_log)
        plt.plot(xs, ys, "o-", color="blue",
                 label=_lab("Validation", "BPD"), linewidth=2, markersize=6)
    plt.xlabel("Epoch", fontsize=st["label_fs"])
    plt.ylabel("Bits Per Dimension (BPD)", fontsize=st["label_fs"])
    plt.legend(fontsize=st["legend_fs"])
    plt.grid(True, alpha=0.7)
    plt.title("BPD Evolution", fontsize=st["title_fs"], fontweight=st["weight"])

    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "training_metrics.png"), dpi=300,
                bbox_inches="tight")
    plt.close()


def plot_loss_curve(
    output_dir: str,
    loss_log: Sequence[float],
    val_loss_log: Sequence[float] = (),
    eval_every: int = 5,
    title: str = "",
) -> None:
    """Log-loss curve — ``loss_evolution.png`` (train_diffusion.py:157-160;
    conditional variant adds the validation overlay,
    train_diffusion_condition.py:258-271)."""
    n_epoch = len(loss_log)
    plt.figure(figsize=(10, 5) if val_loss_log else None)
    plt.plot(
        np.arange(1, n_epoch + 1), np.log(np.asarray(loss_log)),
        label="Training Loss",
    )
    if val_loss_log:
        val_epochs = list(range(0, n_epoch, eval_every))
        if (n_epoch - 1) % eval_every != 0:
            val_epochs.append(n_epoch - 1)
        xs = [e + 1 for e in val_epochs][: len(val_loss_log)]
        plt.plot(xs, np.log(np.asarray(val_loss_log[: len(xs)])), "o-",
                 label="Validation Loss")
        plt.legend()
    plt.xlabel("Epoch")
    plt.ylabel("Log Loss")
    plt.grid(True, alpha=0.7)
    if title:
        plt.title(title)
    plt.savefig(os.path.join(output_dir, "loss_evolution.png"), dpi=150,
                bbox_inches="tight")
    plt.close()


def plot_distribution_comparison(
    bin_mid: np.ndarray,
    orig_mean: np.ndarray,
    orig_std: np.ndarray,
    gen_mean: np.ndarray,
    gen_std: np.ndarray,
    output_dir: str,
    filename: str = "distribution_comparison.png",
    styled: bool = True,
    style: str = "default",
) -> str:
    """Two-panel mean/std pixel-PDF figure (train_diffusion_paper.py:861-905).

    ``style="paper1"`` selects the large-font variant
    (train_diffusion_paper1.py:887-900: fontsize 25, legend 22, tick
    labelsize 16, non-bold suptitle)."""
    st = _PLOT_STYLES[style]
    fig, ax = plt.subplots(1, 2, figsize=(14, 4))
    ax[0].plot(bin_mid, orig_mean, color="blue", linewidth=2, label="Original")
    ax[0].plot(bin_mid, gen_mean, color="red", linewidth=2, linestyle="--",
               label="Model")
    ax[0].set_ylabel(r"$\mu(\rm PDF)$", fontsize=st["label_fs"])
    ax[0].legend(fontsize=st["dist_legend_fs"])
    ax[1].plot(bin_mid, orig_std, color="blue", linewidth=2)
    ax[1].plot(bin_mid, gen_std, color="red", linewidth=2, linestyle="--")
    ax[1].set_ylabel(r"$\sigma(\rm PDF)$", fontsize=st["label_fs"])
    for i in range(2):
        ax[i].set_xlabel(r"$N_{\rm HI}$", fontsize=st["label_fs"])
        if st["tick_fs"]:
            ax[i].tick_params(axis="both", which="major",
                              labelsize=st["tick_fs"])
        ax[i].grid(True, alpha=0.7)
    if styled:
        fig.suptitle("Probability Distribution", fontsize=st["title_fs"],
                     fontweight=st["weight"])
    plt.tight_layout()
    path = os.path.join(output_dir, filename)
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()
    return path


def plot_power_spectrum_comparison(
    k: np.ndarray,
    orig_mean: np.ndarray,
    orig_std: np.ndarray,
    gen_mean: np.ndarray,
    gen_std: np.ndarray,
    output_dir: str,
    title: str = "Power Spectrum Comparison",
    filename: str = "power_spectrum_comparison.png",
    skip_first: bool = True,
) -> str:
    """Linear-bin log-log comparison with error bands
    (diffusion_utilities.py:420-446)."""
    s = 1 if skip_first else 0
    plt.figure(figsize=(10, 6))
    plt.loglog(k[s:], orig_mean[s:], "b-", label="Original")
    plt.fill_between(k[s:], orig_mean[s:] - orig_std[s:],
                     orig_mean[s:] + orig_std[s:], alpha=0.3, color="b")
    plt.loglog(k[s:], gen_mean[s:], "r-", label="Diffusion Model")
    plt.fill_between(k[s:], gen_mean[s:] - gen_std[s:],
                     gen_mean[s:] + gen_std[s:], alpha=0.3, color="r")
    plt.xlabel("k")
    plt.ylabel("P(k)")
    plt.title(title)
    plt.legend()
    plt.grid(True, which="both", ls="-", alpha=0.2)
    plt.tight_layout()
    path = os.path.join(output_dir, filename)
    plt.savefig(path, dpi=150)
    plt.close()
    return path


def plot_guidance_metrics(metrics: List[Dict[str, float]], output_dir: str) -> None:
    """Guidance strength vs ELBO/BPD/NLL (train_diffusion_paper.py:1077-1105)."""
    plt.figure(figsize=(15, 5))
    for i, (key, ylabel, title) in enumerate(
        [
            ("elbo", "ELBO", "Guidance Strength vs. ELBO"),
            ("bpd", "Bits Per Dimension (BPD)", "Guidance Strength vs. BPD"),
            ("nll", "Negative Log Likelihood (NLL)", "Guidance Strength vs. NLL"),
        ]
    ):
        plt.subplot(1, 3, i + 1)
        plt.plot([m["guidance"] for m in metrics], [m[key] for m in metrics],
                 "o-", linewidth=2, markersize=8)
        plt.xlabel("Guidance Strength", fontsize=14)
        plt.ylabel(ylabel, fontsize=14)
        plt.grid(True, alpha=0.7)
        plt.title(title, fontsize=16, fontweight="bold")
    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "guidance_metrics.png"), dpi=300,
                bbox_inches="tight")
    plt.close()


def plot_parameter_metrics(
    metrics: List[Dict[str, float]], param_idx: int, output_dir: str
) -> None:
    """Parameter value vs ELBO/BPD/NLL (train_diffusion_paper.py:1184-1215)."""
    plt.figure(figsize=(15, 5))
    for i, (key, ylabel) in enumerate(
        [("elbo", "ELBO"), ("bpd", "Bits Per Dimension (BPD)"),
         ("nll", "Negative Log Likelihood (NLL)")]
    ):
        plt.subplot(1, 3, i + 1)
        plt.plot([m["param_value"] for m in metrics], [m[key] for m in metrics],
                 "o-", linewidth=2, markersize=8)
        plt.xlabel(f"Parameter {param_idx + 1} Value", fontsize=14)
        plt.ylabel(ylabel, fontsize=14)
        plt.grid(True, alpha=0.7)
        plt.title(f"Parameter {param_idx + 1} Value vs. {ylabel.split(' ')[0]}",
                  fontsize=16, fontweight="bold")
    plt.tight_layout()
    plt.savefig(
        os.path.join(output_dir, f"parameter_{param_idx + 1}_metrics.png"),
        dpi=300, bbox_inches="tight",
    )
    plt.close()


def plot_sensitivity_grid(
    images: np.ndarray,  # (num_params, 5, H, W)
    param_values: np.ndarray,
    output_dir: str,
    suptitle: str = "Power Spectrum",
) -> None:
    """num_params x 5 sensitivity figure (train_diffusion_paper.py:1107-1182;
    the odd "Power Spectrum" suptitle is the reference's own)."""
    num_params = images.shape[0]
    fig, axs = plt.subplots(num_params, 5, figsize=(15, 3 * num_params))
    axs = np.atleast_2d(axs)
    for p in range(num_params):
        for i in range(5):
            axs[p, i].imshow(images[p, i], cmap="viridis")
            axs[p, i].set_title(f"Param {p + 1} = {param_values[i]:.2f}", fontsize=12)
            axs[p, i].axis("off")
    fig.suptitle(suptitle, fontsize=18, fontweight="bold")
    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "parameter_sensitivity.png"), dpi=300,
                bbox_inches="tight")
    plt.close()


def plot_grid(x: np.ndarray, n_sample: int, n_rows: int, save_dir: str, w) -> None:
    """Per-image-normalized grid PNG (diffusion_utilities.py:187-193)."""
    from .image_norm import norm_batch

    path = os.path.join(save_dir, f"run_image_w{w}.png")
    save_image_grid(norm_batch(_to_bhw(x)[..., None]), path, nrow=n_sample // n_rows)


def plot_sample_gif(
    x_gen_store: np.ndarray,
    n_sample: int,
    nrows: int,
    save_dir: str,
    fn: str,
    w,
    save: bool = False,
):
    """Denoising-trajectory GIF via FuncAnimation
    (diffusion_utilities.py:195-217).  x_gen_store: (T, S, H, W[, C])."""
    from matplotlib.animation import FuncAnimation, PillowWriter

    from .image_norm import norm_all

    store = np.asarray(x_gen_store)
    if store.ndim == 4:
        store = store[..., None]
    ncols = n_sample // nrows
    nstore = norm_all(store, store.shape[0], n_sample)
    fig, axs = plt.subplots(
        nrows=nrows, ncols=ncols, sharex=True, sharey=True, figsize=(ncols, nrows)
    )
    axs = np.atleast_2d(axs)

    def animate_diff(i, store_):
        plots = []
        for row in range(nrows):
            for col in range(ncols):
                axs[row, col].clear()
                axs[row, col].set_xticks([])
                axs[row, col].set_yticks([])
                plots.append(axs[row, col].imshow(store_[i, (row * ncols) + col, ..., 0]))
        return plots

    ani = FuncAnimation(
        fig, animate_diff, fargs=[nstore], interval=200, blit=False,
        repeat=True, frames=nstore.shape[0],
    )
    plt.close()
    if save:
        path = os.path.join(save_dir, f"{fn}_w{w}.gif")
        ani.save(path, dpi=100, writer=PillowWriter(fps=5))
    return ani


def plot_example_maps_comparison(
    camels_maps: np.ndarray,
    model_maps: np.ndarray,
    output_path: str,
    top_label: str = "CAMELS",
    bottom_label: str = "HI-CDM",
) -> None:
    """2x5 example maps figure (sample_power_spectra.py:319-336)."""
    camels_maps = _to_bhw(camels_maps)
    model_maps = _to_bhw(model_maps)
    fig, axes = plt.subplots(2, 5, figsize=(15, 6))
    for i in range(5):
        axes[0, i].imshow(camels_maps[i], cmap="viridis")
        axes[0, i].set_title(f"{top_label} {i + 1}")
        axes[0, i].axis("off")
        axes[1, i].imshow(model_maps[i], cmap="viridis")
        axes[1, i].set_title(f"{bottom_label} {i + 1}")
        axes[1, i].axis("off")
    plt.tight_layout()
    plt.savefig(output_path, dpi=300, bbox_inches="tight")
    plt.close()


def plot_log_spectrum_comparison(
    k: np.ndarray,
    camels_mean: np.ndarray,
    camels_std: np.ndarray,
    model_mean: np.ndarray,
    model_std: np.ndarray,
    params_dict: Dict[str, float],
    output_path: str,
) -> None:
    """Log-bin comparison plot (sample_power_spectra.py:286-314)."""
    plt.figure(figsize=(10, 8))
    plt.plot(k, camels_mean, "r-", linewidth=2, label="CAMELS", alpha=0.8)
    plt.fill_between(k, camels_mean - camels_std, camels_mean + camels_std,
                     color="red", alpha=0.3)
    plt.plot(k, model_mean, "b-", linewidth=2, label="Model", alpha=0.8)
    plt.fill_between(k, model_mean - model_std, model_mean + model_std,
                     color="blue", alpha=0.3)
    plt.xscale("log")
    plt.yscale("log")
    plt.xlabel("k", fontsize=14)
    plt.ylabel("P(k)", fontsize=14)
    plt.legend(fontsize=12)
    plt.grid(True, alpha=0.3)
    param_text = ", ".join(f"{k_}={v}" for k_, v in params_dict.items())
    plt.title(f"Power Spectrum Comparison\n{param_text}", fontsize=12)
    plt.savefig(output_path, dpi=300, bbox_inches="tight")
    plt.close()
