"""Spectral calibration of reduced-step sampler output.

The certified serving fast path strides the reference chain's own
(sigma^2 = beta) ancestral update (`sample_ddim(sigma_mode="beta")`,
SPEEDUP.md).  Its residual against the exact 1500-step reference output is a
SMOOTH, k-dependent mean-power offset of a few percent (measured: a -3.5%
mid-k dip plus a step-count-tunable broadband term).  Because the residual
is a smooth function of |k| only, it can be removed exactly (in expectation)
by one fixed radial filter in Fourier space:

    1. **fit** (offline, once per checkpoint + sampler config): generate a
       calibration set with the fast sampler, measure the per-bin ratio
       r(k) = P_fast(k) / P_ref(k) against an exact-chain reference run,
       and fit a low-order polynomial to r(k) — the smooth fit averages away
       the per-bin Monte-Carlo noise of the calibration set;
    2. **apply** (serving, per batch): multiply each sampled map's FFT by
       g(|k|) = r_fit(|k|)^(-1/2) and invert.  This scales the mean P(k) by
       exactly 1/r_fit(k), driving it onto the reference's, at the cost of
       one 64x64 FFT pair per map (~1e-4 of the UNet sampling FLOPs).

The transform is a fixed, deterministic, near-unity linear filter (amplitude
within a few percent of 1 everywhere); it is saved as an .npz sidecar and is
strictly opt-in in the serving CLI.  Honest accounting: the fit must be
VALIDATED on samples drawn with fresh noise seeds against an independent
reference run (scripts/certify_fast_sampler.py --calibrated does this);
matching the calibration set itself would overfit its estimator noise.

No reference counterpart (the reference has no reduced-step sampling at
all); this is a serving-path component of the TPU rebuild.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SpectralCalibration:
    """Smooth multiplicative P(k) correction, P_corrected = P / r_fit(k).

    ``coeffs`` are numpy polynomial coefficients (np.polyval order) of the
    fitted power ratio r(k) = P_fast / P_ref over ``[k_min, k_max]``;
    evaluation clamps k into that range and the ratio into ``clip`` for
    numerical sanity.  ``dl`` is the pixel spacing of the k-grid convention
    (ops/spectrum.py linear binning: k = 2*pi*fftfreq(n, dl)).
    """

    coeffs: Tuple[float, ...]
    k_min: float
    k_max: float
    dl: float = 1.0
    clip: Tuple[float, float] = (0.7, 1.4)
    # Optional mode-gated binwise component composed ON TOP of the smooth
    # polynomial: ``bin_ratios[i]`` is an extra power ratio for the linear
    # P(k) bin ``i = rint(|k| / dk)`` (ops/spectrum.py binning, dk =
    # 2*pi/(n*dl)); 1.0 (or an index past the table) leaves the bin
    # untouched.  Fitted by scripts/fit_binwise_residual.py from a
    # high-statistics validation run: the smooth fit cannot follow bin-local
    # structure (the Nyquist-corner sign flip), and at N=16384 fit
    # statistics a per-bin correction of the few significant bins carries
    # less noise than the residual it removes (at N=4096 it did NOT —
    # scripts/binwise_recalibration.py, the round-3 falsification).
    bin_ratios: Tuple[float, ...] | None = None

    def ratio(self, k):
        """Fitted power ratio r(k) — smooth polynomial part only, clamped
        to the fit range and clip.  The binwise component (``bin_ratios``)
        is index-based and composed in :func:`total_ratio` / the filter."""
        k = np.clip(np.asarray(k, np.float64), self.k_min, self.k_max)
        r = np.polyval(np.asarray(self.coeffs, np.float64), k)
        return np.clip(r, self.clip[0], self.clip[1])

    def bin_ratio(self, k, n: int):
        """Binwise power-ratio component at physical |k| for an n-pixel map
        (1.0 everywhere when no binwise table is present)."""
        k = np.asarray(k, np.float64)
        if self.bin_ratios is None:
            return np.ones_like(k)
        dk = 2 * np.pi / (n * self.dl)
        idx = np.rint(k / dk).astype(np.int64)
        table = np.asarray(self.bin_ratios, np.float64)
        safe = np.minimum(idx, len(table) - 1)
        return np.where(idx < len(table), table[safe], 1.0)

    def total_ratio(self, k, n: int):
        """Full fitted power ratio: polynomial x binwise."""
        return self.ratio(k) * self.bin_ratio(k, n)

    def save(self, path: str, meta: dict | None = None) -> None:
        """Save the filter, optionally with provenance metadata.

        ``meta`` entries land as ``meta_<key>`` npz arrays (scalars/strings).
        The load path ignores them; :func:`load_calibration_meta` reads them
        back.  Stamping ``checkpoint_fingerprint`` (the md5 of the checkpoint
        the fit's sweep ran on) is what lets the certifier refuse to pair a
        calibration with a retrained model — calibrations are model-specific.
        """
        extra = {}
        for key, val in (meta or {}).items():
            extra[f"meta_{key}"] = np.asarray(val)
        if self.bin_ratios is not None:
            extra["bin_ratios"] = np.asarray(self.bin_ratios, np.float64)
        np.savez(
            path,
            coeffs=np.asarray(self.coeffs, np.float64),
            k_min=self.k_min,
            k_max=self.k_max,
            dl=self.dl,
            clip=np.asarray(self.clip, np.float64),
            **extra,
        )

    @staticmethod
    def load(path: str) -> "SpectralCalibration":
        z = np.load(path)
        bin_ratios = None
        if "bin_ratios" in z.files:
            bin_ratios = tuple(float(v) for v in z["bin_ratios"])
        return SpectralCalibration(
            coeffs=tuple(float(c) for c in z["coeffs"]),
            k_min=float(z["k_min"]),
            k_max=float(z["k_max"]),
            dl=float(z["dl"]),
            clip=(float(z["clip"][0]), float(z["clip"][1])),
            bin_ratios=bin_ratios,
        )


def load_calibration_meta(path: str) -> dict:
    """Provenance metadata stamped into a calibration npz at save time.

    Returns ``{}`` for legacy (pre-stamping) files.  Keys of interest:
    ``checkpoint_fingerprint`` — md5 of the train_state.msgpack the fit's
    sweep was generated with; consumers (scripts/certify_fast_sampler.py,
    bench.py) must reject a calibration whose stamp does not match the
    checkpoint in use.
    """
    z = np.load(path)
    out = {}
    for name in z.files:
        if name.startswith("meta_"):
            v = z[name]
            out[name[len("meta_"):]] = v.item() if v.ndim == 0 else v.tolist()
    return out


def fit_spectral_transfer(
    k_bins,
    pk_fast,
    pk_ref,
    *,
    deg: int = 6,
    counts=None,
    dl: float = 1.0,
    clip: Tuple[float, float] = (0.7, 1.4),
) -> SpectralCalibration:
    """Fit a smooth polynomial to the per-bin power ratio P_fast/P_ref.

    Only populated non-DC bins participate (matching the certification error
    metric).  ``counts`` (Fourier modes per bin, from the linear binning)
    weights the fit by each bin's statistical precision (~sqrt(modes)); the
    low-k bins of a 64x64 map hold only ~6 modes and carry most of the
    estimator noise, which the smooth fit is meant to average away.
    """
    k_bins = np.asarray(k_bins, np.float64)
    pk_fast = np.asarray(pk_fast, np.float64)
    pk_ref = np.asarray(pk_ref, np.float64)
    good = (k_bins > 0) & np.isfinite(pk_ref) & (pk_ref > 0)
    good &= np.isfinite(pk_fast) & (pk_fast > 0)
    k = k_bins[good]
    if k.size == 0:
        raise ValueError(
            "fit_spectral_transfer: no valid (positive, finite) bins in the "
            "calibration input — check the sweep spectra"
        )
    r = pk_fast[good] / pk_ref[good]
    if counts is not None:
        w = np.sqrt(np.asarray(counts, np.float64)[good])
    else:
        w = None
    deg = min(deg, len(k) - 1)
    coeffs = np.polyfit(k, r, deg, w=w)
    return SpectralCalibration(
        coeffs=tuple(float(c) for c in coeffs),
        k_min=float(k.min()),
        k_max=float(k.max()),
        dl=dl,
        clip=clip,
    )


@functools.lru_cache(maxsize=16)
def _amplitude_filter(calib: SpectralCalibration, shape: Tuple[int, int]):
    """(H, W//2+1) rfft2-layout amplitude filter g(|k|) = r_fit(|k|)^(-1/2).

    DC is always passed through untouched (g=1): the calibration corrects
    the fluctuation spectrum, never the map mean.  When the calibration
    carries a binwise component, every mode in linear P(k) bin i (the
    ops/spectrum.py rint binning) is additionally divided by
    sqrt(bin_ratios[i]), so the binned mean P(k) scales by exactly
    1/bin_ratios[i] — a bin-exact correction of bin-local residuals the
    smooth polynomial cannot follow.
    """
    h, w = shape
    if calib.bin_ratios is not None and h != w:
        raise ValueError(
            "binwise calibration tables are tied to the square-map linear "
            f"binning; got shape {shape}"
        )
    ky = 2 * np.pi * np.fft.fftfreq(h, calib.dl)
    kx = 2 * np.pi * np.fft.rfftfreq(w, calib.dl)
    kgrid = np.sqrt(ky[:, None] ** 2 + kx[None, :] ** 2)
    g = 1.0 / np.sqrt(calib.total_ratio(kgrid, h))
    g[0, 0] = 1.0
    return jnp.asarray(g, jnp.float32)


@functools.partial(jax.jit, static_argnums=(1,))
def _apply_filter(x, hw: Tuple[int, int], g):
    orig_dtype = x.dtype
    # NHWC: spatial axes are (-3, -2); HW / BHW: (-2, -1).
    axes = (-3, -2) if x.ndim == 4 else (-2, -1)
    xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=axes)
    xf = xf * (g[None, :, :, None] if x.ndim == 4 else g)
    out = jnp.fft.irfft2(xf, s=hw, axes=axes)
    return out.astype(orig_dtype)


def apply_spectral_calibration(x, calib: SpectralCalibration):
    """Apply the calibration filter to maps.

    Accepts (H, W), (B, H, W) or NHWC (B, H, W, C); returns the same shape
    and dtype.  Per-map mean power at every k scales by exactly
    1/r_fit(k) (each Fourier mode is multiplied by a real scalar), so the
    calibrated mean P(k) lands on the reference's in expectation.
    """
    x = jnp.asarray(x)
    if x.ndim == 4:
        hw = (x.shape[1], x.shape[2])
    elif x.ndim in (2, 3):
        hw = (x.shape[-2], x.shape[-1])
    else:
        raise ValueError(f"expected 2-4 dims, got shape {x.shape}")
    g = _amplitude_filter(calib, hw)
    return _apply_filter(x, hw, g)
