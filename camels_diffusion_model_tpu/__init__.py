"""camels-diffusion-model_tpu — a TPU-native diffusion framework for CAMELS HI maps.

A ground-up JAX / XLA / Pallas re-design of the capabilities of the
``Tengis0618/CAMELS-Diffusion-Model`` reference (a single-GPU PyTorch research
codebase): a parameter-conditional DDPM over 64x64 CAMELS HI intensity maps with
classifier-free guidance, ELBO/BPD/NLL likelihood evaluation, pixel-PDF and
2-D power-spectrum validation.

Design principles (TPU-first, not a port):

* All compute-path code is functional JAX, jit-compiled, NHWC layout, bfloat16
  matmul-friendly, with ``lax.scan`` for the sequential reverse-diffusion loop.
* Multi-chip scaling goes through ``jax.sharding.Mesh`` + NamedSharding data
  parallelism (XLA inserts the ICI collectives); there is no hand-written
  NCCL-style communication.
* Classifier-free guidance exploits the model structure: the U-Net encoder is
  condition-independent, so guidance runs the encoder once and only the FiLM-
  modulated decoder twice (the reference runs the full model twice per step).
* Hot elementwise chains (FiLM modulation, GroupNorm epilogues, the ancestral
  sampler update) have fused Pallas TPU kernels with pure-XLA fallbacks.

Public API (stable):

    from camels_diffusion_model_tpu import (
        DDPMSchedule, make_schedule, q_sample, p_sample_step,
        ContextUnet, sample_ddpm, sample_ddpm_from_noise,
        calculate_elbo_and_bpd, calculate_likelihood,
        power_spectrum, calculate_power_spectrum_2d,
    )
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache for every entry point (CLIs, bench,
# scripts): a fresh `train_diffusion.py` invocation of an already-seen config
# skips the ~3-minute cold compile.  Opt out with CAMELS_NO_COMPILE_CACHE=1;
# tests/conftest.py points this at its own directory before importing us.
# Set via jax.config.update (not env vars): jax latches env defaults at ITS
# import time, so an `import jax` before this package would silently disable
# an env-only cache setting.  config.update works regardless of import order
# as long as nothing has been compiled yet.
if not _os.environ.get("CAMELS_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.path.join(
        _os.environ.get("XDG_CACHE_HOME", _os.path.expanduser("~/.cache")),
        "camels_diffusion_jax",
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these config names
        # Env vars are useless here (jax latched them at its own import);
        # the pre-config-API cache entry point still works post-import.
        try:
            from jax.experimental.compilation_cache import (
                compilation_cache as _cc,
            )

            if hasattr(_cc, "set_cache_dir"):
                _cc.set_cache_dir(_cache_dir)
            else:
                _cc.initialize_cache(_cache_dir)
        except Exception:
            pass  # this jax has no persistent-cache support at all

from .diffusion.schedule import (
    DDPMSchedule,
    make_schedule,
    NoiseScaling,
    q_sample,
    p_sample_step,
)
from .diffusion.sampler import sample_ddpm, sample_ddpm_from_noise
from .diffusion.likelihood import (
    calculate_elbo_and_bpd,
    calculate_likelihood,
    elbo_per_batch,
)
from .models.context_unet import ContextUnet
from .ops.spectrum import power_spectrum, calculate_power_spectrum_2d

__all__ = [
    "__version__",
    "DDPMSchedule",
    "make_schedule",
    "NoiseScaling",
    "q_sample",
    "p_sample_step",
    "sample_ddpm",
    "sample_ddpm_from_noise",
    "calculate_elbo_and_bpd",
    "calculate_likelihood",
    "elbo_per_batch",
    "ContextUnet",
    "power_spectrum",
    "calculate_power_spectrum_2d",
]
