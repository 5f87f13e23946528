from .schedule import (
    DDPMSchedule,
    make_schedule,
    NoiseScaling,
    q_sample,
    p_sample_step,
)
from .sampler import sample_ddpm, sample_ddpm_from_noise, SamplerOutput
from .likelihood import calculate_elbo_and_bpd, calculate_likelihood, elbo_per_batch
from .calibration import (
    SpectralCalibration,
    apply_spectral_calibration,
    fit_spectral_transfer,
)

__all__ = [
    "DDPMSchedule",
    "make_schedule",
    "NoiseScaling",
    "q_sample",
    "p_sample_step",
    "sample_ddpm",
    "sample_ddpm_from_noise",
    "SamplerOutput",
    "calculate_elbo_and_bpd",
    "calculate_likelihood",
    "elbo_per_batch",
    "SpectralCalibration",
    "apply_spectral_calibration",
    "fit_spectral_transfer",
]
