from .schedules import beta_schedule, rescale_zero_terminal_snr
from .gaussian import DiffusionParams, GaussianDiffusion
from .samplers import ddim_sample_loop, ddpm_sample_loop, plms_sample_loop

__all__ = [
    "beta_schedule",
    "rescale_zero_terminal_snr",
    "DiffusionParams",
    "GaussianDiffusion",
    "ddim_sample_loop",
    "ddpm_sample_loop",
    "plms_sample_loop",
]
