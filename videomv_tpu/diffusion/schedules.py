"""Diffusion beta schedules as pure numpy/JAX functions.

Capability parity with the reference schedule zoo
(/root/reference/tools/modules/diffusions/schedules.py:5-143): ``linear``,
``linear_sd``, ``quadratic``, ``cosine``, ``logsnr_cosine_interp`` and Karras
sigmas, plus the zero-terminal-SNR rescale.  Schedules are computed host-side
in float64 (numpy) once at model build time; everything downstream consumes
them as constants baked into jitted programs.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "beta_schedule",
    "linear_schedule",
    "linear_sd_schedule",
    "quadratic_schedule",
    "cosine_schedule",
    "logsnr_cosine_interp_schedule",
    "karras_sigmas",
    "betas_to_sigmas",
    "sigmas_to_betas",
    "rescale_zero_terminal_snr",
]


def linear_schedule(num_timesteps: int, init_beta: float, last_beta: float, **kwargs) -> np.ndarray:
    scale = 1000.0 / num_timesteps
    init_beta = init_beta or scale * 0.0001
    last_beta = last_beta or scale * 0.02
    return np.linspace(init_beta, last_beta, num_timesteps, dtype=np.float64)


def linear_sd_schedule(num_timesteps: int, init_beta: float, last_beta: float, **kwargs) -> np.ndarray:
    """Stable-Diffusion 'scaled linear' schedule: linear in sqrt(beta)."""
    return np.linspace(init_beta ** 0.5, last_beta ** 0.5, num_timesteps, dtype=np.float64) ** 2


def quadratic_schedule(num_timesteps: int, init_beta: float = 0.0015, last_beta: float = 0.0195, **kwargs) -> np.ndarray:
    init_beta = init_beta or 0.0015
    last_beta = last_beta or 0.0195
    return np.linspace(init_beta ** 0.5, last_beta ** 0.5, num_timesteps, dtype=np.float64) ** 2


def cosine_schedule(num_timesteps: int, cosine_s: float = 0.008, **kwargs) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule, betas capped at 0.999."""
    steps = np.arange(num_timesteps, dtype=np.float64)
    t1 = steps / num_timesteps
    t2 = (steps + 1) / num_timesteps

    def f(u):
        return np.cos((u + cosine_s) / (1 + cosine_s) * math.pi / 2) ** 2

    return np.minimum(1.0 - f(t2) / f(t1), 0.999)


def betas_to_sigmas(betas: np.ndarray) -> np.ndarray:
    return np.sqrt(1 - np.cumprod(1 - betas))


def sigmas_to_betas(sigmas: np.ndarray) -> np.ndarray:
    square_alphas = 1 - sigmas ** 2
    return 1 - np.concatenate([square_alphas[:1], square_alphas[1:] / square_alphas[:-1]])


def _logsnr_cosine(n: int, logsnr_min: float = -15, logsnr_max: float = 15) -> np.ndarray:
    t_min = math.atan(math.exp(-0.5 * logsnr_min))
    t_max = math.atan(math.exp(-0.5 * logsnr_max))
    t = np.linspace(1, 0, n)
    return -2 * np.log(np.tan(t_min + t * (t_max - t_min)))


def _logsnr_cosine_shifted(n, logsnr_min=-15, logsnr_max=15, scale=2):
    return _logsnr_cosine(n, logsnr_min, logsnr_max) + 2 * math.log(1 / scale)


def logsnr_cosine_interp_schedule(
    num_timesteps: int,
    scale_min: float = 2,
    scale_max: float = 4,
    logsnr_min: float = -15,
    logsnr_max: float = 15,
    **kwargs,
) -> np.ndarray:
    """Interpolated shifted-cosine logSNR schedule → *sigmas* (as in reference).

    Note the reference returns sigmas (not betas) for this schedule name; the
    caller is expected to treat them accordingly.  We keep that contract.
    """
    t = np.linspace(1, 0, num_timesteps)
    lo = _logsnr_cosine_shifted(num_timesteps, logsnr_min, logsnr_max, scale_min)
    hi = _logsnr_cosine_shifted(num_timesteps, logsnr_min, logsnr_max, scale_max)
    logsnrs = t * lo + (1 - t) * hi
    # sigmoid(-logsnr) = sigma^2
    return np.sqrt(1.0 / (1.0 + np.exp(logsnrs)))


def karras_sigmas(n: int, sigma_min: float = 0.002, sigma_max: float = 80.0, rho: float = 7.0) -> np.ndarray:
    ramp = np.linspace(1, 0, n)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return np.sqrt(sigmas ** 2 / (1 + sigmas ** 2))


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale a beta schedule so the terminal step has exactly zero SNR.

    (Lin et al., "Common Diffusion Noise Schedules and Sample Steps are
    Flawed"; reference schedules.py:121-143.)
    """
    alphas = 1 - betas
    alphas_bar = np.cumprod(alphas)
    alphas_bar_sqrt = np.sqrt(alphas_bar)

    a0 = alphas_bar_sqrt[0].copy()
    aT = alphas_bar_sqrt[-1].copy()
    alphas_bar_sqrt = alphas_bar_sqrt - aT
    alphas_bar_sqrt = alphas_bar_sqrt * a0 / (a0 - aT)

    alphas_bar = alphas_bar_sqrt ** 2
    alphas = np.concatenate([alphas_bar[0:1], alphas_bar[1:] / alphas_bar[:-1]])
    return 1 - alphas


_SCHEDULES = {
    "linear": linear_schedule,
    "linear_sd": linear_sd_schedule,
    "quadratic": quadratic_schedule,
    "cosine": cosine_schedule,
    "logsnr_cosine_interp": logsnr_cosine_interp_schedule,
}


def beta_schedule(
    schedule: str = "cosine",
    num_timesteps: int = 1000,
    zero_terminal_snr: bool = False,
    **kwargs,
) -> np.ndarray:
    """Build a beta schedule by name (reference schedules.py:5-21)."""
    betas = _SCHEDULES[schedule](num_timesteps, **kwargs)
    if zero_terminal_snr and betas.max() != 1.0:
        betas = rescale_zero_terminal_snr(betas)
    return betas
