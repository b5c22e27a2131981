"""DPM-Solver++ fast ODE sampling for discrete-time VP diffusion.

Re-derivation of the solver used by the reference
(video_based/models/ddpm/dpm_solver.py: NoiseScheduleVP :66, model_wrapper
:238, DPM_Solver :419) restructured for XLA: the reference is a 1.3k-LoC
stateful torch class; here the sampling timestep grid, the per-step
alphas/sigmas/log-SNRs and all Runge-Kutta coefficients are *static numpy*
computed at trace time, so the compiled program is just `steps` UNet calls
plus fused linear combinations — no device-side control flow at all.

Supported surface (what the reference actually uses, cond_ddpm.py:154-193):
- algorithm dpmsolver++ (data prediction), singlestep orders 1-3 and
  multistep order 2, `time_uniform` outer / `logSNR` inner step spacing
- model types 'eps' ('noise'), 'x0' ('x_start'), 'v'
- `correcting_x0_fn`: dynamic clipping in pixel space or VQ quantize-denoise
  in latent space (`vq_denoised`)
- classifier-free guidance scaffold with guidance_scale == 1 (the only value
  the reference ever passes — condition-only forward)
"""

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


class VPSchedule:
    """Continuous-time view of a discrete beta schedule (NoiseScheduleVP,
    reference dpm_solver.py:66-168). All methods are numpy over static t."""

    def __init__(self, betas: np.ndarray):
        betas = np.asarray(betas, np.float64)
        self.N = len(betas)
        self.T = 1.0
        log_alphas = 0.5 * np.cumsum(np.log(1.0 - betas))
        self.t_array = (np.arange(self.N) + 1.0) / self.N
        self.log_alpha_array = log_alphas

    def log_alpha(self, t):
        return np.interp(t, self.t_array, self.log_alpha_array)

    def alpha(self, t):
        return np.exp(self.log_alpha(t))

    def sigma(self, t):
        return np.sqrt(1.0 - np.exp(2.0 * self.log_alpha(t)))

    def lam(self, t):
        la = self.log_alpha(t)
        return la - 0.5 * np.log(1.0 - np.exp(2.0 * la))

    def inverse_lambda(self, lam):
        lam_array = (self.log_alpha_array -
                     0.5 * np.log(1.0 - np.exp(2.0 * self.log_alpha_array)))
        # lambda decreases with t; reverse for np.interp
        return np.interp(lam, lam_array[::-1], self.t_array[::-1])


def _time_steps(ns: VPSchedule, skip_type, t_T, t_0, N):
    """Outer timestep grid (reference get_time_steps, dpm_solver.py:600)."""
    if skip_type == "time_uniform":
        return np.linspace(t_T, t_0, N + 1)
    if skip_type == "logSNR":
        lam_T, lam_0 = ns.lam(t_T), ns.lam(t_0)
        lams = np.linspace(lam_T, lam_0, N + 1)
        return ns.inverse_lambda(lams)
    if skip_type == "time_quadratic":
        return (np.linspace(t_T ** 0.5, t_0 ** 0.5, N + 1)) ** 2
    raise ValueError(skip_type)


def _singlestep_orders(steps, order):
    """Order pattern for singlestep mode (reference dpm_solver.py:635-668)."""
    if order == 3:
        K = steps // 3 + 1
        if steps % 3 == 0:
            orders = [3] * (K - 2) + [2, 1]
        elif steps % 3 == 1:
            orders = [3] * (K - 1) + [1]
        else:
            orders = [3] * (K - 1) + [2]
    elif order == 2:
        if steps % 2 == 0:
            K = steps // 2
            orders = [2] * K
        else:
            K = steps // 2 + 1
            orders = [2] * (K - 1) + [1]
    elif order == 1:
        K = steps
        orders = [1] * steps
    else:
        raise ValueError(order)
    return orders


def dpm_solver_sample(
    model_fn: Callable,
    betas: np.ndarray,
    x_T,
    steps: int = 20,
    order: int = 3,
    method: str = "singlestep",
    skip_type: str = "time_uniform",
    model_type: str = "eps",
    correcting_x0_fn: Optional[Callable] = None,
    guidance_scale: float = 1.0,
    uncond_model_fn: Optional[Callable] = None,
    t_start: Optional[float] = None,
    t_end: Optional[float] = None,
):
    """Sample x_0 from x_T with DPM-Solver++ (data prediction).

    Args:
        model_fn: (x, t_continuous_scalar) -> model output (eps/x0/v per
            `model_type`). Called with a static python float t; the caller
            maps continuous to discrete time (t * N - 1, matching
            model_wrapper's discrete-time convention, dpm_solver.py:300-320).
        betas: [N] float64 discrete beta schedule.
        correcting_x0_fn: applied to each predicted x0 (clip / vq-quantize).
        guidance_scale / uncond_model_fn: classifier-free guidance; with
            scale == 1 only the conditional branch runs.
    """
    ns = VPSchedule(betas)
    t_0 = 1.0 / ns.N if t_end is None else t_end
    t_T = ns.T if t_start is None else t_start

    def x0_fn(x, t):
        """Data-prediction model with correction."""
        out = model_fn(x, t)
        if guidance_scale != 1.0:
            assert uncond_model_fn is not None
            u = uncond_model_fn(x, t)
            out = u + guidance_scale * (out - u)
        a, s = ns.alpha(t), ns.sigma(t)
        if model_type in ("eps", "noise"):
            x0 = (x - s * out) / a
        elif model_type == "v":
            x0 = a * x - s * out
        elif model_type in ("x0", "x_start"):
            x0 = out
        else:
            raise ValueError(model_type)
        if correcting_x0_fn is not None:
            x0 = correcting_x0_fn(x0)
        return x0

    def update_1(x, m_s, s, t):
        """DPM-Solver++(1) == DDIM (dpm_solver.py:738-772)."""
        h = ns.lam(t) - ns.lam(s)
        phi_1 = np.expm1(-h)
        return (ns.sigma(t) / ns.sigma(s)) * x - (ns.alpha(t) * phi_1) * m_s

    def update_2(x, m_s, s, t, r1=0.5):
        """Singlestep second order (dpm_solver.py:775-843)."""
        lam_s, lam_t = ns.lam(s), ns.lam(t)
        h = lam_t - lam_s
        s1 = ns.inverse_lambda(lam_s + r1 * h)
        phi_11 = np.expm1(-r1 * h)
        phi_1 = np.expm1(-h)
        x_s1 = (ns.sigma(s1) / ns.sigma(s)) * x - \
            (ns.alpha(s1) * phi_11) * m_s
        m_s1 = x0_fn(x_s1, s1)
        x_t = (ns.sigma(t) / ns.sigma(s)) * x - (ns.alpha(t) * phi_1) * m_s \
            - (0.5 / r1) * (ns.alpha(t) * phi_1) * (m_s1 - m_s)
        return x_t

    def update_3(x, m_s, s, t, r1=1.0 / 3.0, r2=2.0 / 3.0):
        """Singlestep third order (dpm_solver.py:846-931)."""
        lam_s, lam_t = ns.lam(s), ns.lam(t)
        h = lam_t - lam_s
        s1 = ns.inverse_lambda(lam_s + r1 * h)
        s2 = ns.inverse_lambda(lam_s + r2 * h)
        phi_11 = np.expm1(-r1 * h)
        phi_12 = np.expm1(-r2 * h)
        phi_1 = np.expm1(-h)
        phi_22 = np.expm1(-r2 * h) / (r2 * h) + 1.0
        phi_2 = phi_1 / h + 1.0
        x_s1 = (ns.sigma(s1) / ns.sigma(s)) * x - \
            (ns.alpha(s1) * phi_11) * m_s
        m_s1 = x0_fn(x_s1, s1)
        x_s2 = (ns.sigma(s2) / ns.sigma(s)) * x \
            - (ns.alpha(s2) * phi_12) * m_s \
            + (r2 / r1) * (ns.alpha(s2) * phi_22) * (m_s1 - m_s)
        m_s2 = x0_fn(x_s2, s2)
        x_t = (ns.sigma(t) / ns.sigma(s)) * x - (ns.alpha(t) * phi_1) * m_s \
            + (1.0 / r2) * (ns.alpha(t) * phi_2) * (m_s2 - m_s)
        return x_t

    x = x_T
    if method == "singlestep":
        orders = _singlestep_orders(steps, order)
        K = len(orders)
        if skip_type == "logSNR":
            t_outer = _time_steps(ns, skip_type, t_T, t_0, K)
        else:
            full = _time_steps(ns, skip_type, t_T, t_0, steps)
            idx = np.cumsum([0] + orders)
            t_outer = full[idx]
        for i, ord_i in enumerate(orders):
            s, t = float(t_outer[i]), float(t_outer[i + 1])
            # r1/r2 come from the lambdas of skip_type-spaced INNER steps
            # (reference sample(), dpm_solver.py:1319-1325: inner grid uses
            # the same skip_type as the outer grid — time_uniform in the
            # reference's eval path, NOT logSNR)
            lam_s, lam_t = ns.lam(s), ns.lam(t)
            h = lam_t - lam_s
            inner = _time_steps(ns, skip_type, s, t, ord_i)
            m_s = x0_fn(x, s)
            if ord_i == 1:
                x = update_1(x, m_s, s, t)
            elif ord_i == 2:
                r1 = float((ns.lam(inner[1]) - lam_s) / h)
                x = update_2(x, m_s, s, t, r1=r1)
            else:
                r1 = float((ns.lam(inner[1]) - lam_s) / h)
                r2 = float((ns.lam(inner[2]) - lam_s) / h)
                x = update_3(x, m_s, s, t, r1=r1, r2=r2)
    elif method == "multistep":
        # multistep order<=2: AB-style using previous model output
        # (dpm_solver.py:934-1004). lower_order_final drops the last step
        # to first order ONLY when steps < 10 (sample(), dpm_solver.py:1294)
        t_grid = _time_steps(ns, skip_type, t_T, t_0, steps)
        m_prev, t_prev = None, None
        for i in range(steps):
            s, t = float(t_grid[i]), float(t_grid[i + 1])
            m_s = x0_fn(x, s)
            use_first = (m_prev is None) or (order == 1) or \
                (i == steps - 1 and steps < 10)
            if use_first:
                x = update_1(x, m_s, s, t)
            else:
                lam_p, lam_s, lam_t = ns.lam(t_prev), ns.lam(s), ns.lam(t)
                h0 = lam_s - lam_p
                h = lam_t - lam_s
                r0 = h0 / h
                d1 = (m_s - m_prev) / r0
                phi_1 = np.expm1(-h)
                x = (ns.sigma(t) / ns.sigma(s)) * x \
                    - (ns.alpha(t) * phi_1) * m_s \
                    - 0.5 * (ns.alpha(t) * phi_1) * d1
            m_prev, t_prev = m_s, s
    else:
        raise ValueError(method)
    return x
