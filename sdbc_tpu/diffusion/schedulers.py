"""DDPM / DDIM / PNDM schedulers as pure-JAX functions.

Replaces the diffusers schedulers the reference drives (SURVEY.md E3):
  - DDPMScheduler for training noise injection (finetune_sd.py:335-336,473)
  - DDIMScheduler for inference with clip_sample=False, set_alpha_to_one=False
    (inference.py:386-387)
  - PNDMScheduler with skip_prk_steps=True as the checkpoint-load fallback
    (utils.py:222-224)

All share the SD-1.x beta schedule: scaled_linear (sqrt-space linear) from
0.00085 to 0.012 over 1000 train steps.  Everything is stateless and
fixed-shape so `step` calls can live inside a single jitted
``lax.fori_loop`` sampling graph (PNDM carries a small fixed-size ets buffer).
All schedule math is fp32.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    # DDIM flags pinned by the reference (inference.py:386-387)
    clip_sample: bool = False
    set_alpha_to_one: bool = False
    # diffusers-0.7.2 scheduler-class default is 0, and the reference builds
    # its inference schedulers explicitly WITHOUT steps_offset
    # (inference.py:386-387 DDIM, utils.py:222-224 PNDM), so its sampled grid
    # is offset-0.  (Shipped SD checkpoint *configs* carry steps_offset=1,
    # but the reference overrides them — parity requires 0 here.)
    steps_offset: int = 0
    # "epsilon" (SD-1.x, the reference) or "v_prediction" (SD-2.x-style
    # checkpoints); converted to (eps, x0) at each step via to_eps_x0
    prediction_type: str = "epsilon"
    # Lin et al. 2023 (arXiv:2305.08891): rescale sqrt(ā) affinely so the
    # terminal ā_T is EXACTLY 0 (the model really sees pure noise at t=T).
    # Requires v_prediction (ā_T=0 makes the eps→x0 map singular) and
    # pairs with timestep_spacing="trailing" + guidance_rescale.
    rescale_zero_snr: bool = False
    # "leading" (diffusers-0.7.2 semantics, the reference's grid) or
    # "trailing" (grids START at t=T−1 — required for zero-SNR schedules
    # to actually sample the pure-noise endpoint)
    timestep_spacing: str = "leading"

    @staticmethod
    def sd15() -> "ScheduleConfig":
        return ScheduleConfig()


class Schedule(NamedTuple):
    betas: jax.Array            # (T,)
    alphas_cumprod: jax.Array   # (T,)
    final_alpha_cumprod: jax.Array  # scalar; alpha_0 or 1.0 per set_alpha_to_one


def make_schedule(cfg: ScheduleConfig) -> Schedule:
    t = cfg.num_train_timesteps
    if cfg.beta_schedule == "scaled_linear":
        betas = jnp.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, t,
                             dtype=jnp.float64 if jax.config.x64_enabled else jnp.float32) ** 2
    elif cfg.beta_schedule == "linear":
        betas = jnp.linspace(cfg.beta_start, cfg.beta_end, t, dtype=jnp.float32)
    else:
        raise ValueError(cfg.beta_schedule)
    betas = betas.astype(jnp.float32)
    alphas_cumprod = jnp.cumprod(1.0 - betas)
    if cfg.rescale_zero_snr:
        if cfg.prediction_type == "epsilon":
            raise ValueError(
                "rescale_zero_snr makes the terminal alpha_bar exactly 0, "
                "where the epsilon->x0 map is singular — use "
                "prediction_type='v_prediction' (arXiv:2305.08891 trains "
                "with v-prediction for exactly this reason)")
        # affine rescale of sqrt(alpha_bar): endpoint ā_0 kept, ā_T -> 0
        s = jnp.sqrt(alphas_cumprod)
        s0, sT = s[0], s[-1]
        s = (s - sT) * (s0 / (s0 - sT))
        alphas_cumprod = s ** 2
        # keep betas consistent with the rescaled cumprod (ā_t/ā_{t-1})
        alphas = alphas_cumprod[1:] / alphas_cumprod[:-1]
        alphas = jnp.concatenate([alphas_cumprod[:1], alphas])
        betas = (1.0 - alphas).astype(jnp.float32)
    final = jnp.asarray(1.0, jnp.float32) if cfg.set_alpha_to_one else alphas_cumprod[0]
    return Schedule(betas, alphas_cumprod, final)


# ---------------------------------------------------------------------------
# DDPM (training: q(x_t | x_0); also ancestral sampling step)


def ddpm_add_noise(sched: Schedule, x0, noise, timesteps):
    """Forward process sample x_t = sqrt(ā_t) x0 + sqrt(1-ā_t) ε.

    Mirrors DDPMScheduler.add_noise at the reference's finetune_sd.py:473.
    timesteps: (B,) int in [0, T).
    """
    a = sched.alphas_cumprod[timesteps].astype(jnp.float32)
    shape = (-1,) + (1,) * (x0.ndim - 1)
    sqrt_a = jnp.sqrt(a).reshape(shape)
    sqrt_1ma = jnp.sqrt(1.0 - a).reshape(shape)
    return (sqrt_a * x0.astype(jnp.float32)
            + sqrt_1ma * noise.astype(jnp.float32)).astype(x0.dtype)


def ddpm_step(sched: Schedule, eps, t, x_t, key, clip_sample: bool = True,
              t_prev=None):
    """One ancestral DDPM sampling step t → t_prev (eps parameterisation).

    The posterior is computed over the ACTUAL stride: with the effective
    step ᾱ_step = ā_t/ā_prev (β_step = 1−ᾱ_step), the DDPM eq. 7
    coefficients generalize to any t_prev < t and reduce exactly to the
    textbook single-step form (β_step = β_t) at stride 1.  A one-step-back
    posterior under a strided timestep grid removes only 1/ratio of the
    noise per step — at 50 inference steps the output would retain ~91%
    of the initial noise.  (diffusers 0.7.2's DDPMScheduler has exactly
    that bug — strided set_timesteps with a t−1 posterior — fixed in
    later diffusers via previous_timestep(); we implement the fixed
    semantics, the reference never samples with DDPM.)

    t_prev defaults to t−1; t_prev < 0 means "final step" (ā_prev = 1,
    no noise added).
    """
    if t_prev is None:
        t_prev = t - 1
    a_t = sched.alphas_cumprod[t]
    a_prev = jnp.where(t_prev >= 0,
                       sched.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
    a_step = a_t / a_prev
    beta_step = 1.0 - a_step
    xf, ef = x_t.astype(jnp.float32), eps.astype(jnp.float32)

    x0 = (xf - jnp.sqrt(1.0 - a_t) * ef) / jnp.sqrt(a_t)
    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)
    # strided posterior mean coefficients (DDPM eq. 7 over [t_prev, t])
    coef_x0 = jnp.sqrt(a_prev) * beta_step / (1.0 - a_t)
    coef_xt = jnp.sqrt(a_step) * (1.0 - a_prev) / (1.0 - a_t)
    mean = coef_x0 * x0 + coef_xt * xf
    var = jnp.clip(beta_step * (1.0 - a_prev) / (1.0 - a_t), 1e-20, None)
    noise = jax.random.normal(key, x_t.shape, jnp.float32)
    sample = mean + jnp.where(t_prev >= 0, jnp.sqrt(var), 0.0) * noise
    return sample.astype(x_t.dtype)


def to_eps_x0(sched: Schedule, model_out, t, x_t, prediction_type: str):
    """Convert a model output to (eps, x0) under the given parameterisation.

    epsilon:      x = α·x0 + σ·ε with model_out = ε
    v_prediction: model_out = v := α·ε − σ·x0  ⇒  x0 = α·x − σ·v,
                  ε = σ·x + α·v  (α = sqrt(ā_t), σ = sqrt(1−ā_t))
    """
    a_t = sched.alphas_cumprod[t]
    alpha = jnp.sqrt(a_t)
    sigma = jnp.sqrt(1.0 - a_t)
    xf = x_t.astype(jnp.float32)
    mo = model_out.astype(jnp.float32)
    if prediction_type == "v_prediction":
        x0 = alpha * xf - sigma * mo
        eps = sigma * xf + alpha * mo
    elif prediction_type == "epsilon":
        eps = mo
        x0 = (xf - sigma * eps) / alpha
    else:
        raise ValueError(f"unknown prediction_type {prediction_type}")
    return eps, x0


def velocity_target(sched: Schedule, x0, noise, timesteps):
    """Training target for v-prediction: v = α·ε − σ·x0 (per-example t)."""
    a = sched.alphas_cumprod[timesteps].astype(jnp.float32)
    shape = (-1,) + (1,) * (x0.ndim - 1)
    alpha = jnp.sqrt(a).reshape(shape)
    sigma = jnp.sqrt(1.0 - a).reshape(shape)
    return alpha * noise.astype(jnp.float32) - sigma * x0.astype(jnp.float32)


# ---------------------------------------------------------------------------
# timestep grids


def inference_stride(cfg: ScheduleConfig, num_inference_steps: int) -> int:
    """Train-step stride for a grid of num_inference_steps.

    Rejects num_inference_steps > num_train_timesteps up front: the
    integer ratio would be 0, every timestep would collapse to
    steps_offset, and each scheduler step would be an exact no-op — the
    pipeline would silently decode the initial noise (diffusers raises
    the same error)."""
    if not 1 <= num_inference_steps <= cfg.num_train_timesteps:
        raise ValueError(
            f"num_inference_steps must be in [1, {cfg.num_train_timesteps}] "
            f"(got {num_inference_steps})")
    return cfg.num_train_timesteps // num_inference_steps


# ---------------------------------------------------------------------------
# DDIM


def ddim_timesteps(cfg: ScheduleConfig, num_inference_steps: int) -> jnp.ndarray:
    """Descending timestep sequence.

    timestep_spacing="leading" (default): [0, r, 2r, ...][::-1] + offset —
    the diffusers-0.7.2 semantics the reference's grids use.
    "trailing": [T−1, T−1−r, ...] — starts at the LAST train step, so a
    zero-SNR schedule actually samples from pure noise (arXiv:2305.08891;
    steps_offset does not apply, matching diffusers)."""
    ratio = inference_stride(cfg, num_inference_steps)
    if cfg.timestep_spacing == "trailing":
        ts = (cfg.num_train_timesteps
              - jnp.arange(num_inference_steps) * ratio - 1)
        return ts.astype(jnp.int32)
    if cfg.timestep_spacing != "leading":
        raise ValueError(f"unknown timestep_spacing "
                         f"{cfg.timestep_spacing!r} (leading|trailing)")
    ts = (jnp.arange(num_inference_steps) * ratio).round().astype(jnp.int32)
    ts = ts + cfg.steps_offset
    return ts[::-1]


def ddim_step(sched: Schedule, model_out, t, t_prev, x_t, eta: float = 0.0,
              prediction_type: str = "epsilon", noise=None):
    """DDIM step; eta=0 (deterministic) is the reference's inference setting.

    t_prev < 0 selects final_alpha_cumprod (set_alpha_to_one=False semantics:
    ā_{-1} = ā_0 rather than 1).  model_out is interpreted per
    prediction_type (epsilon for SD-1.x, v_prediction for SD-2.x-style).

    eta > 0 adds the diffusers-0.7.2 DDIM variance:
    σ_t = η·sqrt((1-ā_prev)/(1-ā_t))·sqrt(1-ā_t/ā_prev) — at η=1 this is
    exactly the DDPM posterior std — and requires ``noise`` (standard
    normal, x_t-shaped).
    """
    a_prev = jnp.where(t_prev >= 0,
                       sched.alphas_cumprod[jnp.maximum(t_prev, 0)],
                       sched.final_alpha_cumprod)
    ef, x0 = to_eps_x0(sched, model_out, t, x_t, prediction_type)
    # clip_sample=False per reference → no clipping here
    if eta > 0.0:
        if noise is None:
            raise ValueError("ddim_step with eta > 0 needs `noise`")
        a_t = sched.alphas_cumprod[t]
        var = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
        sigma = eta * jnp.sqrt(var)
        dir_xt = jnp.sqrt(1.0 - a_prev - sigma ** 2) * ef
        return (jnp.sqrt(a_prev) * x0 + dir_xt
                + sigma * noise).astype(x_t.dtype)
    dir_xt = jnp.sqrt(1.0 - a_prev) * ef
    return (jnp.sqrt(a_prev) * x0 + dir_xt).astype(x_t.dtype)


# ---------------------------------------------------------------------------
# PNDM (skip_prk_steps=True → PLMS: linear multistep on the epsilon history)


class PNDMState(NamedTuple):
    ets: jax.Array      # (4, *latent_shape) ring buffer of past eps
    count: jax.Array    # () int32 — number of eps seen so far
    cur_sample: jax.Array  # latent carried between the first two half-steps


def pndm_timesteps(cfg: ScheduleConfig, num_inference_steps: int) -> jnp.ndarray:
    """PLMS timestep sequence with skip_prk_steps=True.

    diffusers PNDM (skip_prk_steps): plms_timesteps = [t_N, t_{N-1}, t_{N-1}]
    then the rest — the second step re-runs t_{N-1} as part of the Heun-style
    warmup.  Sequence length is num_inference_steps + 1.
    """
    ratio = inference_stride(cfg, num_inference_steps)
    base = (jnp.arange(num_inference_steps) * ratio).astype(jnp.int32) + cfg.steps_offset
    # descending: base[::-1] = [t_max, ..., t_0]
    desc = base[::-1]
    return jnp.concatenate([desc[:1], desc[1:2], desc[1:]])


def pndm_init_state(latent_shape, dtype=jnp.float32) -> PNDMState:
    return PNDMState(
        ets=jnp.zeros((4,) + tuple(latent_shape), jnp.float32),
        count=jnp.asarray(0, jnp.int32),
        cur_sample=jnp.zeros(latent_shape, dtype),
    )


def pndm_step(sched: Schedule, cfg: ScheduleConfig, state: PNDMState, eps, t,
              x_t, num_inference_steps: int):
    """One PLMS step.  Returns (new_state, x_prev).

    Implements diffusers PNDMScheduler.step_plms (skip_prk_steps=True) with a
    fixed-size ets ring buffer so it can run inside lax.fori_loop.
    """
    ratio = inference_stride(cfg, num_inference_steps)
    eps = eps.astype(jnp.float32)
    xf = x_t.astype(jnp.float32)
    count = state.count

    t_prev = t - ratio
    # first call uses t -> t - ratio; second call uses t + ratio -> t with the
    # held cur_sample (diffusers step_plms lines: counter==1 branch)
    is_second = count == 1
    t_eff = jnp.where(is_second, t + ratio, t)
    t_prev = jnp.where(is_second, t, t_prev)

    # update eps history (not on the second call, which averages instead)
    new_ets = jnp.where(is_second, state.ets,
                        jnp.roll(state.ets, 1, axis=0).at[0].set(eps))
    e1, e2, e3, e4 = new_ets[0], new_ets[1], new_ets[2], new_ets[3]

    eps_prime = jnp.select(
        [count == 0, count == 1, count == 2, count == 3],
        [eps,
         (eps + e1) / 2.0,
         (3.0 * e1 - e2) / 2.0,
         (23.0 * e1 - 16.0 * e2 + 5.0 * e3) / 12.0],
        (55.0 * e1 - 59.0 * e2 + 37.0 * e3 - 9.0 * e4) / 24.0,
    )

    sample = jnp.where(is_second, state.cur_sample.astype(jnp.float32), xf)
    new_cur = jnp.where(count == 0, xf, state.cur_sample.astype(jnp.float32))

    a_t = sched.alphas_cumprod[t_eff]
    a_prev = jnp.where(t_prev >= 0,
                       sched.alphas_cumprod[jnp.maximum(t_prev, 0)],
                       sched.final_alpha_cumprod)
    # diffusers _get_prev_sample closed form
    denom = (a_t * jnp.sqrt(1.0 - a_prev)
             + jnp.sqrt(a_t * a_prev * (1.0 - a_t)))
    x_prev = (jnp.sqrt(a_prev / a_t) * sample
              - (a_prev - a_t) * eps_prime / denom)

    new_state = PNDMState(ets=new_ets, count=count + 1,
                          cur_sample=new_cur.astype(x_t.dtype))
    return new_state, x_prev.astype(x_t.dtype)


# ---------------------------------------------------------------------------
# Euler ancestral (k-diffusion get_ancestral_step / diffusers
# EulerAncestralDiscreteScheduler) — beyond-reference bonus: a stochastic
# sampler distinct from DDPM's posterior sampling.
#
# Formulated in VE (sigma) coordinates internally but operating on the
# pipeline's variance-preserving latents: x_ve = x_vp / sqrt(ā_t) with
# σ = sqrt((1-ā)/ā), so no scale_model_input hook is needed.  The
# NON-ancestral Euler step is the exact identity x0 + σ_prev·ε̂ — i.e.
# byte-for-byte the DDIM (eta=0) update on the same grid (tested) — so only
# the ancestral variant is exposed as a scheduler; the grid is our leading
# integer grid (== diffusers timestep_spacing="leading"; diffusers' own
# default for Euler is interpolated "linspace", a grid choice, not a
# method difference).


def _ve_sigma(alpha_bar):
    return jnp.sqrt((1.0 - alpha_bar) / jnp.maximum(alpha_bar, 1e-20))


def euler_step(sched: Schedule, eps, t, t_prev, x_t, noise=None,
               ancestral: bool = False):
    """One Euler step t → t_prev on VP latents (eps parameterisation).

    t_prev < 0 is the final step: σ_prev = 0 (the appended terminal sigma
    of the k-diffusion grid), returning the x0 prediction exactly.
    ancestral=True adds k-diffusion's ancestral noise split
    (σ_down² + σ_up² = σ_prev², σ_up = σ_prev·sqrt(1 − σ_prev²/σ_t²))
    and requires ``noise`` (standard normal, x_t-shaped).
    """
    a_t = sched.alphas_cumprod[t]
    a_prev = jnp.where(t_prev >= 0,
                       sched.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
    s_t = _ve_sigma(a_t)
    s_p = _ve_sigma(a_prev)
    xf = x_t.astype(jnp.float32)
    ef = eps.astype(jnp.float32)
    x_ve = xf / jnp.sqrt(a_t)
    if ancestral:
        if noise is None:
            raise ValueError("euler_step with ancestral=True needs `noise`")
        var_up = s_p ** 2 * (s_t ** 2 - s_p ** 2) / jnp.maximum(s_t ** 2,
                                                                1e-20)
        s_up = jnp.sqrt(jnp.maximum(var_up, 0.0))
        s_down = jnp.sqrt(jnp.maximum(s_p ** 2 - var_up, 0.0))
        x_ve = (x_ve + (s_down - s_t) * ef
                + s_up * noise.astype(jnp.float32))
    else:
        x_ve = x_ve + (s_p - s_t) * ef
    return (x_ve * jnp.sqrt(a_prev)).astype(x_t.dtype)


# ---------------------------------------------------------------------------
# k-LMS (diffusers-0.7.2 LMSDiscreteScheduler / Katherine Crowson's
# k-diffusion sampler) — the remaining member of the diffusers-0.7.2
# sampler family the reference's engine ships.  Linear multistep in VE
# sigma space with Lagrange-polynomial coefficients; diffusers evaluates
# the coefficient integrals numerically (scipy.integrate.quad) — the
# integrand is a degree-(order-1) polynomial, so we integrate it EXACTLY
# host-side (numpy polyint) into a static (N, order) table the jitted
# fori_loop indexes.  Grid: the repo's leading integer grid (same
# deliberate grid choice as euler_a; diffusers' own LMS default is an
# interpolated "linspace" grid — a spacing choice, not a method change).


class LMSState(NamedTuple):
    ders: jax.Array     # (order, *latent_shape) eps history, newest first
    count: jax.Array    # () int32 — steps taken so far


LMS_ORDER = 4


def lms_timesteps(cfg: ScheduleConfig, num_inference_steps: int) -> jnp.ndarray:
    """Same leading-space descending sequence as DDIM."""
    return ddim_timesteps(cfg, num_inference_steps)


def _host_grid(cfg: ScheduleConfig, num_inference_steps: int):
    """ddim_timesteps as host numpy (for the static coefficient tables)."""
    import numpy as np

    ratio = inference_stride(cfg, num_inference_steps)
    if cfg.timestep_spacing == "trailing":
        return (cfg.num_train_timesteps
                - np.arange(num_inference_steps) * ratio - 1)
    return (np.arange(num_inference_steps) * ratio + cfg.steps_offset)[::-1]


def lms_coeff_table(cfg: ScheduleConfig, num_inference_steps: int,
                    order: int = LMS_ORDER) -> jnp.ndarray:
    """(N, order) integrated Lagrange coefficients over the sigma grid.

    Row i gives the weights of the last min(i+1, order) eps predictions
    (newest first; unused slots zero) for the update
    x_ve += sum_j coeff[i, j] * eps_hist[j] integrating from sigma_i to
    sigma_{i+1} (terminal sigma 0).  Exact polynomial integration of
    diffusers' get_lms_coefficient quad integrand, in float64.
    (Sigma-space: incompatible with rescale_zero_snr, whose terminal
    sigma is infinite — the pipeline rejects that combination.)
    """
    import numpy as np

    ts = _host_grid(cfg, num_inference_steps)
    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                            cfg.num_train_timesteps, dtype=np.float64) ** 2
    else:
        betas = np.linspace(cfg.beta_start, cfg.beta_end,
                            cfg.num_train_timesteps, dtype=np.float64)
    ac = np.cumprod(1.0 - betas)
    sig = np.sqrt((1.0 - ac[ts]) / ac[ts])
    sig = np.append(sig, 0.0)  # terminal
    n = num_inference_steps
    table = np.zeros((n, order), np.float64)
    for i in range(n):
        cur = min(i + 1, order)
        for j in range(cur):
            poly = np.poly1d([1.0])
            for k in range(cur):
                if k == j:
                    continue
                poly = poly * np.poly1d([1.0, -sig[i - k]]) \
                    / (sig[i - j] - sig[i - k])
            integ = np.polyint(poly)
            table[i, j] = integ(sig[i + 1]) - integ(sig[i])
    return jnp.asarray(table, jnp.float32)


def lms_init_state(latent_shape, order: int = LMS_ORDER) -> LMSState:
    return LMSState(ders=jnp.zeros((order,) + tuple(latent_shape),
                                   jnp.float32),
                    count=jnp.asarray(0, jnp.int32))


def lms_step(sched: Schedule, state: LMSState, eps, t, t_prev, x_t,
             coeff_row):
    """One k-LMS step t → t_prev.  Returns (new_state, x_prev).

    eps is the (guided) epsilon prediction — in VE coordinates the
    derivative (x_ve − x0)/σ equals ε̂ exactly, so the history stores eps.
    ``coeff_row``: the timestep's row of lms_coeff_table (zero-padded, so
    the full dot over the order-4 history is exact at any warmup count —
    row i only weights the min(i+1, 4) entries that exist).
    """
    a_t = sched.alphas_cumprod[t]
    a_prev = jnp.where(t_prev >= 0,
                       sched.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
    xf = x_t.astype(jnp.float32)
    ef = eps.astype(jnp.float32)
    x_ve = xf / jnp.sqrt(a_t)
    ders = jnp.roll(state.ders, 1, axis=0).at[0].set(ef)
    upd = jnp.tensordot(coeff_row.astype(jnp.float32), ders, axes=1)
    x_prev = (x_ve + upd) * jnp.sqrt(a_prev)
    return LMSState(ders=ders, count=state.count + 1), x_prev.astype(x_t.dtype)


# ---------------------------------------------------------------------------
# Karras sigma grid (Karras et al. 2022, arXiv:2206.00364 eq. 5) — the
# rho-interpolated noise schedule the k-diffusion samplers were designed
# around; markedly better low-step quality for euler_a / lms / dpm.
# Beyond-reference bonus (diffusers grew `use_karras_sigmas` after 0.7.2).
# All grid construction is host-side numpy (static), like lms_coeff_table.


def _train_log_sigmas(cfg: ScheduleConfig):
    """(T,) float64 log-sigmas of the training grid, σ_t = sqrt((1-ā)/ā)."""
    import numpy as np

    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                            cfg.num_train_timesteps, dtype=np.float64) ** 2
    else:
        betas = np.linspace(cfg.beta_start, cfg.beta_end,
                            cfg.num_train_timesteps, dtype=np.float64)
    ac = np.cumprod(1.0 - betas)
    return np.log(np.sqrt((1.0 - ac) / ac))


def karras_grid(cfg: ScheduleConfig, num_inference_steps: int,
                rho: float = 7.0) -> Tuple["np.ndarray", "np.ndarray"]:
    """Karras sigma schedule → (sigmas (N+1,), float timesteps (N,)).

    Returns HOST numpy arrays (float32): callers jnp-ify the pieces they
    feed the graph.  Returning jnp here would hand jit callers tracers
    (omnistaging stages every jnp op), breaking the host-side Lagrange
    coefficient integration that consumes the sigmas.

    σ_i = (σ_max^(1/ρ) + i/(N−1)·(σ_min^(1/ρ) − σ_max^(1/ρ)))^ρ, descending,
    with a terminal 0 appended (k-diffusion convention).  σ_min/σ_max are the
    endpoint sigmas of the repo's leading integer grid for the same step
    count (diffusers semantics: the karras ramp replaces the grid between
    the SAME endpoints).  The returned timesteps are the CONTINUOUS
    positions of each σ on the training grid — fractional-index linear
    interpolation in log-sigma space (k-diffusion sigma_to_t) — and feed
    the UNet's sinusoidal embedding directly (it accepts floats).
    """
    import numpy as np

    ts = _host_grid(cfg, num_inference_steps)
    log_sigmas = _train_log_sigmas(cfg)
    sig_grid = np.exp(log_sigmas[ts])
    sigma_max, sigma_min = sig_grid[0], sig_grid[-1]

    if num_inference_steps == 1:
        sigmas = np.asarray([sigma_max], np.float64)
    else:
        ramp = np.linspace(0.0, 1.0, num_inference_steps)
        sigmas = (sigma_max ** (1.0 / rho)
                  + ramp * (sigma_min ** (1.0 / rho)
                            - sigma_max ** (1.0 / rho))) ** rho

    # sigma → continuous t (k-diffusion sigma_to_t: piecewise-linear in
    # log sigma over the training table)
    log_s = np.log(sigmas)
    dists = log_s[None, :] - log_sigmas[:, None]          # (T, N)
    low_idx = np.clip(np.cumsum(dists >= 0, axis=0).argmax(axis=0),
                      0, log_sigmas.shape[0] - 2)
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = np.clip((low - log_s) / (low - high), 0.0, 1.0)
    t_cont = (1.0 - w) * low_idx + w * high_idx

    sigmas = np.append(sigmas, 0.0)
    return (np.asarray(sigmas, np.float32), np.asarray(t_cont, np.float32))


def _alpha_bar_of_sigma(sigma):
    """VP ā from VE σ: σ² = (1−ā)/ā ⇒ ā = 1/(1+σ²)."""
    return 1.0 / (1.0 + sigma.astype(jnp.float32) ** 2)


def sigma_to_eps_x0(model_out, sigma, x_t, prediction_type: str):
    """to_eps_x0 for a continuous-σ grid point (ā = 1/(1+σ²))."""
    a = _alpha_bar_of_sigma(sigma)
    alpha = jnp.sqrt(a)
    sig_vp = jnp.sqrt(1.0 - a)
    xf = x_t.astype(jnp.float32)
    mo = model_out.astype(jnp.float32)
    if prediction_type == "v_prediction":
        x0 = alpha * xf - sig_vp * mo
        eps = sig_vp * xf + alpha * mo
    elif prediction_type == "epsilon":
        eps = mo
        x0 = (xf - sig_vp * eps) / alpha
    else:
        raise ValueError(f"unknown prediction_type {prediction_type}")
    return eps, x0


def euler_step_sigma(eps, s_t, s_p, x_t, noise=None, ancestral: bool = False):
    """euler_step on an explicit (σ_t → σ_prev) pair (VP latents in/out).

    Identical math to euler_step with ā = 1/(1+σ²); σ_prev = 0 is the
    terminal step (returns the x0 prediction; no ancestral noise)."""
    s_t = jnp.asarray(s_t, jnp.float32)
    s_p = jnp.asarray(s_p, jnp.float32)
    a_t = _alpha_bar_of_sigma(s_t)
    a_p = _alpha_bar_of_sigma(s_p)
    xf = x_t.astype(jnp.float32)
    ef = eps.astype(jnp.float32)
    x_ve = xf / jnp.sqrt(a_t)
    if ancestral:
        if noise is None:
            raise ValueError("euler_step_sigma with ancestral=True needs "
                             "`noise`")
        var_up = s_p ** 2 * (s_t ** 2 - s_p ** 2) / jnp.maximum(s_t ** 2,
                                                                1e-20)
        s_up = jnp.sqrt(jnp.maximum(var_up, 0.0))
        s_down = jnp.sqrt(jnp.maximum(s_p ** 2 - var_up, 0.0))
        x_ve = (x_ve + (s_down - s_t) * ef
                + s_up * noise.astype(jnp.float32))
    else:
        x_ve = x_ve + (s_p - s_t) * ef
    return (x_ve * jnp.sqrt(a_p)).astype(x_t.dtype)


def leading_sigma_grid(cfg: ScheduleConfig, num_inference_steps: int):
    """(sigmas (N+1,), float timesteps (N,)) of the LEADING integer grid
    with a terminal 0 appended — the non-Karras sigma-space sampling grid
    (diffusers HeunDiscrete/EulerDiscrete semantics: the discrete grid's
    own sigmas, stepped in VE space).  Host numpy, like karras_grid."""
    import numpy as np

    ts = _host_grid(cfg, num_inference_steps)
    sig = np.exp(_train_log_sigmas(cfg)[ts])
    return (np.asarray(np.append(sig, 0.0), np.float32),
            np.asarray(ts, np.float32))


def heun_step_sigma(eps1, eps2, s_t, s_p, x_t):
    """One deterministic Heun (trapezoidal) step σ_t → σ_p in VE space.

    k-diffusion sample_heun / arXiv:2206.00364 Alg. 1: the slope is the
    average of the eps at σ_t and the eps at the Euler predictor's
    endpoint (``eps2``, computed by the caller with a second model eval).
    ``eps2 = eps1`` degenerates to the plain Euler step (used for the
    terminal σ_p = 0 step, where no second eval exists).  VP latents
    in/out like euler_step_sigma.
    """
    s_t = jnp.asarray(s_t, jnp.float32)
    s_p = jnp.asarray(s_p, jnp.float32)
    a_t = _alpha_bar_of_sigma(s_t)
    a_p = _alpha_bar_of_sigma(s_p)
    x_ve = x_t.astype(jnp.float32) / jnp.sqrt(a_t)
    d = 0.5 * (eps1.astype(jnp.float32) + eps2.astype(jnp.float32))
    x_ve = x_ve + (s_p - s_t) * d
    return (x_ve * jnp.sqrt(a_p)).astype(x_t.dtype)


def lms_coeff_table_sigmas(sigmas, order: int = LMS_ORDER) -> jnp.ndarray:
    """lms_coeff_table over an EXPLICIT (N+1,) sigma grid (terminal last).

    Same exact Lagrange-polynomial integration; the integer-grid
    lms_coeff_table is the special case sigmas = σ(leading grid) + [0]."""
    import numpy as np

    sig = np.asarray(sigmas, np.float64)
    n = sig.shape[0] - 1
    table = np.zeros((n, order), np.float64)
    for i in range(n):
        cur = min(i + 1, order)
        for j in range(cur):
            poly = np.poly1d([1.0])
            for k in range(cur):
                if k == j:
                    continue
                poly = poly * np.poly1d([1.0, -sig[i - k]]) \
                    / (sig[i - j] - sig[i - k])
            integ = np.polyint(poly)
            table[i, j] = integ(sig[i + 1]) - integ(sig[i])
    return jnp.asarray(table, jnp.float32)


def lms_step_sigma(state: LMSState, eps, s_t, s_p, x_t, coeff_row):
    """lms_step on an explicit (σ_t → σ_prev) pair (VP latents in/out)."""
    a_t = _alpha_bar_of_sigma(jnp.asarray(s_t, jnp.float32))
    a_p = _alpha_bar_of_sigma(jnp.asarray(s_p, jnp.float32))
    xf = x_t.astype(jnp.float32)
    ef = eps.astype(jnp.float32)
    x_ve = xf / jnp.sqrt(a_t)
    ders = jnp.roll(state.ders, 1, axis=0).at[0].set(ef)
    upd = jnp.tensordot(coeff_row.astype(jnp.float32), ders, axes=1)
    x_prev = (x_ve + upd) * jnp.sqrt(a_p)
    return LMSState(ders=ders, count=state.count + 1), x_prev.astype(x_t.dtype)


def dpm_step_sigma(state: "DPMState", eps, s_t, s_p, x_t, first_order=False):
    """dpm_step on an explicit (σ_t → σ_prev) pair.

    With ā = 1/(1+σ²): λ = log(α/σ_vp) = −log σ, so the lambda-space 2M
    update carries over verbatim; σ_prev = 0 is the terminal step (the
    guarded λ_p is large ⇒ expm1(−h) → −1 and the σ-ratio term vanishes,
    returning the x0 prediction exactly)."""
    s_t = jnp.asarray(s_t, jnp.float32)
    s_p = jnp.asarray(s_p, jnp.float32)
    a_t = _alpha_bar_of_sigma(s_t)
    a_p = _alpha_bar_of_sigma(s_p)
    xf = x_t.astype(jnp.float32)
    ef = eps.astype(jnp.float32)

    alpha_t, sigma_t = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
    alpha_p, sigma_p = jnp.sqrt(a_p), jnp.sqrt(1.0 - a_p)
    x0 = (xf - sigma_t * ef) / alpha_t

    lam_t = -jnp.log(jnp.maximum(s_t, 1e-20))
    lam_p = -jnp.log(jnp.maximum(s_p, 1e-20))
    h = lam_p - lam_t
    h_prev = lam_t - state.prev_lambda

    use_2nd = jnp.logical_and(state.count > 0,
                              jnp.logical_not(jnp.asarray(first_order)))
    r0 = jnp.where(use_2nd, h_prev / h, 1.0)
    d1 = (x0 - state.prev_x0) / r0
    x0_2m = jnp.where(use_2nd, x0 + 0.5 * d1, x0)

    phi = jnp.expm1(-h)
    x_prev = (sigma_p / sigma_t) * xf - alpha_p * phi * x0_2m

    return DPMState(prev_x0=x0, prev_lambda=lam_t, count=state.count + 1), \
        x_prev.astype(x_t.dtype)


# ---------------------------------------------------------------------------
# DPM-Solver++ (2M) — beyond-reference bonus: DDIM-quality samples in
# ~20-25 steps.  Second-order multistep solver in log-SNR (lambda) space,
# data-prediction formulation (Lu et al. 2022, multistep variant).


class DPMState(NamedTuple):
    prev_x0: jax.Array      # x0 prediction from the previous step
    prev_lambda: jax.Array  # () log-SNR at the previous model point
    count: jax.Array        # () int32 — steps taken so far


def dpm_timesteps(cfg: ScheduleConfig, num_inference_steps: int) -> jnp.ndarray:
    """Same leading-space descending sequence as DDIM."""
    return ddim_timesteps(cfg, num_inference_steps)


def dpm_init_state(latent_shape) -> DPMState:
    return DPMState(prev_x0=jnp.zeros(latent_shape, jnp.float32),
                    prev_lambda=jnp.zeros((), jnp.float32),
                    count=jnp.asarray(0, jnp.int32))


def _lambda_of(alpha_bar):
    """log-SNR lambda = log(alpha/sigma) with alpha=sqrt(ā), sigma=sqrt(1-ā)."""
    a = jnp.sqrt(alpha_bar)
    s = jnp.sqrt(1.0 - alpha_bar)
    return jnp.log(jnp.maximum(a, 1e-20)) - jnp.log(jnp.maximum(s, 1e-20))


def dpm_sde_step(sched: Schedule, cfg: ScheduleConfig, state: DPMState, eps,
                 t, t_prev, x_t, noise, first_order=False):
    """One SDE-DPM-Solver++(2M) step t → t_prev (midpoint solver type).

    The stochastic counterpart of ``dpm_step`` (Lu et al. 2022, SDE
    variant): solves the reverse SDE instead of the probability-flow ODE —
    fresh noise is injected every step while the sample's own contribution
    contracts by e^{−h}, preserving the forward marginals exactly when the
    data prediction is exact (tested).  Often sharper/more diverse at
    moderate step counts than the deterministic solver; requires ``noise``
    (standard normal, x_t-shaped).  Returns (new_state, x_prev).

      x_prev = (σ_p/σ_t)·e^{−h}·x + α_p·(1−e^{−2h})·x0
               + ½·α_p·(1−e^{−2h})·D1 + σ_p·sqrt(1−e^{−2h})·z
      D1 = (x0 − x0_prev)/r0,  r0 = h_prev/h  (midpoint second order)

    The degenerate terminal step (ā_prev == ā_t under set_alpha_to_one=
    False ⇒ h = 0) is an exact no-op: every non-sample coefficient → 0.
    """
    a_t = sched.alphas_cumprod[t]
    a_prev = jnp.where(t_prev >= 0,
                       sched.alphas_cumprod[jnp.maximum(t_prev, 0)],
                       sched.final_alpha_cumprod)
    xf = x_t.astype(jnp.float32)
    ef = eps.astype(jnp.float32)

    alpha_t, sigma_t = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
    alpha_p, sigma_p = jnp.sqrt(a_prev), jnp.sqrt(1.0 - a_prev)
    x0 = (xf - sigma_t * ef) / alpha_t

    lam_t = _lambda_of(a_t)
    lam_p = _lambda_of(a_prev)
    h = lam_p - lam_t          # > 0 (λ grows as t falls)
    h_prev = lam_t - state.prev_lambda

    use_2nd = jnp.logical_and(state.count > 0,
                              jnp.logical_not(jnp.asarray(first_order)))
    r0 = jnp.where(use_2nd, h_prev / h, 1.0)  # h→0 ⇒ r0→inf ⇒ d1→0
    d1 = (x0 - state.prev_x0) / r0
    x0_2m = jnp.where(use_2nd, x0 + 0.5 * d1, x0)

    decay = jnp.exp(-h)
    grow = -jnp.expm1(-2.0 * h)               # 1 − e^{−2h}
    x_prev = ((sigma_p / sigma_t) * decay * xf
              + alpha_p * grow * x0_2m
              + sigma_p * jnp.sqrt(jnp.maximum(grow, 0.0))
              * noise.astype(jnp.float32))

    return DPMState(prev_x0=x0, prev_lambda=lam_t, count=state.count + 1), \
        x_prev.astype(x_t.dtype)


def dpm_sde_step_sigma(state: "DPMState", eps, s_t, s_p, x_t, noise,
                       first_order=False):
    """dpm_sde_step on an explicit (σ_t → σ_prev) pair (karras grids).

    λ = −log σ under ā = 1/(1+σ²), so the lambda-space update carries over
    verbatim; σ_prev = 0 is the terminal step (the guarded λ_p is huge ⇒
    e^{−h} → 0, 1−e^{−2h} → 1, σ_p → 0: returns the x0 prediction exactly,
    with no noise added).
    """
    s_t = jnp.asarray(s_t, jnp.float32)
    s_p = jnp.asarray(s_p, jnp.float32)
    a_t = _alpha_bar_of_sigma(s_t)
    a_p = _alpha_bar_of_sigma(s_p)
    xf = x_t.astype(jnp.float32)
    ef = eps.astype(jnp.float32)

    alpha_t, sigma_t = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
    alpha_p, sigma_p = jnp.sqrt(a_p), jnp.sqrt(1.0 - a_p)
    x0 = (xf - sigma_t * ef) / alpha_t

    lam_t = -jnp.log(jnp.maximum(s_t, 1e-20))
    lam_p = -jnp.log(jnp.maximum(s_p, 1e-20))
    h = lam_p - lam_t
    h_prev = lam_t - state.prev_lambda

    use_2nd = jnp.logical_and(state.count > 0,
                              jnp.logical_not(jnp.asarray(first_order)))
    r0 = jnp.where(use_2nd, h_prev / h, 1.0)
    d1 = (x0 - state.prev_x0) / r0
    x0_2m = jnp.where(use_2nd, x0 + 0.5 * d1, x0)

    decay = jnp.exp(-h)
    grow = -jnp.expm1(-2.0 * h)
    x_prev = ((sigma_p / sigma_t) * decay * xf
              + alpha_p * grow * x0_2m
              + sigma_p * jnp.sqrt(jnp.maximum(grow, 0.0))
              * noise.astype(jnp.float32))

    return DPMState(prev_x0=x0, prev_lambda=lam_t, count=state.count + 1), \
        x_prev.astype(x_t.dtype)


def _alpha_sigma_of_lambda(lam):
    """(α, σ) from log-SNR λ: α² = sigmoid(2λ) (since α²+σ²=1, λ=log α/σ)."""
    a2 = jax.nn.sigmoid(2.0 * lam)
    return jnp.sqrt(a2), jnp.sqrt(1.0 - a2)


class UniPCState(NamedTuple):
    m0: jax.Array           # newest past x0 prediction (model point at lam0)
    m1: jax.Array           # second-newest x0 prediction (at lam1)
    lam0: jax.Array         # () log-SNR of m0's model point
    lam1: jax.Array         # () log-SNR of m1's model point
    last_sample: jax.Array  # corrected sample at lam0 (the predictor's input)
    count: jax.Array        # () int32 — model evaluations consumed so far


def unipc_init_state(latent_shape) -> UniPCState:
    z = jnp.zeros(latent_shape, jnp.float32)
    return UniPCState(m0=z, m1=z, lam0=jnp.zeros((), jnp.float32),
                      lam1=jnp.zeros((), jnp.float32), last_sample=z,
                      count=jnp.asarray(0, jnp.int32))


def unipc_timesteps(cfg: ScheduleConfig, num_inference_steps: int) -> jnp.ndarray:
    """Same leading-space descending sequence as DDIM."""
    return ddim_timesteps(cfg, num_inference_steps)


def _unipc_bh2_terms(h):
    """(h_phi_1, B_h, b1, b2) of the B₂(h)=e^h−1 data-prediction variant.

    hh = −h (predict-x0 coordinates).  h_phi_1 = hφ₁(hh) = e^hh − 1;
    b_i = i!·hφ_{i+1}/B_h with hφ_{k+1} = hφ_k/hh − 1/k! (the recursion of
    UniPC eq. 3.14, arXiv:2302.04867).  Divisions are guarded at h→0 so a
    degenerate final step (ā_prev == ā_t under set_alpha_to_one=False)
    stays finite — every use multiplies by B_h or h_phi_1, both → 0, so
    the step degrades to an exact no-op rather than NaN.
    """
    hh = -h
    hh_safe = jnp.where(jnp.abs(hh) < 1e-8, 1.0, hh)
    h_phi_1 = jnp.expm1(hh)
    b_h = h_phi_1  # bh2: B(h) = e^h − 1
    b_safe = jnp.where(jnp.abs(b_h) < 1e-12, 1.0, b_h)
    h_phi_2 = h_phi_1 / hh_safe - 1.0
    h_phi_3 = h_phi_2 / hh_safe - 0.5
    return h_phi_1, b_h, h_phi_2 / b_safe, 2.0 * h_phi_3 / b_safe


def unipc_step(sched: Schedule, state: UniPCState, x0_t, t, t_prev, x_t,
               last_step=False):
    """One UniPC step t → t_prev (UniC corrector + UniP predictor).

    UniPC (Zhao et al. 2023, arXiv:2302.04867): a predictor-corrector
    framework in log-SNR space sharing one model evaluation per step — the
    corrector refines the CURRENT sample (predicted last step) with the
    model output just computed at it, then the predictor advances.  This is
    the B₂(h) = e^h−1 ("bh2") data-prediction variant at solver order 2,
    the established configuration for guided sampling.  Order bookkeeping
    (first step order 1, order-1 final predictor via ``last_step``) matches
    the variable-order warmup of the multistep family.

    x0_t: the model's x0 prediction at timestep t, evaluated at x_t (use
    ``to_eps_x0``'s x0 — any prediction_type).  Returns (new_state, x_next).

    Closed forms at order ≤ 2 (R is 1×1 / 2×2, solved exactly):
      UniP₂ weights: ρ = [1/2] (the framework's canonical choice);
      UniC₁: ρ = [1/2];  UniC₂: solve [[1,1],[r₁,1]]ρ = [b₁,b₂].
    """
    a_t = sched.alphas_cumprod[t]
    a_prev = jnp.where(t_prev >= 0,
                       sched.alphas_cumprod[jnp.maximum(t_prev, 0)],
                       sched.final_alpha_cumprod)
    x0_t = x0_t.astype(jnp.float32)
    xf = x_t.astype(jnp.float32)

    lam_t = _lambda_of(a_t)
    alpha_t, sigma_t = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)

    # ---- UniC: correct x_t using the model output just computed at it.
    # Recomputes the t-sample from last_sample (the corrected sample at
    # lam0) — the corrector is a full replacement step, not a delta.
    h_c = lam_t - state.lam0
    _, sigma_s0 = _alpha_sigma_of_lambda(state.lam0)
    hp1_c, bh_c, b1_c, b2_c = _unipc_bh2_terms(h_c)
    base_c = (sigma_t / sigma_s0) * state.last_sample - alpha_t * hp1_c * state.m0
    d1_t = x0_t - state.m0
    # order 2 (count >= 2): one history difference D1_0 plus the fresh D1_t
    r1 = (state.lam1 - state.lam0) / jnp.where(jnp.abs(h_c) < 1e-12, 1.0, h_c)
    r1_safe = jnp.where(jnp.abs(r1) < 1e-12, 1.0, r1)
    d1_0 = (state.m1 - state.m0) / r1_safe
    rho1 = (b2_c - b1_c) / jnp.where(jnp.abs(r1 - 1.0) < 1e-12, 1.0, r1 - 1.0)
    rho2 = b1_c - rho1
    corr2 = base_c - alpha_t * bh_c * (rho1 * d1_0 + rho2 * d1_t)
    corr1 = base_c - alpha_t * bh_c * (0.5 * d1_t)
    x_corr = jnp.where(state.count >= 2, corr2,
                       jnp.where(state.count == 1, corr1, xf))

    # ---- history shift: the current model point becomes m0
    m0, m1 = x0_t, state.m0
    lam0, lam1 = lam_t, state.lam0

    # ---- UniP: advance the corrected sample to t_prev
    lam_p = _lambda_of(a_prev)
    alpha_p, sigma_p = jnp.sqrt(a_prev), jnp.sqrt(1.0 - a_prev)
    h_p = lam_p - lam_t
    hp1_p, bh_p, _, _ = _unipc_bh2_terms(h_p)
    base_p = (sigma_p / sigma_t) * x_corr - alpha_p * hp1_p * m0
    r1p = (lam1 - lam0) / jnp.where(jnp.abs(h_p) < 1e-12, 1.0, h_p)
    r1p_safe = jnp.where(jnp.abs(r1p) < 1e-12, 1.0, r1p)
    d1p = (m1 - m0) / r1p_safe
    use_2nd = jnp.logical_and(state.count >= 1,
                              jnp.logical_not(jnp.asarray(last_step)))
    x_next = jnp.where(use_2nd, base_p - alpha_p * bh_p * (0.5 * d1p), base_p)

    new_state = UniPCState(m0=m0, m1=m1, lam0=lam0, lam1=lam1,
                           last_sample=x_corr, count=state.count + 1)
    return new_state, x_next.astype(x_t.dtype)


def dpm_step(sched: Schedule, cfg: ScheduleConfig, state: DPMState, eps, t,
             t_prev, x_t, first_order=False):
    """One DPM-Solver++(2M) step t → t_prev.  Returns (new_state, x_prev).

    Exact multistep form (Lu et al. 2022, data-prediction 2M): with the
    previous model point's log-SNR λ_{s1} carried in the state,
    r0 = (λ_t − λ_{s1}) / h and D1 = (x0 − x0_prev)/r0, giving the
    update x_prev = (σ_p/σ_t)·x − α_p·expm1(−h)·(x0 + D1/2).  The first
    step — and, when ``first_order`` is set (the lower-order-final safeguard
    for small step counts), the last — falls back to first order.
    """
    a_t = sched.alphas_cumprod[t]
    a_prev = jnp.where(t_prev >= 0,
                       sched.alphas_cumprod[jnp.maximum(t_prev, 0)],
                       sched.final_alpha_cumprod)
    xf = x_t.astype(jnp.float32)
    ef = eps.astype(jnp.float32)

    alpha_t, sigma_t = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
    alpha_p, sigma_p = jnp.sqrt(a_prev), jnp.sqrt(1.0 - a_prev)
    x0 = (xf - sigma_t * ef) / alpha_t

    lam_t = _lambda_of(a_t)
    lam_p = _lambda_of(a_prev)
    h = lam_p - lam_t          # > 0 (λ grows as t falls)
    h_prev = lam_t - state.prev_lambda

    use_2nd = jnp.logical_and(state.count > 0,
                              jnp.logical_not(jnp.asarray(first_order)))
    r0 = jnp.where(use_2nd, h_prev / h, 1.0)  # guarded: no NaN through where
    d1 = (x0 - state.prev_x0) / r0
    x0_2m = jnp.where(use_2nd, x0 + 0.5 * d1, x0)

    phi = jnp.expm1(-h)
    x_prev = (sigma_p / sigma_t) * xf - alpha_p * phi * x0_2m

    return DPMState(prev_x0=x0, prev_lambda=lam_t, count=state.count + 1), \
        x_prev.astype(x_t.dtype)


# ---------------------------------------------------------------------------
# LCM — Latent Consistency Models (Luo et al. 2023, arXiv:2310.04378)


def lcm_timesteps(cfg: ScheduleConfig, num_inference_steps: int,
                  original_inference_steps: int = 50) -> jnp.ndarray:
    """The LCM inference grid (descending int32 timesteps).

    Consistency distillation trains on a COARSE sub-grid of the 1000-step
    schedule (``original_inference_steps`` teacher steps, diffusers
    LCMScheduler default 50); inference picks ``num_inference_steps``
    evenly from it, highest-noise first — so a 4-step run lands exactly on
    distilled timesteps (999, 759, 519, 279 for the SD grid).
    """
    import numpy as np

    if not 0 < num_inference_steps <= original_inference_steps:
        raise ValueError(
            f"LCM num_inference_steps must be in [1, "
            f"{original_inference_steps}] (the distillation grid size), "
            f"got {num_inference_steps}")
    if cfg.num_train_timesteps % original_inference_steps:
        raise ValueError(
            f"original_inference_steps ({original_inference_steps}) must "
            f"divide num_train_timesteps ({cfg.num_train_timesteps})")
    k = cfg.num_train_timesteps // original_inference_steps
    origin = np.arange(1, original_inference_steps + 1) * k - 1
    skip = original_inference_steps // num_inference_steps
    ts = origin[::-1][::skip][:num_inference_steps]
    return jnp.asarray(np.ascontiguousarray(ts), jnp.int32)


def lcm_boundary_scalings(t, timestep_scaling: float = 10.0,
                          sigma_data: float = 0.5):
    """(c_skip, c_out) boundary-condition scalings at integer timestep t.

    The consistency function must satisfy f(x, 0) = x; the EDM-style
    parameterisation c_skip·x + c_out·x0 enforces it smoothly
    (c_skip(0)=1, c_out(0)=0).  ``timestep_scaling`` 10 and σ_data 0.5 are
    the LCM defaults baked into published distilled checkpoints.
    """
    s = jnp.asarray(t, jnp.float32) * timestep_scaling
    c_skip = sigma_data ** 2 / (s ** 2 + sigma_data ** 2)
    c_out = s / jnp.sqrt(s ** 2 + sigma_data ** 2)
    return c_skip, c_out


def lcm_step(sched: Schedule, x0_t, t, t_next, x_t, noise, last_step=False):
    """One LCM step t → t_next.

    The distilled model's x0 prediction (via ``to_eps_x0`` — any
    prediction_type) is blended with the boundary condition into the
    consistency output f(x_t, t) = c_skip·x_t + c_out·x0; intermediate
    steps RE-NOISE it to the next grid point with FRESH noise (the
    multistep consistency chain), the final step returns it clean.
    """
    xf = x_t.astype(jnp.float32)
    c_skip, c_out = lcm_boundary_scalings(t)
    denoised = c_skip * xf + c_out * x0_t.astype(jnp.float32)
    a_next = sched.alphas_cumprod[jnp.maximum(t_next, 0)]
    noised = (jnp.sqrt(a_next) * denoised
              + jnp.sqrt(1.0 - a_next) * noise.astype(jnp.float32))
    out = jnp.where(jnp.asarray(last_step), denoised, noised)
    return out.astype(x_t.dtype)
