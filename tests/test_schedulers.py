"""Scheduler numerics: beta schedule, add_noise, DDIM/PNDM/DDPM step identities."""
import jax
import jax.numpy as jnp
import numpy as np

from sdbc_tpu.diffusion import schedulers as S

CFG = S.ScheduleConfig.sd15()
SCHED = S.make_schedule(CFG)


def test_beta_schedule_endpoints():
    betas = np.asarray(SCHED.betas)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-5)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-5)
    # scaled_linear: sqrt(beta) is linear
    sq = np.sqrt(betas)
    np.testing.assert_allclose(np.diff(sq), np.diff(sq)[0], rtol=1e-3)
    ac = np.asarray(SCHED.alphas_cumprod)
    assert np.all(np.diff(ac) < 0) and 0 < ac[-1] < ac[0] < 1


def test_final_alpha_cumprod_flag():
    assert np.isclose(float(SCHED.final_alpha_cumprod),
                      float(SCHED.alphas_cumprod[0]))  # set_alpha_to_one=False
    s2 = S.make_schedule(S.ScheduleConfig(set_alpha_to_one=True))
    assert float(s2.final_alpha_cumprod) == 1.0


def test_add_noise_limits():
    x0 = jnp.ones((2, 4, 4, 1))
    noise = jnp.full((2, 4, 4, 1), 2.0)
    near0 = S.ddpm_add_noise(SCHED, x0, noise, jnp.array([0, 0]))
    a0 = float(SCHED.alphas_cumprod[0])
    np.testing.assert_allclose(np.asarray(near0),
                               np.sqrt(a0) * 1 + np.sqrt(1 - a0) * 2, rtol=1e-5)
    nearT = S.ddpm_add_noise(SCHED, x0, noise, jnp.array([999, 999]))
    aT = float(SCHED.alphas_cumprod[999])
    np.testing.assert_allclose(np.asarray(nearT),
                               np.sqrt(aT) * 1 + np.sqrt(1 - aT) * 2, rtol=1e-4)


def test_ddim_step_recovers_x0_with_true_eps():
    """If eps is the exact noise, repeated DDIM inversion preserves pred-x0."""
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (1, 4, 4, 2))
    noise = jax.random.normal(jax.random.key(1), (1, 4, 4, 2))
    t = jnp.asarray(801)
    x_t = S.ddpm_add_noise(SCHED, x0, noise, t[None])[0][None]
    # step to t_prev: result must equal closed-form q-sample at t_prev with same noise
    t_prev = jnp.asarray(781)
    x_prev = S.ddim_step(SCHED, noise, t, t_prev, x_t)
    expect = S.ddpm_add_noise(SCHED, x0, noise, t_prev[None])
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expect), atol=1e-4)


def test_ddim_timesteps_sequence():
    ts = np.asarray(S.ddim_timesteps(CFG, 50))
    assert ts.shape == (50,)
    assert ts[0] == 980 and ts[-1] == 0  # 1000/50=20 ratio, offset 0, descending
    assert np.all(np.diff(ts) == -20)


def test_ddim_timesteps_match_diffusers_072_reference_construction():
    """The reference builds DDIMScheduler WITHOUT steps_offset
    (/root/reference/inference.py:386-387), which defaults to 0 in
    diffusers 0.7.2.  Its set_timesteps formula is
    (arange(N) * (T // N)).round()[::-1] + steps_offset."""
    for n in (50, 25, 10, 4):
        ratio = 1000 // n
        expect = (np.arange(0, n) * ratio).round()[::-1].astype(np.int64)
        got = np.asarray(S.ddim_timesteps(CFG, n))
        np.testing.assert_array_equal(got, expect)
    # a checkpoint config carrying steps_offset=1 still shifts the grid
    cfg1 = S.ScheduleConfig(steps_offset=1)
    np.testing.assert_array_equal(np.asarray(S.ddim_timesteps(cfg1, 50)),
                                  (np.arange(50) * 20)[::-1] + 1)


def test_pndm_timesteps_match_diffusers_072_reference_construction():
    """The reference's PNDM fallback (/root/reference/utils.py:222-224) uses
    skip_prk_steps=True and no steps_offset.  diffusers-0.7.2 plms_timesteps =
    concat(_ts[:-1], _ts[-2:-1], _ts[-1:])[::-1] with
    _ts = arange(N) * (T // N) + steps_offset (ascending)."""
    for n in (50, 10):
        ratio = 1000 // n
        asc = np.arange(0, n) * ratio
        expect = np.concatenate(
            [asc[:-1], asc[-2:-1], asc[-1:]])[::-1].astype(np.int64)
        got = np.asarray(S.pndm_timesteps(CFG, n))
        np.testing.assert_array_equal(got, expect)


def test_ddpm_step_no_noise_at_t0():
    eps = jnp.zeros((1, 2, 2, 1))
    x = jnp.ones((1, 2, 2, 1))
    out1 = S.ddpm_step(SCHED, eps, jnp.asarray(0), x, jax.random.key(0))
    out2 = S.ddpm_step(SCHED, eps, jnp.asarray(0), x, jax.random.key(9))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_pndm_timesteps_and_warmup():
    ts = np.asarray(S.pndm_timesteps(CFG, 50))
    assert ts.shape == (51,)
    assert ts[0] == 980 and ts[1] == ts[2] == 960  # doubled second step
    state = S.pndm_init_state((1, 2, 2, 1))
    assert int(state.count) == 0


def test_pndm_first_step_matches_ddim():
    """With an empty eps history, PLMS's first step is the DDIM-style update."""
    x0 = jax.random.normal(jax.random.key(2), (1, 4, 4, 2))
    noise = jax.random.normal(jax.random.key(3), (1, 4, 4, 2))
    t = jnp.asarray(981)
    x_t = S.ddpm_add_noise(SCHED, x0, noise, t[None])
    state = S.pndm_init_state(x_t.shape)
    _, x_prev = S.pndm_step(SCHED, CFG, state, noise, t, x_t, 50)
    ref = S.ddim_step(SCHED, noise, t, t - 20, x_t)
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(ref), atol=1e-4)


def test_pndm_multistep_runs_finite():
    x = jax.random.normal(jax.random.key(4), (1, 4, 4, 2))
    state = S.pndm_init_state(x.shape)
    ts = S.pndm_timesteps(CFG, 10)
    for i in range(int(ts.shape[0])):
        eps = x * 0.1
        state, x = S.pndm_step(SCHED, CFG, state, eps, ts[i], x, 10)
    assert np.all(np.isfinite(np.asarray(x)))
    assert int(state.count) == int(ts.shape[0])


def test_pndm_constant_eps_matches_closed_form():
    """With a constant eps field every multistep average equals eps, so the
    PLMS trajectory must equal the closed-form _get_prev_sample chain over
    the PLMS timestep sequence — validates the ring buffer + warmup logic."""
    steps = 10
    ts = np.asarray(S.pndm_timesteps(CFG, steps))
    ratio = CFG.num_train_timesteps // steps
    eps = jnp.full((1, 2, 2, 1), 0.3)
    x = jnp.ones((1, 2, 2, 1))

    state = S.pndm_init_state(x.shape)
    x_pndm = x
    for i in range(len(ts)):
        state, x_pndm = S.pndm_step(SCHED, CFG, state, eps, jnp.asarray(ts[i]),
                                    x_pndm, steps)

    # closed-form: same sequence of (t_eff → t_prev) transitions with eps
    def prev_sample(x, t, t_prev):
        a_t = np.asarray(SCHED.alphas_cumprod)[t]
        a_prev = (np.asarray(SCHED.alphas_cumprod)[t_prev] if t_prev >= 0
                  else float(SCHED.final_alpha_cumprod))
        denom = a_t * np.sqrt(1 - a_prev) + np.sqrt(a_t * a_prev * (1 - a_t))
        return (np.sqrt(a_prev / a_t) * np.asarray(x)
                - (a_prev - a_t) * 0.3 / denom)

    x_ref = np.asarray(x, np.float64)
    # transitions: step0: ts[0]→ts[0]-r; step1 (counter==1): ts[1]+r→ts[1]
    # applied to the ORIGINAL x (cur_sample); then ts[2]→ts[2]-r, ...
    x0_saved = x_ref.copy()
    x_ref = prev_sample(x_ref, ts[0], ts[0] - ratio)
    x_ref = prev_sample(x0_saved, ts[1] + ratio, ts[1])
    for i in range(2, len(ts)):
        x_ref = prev_sample(x_ref, ts[i], ts[i] - ratio)

    np.testing.assert_allclose(np.asarray(x_pndm), x_ref, rtol=1e-4)


def test_dpm_first_order_step_recovers_qsample():
    """With exact eps, the first DPM-Solver++ step maps x_t exactly onto the
    closed-form q-sample at t_prev (same invariant DDIM satisfies)."""
    x0 = jax.random.normal(jax.random.key(7), (1, 4, 4, 2))
    noise = jax.random.normal(jax.random.key(8), (1, 4, 4, 2))
    t = jnp.asarray(801)
    x_t = S.ddpm_add_noise(SCHED, x0, noise, t[None])
    state = S.dpm_init_state(x_t.shape)
    _, x_prev = S.dpm_step(SCHED, CFG, state, noise, t, jnp.asarray(781), x_t)
    expect = S.ddpm_add_noise(SCHED, x0, noise, jnp.asarray(781)[None])
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expect),
                               atol=1e-4)


def test_dpm_multistep_runs_finite_and_uses_history():
    x = jax.random.normal(jax.random.key(9), (1, 4, 4, 2))
    state = S.dpm_init_state(x.shape)
    ts = S.dpm_timesteps(CFG, 10)
    ratio = CFG.num_train_timesteps // 10
    for i in range(10):
        eps = x * 0.1
        state, x = S.dpm_step(SCHED, CFG, state, eps, ts[i], ts[i] - ratio, x)
    assert np.all(np.isfinite(np.asarray(x)))
    assert int(state.count) == 10


def test_dpm_second_order_exact_coefficient():
    """Two DPM-2M steps on a NON-uniform lambda grid must match the exact
    multistep closed form (r0 = h_prev/h), not the r0=1 simplification."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    eps1 = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    eps2 = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    t0, t1, t2 = 901, 481, 381  # non-uniform spacing → h_prev != h

    state = S.dpm_init_state(x.shape)
    state, x1 = S.dpm_step(SCHED, CFG, state, eps1, jnp.asarray(t0),
                           jnp.asarray(t1), x)
    state, x2 = S.dpm_step(SCHED, CFG, state, eps2, jnp.asarray(t1),
                           jnp.asarray(t2), x1)

    ac = np.asarray(SCHED.alphas_cumprod, np.float64)

    def coeffs(t):
        a, s = np.sqrt(ac[t]), np.sqrt(1 - ac[t])
        return a, s, np.log(a) - np.log(s)

    a0, s0, l0 = coeffs(t0)
    a1, s1, l1 = coeffs(t1)
    a2, s2, l2 = coeffs(t2)
    xn = np.asarray(x, np.float64)
    x0_1 = (xn - s0 * np.asarray(eps1, np.float64)) / a0
    h1 = l1 - l0
    x1_ref = (s1 / s0) * xn - a1 * np.expm1(-h1) * x0_1
    x0_2 = (x1_ref - s1 * np.asarray(eps2, np.float64)) / a1
    h2, h_prev = l2 - l1, l1 - l0
    r0 = h_prev / h2
    d1 = (x0_2 - x0_1) / r0
    x2_ref = (s2 / s1) * x1_ref - a2 * np.expm1(-h2) * (x0_2 + 0.5 * d1)

    np.testing.assert_allclose(np.asarray(x1), x1_ref, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x2), x2_ref, rtol=2e-4, atol=1e-5)


def test_dpm_lower_order_final():
    """first_order=True forces the first-order update even with history."""
    x = jax.random.normal(jax.random.key(13), (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.key(14), (1, 4, 4, 2))
    state = S.dpm_init_state(x.shape)
    state, x1 = S.dpm_step(SCHED, CFG, state, eps, jnp.asarray(801),
                           jnp.asarray(401), x)
    _, x2_first = S.dpm_step(SCHED, CFG, state, eps, jnp.asarray(401),
                             jnp.asarray(1), x1, first_order=True)
    fresh = S.dpm_init_state(x.shape)
    _, x2_ref = S.dpm_step(SCHED, CFG, fresh, eps, jnp.asarray(401),
                           jnp.asarray(1), x1)
    np.testing.assert_allclose(np.asarray(x2_first), np.asarray(x2_ref),
                               atol=1e-6)


def test_v_prediction_roundtrip():
    """eps↔v conversions are exact inverses; v-pred DDIM step with the exact
    velocity matches the eps-pred step with the exact noise."""
    x0 = jax.random.normal(jax.random.key(11), (1, 4, 4, 2))
    noise = jax.random.normal(jax.random.key(12), (1, 4, 4, 2))
    t = jnp.asarray(601)
    x_t = S.ddpm_add_noise(SCHED, x0, noise, t[None])
    v = S.velocity_target(SCHED, x0, noise, t[None])
    eps_back, x0_back = S.to_eps_x0(SCHED, v, t, x_t, "v_prediction")
    np.testing.assert_allclose(np.asarray(eps_back), np.asarray(noise),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0_back), np.asarray(x0), atol=1e-5)
    step_eps = S.ddim_step(SCHED, noise, t, jnp.asarray(581), x_t)
    step_v = S.ddim_step(SCHED, v, t, jnp.asarray(581), x_t,
                         prediction_type="v_prediction")
    np.testing.assert_allclose(np.asarray(step_v), np.asarray(step_eps),
                               atol=1e-4)


def test_ddim_eta_variance():
    """eta>0 adds the diffusers DDIM variance: at eta=1 sigma_t equals the
    DDPM posterior std; eta=0 stays the deterministic path; eta>0 without
    noise raises."""
    import pytest

    key = jax.random.key(0)
    x_t = jax.random.normal(key, (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.key(1), x_t.shape)
    t, t_prev = jnp.asarray(601), jnp.asarray(581)

    det = S.ddim_step(SCHED, eps, t, t_prev, x_t)
    # zero noise at eta=1: the deterministic part shrinks by sigma^2
    z0 = S.ddim_step(SCHED, eps, t, t_prev, x_t, eta=1.0,
                     noise=jnp.zeros_like(x_t))
    a_t = float(SCHED.alphas_cumprod[601])
    a_prev = float(SCHED.alphas_cumprod[581])
    beta_tilde = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
    # reconstruct sigma from the two runs: with unit noise n=1s,
    # step(eta=1, n) - step(eta=1, 0) == sigma * 1
    ones = S.ddim_step(SCHED, eps, t, t_prev, x_t, eta=1.0,
                       noise=jnp.ones_like(x_t))
    sigma = float(jnp.mean(ones - z0))
    np.testing.assert_allclose(sigma, np.sqrt(beta_tilde), rtol=1e-4)
    # direction coefficient shrinks: sqrt(1-a_prev-sigma^2) < sqrt(1-a_prev)
    assert not np.allclose(np.asarray(det), np.asarray(z0))
    with pytest.raises(ValueError, match="noise"):
        S.ddim_step(SCHED, eps, t, t_prev, x_t, eta=0.5)


def test_ddpm_strided_posterior_identities():
    """ddpm_step over an arbitrary stride must keep the forward-process
    marginals: stepping exact x_t = sqrt(a_t) x0 + sqrt(1-a_t) n with the
    true-eps oracle yields signal coef sqrt(a_prev) and TOTAL noise
    variance 1 - a_prev. The one-step-back posterior (diffusers 0.7.2's
    DDPM bug) fails these at stride > 1 — a 50-step chain would retain
    ~91% of the initial noise."""
    ac = np.asarray(SCHED.alphas_cumprod, np.float64)
    key = jax.random.key(3)
    x = jnp.full((1, 4, 4, 1), 0.73, jnp.float32)
    e = jnp.full((1, 4, 4, 1), -0.41, jnp.float32)
    z = jnp.zeros_like(x)

    for t_, tp_ in [(980, 960), (510, 490), (19, -1)]:
        t = jnp.asarray(t_)
        step = lambda xv, ev: np.asarray(S.ddpm_step(
            SCHED, ev, t, xv, key, clip_sample=False,
            t_prev=jnp.asarray(tp_)))[0, 0, 0, 0]
        # the step is affine in (x, eps) with key-fixed additive noise:
        # extract A (x coef), B (eps coef), and the noise term
        A = (step(2 * x, z) - step(x, z)) / 0.73
        B = (step(x, 2 * e) - step(x, e)) / -0.41
        noise_term = step(x, e) - A * 0.73 - B * -0.41
        a_t, a_prev = ac[t_], (ac[tp_] if tp_ >= 0 else 1.0)
        # variance of the additive noise: beta_step (1-a_prev)/(1-a_t)
        var = (1 - a_t / a_prev) * (1 - a_prev) / (1 - a_t)
        # signal: A sqrt(a_t) == sqrt(a_prev)
        np.testing.assert_allclose(A * np.sqrt(a_t), np.sqrt(a_prev),
                                   rtol=1e-5)
        # total noise: (A sqrt(1-a_t) + B)^2 + var == 1 - a_prev
        C = A * np.sqrt(1 - a_t) + B
        np.testing.assert_allclose(C * C + var, 1 - a_prev, atol=1e-6)
        if tp_ < 0:
            assert noise_term == 0.0  # final step adds no noise


def test_inference_steps_bounds():
    """num_inference_steps > T would make the stride 0 (all timesteps
    collapse; every step a no-op; pure-noise output) — reject up front."""
    import pytest

    for bad in (0, 1001, 1500):
        with pytest.raises(ValueError, match="num_inference_steps"):
            S.inference_stride(CFG, bad)
    assert S.inference_stride(CFG, 1000) == 1


def test_euler_plain_step_equals_ddim():
    """The non-ancestral Euler step in VE coordinates is algebraically the
    DDIM (eta=0) update — x0 + sigma_prev*eps in VE — on any non-final
    stride (the final step differs by design: Euler's grid terminates at
    sigma=0 while DDIM uses final_alpha_cumprod)."""
    x_t = jax.random.normal(jax.random.key(20), (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.key(21), x_t.shape)
    for t, t_prev in ((981, 961), (601, 581), (41, 21), (21, 1)):
        a = S.euler_step(SCHED, eps, jnp.asarray(t), jnp.asarray(t_prev), x_t)
        b = S.ddim_step(SCHED, eps, jnp.asarray(t), jnp.asarray(t_prev), x_t)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_euler_ancestral_step():
    """k-diffusion ancestral split: sigma_down^2 + sigma_up^2 = sigma_prev^2
    (zero-noise ancestral == plain Euler to sigma_down), the final step
    returns the x0 prediction exactly, and noise is required."""
    import pytest

    x0 = jax.random.normal(jax.random.key(22), (1, 4, 4, 2))
    noise = jax.random.normal(jax.random.key(23), x0.shape)
    t, t_prev = jnp.asarray(601), jnp.asarray(581)
    x_t = S.ddpm_add_noise(SCHED, x0, noise, t[None])

    with pytest.raises(ValueError, match="needs `noise`"):
        S.euler_step(SCHED, noise, t, t_prev, x_t, ancestral=True)

    # variance split: with unit noise, (out - zero-noise out) has std
    # sigma_up * sqrt(a_prev); check against the closed form
    z = jax.random.normal(jax.random.key(24), x_t.shape)
    out_z = S.euler_step(SCHED, noise, t, t_prev, x_t, noise=z,
                         ancestral=True)
    out_0 = S.euler_step(SCHED, noise, t, t_prev, x_t,
                         noise=jnp.zeros_like(z), ancestral=True)
    a_t = float(SCHED.alphas_cumprod[601])
    a_p = float(SCHED.alphas_cumprod[581])
    s_t2 = (1 - a_t) / a_t
    s_p2 = (1 - a_p) / a_p
    s_up = (s_p2 * (s_t2 - s_p2) / s_t2) ** 0.5
    np.testing.assert_allclose(np.asarray(out_z - out_0),
                               np.asarray(z) * s_up * a_p ** 0.5, atol=1e-5)

    # final step (t_prev < 0): sigma_prev = 0 so sigma_up = sigma_down = 0
    # and the output is exactly the x0 prediction regardless of noise
    fin = S.euler_step(SCHED, noise, jnp.asarray(1), jnp.asarray(-19), x_t,
                       noise=z, ancestral=True)
    _, x0_pred = S.to_eps_x0(SCHED, noise, jnp.asarray(1), x_t, "epsilon")
    np.testing.assert_allclose(np.asarray(fin), np.asarray(x0_pred),
                               atol=1e-5)


def test_lms_coeff_table_invariants():
    """Row 0 is pure Euler (one term = Δσ); every row's terms sum to Δσ
    (the Lagrange basis sums to 1, so the integral of the sum is Δσ);
    unused history slots are exactly zero."""
    n = 10
    tab = np.asarray(S.lms_coeff_table(CFG, n))
    ratio = CFG.num_train_timesteps // n
    ts = (np.arange(n) * ratio + CFG.steps_offset)[::-1]
    ac = np.asarray(SCHED.alphas_cumprod)[ts].astype(np.float64)
    sig = np.append(np.sqrt((1 - ac) / ac), 0.0)
    dsig = sig[1:] - sig[:-1]
    assert tab.shape == (n, 4)
    np.testing.assert_allclose(tab[0], [dsig[0], 0, 0, 0], rtol=1e-5)
    assert np.all(tab[0, 1:] == 0) and np.all(tab[1, 2:] == 0) \
        and np.all(tab[2, 3:] == 0)
    np.testing.assert_allclose(tab.sum(axis=1), dsig, rtol=2e-4)


def test_lms_first_step_equals_euler():
    """With an empty history the LMS step is exactly the plain Euler step
    (row 0 coefficient = σ_prev − σ_t)."""
    n = 10
    tab = S.lms_coeff_table(CFG, n)
    ts = np.asarray(S.lms_timesteps(CFG, n))
    ratio = CFG.num_train_timesteps // n
    x_t = jax.random.normal(jax.random.key(30), (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.key(31), x_t.shape)
    state = S.lms_init_state(x_t.shape)
    t = jnp.asarray(int(ts[0]))
    _, a = S.lms_step(SCHED, state, eps, t, t - ratio, x_t, tab[0])
    b = S.euler_step(SCHED, eps, t, t - ratio, x_t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_lms_constant_eps_collapses_to_euler_chain():
    """With a CONSTANT model output the multistep history is constant, so
    every coefficient row contracts (sum = Δσ) and the whole LMS chain
    equals the plain Euler chain — catching any history-ordering or
    coefficient-indexing bug."""
    n = 8
    tab = S.lms_coeff_table(CFG, n)
    ts = np.asarray(S.lms_timesteps(CFG, n))
    ratio = CFG.num_train_timesteps // n
    eps = jax.random.normal(jax.random.key(33), (1, 4, 4, 2)) * 0.3
    x_lms = x_eul = jax.random.normal(jax.random.key(34), eps.shape)
    state = S.lms_init_state(eps.shape)
    for i, t in enumerate(ts):
        t = jnp.asarray(int(t))
        state, x_lms = S.lms_step(SCHED, state, eps, t, t - ratio,
                                  x_lms, tab[i])
        x_eul = S.euler_step(SCHED, eps, t, t - ratio, x_eul)
        np.testing.assert_allclose(np.asarray(x_lms), np.asarray(x_eul),
                                   rtol=2e-4, atol=2e-4)
    assert np.isfinite(np.asarray(x_lms)).all()


def test_lms_uses_history():
    """A varying model output must produce a different trajectory than
    Euler from step 2 on (the 2nd-order correction kicks in)."""
    n = 8
    tab = S.lms_coeff_table(CFG, n)
    ts = np.asarray(S.lms_timesteps(CFG, n))
    ratio = CFG.num_train_timesteps // n
    key = jax.random.key(35)
    x_lms = x_eul = jax.random.normal(jax.random.key(36), (1, 4, 4, 2))
    state = S.lms_init_state(x_lms.shape)
    for i, t in enumerate(ts[:3]):
        key, sub = jax.random.split(key)
        eps = jax.random.normal(sub, x_lms.shape)
        t = jnp.asarray(int(t))
        state, x_lms = S.lms_step(SCHED, state, eps, t, t - ratio,
                                  x_lms, tab[i])
        x_eul = S.euler_step(SCHED, eps, t, t - ratio, x_eul)
    assert np.abs(np.asarray(x_lms) - np.asarray(x_eul)).max() > 1e-4


# ---------------------------------------------------------------------------
# Karras sigma grid (arXiv:2206.00364)


def _grid_sigmas(n):
    """(σ of the leading integer grid, descending) for n steps."""
    ratio = S.inference_stride(CFG, n)
    ts = (np.arange(n) * ratio + CFG.steps_offset)[::-1]
    ac = np.asarray(SCHED.alphas_cumprod, np.float64)
    return np.sqrt((1.0 - ac[ts]) / ac[ts]), ts


def test_karras_grid_endpoints_and_monotone():
    n = 25
    sig_lead, _ = _grid_sigmas(n)
    sigmas, ts_f = map(np.asarray, S.karras_grid(CFG, n))
    assert sigmas.shape == (n + 1,)
    assert ts_f.shape == (n,)
    # same endpoints as the leading grid, terminal 0 appended
    np.testing.assert_allclose(sigmas[0], sig_lead[0], rtol=1e-4)
    np.testing.assert_allclose(sigmas[n - 1], sig_lead[-1], rtol=1e-4)
    assert sigmas[n] == 0.0
    assert np.all(np.diff(sigmas) < 0)
    # timesteps descend within the training grid
    assert np.all(np.diff(ts_f) < 0)
    assert ts_f[0] <= CFG.num_train_timesteps - 1 and ts_f[-1] >= 0


def test_karras_sigma_to_t_inverts_table_points():
    """σ values that sit exactly on the training table map back to their
    integer timestep (the log-sigma interpolation is exact at knots)."""
    n = 25
    sig_lead, ts_int = _grid_sigmas(n)
    _, ts_f = map(np.asarray, S.karras_grid(CFG, n))
    # endpoints of the ramp are exactly the grid's σ endpoints
    np.testing.assert_allclose(ts_f[0], ts_int[0], atol=1e-3)
    np.testing.assert_allclose(ts_f[-1], ts_int[-1], atol=1e-3)


def test_euler_step_sigma_matches_integer_grid():
    """On the integer grid's own sigmas the σ-space step reproduces
    euler_step bit-for-bit (incl. the terminal σ=0 ⇒ ā_prev=1 step)."""
    rng = np.random.default_rng(0)
    x_t = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=x_t.shape).astype(np.float32))
    z = jnp.asarray(rng.normal(size=x_t.shape).astype(np.float32))
    ac = np.asarray(SCHED.alphas_cumprod, np.float64)
    for t, t_prev in [(981, 941), (41, 1), (1, -39)]:
        s_t = np.sqrt((1 - ac[t]) / ac[t])
        s_p = np.sqrt((1 - ac[t_prev]) / ac[t_prev]) if t_prev >= 0 else 0.0
        for anc in (False, True):
            a = S.euler_step(SCHED, eps, jnp.asarray(t), jnp.asarray(t_prev),
                             x_t, noise=z, ancestral=anc)
            b = S.euler_step_sigma(eps, jnp.asarray(s_t, jnp.float32),
                                   jnp.asarray(s_p, jnp.float32), x_t,
                                   noise=z, ancestral=anc)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)


def test_lms_coeff_table_sigmas_matches_integer_grid():
    n = 10
    # the same float64 training sigmas lms_coeff_table derives internally
    ratio = S.inference_stride(CFG, n)
    ts = (np.arange(n) * ratio + CFG.steps_offset)[::-1]
    sig_lead = np.exp(S._train_log_sigmas(CFG)[ts])
    sig = np.append(sig_lead, 0.0)
    a = np.asarray(S.lms_coeff_table(CFG, n))
    b = np.asarray(S.lms_coeff_table_sigmas(sig))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_lms_step_sigma_matches_integer_grid():
    rng = np.random.default_rng(1)
    x_t = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=x_t.shape).astype(np.float32))
    coeff = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    st = S.lms_init_state(x_t.shape)
    ac = np.asarray(SCHED.alphas_cumprod, np.float64)
    t, t_prev = 501, 481
    s_t = np.sqrt((1 - ac[t]) / ac[t])
    s_p = np.sqrt((1 - ac[t_prev]) / ac[t_prev])
    st_a, a = S.lms_step(SCHED, st, eps, jnp.asarray(t), jnp.asarray(t_prev),
                         x_t, coeff)
    st_b, b = S.lms_step_sigma(st, eps, jnp.asarray(s_t, jnp.float32),
                               jnp.asarray(s_p, jnp.float32), x_t, coeff)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_a.ders), np.asarray(st_b.ders))


def test_dpm_step_sigma_matches_integer_grid():
    """Non-terminal steps agree with dpm_step on the grid's own sigmas
    (the terminal step deliberately differs: karras ends at σ=0 ⇒ ā=1,
    the integer grid at final_alpha_cumprod = ā_0)."""
    rng = np.random.default_rng(2)
    x_t = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=x_t.shape).astype(np.float32))
    ac = np.asarray(SCHED.alphas_cumprod, np.float64)
    st_a = st_b = S.dpm_init_state(x_t.shape)
    for t, t_prev in [(981, 941), (941, 901)]:
        s_t = np.sqrt((1 - ac[t]) / ac[t])
        s_p = np.sqrt((1 - ac[t_prev]) / ac[t_prev])
        st_a, a = S.dpm_step(SCHED, CFG, st_a, eps, jnp.asarray(t),
                             jnp.asarray(t_prev), x_t)
        st_b, b = S.dpm_step_sigma(st_b, eps, jnp.asarray(s_t, jnp.float32),
                                   jnp.asarray(s_p, jnp.float32), x_t)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-5)
        x_t = a


def test_dpm_step_sigma_terminal_returns_x0():
    """σ_prev = 0 returns the x0 prediction exactly (first-order step)."""
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    eps = rng.normal(size=x0.shape).astype(np.float32)
    ac = np.asarray(SCHED.alphas_cumprod, np.float64)
    t = 41
    s_t = np.sqrt((1 - ac[t]) / ac[t])
    x_t = np.sqrt(ac[t]) * x0 + np.sqrt(1 - ac[t]) * eps
    st = S.dpm_init_state(x0.shape)
    _, out = S.dpm_step_sigma(st, jnp.asarray(eps),
                              jnp.asarray(s_t, jnp.float32),
                              jnp.asarray(0.0, jnp.float32),
                              jnp.asarray(x_t.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(out), x0, rtol=1e-4, atol=1e-4)


def test_sigma_to_eps_x0_matches_to_eps_x0_on_grid():
    rng = np.random.default_rng(4)
    x_t = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    mo = jnp.asarray(rng.normal(size=x_t.shape).astype(np.float32))
    ac = np.asarray(SCHED.alphas_cumprod, np.float64)
    t = 321
    s_t = jnp.asarray(np.sqrt((1 - ac[t]) / ac[t]), jnp.float32)
    for pt in ("epsilon", "v_prediction"):
        e_a, x_a = S.to_eps_x0(SCHED, mo, jnp.asarray(t), x_t, pt)
        e_b, x_b = S.sigma_to_eps_x0(mo, s_t, x_t, pt)
        np.testing.assert_allclose(np.asarray(e_a), np.asarray(e_b),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_b),
                                   rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# UniPC (arXiv:2302.04867, bh2 data-prediction, order 2)


def _lam_np(t):
    ac = np.asarray(SCHED.alphas_cumprod, np.float64)
    a = ac[t]
    return np.sqrt(a), np.sqrt(1 - a), 0.5 * (np.log(a) - np.log(1 - a))


def test_unipc_first_step_equals_dpm_first_order():
    """A fresh UniPC step has no history: no corrector, order-1 predictor —
    exactly the first-order DPM-Solver++ update (== DDIM eta=0)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    t, tp = jnp.asarray(801), jnp.asarray(601)
    _, x0 = S.to_eps_x0(SCHED, eps, t, x, "epsilon")
    st = S.unipc_init_state(x.shape)
    _, x1 = S.unipc_step(SCHED, st, x0, t, tp, x)
    dst = S.dpm_init_state(x.shape)
    _, x1_dpm = S.dpm_step(SCHED, CFG, dst, eps, t, tp, x)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x1_dpm), atol=1e-5)
    x1_ddim = S.ddim_step(SCHED, eps, t, tp, x)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x1_ddim), atol=1e-4)


def test_unipc_exact_oracle_tracks_qsample():
    """With the exact x0 oracle (model returns the true x0 every step) all
    difference terms vanish and each step must land exactly on the forward
    q-sample at the next grid point — UniPC is exact on exact data."""
    rng = np.random.default_rng(7)
    x0_true = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=x0_true.shape).astype(np.float32))
    ts = [901, 701, 501, 301, 101]
    x = S.ddpm_add_noise(SCHED, x0_true, noise, jnp.asarray([ts[0]]))
    st = S.unipc_init_state(x.shape)
    for i, t in enumerate(ts):
        tp = ts[i + 1] if i + 1 < len(ts) else 1
        st, x = S.unipc_step(SCHED, st, x0_true, jnp.asarray(t),
                             jnp.asarray(tp), x,
                             last_step=i == len(ts) - 1)
        expect = S.ddpm_add_noise(SCHED, x0_true, noise, jnp.asarray([tp]))
        np.testing.assert_allclose(np.asarray(x), np.asarray(expect),
                                   atol=2e-4)


def test_unipc_two_steps_closed_form():
    """Step 2 = order-1 corrector (rho=1/2) on the step-1 sample + order-2
    predictor — checked against an independent numpy transcription of the
    bh2 data-prediction formulas (UniPC eqs. 3.10-3.14)."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    x0a = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    x0b = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    t0, t1, t2 = 901, 481, 381  # non-uniform lambda spacing

    st = S.unipc_init_state(x.shape)
    st, x1 = S.unipc_step(SCHED, st, x0a, jnp.asarray(t0), jnp.asarray(t1), x)
    st, x2 = S.unipc_step(SCHED, st, x0b, jnp.asarray(t1), jnp.asarray(t2), x1)

    a0, s0, l0 = _lam_np(t0)
    a1, s1, l1 = _lam_np(t1)
    a2, s2, l2 = _lam_np(t2)
    xn = np.asarray(x, np.float64)
    m_a = np.asarray(x0a, np.float64)
    m_b = np.asarray(x0b, np.float64)

    h1 = l1 - l0
    x1_ref = (s1 / s0) * xn - a1 * np.expm1(-h1) * m_a
    np.testing.assert_allclose(np.asarray(x1), x1_ref, rtol=2e-4, atol=1e-5)

    # corrector (order 1): recompute from last_sample (= x) with rho = 1/2
    bh1_ = np.expm1(-h1)
    x1_corr = ((s1 / s0) * xn - a1 * bh1_ * m_a
               - a1 * bh1_ * 0.5 * (m_b - m_a))
    # predictor (order 2): D1 from the (m_a, l0) history point
    h2 = l2 - l1
    bh2_ = np.expm1(-h2)
    r1p = (l0 - l1) / h2
    d1p = (m_a - m_b) / r1p
    x2_ref = ((s2 / s1) * x1_corr - a2 * bh2_ * m_b
              - a2 * bh2_ * 0.5 * d1p)
    np.testing.assert_allclose(np.asarray(x2), x2_ref, rtol=2e-4, atol=1e-5)


def test_unipc_third_step_corrector_order2_closed_form():
    """Step 3's corrector solves the 2x2 bh2 system — checked against the
    independent numpy transcription on a non-uniform grid."""
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    m = [jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
         for _ in range(3)]
    t0, t1, t2, t3 = 901, 641, 421, 281

    st = S.unipc_init_state(x.shape)
    st, x1 = S.unipc_step(SCHED, st, m[0], jnp.asarray(t0), jnp.asarray(t1), x)
    st, x2 = S.unipc_step(SCHED, st, m[1], jnp.asarray(t1), jnp.asarray(t2), x1)
    st, x3 = S.unipc_step(SCHED, st, m[2], jnp.asarray(t2), jnp.asarray(t3), x2)

    a0, s0, l0 = _lam_np(t0)
    a1, s1, l1 = _lam_np(t1)
    a2, s2, l2 = _lam_np(t2)
    a3, s3, l3 = _lam_np(t3)
    xn = np.asarray(x, np.float64)
    m0_, m1_, m2_ = (np.asarray(v, np.float64) for v in m)

    # --- steps 1-2 (as in the two-step test)
    h1 = l1 - l0
    x1_ref = (s1 / s0) * xn - a1 * np.expm1(-h1) * m0_
    bh_c1 = np.expm1(-h1)
    x1_corr = x1_ref - a1 * bh_c1 * 0.5 * (m1_ - m0_)
    h2 = l2 - l1
    bh_p2 = np.expm1(-h2)
    x2_ref = ((s2 / s1) * x1_corr - a2 * bh_p2 * m1_
              - a2 * bh_p2 * 0.5 * (m0_ - m1_) / ((l0 - l1) / h2))

    # --- step 3 corrector: order 2, h_c = l2 - l1 = h2
    hh = -h2
    hp1 = np.expm1(hh)
    bh = hp1
    hp2 = hp1 / hh - 1.0
    hp3 = hp2 / hh - 0.5
    b1, b2 = hp2 / bh, 2.0 * hp3 / bh
    r1 = (l0 - l1) / h2          # lam1(=l0) relative to lam0(=l1)
    d1_0 = (m0_ - m1_) / r1
    d1_t = m2_ - m1_
    rho1 = (b2 - b1) / (r1 - 1.0)
    rho2 = b1 - rho1
    x2_corr = ((s2 / s1) * x1_corr - a2 * hp1 * m1_
               - a2 * bh * (rho1 * d1_0 + rho2 * d1_t))
    # --- step 3 predictor: order 2 from (m2_, l2) with history (m1_, l1)
    h3 = l3 - l2
    bh_p3 = np.expm1(-h3)
    d1p = (m1_ - m2_) / ((l1 - l2) / h3)
    x3_ref = ((s3 / s2) * x2_corr - a3 * bh_p3 * m2_
              - a3 * bh_p3 * 0.5 * d1p)
    np.testing.assert_allclose(np.asarray(x3), x3_ref, rtol=3e-4, atol=2e-5)


def test_unipc_last_step_first_order_and_terminal_finite():
    """last_step=True drops the predictor's D1 term; the terminal grid step
    (t=0 -> t_prev<0, h=0 under set_alpha_to_one=False) stays finite and
    is an exact no-op after the corrector."""
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    x0a = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    x0b = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    st = S.unipc_init_state(x.shape)
    st, x1 = S.unipc_step(SCHED, st, x0a, jnp.asarray(801), jnp.asarray(401),
                          x)
    _, x2_last = S.unipc_step(SCHED, st, x0b, jnp.asarray(401),
                              jnp.asarray(1), x1, last_step=True)
    # reference: corrector order 1, then FIRST-order predictor
    a0, s0, l0 = _lam_np(801)
    a1, s1, l1 = _lam_np(401)
    a2, s2, l2 = _lam_np(1)
    h1 = l1 - l0
    x1c = (np.asarray(x1, np.float64)
           - a1 * np.expm1(-h1) * 0.5
           * (np.asarray(x0b, np.float64) - np.asarray(x0a, np.float64)))
    h2 = l2 - l1
    x2_ref = ((s2 / s1) * x1c
              - a2 * np.expm1(-h2) * np.asarray(x0b, np.float64))
    np.testing.assert_allclose(np.asarray(x2_last), x2_ref, rtol=2e-4,
                               atol=1e-5)

    # terminal: t=0 with t_prev<0 maps a_prev -> final_alpha_cumprod = a(0)
    st2 = S.unipc_init_state(x.shape)
    st2, xa = S.unipc_step(SCHED, st2, x0a, jnp.asarray(20), jnp.asarray(0),
                           x)
    _, xb = S.unipc_step(SCHED, st2, x0b, jnp.asarray(0), jnp.asarray(-20),
                         xa, last_step=True)
    assert np.all(np.isfinite(np.asarray(xb)))
    # h=0: the predictor must return the corrected sample unchanged
    a1, s1, l1 = _lam_np(20)
    a2, s2, l2 = _lam_np(0)
    hc = l2 - l1
    xa_corr = ((s2 / s1) * np.asarray(x, np.float64)
               - a2 * np.expm1(-hc) * np.asarray(x0a, np.float64)
               - a2 * np.expm1(-hc) * 0.5
               * (np.asarray(x0b, np.float64) - np.asarray(x0a, np.float64)))
    np.testing.assert_allclose(np.asarray(xb), xa_corr, rtol=2e-4, atol=1e-5)


def test_unipc_convergence_beats_ddim():
    """On a solvable linear model (x0-prediction = c*x) the order-2
    predictor-corrector at N=8 must be substantially closer to the dense
    reference trajectory than first-order DDIM at the same N."""
    c = 0.35
    rng = np.random.default_rng(23)
    x_init = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))

    def run(n, method):
        ratio = 1000 // n
        ts = (np.arange(n) * ratio)[::-1]
        x = x_init
        st = S.unipc_init_state(x.shape)
        for i, t in enumerate(ts):
            tp = int(t) - ratio
            x0 = c * x
            if method == "unipc":
                st, x = S.unipc_step(SCHED, st, x0, jnp.asarray(int(t)),
                                     jnp.asarray(tp), x,
                                     last_step=i == n - 1)
            else:
                a_t = SCHED.alphas_cumprod[int(t)]
                eps = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
                x = S.ddim_step(SCHED, eps, jnp.asarray(int(t)),
                                jnp.asarray(tp), x)
        return np.asarray(x, np.float64)

    ref = run(500, "ddim")
    err_unipc = np.abs(run(8, "unipc") - ref).mean()
    err_ddim = np.abs(run(8, "ddim") - ref).mean()
    assert err_unipc < 0.5 * err_ddim, (err_unipc, err_ddim)


# ---------------------------------------------------------------------------
# SDE-DPM-Solver++(2M), midpoint


def test_dpm_sde_preserves_forward_marginals():
    """With the exact data prediction, one SDE step must land exactly on
    alpha_p*x0 + sigma_p*(e^{-h} eps + sqrt(1-e^{-2h}) z) — the forward
    marginal with the old noise contracted and fresh noise topped up."""
    rng = np.random.default_rng(29)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    z = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    t, tp = 801, 601
    x_t = S.ddpm_add_noise(SCHED, x0, eps, jnp.asarray([t]))
    st = S.dpm_init_state(x_t.shape)
    _, x_p = S.dpm_sde_step(SCHED, CFG, st, eps, jnp.asarray(t),
                            jnp.asarray(tp), x_t, z)
    ac = np.asarray(SCHED.alphas_cumprod, np.float64)
    a_t, a_p = ac[t], ac[tp]
    lam = lambda a: 0.5 * (np.log(a) - np.log(1 - a))
    h = lam(a_p) - lam(a_t)
    expect = (np.sqrt(a_p) * np.asarray(x0, np.float64)
              + np.sqrt(1 - a_p) * (np.exp(-h) * np.asarray(eps, np.float64)
                                    + np.sqrt(-np.expm1(-2 * h))
                                    * np.asarray(z, np.float64)))
    np.testing.assert_allclose(np.asarray(x_p), expect, rtol=2e-4, atol=1e-5)


def test_dpm_sde_second_order_closed_form():
    """Two steps on a non-uniform grid vs the midpoint-2M closed form."""
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    eps1 = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    eps2 = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    z1 = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    t0, t1, t2 = 901, 481, 381

    st = S.dpm_init_state(x.shape)
    st, x1 = S.dpm_sde_step(SCHED, CFG, st, eps1, jnp.asarray(t0),
                            jnp.asarray(t1), x, z1)
    st, x2 = S.dpm_sde_step(SCHED, CFG, st, eps2, jnp.asarray(t1),
                            jnp.asarray(t2), x1, z2)

    ac = np.asarray(SCHED.alphas_cumprod, np.float64)

    def co(t):
        a = ac[t]
        return np.sqrt(a), np.sqrt(1 - a), 0.5 * (np.log(a) - np.log(1 - a))

    a0, s0, l0 = co(t0)
    a1, s1, l1 = co(t1)
    a2, s2, l2 = co(t2)
    xn = np.asarray(x, np.float64)
    x0_1 = (xn - s0 * np.asarray(eps1, np.float64)) / a0
    h1 = l1 - l0
    g1 = -np.expm1(-2 * h1)
    x1_ref = ((s1 / s0) * np.exp(-h1) * xn + a1 * g1 * x0_1
              + s1 * np.sqrt(g1) * np.asarray(z1, np.float64))
    np.testing.assert_allclose(np.asarray(x1), x1_ref, rtol=2e-4, atol=1e-5)

    x0_2 = (x1_ref - s1 * np.asarray(eps2, np.float64)) / a1
    h2 = l2 - l1
    g2 = -np.expm1(-2 * h2)
    d1 = (x0_2 - x0_1) / ((l1 - l0) / h2)
    x2_ref = ((s2 / s1) * np.exp(-h2) * x1_ref
              + a2 * g2 * (x0_2 + 0.5 * d1)
              + s2 * np.sqrt(g2) * np.asarray(z2, np.float64))
    np.testing.assert_allclose(np.asarray(x2), x2_ref, rtol=2e-4, atol=1e-5)


def test_dpm_sde_terminal_step_noop_and_sigma_variant():
    """Integer grid: the degenerate terminal step (h=0) returns the sample
    unchanged.  Sigma variant: terminal sigma 0 returns the x0 prediction
    with no noise, and the mid-grid step matches the integer-grid step at
    the grid's own sigmas."""
    rng = np.random.default_rng(37)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    z = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    st = S.dpm_init_state(x.shape)
    _, x_term = S.dpm_sde_step(SCHED, CFG, st, eps, jnp.asarray(0),
                               jnp.asarray(-20), x, z)
    np.testing.assert_allclose(np.asarray(x_term), np.asarray(x), atol=1e-5)

    # sigma variant matches the integer-grid step at matching sigmas
    ac = np.asarray(SCHED.alphas_cumprod, np.float64)
    sg = lambda t: np.sqrt((1 - ac[t]) / ac[t])
    st1 = S.dpm_init_state(x.shape)
    _, a_int = S.dpm_sde_step(SCHED, CFG, st1, eps, jnp.asarray(801),
                              jnp.asarray(601), x, z)
    st2 = S.dpm_init_state(x.shape)
    _, a_sig = S.dpm_sde_step_sigma(st2, eps, jnp.asarray(sg(801),
                                                          jnp.float32),
                                    jnp.asarray(sg(601), jnp.float32), x, z)
    np.testing.assert_allclose(np.asarray(a_sig), np.asarray(a_int),
                               rtol=3e-4, atol=2e-5)

    # terminal sigma 0: x0 prediction, no noise
    st3 = S.dpm_init_state(x.shape)
    _, x_last = S.dpm_sde_step_sigma(st3, eps, jnp.asarray(sg(801),
                                                           jnp.float32),
                                     jnp.asarray(0.0), x, z)
    x0_ref = (np.asarray(x, np.float64)
              - np.sqrt(1 - ac[801]) * np.asarray(eps, np.float64)) \
        / np.sqrt(ac[801])
    np.testing.assert_allclose(np.asarray(x_last), x0_ref, rtol=2e-3,
                               atol=2e-4)


# ---------------------------------------------------------------------------
# zero terminal SNR + trailing spacing (arXiv:2305.08891)


def test_rescale_zero_snr_endpoints():
    """Terminal alpha_bar is EXACTLY 0, the t=0 point is unchanged, the
    cumprod stays monotone, and betas are kept consistent with it."""
    cfg = S.ScheduleConfig(prediction_type="v_prediction",
                           rescale_zero_snr=True)
    sched = S.make_schedule(cfg)
    ac = np.asarray(sched.alphas_cumprod, np.float64)
    assert ac[-1] == 0.0
    base = np.asarray(SCHED.alphas_cumprod, np.float64)
    np.testing.assert_allclose(ac[0], base[0], rtol=1e-6)
    assert np.all(np.diff(ac) < 0)
    # betas consistency: cumprod(1 - betas) == alphas_cumprod
    re = np.cumprod(1.0 - np.asarray(sched.betas, np.float64))
    np.testing.assert_allclose(re[:-1], ac[:-1], rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(re[-1], 0.0, atol=1e-7)

    # the affine-rescale closed form (eq. from the paper's reference code)
    s = np.sqrt(base)
    expect = ((s - s[-1]) * (s[0] / (s[0] - s[-1]))) ** 2
    np.testing.assert_allclose(ac, expect, rtol=2e-5, atol=1e-7)


def test_rescale_zero_snr_requires_v_prediction():
    import pytest

    with pytest.raises(ValueError, match="v_prediction"):
        S.make_schedule(S.ScheduleConfig(rescale_zero_snr=True))


def test_trailing_timestep_grid():
    """trailing spacing: [999, 979, ..., 19] for 50 steps; steps_offset
    does not apply; lms coefficients + karras endpoints follow the grid."""
    cfg = S.ScheduleConfig(timestep_spacing="trailing", steps_offset=1)
    ts = np.asarray(S.ddim_timesteps(cfg, 50))
    assert ts[0] == 999 and ts[-1] == 19
    np.testing.assert_array_equal(ts, 999 - 20 * np.arange(50))
    # the host grid helper matches the device grid
    np.testing.assert_array_equal(S._host_grid(cfg, 50), ts)
    # lms table over the trailing grid integrates from sigma(999)
    tab = np.asarray(S.lms_coeff_table(cfg, 8))
    assert tab.shape == (8, 4) and np.isfinite(tab).all()
    sig, tcont = S.karras_grid(cfg, 8)
    ac = np.asarray(SCHED.alphas_cumprod, np.float64)
    smax = np.sqrt((1 - ac[999]) / ac[999])
    np.testing.assert_allclose(sig[0], smax, rtol=1e-4)


def test_zero_snr_ddim_first_step_returns_minus_v():
    """At the zero-SNR terminal step (t=999, alpha=0) the v-pred DDIM step
    reads x0 = -v directly — finite, exactly the paper's design."""
    cfg = S.ScheduleConfig(prediction_type="v_prediction",
                           rescale_zero_snr=True,
                           timestep_spacing="trailing")
    sched = S.make_schedule(cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    out = S.ddim_step(sched, v, jnp.asarray(999), jnp.asarray(979), x,
                      prediction_type="v_prediction")
    a_p = float(sched.alphas_cumprod[979])
    # alpha_t = 0, sigma_t = 1: x0 = -v, eps = x
    expect = (np.sqrt(a_p) * (-np.asarray(v, np.float64))
              + np.sqrt(1 - a_p) * np.asarray(x, np.float64))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# LCM (arXiv:2310.04378)


def test_lcm_timestep_grid():
    """The diffusers LCMScheduler grid: 50-step teacher sub-grid (k=20),
    num_inference_steps picked highest-noise-first."""
    np.testing.assert_array_equal(np.asarray(S.lcm_timesteps(CFG, 4)),
                                  [999, 759, 519, 279])
    ts8 = np.asarray(S.lcm_timesteps(CFG, 8))
    np.testing.assert_array_equal(
        ts8, [999, 879, 759, 639, 519, 399, 279, 159])
    assert np.asarray(S.lcm_timesteps(CFG, 1)) == [999]
    import pytest

    with pytest.raises(ValueError, match="distillation grid"):
        S.lcm_timesteps(CFG, 51)
    with pytest.raises(ValueError, match="divide"):
        S.lcm_timesteps(CFG, 4, original_inference_steps=7)


def test_lcm_boundary_condition():
    """f(x, 0) = x: c_skip(0)=1, c_out(0)=0; c_out grows monotonically."""
    c_skip, c_out = S.lcm_boundary_scalings(jnp.asarray(0))
    assert float(c_skip) == 1.0 and float(c_out) == 0.0
    # monotone ramp-in (fp32 saturates c_out at 1 for large scaled t, so
    # test the non-degenerate low range strictly and the rest weakly)
    t = jnp.arange(0, 1000, 50)
    cs, co = S.lcm_boundary_scalings(t)
    assert np.all(np.diff(np.asarray(co)) >= 0)
    assert np.all(np.diff(np.asarray(cs)) <= 0)
    cs_lo, co_lo = S.lcm_boundary_scalings(jnp.arange(0, 5))
    assert np.all(np.diff(np.asarray(co_lo)) > 0)
    assert np.all(np.diff(np.asarray(cs_lo)) < 0)
    # last step at t=0 is the identity
    x = jnp.full((1, 2, 2, 1), 3.0)
    out = S.lcm_step(SCHED, jnp.zeros_like(x), jnp.asarray(0),
                     jnp.asarray(-1), x, jnp.zeros_like(x), last_step=True)
    np.testing.assert_allclose(np.asarray(out), 3.0)


def test_lcm_one_step_recovers_x0_with_exact_eps():
    """At t=999 c_skip ≈ 2.5e-9, so a single last step with the exact-eps
    oracle's x0 returns x0 (the one-step consistency generation)."""
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
    n = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
    t = jnp.asarray([999, 999])
    x_t = S.ddpm_add_noise(SCHED, x0, n, t)
    _, x0_pred = S.to_eps_x0(SCHED, n, 999, x_t, "epsilon")
    out = S.lcm_step(SCHED, x0_pred, jnp.asarray(999), jnp.asarray(-1),
                     x_t, jnp.zeros_like(x_t), last_step=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                               atol=2e-4, rtol=1e-4)


def test_lcm_renoise_marginal():
    """Intermediate steps re-noise the consistency output to EXACTLY the
    next grid point's forward marginal (fresh-noise multistep chain)."""
    rng = np.random.RandomState(1)
    x_t = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
    x0p = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
    noise = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
    t, t_next = 759, 519
    out = S.lcm_step(SCHED, x0p, jnp.asarray(t), jnp.asarray(t_next),
                     x_t, noise, last_step=False)
    cs, co = S.lcm_boundary_scalings(jnp.asarray(t))
    denoised = float(cs) * np.asarray(x_t) + float(co) * np.asarray(x0p)
    a = float(SCHED.alphas_cumprod[t_next])
    ref = np.sqrt(a) * denoised + np.sqrt(1 - a) * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_heun_step_trapezoid_exact_and_euler_degenerate():
    """heun_step_sigma integrates a slope LINEAR in sigma exactly (the
    trapezoid rule's exactness class — one order above Euler), and with
    eps2 == eps1 it degenerates to the plain Euler step."""
    x_t = jax.random.normal(jax.random.key(30), (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.key(31), x_t.shape)
    s_t, s_p = 7.5, 3.25

    np.testing.assert_allclose(
        np.asarray(S.heun_step_sigma(eps, eps, s_t, s_p, x_t)),
        np.asarray(S.euler_step_sigma(eps, s_t, s_p, x_t)),
        atol=1e-6)

    # slope eps(sigma) = a + b*sigma (x-independent): exact solution in VE
    # is x0 + a*(s_p - s_t) + b/2*(s_p^2 - s_t^2)
    a = jax.random.normal(jax.random.key(32), x_t.shape)
    b = jax.random.normal(jax.random.key(33), x_t.shape)
    eps1, eps2 = a + b * s_t, a + b * s_p
    out = S.heun_step_sigma(eps1, eps2, s_t, s_p, x_t)
    a_t = 1.0 / (1.0 + s_t ** 2)
    a_p = 1.0 / (1.0 + s_p ** 2)
    x_ve = np.asarray(x_t, np.float64) / np.sqrt(a_t)
    exact = (x_ve + np.asarray(a, np.float64) * (s_p - s_t)
             + np.asarray(b, np.float64) / 2 * (s_p ** 2 - s_t ** 2))
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               exact * np.sqrt(a_p), atol=1e-5)


def test_leading_sigma_grid():
    """leading_sigma_grid: sigmas are the training-table sigmas at the
    leading grid's timesteps with a terminal 0; timesteps match the
    integer grid as floats."""
    sig, ts = S.leading_sigma_grid(CFG, 10)
    assert sig.shape == (11,) and ts.shape == (10,)
    assert sig[-1] == 0.0
    assert (np.diff(sig) < 0).all() or (np.diff(sig[:-1]) < 0).all()
    np.testing.assert_array_equal(
        ts, np.asarray(S.ddim_timesteps(CFG, 10), np.float32))
