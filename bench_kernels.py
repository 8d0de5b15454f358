"""Microbenchmarks of the VBMC-TPU hot kernels on the current device.

Reports per-kernel wall time and achieved FLOP rates for:
  1. batched GP posterior build (S Cholesky factorizations + inverses)
  2. the 2^13-candidate acquisition sweep (GEMM-shaped predict + mixture pdf)
  3. one ELBO value-and-gradient step (Bayesian quadrature + entropy)
  4. one GP hyperparameter slice-sampling sweep (sequential scan)

Each JSON row carries BOTH timings:
  ms_pipelined — many dispatches in flight, block at the end (device
                 throughput; hides per-dispatch host/tunnel latency)
  ms_single    — one dispatch, block_until_ready (what a latency-bound
                 caller sees; includes the ~30 ms TPU tunnel round trip)
plus {flops, tflops, peak_tflops, mfu, dtype, precision, device}. `mfu` is
achieved/peak against the documented chip peak for the MXU-native dtype
(see BASELINE.md "Device peaks"); for float32 matmul-precision=highest
workloads the MXU runs a multi-pass bf16 decomposition, so `mfu_f32roof`
additionally reports achieved/measured-f32-highest-matmul-roofline (the
roofline itself is measured in-process at startup and recorded in the
`device_probe` row).

Usage: python bench_kernels.py [N] [S] [K] [M]
Prints one JSON line per kernel (stderr has human-readable detail).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

# Documented per-chip peak dense matmul throughput, TFLOP/s, for the
# MXU-native dtype (bf16 inputs, f32 accumulate). Sources: Google Cloud TPU
# system-architecture docs / TPU product pages (also quoted in the public
# "How to Scale Your Model" book, jax-ml.github.io/scaling-book).
DOCUMENTED_PEAK_BF16 = {
    "TPU v2": 45.0,
    "TPU v3": 123.0,
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5": 459.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
    "TPU7x": 2307.0,
}


def peak_for(device_kind: str):
    for k, v in DOCUMENTED_PEAK_BF16.items():
        if device_kind.lower().startswith(k.lower()):
            return v, k
    return None, None


def _fetch_scalar(out):
    """Pull ONE element of the output back to the host. This is the only
    reliable execution barrier through the axon TPU tunnel:
    `block_until_ready` there returns at remote ENQUEUE, not completion
    (measured: it reported a 2.9 ms 8192^3 bf16 matmul = 44,000 TFLOP/s,
    224x the documented chip peak). A value fetch forces real execution of
    the whole in-order program queue."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[0])


def _time_pipelined(make_call, reps=16):
    """Throughput timing that survives the async tunnel: dispatch R
    *distinct* calls (``make_call(i)`` perturbs an input per rep, defeating
    any dispatch-level result caching), fetch a scalar from the LAST output
    (the device executes programs in order, so this waits for all R), and
    difference against the one-dispatch time to cancel the fetch/tunnel
    latency. Self-calibrates R until the differenced time is >= 200 ms."""
    _fetch_scalar(make_call(0))   # warm/compile

    def run(R):
        t0 = time.monotonic()
        o = None
        for i in range(R):
            o = make_call(i)
        _fetch_scalar(o)
        return time.monotonic() - t0

    t1 = min(run(1) for _ in range(3))
    tR = run(reps)
    while tR - t1 < 0.1 and reps < 512:
        reps *= 4
        tR = run(reps)
    tR = min(tR, run(reps))
    return max((tR - t1) / (reps - 1), 1e-9), reps


def _time_single(make_call, reps=5):
    """Median single-dispatch latency-inclusive timing (dispatch + execute
    + one-scalar fetch through the tunnel) — what a blocking caller sees."""
    _fetch_scalar(make_call(0))
    ts = []
    for i in range(reps):
        t0 = time.monotonic()
        _fetch_scalar(make_call(i + 1))
        ts.append(time.monotonic() - t0)
    return sorted(ts)[len(ts) // 2]


def _matmul_roofline(n, dtype, precision, r_lo=4, r_hi=20):
    """Measured dense-matmul throughput (TFLOP/s) via two in-program
    chained-matmul loops of different static lengths, differenced to cancel
    dispatch/fetch latency. The chain (z -> 0.5*z@x) is data-dependent so
    nothing can be elided or deduplicated."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)) * (1.5 / np.sqrt(n)),
                    dtype)

    def make(R):
        @jax.jit
        def f(x):
            def body(i, y):
                return 0.5 * jnp.dot(y, x, precision=precision)
            return jax.lax.fori_loop(0, R, body, x)
        return f

    f_lo, f_hi = make(r_lo), make(r_hi)
    _fetch_scalar(f_lo(a)), _fetch_scalar(f_hi(a))

    def t(f):
        t0 = time.monotonic()
        _fetch_scalar(f(a))
        return time.monotonic() - t0

    t_lo = min(t(f_lo) for _ in range(3))
    t_hi = min(t(f_hi) for _ in range(3))
    per = max((t_hi - t_lo) / (r_hi - r_lo), 1e-9)
    return 2 * n ** 3 / per / 1e12


def measure_f32_roofline():
    """Measured f32 matmul-precision=highest matmul throughput (TFLOP/s) —
    the realistic roofline for this suite's GP linear algebra, which runs
    at highest precision (bf16 MXU passes corrupt the quadrature
    covariance; see CLAUDE.md)."""
    return _matmul_roofline(4096, jnp.float32, jax.lax.Precision.HIGHEST)


def measure_bf16_peak():
    """Measured bf16 dense-matmul throughput — cross-check against the
    documented chip peak (should land within ~2x of it; if it exceeds the
    documented peak the TIMER is broken, which is exactly the failure mode
    this harness is built to catch)."""
    return _matmul_roofline(8192, jnp.bfloat16, jax.lax.Precision.DEFAULT)


def main():
    from vbmc_tpu.main import _configure_numerics
    _configure_numerics()
    from vbmc_tpu.gp.config import GPConfig
    from vbmc_tpu.gp.gp import gp_from_host
    from vbmc_tpu.gp.fit import _build_gp_jit
    from vbmc_tpu.acquisitions import evaluate_acquisition, AcqState
    from vbmc_tpu.vp import make_vp
    from vbmc_tpu.transforms import create_trinfo
    from vbmc_tpu import elbo as eb

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    M = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    D = 6

    rng = np.random.default_rng(0)
    cfg = GPConfig(D=D)
    X = rng.uniform(-2, 2, (N, D))
    y = -0.5 * np.sum(X ** 2, 1)
    hyps = np.zeros((S, cfg.nhyp))
    hyps[:, :D] = np.log(0.8)
    hyps[:, D] = 0.0
    hyps[:, cfg.ncov] = np.log(0.05)
    hyps[:, cfg.ncov + cfg.nnoise + 1 + D:] = np.log(1.2)
    hyps += 0.03 * rng.standard_normal(hyps.shape)
    gp = gp_from_host(cfg, X, y, None, hyps, n_bucket=N, s_bucket=S)
    dtype = gp.X.dtype
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", dev.platform)
    precision = str(jax.config.jax_default_matmul_precision)
    peak_bf16, peak_key = peak_for(str(kind))
    f32_roof = measure_f32_roofline()
    bf16_meas = measure_bf16_peak()
    probe = {"metric": "device_probe", "value": round(f32_roof, 2),
             "unit": "TFLOP/s_f32_highest_matmul_4096",
             "device": str(kind), "platform": dev.platform,
             "documented_peak_bf16_tflops": peak_bf16,
             "documented_peak_source":
                 "Google Cloud TPU system architecture docs"
                 if peak_bf16 else None,
             "measured_bf16_matmul_tflops": round(bf16_meas, 2),
             "measured_bf16_frac_of_documented":
                 round(bf16_meas / peak_bf16, 3) if peak_bf16 else None,
             "dtype": str(dtype), "precision": precision}
    print(f"# device {kind} ({dev.platform}): documented bf16 peak = "
          f"{peak_bf16} TFLOP/s, measured bf16 matmul = {bf16_meas:.1f} "
          f"TFLOP/s, measured f32-highest matmul roofline = "
          f"{f32_roof:.1f} TFLOP/s", file=sys.stderr)
    if peak_bf16 and bf16_meas > 1.2 * peak_bf16:
        print("# WARNING: measured bf16 exceeds documented peak — timer "
              "is broken, do not trust the rows below", file=sys.stderr)
    print(json.dumps(probe))

    results = []

    # 1. posterior build: S x (chol(N,N) + inverse) ~ S * (N^3/3 + N^3)
    # Every make_call perturbs one input per rep (i) so repeated dispatches
    # can never be served from any dispatch-level cache in the tunnel.
    fn1 = lambda i: _build_gp_jit(cfg, gp.X, gp.y, gp.s2, gp.mask,
                                  gp.hyp + i * 1e-12, gp.hyp_mask)
    flops = S * (N ** 3 / 3 + N ** 3 + 2 * N ** 2 * D)
    results.append(("gp_posterior_build", fn1, flops))

    # 2. acquisition sweep
    trinfo = create_trinfo([-np.inf] * D, [np.inf] * D, [-2.0] * D, [2.0] * D)
    vp = make_vp(trinfo, rng.uniform(-1, 1, (K, D)), 0.5, np.ones(D))
    Xs = jnp.asarray(rng.uniform(-2, 2, (M, D)), dtype=dtype)
    state = AcqState(
        ymax=jnp.asarray(0.0, dtype=dtype),
        tol_var=jnp.asarray(1e-4, dtype=dtype),
        lb_eps_orig=jnp.full((D,), -jnp.inf, dtype=dtype),
        ub_eps_orig=jnp.full((D,), jnp.inf, dtype=dtype),
        gp_length_scale=jnp.ones(D, dtype=dtype),
        var_log_joint=jnp.ones(S, dtype=dtype),
        regularize=jnp.asarray(True))
    fn2 = lambda i: evaluate_acquisition(cfg, "prospective", Xs + i * 1e-12,
                                         vp, gp, state)
    # per sample: kernel cross N*M*D, Binv@ks N*N*M, products 2*N*M
    flops = S * (2 * N * M * D + 2 * N * N * M + 4 * N * M) + 2 * K * M * D
    results.append(("acquisition_sweep_8k", fn2, flops))

    # 2b. fused Pallas acquisition sweep (TPU only).
    if dev.platform == "tpu" and M % 256 == 0:
        from vbmc_tpu.pallas_kernels import fused_prospective_acq
        fn2b = lambda i: fused_prospective_acq(cfg, Xs + i * 1e-12, gp, vp,
                                               0.0, 1e-4)
        results.append(("acquisition_sweep_8k_pallas", fn2b, flops))

    # 2c. VIQR importance-sampling sweep (the noisy-path hot kernel):
    # per sample kma (M,Na), kmx (M,N), kmx @ invK (M,N)x(N,Na), variance
    # reduction + sinh + logsumexp over Na.
    from vbmc_tpu.active_is import build_is_state_core, \
        evaluate_is_acquisition
    key_is = jax.random.PRNGKey(2)
    ais = build_is_state_core(key_is, cfg, "viqr", vp, gp, 100, 100, 100,
                              mh_steps=3)
    Na = ais.Xa.shape[0]
    fn2c = lambda i: evaluate_is_acquisition(cfg, "viqr", Xs + i * 1e-12,
                                             vp, gp, state, ais)
    flops_v = S * (2 * N * M * D + 2 * M * Na * D + 2 * M * N * Na
                   + 6 * M * Na)
    results.append(("viqr_sweep_8k", fn2c, flops_v))

    # 3. ELBO value+grad
    flags = eb.VPFlags(opt_weights=True)
    eta = jnp.zeros(K, dtype=dtype)
    theta = eb.pack_theta(flags, vp.mu, vp.sigma, vp.lam, eta)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def elbo_step(th):
        def f(t_):
            F, _ = eb.negelcbo(cfg, t_, gp, vp.mu, vp.sigma, vp.lam, vp.w,
                               vp.kmask, flags, 0.0, 0, 1, key)
            return F
        return jax.value_and_grad(f)(th)

    # z matrix 2x(S,K,N) einsums over D + J data term 2 GEMMs (S,K,N)x(N,N)
    flops_e = 2 * (S * (4 * K * N * D) + S * (2 * K * N * N + 2 * K * K * N))
    results.append(("elbo_value_and_grad",
                    lambda i: elbo_step(theta + i * 1e-12), flops_e))

    # 4. one slice-sampling sweep over all hyperparameters
    from vbmc_tpu.gp import core as gcore
    from vbmc_tpu.samplers.slice import _slice_sweep
    prior_mu = jnp.asarray(hyps[0], dtype=dtype)

    @jax.jit
    def sweep(k, h):
        def logp(hh):
            return -gcore.neg_log_marginal_likelihood(
                cfg, hh, gp.X, gp.y, gp.s2, gp.mask)
        widths = jnp.ones_like(h)
        lo = h - 10.0
        hi = h + 10.0
        return _slice_sweep(k, logp, h, logp(h), widths, lo, hi)

    flops_s = cfg.nhyp * 4 * (N ** 3 / 3)   # ~4 nlZ evals per coordinate
    results.append(("slice_sweep_nlz",
                    lambda i: sweep(jax.random.PRNGKey(1),
                                    prior_mu + i * 1e-12), flops_s))

    # 4b. one ensemble sweep (the 'covsample' kernel, nhyp>20 policy):
    # 2 half-moves x ~4 batched shrink evals, each a (S/2, N, N) Cholesky.
    from vbmc_tpu.samplers.ensemble import ensemble_slice_final
    walkers0 = jnp.asarray(hyps, dtype=dtype)

    @jax.jit
    def esweep(w0):
        def logp(hh):
            return -gcore.neg_log_marginal_likelihood(
                cfg, hh, gp.X, gp.y, gp.s2, gp.mask)
        lo = walkers0.min(0) - 10.0
        hi = walkers0.max(0) + 10.0
        xs, lps = ensemble_slice_final(jax.random.PRNGKey(3), logp, w0,
                                       lo, hi, 1)
        return xs

    flops_en = 2 * 4 * (S // 2) * (N ** 3 / 3)
    results.append(("ensemble_sweep_nlz",
                    lambda i: esweep(walkers0 + i * 1e-12), flops_en))

    for name, fn, flops in results:
        print(f"# timing {name} ...", file=sys.stderr, flush=True)
        t_pipe, reps = _time_pipelined(fn)
        t_single = _time_single(fn)
        tflops = flops / t_pipe / 1e12
        row = {"metric": f"kernel_{name}_ms",
               "value": round(t_pipe * 1e3, 3), "unit": "ms",
               "ms_pipelined": round(t_pipe * 1e3, 3),
               "ms_single": round(t_single * 1e3, 3),
               "pipeline_reps": reps,
               "flops": int(flops),
               "tflops": round(tflops, 3),
               "dtype": str(dtype), "precision": precision,
               "device": str(kind), "N": N, "S": S, "K": K, "M": M}
        if peak_bf16:
            row["peak_tflops"] = peak_bf16
            row["mfu"] = round(tflops / peak_bf16, 4)
        if f32_roof:
            row["mfu_f32roof"] = round(tflops / f32_roof, 4)
        print(f"# {name}: {t_pipe*1e3:8.3f} ms pipelined / "
              f"{t_single*1e3:8.3f} ms single  ~{tflops:8.3f} TFLOP/s  "
              f"mfu={row.get('mfu', float('nan')):.4f} "
              f"mfu_f32roof={row.get('mfu_f32roof', float('nan')):.4f}",
              file=sys.stderr)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
