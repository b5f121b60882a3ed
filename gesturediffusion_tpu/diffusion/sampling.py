"""Sampler loops compiled to a single `lax.scan`.

Functional parity surface with the reference's host-loop samplers
(reference: diffusion/gaussian_diffusion.py — p_sample:496 /
p_sample_loop:598 / p_sample_loop_progressive:663 (skip_timesteps +
init_image partial noising :696-703, const_noise :534), DDIM :732-993,
PLMS (pseudo linear multistep, orders 1-4) :995-1190).

TPU design: the reference returns to Python once per denoise step (1000
host round-trips per sample); here every loop is one `lax.scan` whose body
is the fused model pass + update rule, so a full 1000-step chain is a
single device program.  Per-step randomness comes from
`jax.random.fold_in(rng, step)` — deterministic, order-independent, and
replayable.  Classifier-free guidance composes at the `model_fn` level
(see models/cfg.py) with cond/uncond stacked on the batch axis.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from gesturediffusion_tpu.diffusion.gaussian import (
    CondFn,
    GaussianDiffusion,
    ModelFn,
    _extract,
)


def _nonzero_mask(t: jax.Array, ndim: int) -> jax.Array:
    """1.0 where t != 0 (no noise is added on the final step)."""
    return (t != 0).astype(jnp.float32).reshape((-1,) + (1,) * (ndim - 1))


def _init_sample(
    diffusion: GaussianDiffusion,
    shape: tuple[int, ...],
    rng: jax.Array,
    noise: Optional[jax.Array],
    skip_timesteps: int,
    init_image: Optional[jax.Array],
) -> tuple[jax.Array, int]:
    """Starting point of the reverse chain + number of steps to run."""
    num_steps = diffusion.num_timesteps - skip_timesteps
    # fold index num_steps is never used by the loop body (which folds 0..N-1)
    x = noise if noise is not None else jax.random.normal(
        jax.random.fold_in(rng, num_steps), shape
    )
    # every scan body emits float32 (loops that support carry_dtype re-cast
    # afterwards) — a non-f32 caller noise would type-clash the scan carry
    x = x.astype(jnp.float32)
    if skip_timesteps and init_image is None:
        init_image = jnp.zeros(shape, x.dtype)
    if init_image is not None:
        t0 = jnp.full((shape[0],), num_steps - 1, jnp.int32)
        x = diffusion.q_sample(init_image, t0, x)
    return x, num_steps


def p_sample(
    diffusion: GaussianDiffusion,
    model_fn: ModelFn,
    x: jax.Array,
    t: jax.Array,
    cond: Any,
    rng: jax.Array,
    *,
    clip_denoised: bool = False,
    denoised_fn=None,
    cond_fn: Optional[CondFn] = None,
    inpaint=None,
    const_noise: bool = False,
) -> dict[str, jax.Array]:
    """One ancestral DDPM step x_t -> x_{t-1}."""
    out = diffusion.p_mean_variance(
        model_fn,
        x,
        t,
        cond,
        clip_denoised=clip_denoised,
        denoised_fn=denoised_fn,
        inpaint=inpaint,
    )
    # noise stays f32 regardless of the carry dtype: it is generated and
    # consumed inside the fused update (no HBM round-trip), and a bf16
    # draw would be a DIFFERENT sample stream, not a rounded one
    noise = jax.random.normal(rng, x.shape, jnp.float32)
    if const_noise:
        noise = jnp.broadcast_to(noise[:1], noise.shape)
    if cond_fn is not None:
        out["mean"] = diffusion.condition_mean(cond_fn, out, x, t, cond)
    nz = _nonzero_mask(t, x.ndim)
    sample = out["mean"] + nz * jnp.exp(0.5 * out["log_variance"]) * noise
    return {"sample": sample, "pred_xstart": out["pred_xstart"]}


def p_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: ModelFn,
    shape: tuple[int, ...],
    rng: jax.Array,
    cond: Any,
    *,
    noise: Optional[jax.Array] = None,
    clip_denoised: bool = False,
    denoised_fn=None,
    cond_fn: Optional[CondFn] = None,
    inpaint: Optional[tuple[jax.Array, jax.Array]] = None,
    skip_timesteps: int = 0,
    init_image: Optional[jax.Array] = None,
    const_noise: bool = False,
    return_intermediates: bool = False,
    carry_dtype: Optional[Any] = None,
) -> jax.Array:
    """Full ancestral sampling chain as one scan.

    Returns the final sample, or (final, all_intermediates) when
    ``return_intermediates`` (the vectorized equivalent of the reference's
    ``dump_steps``).

    ``carry_dtype=jnp.bfloat16`` stores the x_t chain state in bf16 while
    every update stays f32 (the schedule coefficients are f32, so the
    posterior-mean/noise arithmetic promotes; only the carried state and
    the per-step gaussian draw round) — halves the sampler-state HBM
    traffic per step.  Samples are distributionally equivalent, not
    bitwise (tests/test_bf16_carry.py); the final output returns in f32.
    Default None keeps the exact-f32 chain.
    """
    x, num_steps = _init_sample(diffusion, shape, rng, noise, skip_timesteps, init_image)
    if carry_dtype is not None:
        x = x.astype(carry_dtype)

    def body(carry, i):
        t = jnp.full((shape[0],), i, jnp.int32)
        step_rng = jax.random.fold_in(rng, i)
        out = p_sample(
            diffusion,
            model_fn,
            carry,
            t,
            cond,
            step_rng,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            cond_fn=cond_fn,
            inpaint=inpaint,
            const_noise=const_noise,
        )
        sample = out["sample"]
        if carry_dtype is not None:
            sample = sample.astype(carry_dtype)
        y = sample if return_intermediates else None
        return sample, y

    indices = jnp.arange(num_steps - 1, -1, -1)
    final, ys = jax.lax.scan(body, x, indices)
    final = final.astype(jnp.float32)
    if return_intermediates:
        return final, ys
    return final


def ddim_sample(
    diffusion: GaussianDiffusion,
    model_fn: ModelFn,
    x: jax.Array,
    t: jax.Array,
    cond: Any,
    rng: jax.Array,
    *,
    eta: float = 0.0,
    clip_denoised: bool = False,
    denoised_fn=None,
    cond_fn: Optional[CondFn] = None,
    inpaint=None,
) -> dict[str, jax.Array]:
    """One DDIM step (deterministic when eta=0)."""
    out_orig = diffusion.p_mean_variance(
        model_fn,
        x,
        t,
        cond,
        clip_denoised=clip_denoised,
        denoised_fn=denoised_fn,
        inpaint=inpaint,
    )
    out = (
        diffusion.condition_score(cond_fn, out_orig, x, t, cond)
        if cond_fn is not None
        else out_orig
    )
    eps = diffusion.predict_eps_from_xstart(x, t, out["pred_xstart"])

    nd = x.ndim
    alpha_bar = _extract(diffusion.alphas_cumprod, t, nd)
    alpha_bar_prev = _extract(diffusion.alphas_cumprod_prev, t, nd)
    sigma = (
        eta
        * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
        * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
    )
    noise = jax.random.normal(rng, x.shape, x.dtype)
    mean_pred = (
        out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
        + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
    )
    nz = _nonzero_mask(t, nd)
    sample = mean_pred + nz * sigma * noise
    return {"sample": sample, "pred_xstart": out_orig["pred_xstart"]}


def ddim_reverse_sample(
    diffusion: GaussianDiffusion,
    model_fn: ModelFn,
    x: jax.Array,
    t: jax.Array,
    cond: Any,
    *,
    clip_denoised: bool = False,
    denoised_fn=None,
) -> dict[str, jax.Array]:
    """One step of the deterministic DDIM reverse ODE (x_t -> x_{t+1})."""
    out = diffusion.p_mean_variance(
        model_fn, x, t, cond, clip_denoised=clip_denoised, denoised_fn=denoised_fn
    )
    nd = x.ndim
    eps = diffusion.predict_eps_from_xstart(x, t, out["pred_xstart"])
    alpha_bar_next = _extract(diffusion.alphas_cumprod_next, t, nd)
    mean_pred = (
        out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
        + jnp.sqrt(1 - alpha_bar_next) * eps
    )
    return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}


def ddim_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: ModelFn,
    shape: tuple[int, ...],
    rng: jax.Array,
    cond: Any,
    *,
    eta: float = 0.0,
    noise: Optional[jax.Array] = None,
    clip_denoised: bool = False,
    denoised_fn=None,
    cond_fn: Optional[CondFn] = None,
    inpaint: Optional[tuple[jax.Array, jax.Array]] = None,
    skip_timesteps: int = 0,
    init_image: Optional[jax.Array] = None,
    return_intermediates: bool = False,
) -> jax.Array:
    """Full DDIM chain as one scan."""
    x, num_steps = _init_sample(diffusion, shape, rng, noise, skip_timesteps, init_image)

    def body(carry, i):
        t = jnp.full((shape[0],), i, jnp.int32)
        step_rng = jax.random.fold_in(rng, i)
        out = ddim_sample(
            diffusion,
            model_fn,
            carry,
            t,
            cond,
            step_rng,
            eta=eta,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            cond_fn=cond_fn,
            inpaint=inpaint,
        )
        y = out["sample"] if return_intermediates else None
        return out["sample"], y

    indices = jnp.arange(num_steps - 1, -1, -1)
    final, ys = jax.lax.scan(body, x, indices)
    if return_intermediates:
        return final, ys
    return final


def plms_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: ModelFn,
    shape: tuple[int, ...],
    rng: jax.Array,
    cond: Any,
    *,
    order: int = 2,
    noise: Optional[jax.Array] = None,
    clip_denoised: bool = False,
    denoised_fn=None,
    cond_fn: Optional[CondFn] = None,
    inpaint: Optional[tuple[jax.Array, jax.Array]] = None,
    skip_timesteps: int = 0,
    init_image: Optional[jax.Array] = None,
) -> jax.Array:
    """Pseudo-linear-multistep (Adams–Bashforth order 1-4) chain as one scan.

    Carries a fixed-size ring of the last ``order`` epsilon predictions;
    the first step of order>1 runs the pseudo improved-Euler warmup (one
    extra model pass, selected by `lax.cond`).
    """
    if not 1 <= int(order) <= 4:
        raise ValueError("order must be an int in [1, 4]")
    order = int(order)
    x, num_steps = _init_sample(diffusion, shape, rng, noise, skip_timesteps, init_image)


    def get_eps_xstart(xc, t):
        out_orig = diffusion.p_mean_variance(
            model_fn,
            xc,
            t,
            cond,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            inpaint=inpaint,
        )
        out = (
            diffusion.condition_score(cond_fn, out_orig, xc, t, cond)
            if cond_fn is not None
            else out_orig
        )
        eps = diffusion.predict_eps_from_xstart(xc, t, out["pred_xstart"])
        return eps, out["pred_xstart"], out_orig["pred_xstart"]

    # Adams–Bashforth coefficients for orders 1-4 over buffer positions
    # [oldest .. newest] (buffer slot order-1 is the newest prediction).
    ab_coefs = {
        1: [1.0],
        2: [-1.0 / 2, 3.0 / 2],
        3: [5.0 / 12, -16.0 / 12, 23.0 / 12],
        4: [-9.0 / 24, 37.0 / 24, -59.0 / 24, 55.0 / 24],
    }

    def combine(eps_buf, n_old):
        """eps' from the newest min(order, n_old) entries of the ring."""
        branches = []
        for cur in range(1, order + 1):
            coefs = ab_coefs[cur]

            def make(coefs=coefs, cur=cur):
                def f(buf):
                    acc = jnp.zeros_like(buf[0])
                    for k, c in enumerate(coefs):
                        acc = acc + c * buf[order - cur + k]
                    return acc

                return f

            branches.append(make())
        idx = jnp.clip(n_old, 1, order) - 1
        return jax.lax.switch(idx, branches, eps_buf)

    def body(carry, i):
        xc, eps_buf, n_old = carry
        t = jnp.full((shape[0],), i, jnp.int32)
        # the GUIDED pred_xstart drives the warmup probe and the final-step
        # blend (reference: plms_sample uses out['pred_xstart'] at
        # gaussian_diffusion.py:1048,1075)
        eps, pred_xstart, _ = get_eps_xstart(xc, t)

        alpha_bar_prev = _extract(diffusion.alphas_cumprod_prev, t, xc.ndim)

        # Push newest eps into the ring (slot order-1 is newest).
        eps_buf_new = jnp.concatenate([eps_buf[1:], eps[None]], axis=0)

        def warmup(_):
            # Pseudo improved Euler: probe the model one step ahead.
            mean_pred_1 = (
                pred_xstart * jnp.sqrt(alpha_bar_prev)
                + jnp.sqrt(1 - alpha_bar_prev) * eps
            )
            eps_2, _, _ = get_eps_xstart(mean_pred_1, t - 1)
            return (eps + eps_2) / 2

        def multistep(_):
            return combine(eps_buf_new, n_old + 1)

        if order > 1:
            eps_prime = jax.lax.cond(n_old == 0, warmup, multistep, None)
        else:
            eps_prime = eps

        pred_prime = diffusion.predict_xstart_from_eps(xc, t, eps_prime)
        mean_pred = (
            pred_prime * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev) * eps_prime
        )
        nz = _nonzero_mask(t, xc.ndim)
        sample = mean_pred * nz + pred_xstart * (1 - nz)
        return (sample, eps_buf_new, jnp.minimum(n_old + 1, order)), None

    eps_buf0 = jnp.zeros((order,) + tuple(shape), x.dtype)
    indices = jnp.arange(num_steps - 1, -1, -1)
    (final, _, _), _ = jax.lax.scan(body, (x, eps_buf0, jnp.int32(0)), indices)
    return final


def dpmpp_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: ModelFn,
    shape: tuple[int, ...],
    rng: jax.Array,
    cond: Any,
    *,
    order: int = 2,
    noise: Optional[jax.Array] = None,
    clip_denoised: bool = False,
    denoised_fn=None,
    cond_fn: Optional[CondFn] = None,
    inpaint: Optional[tuple[jax.Array, jax.Array]] = None,
    skip_timesteps: int = 0,
    init_image: Optional[jax.Array] = None,
) -> jax.Array:
    """DPM-Solver++(2M) chain as one scan (Lu et al. 2022, multistep
    data-prediction solver) — a deterministic sampler that tracks the
    probability-flow ODE to second order, so it holds sample quality at
    far fewer steps than DDIM (the serving latency knob; the reference
    exposes only DDPM/DDIM/PLMS, gaussian_diffusion.py:598,732,995).

    Update in log-SNR time λ = log(α/σ) for the respaced chain step
    t → t-1 with h = λ_{t-1} − λ_t:

        D   = (1 + 1/(2r))·x̂0(x_t) − 1/(2r)·x̂0(x_{t+1}),  r = h_prev/h
        x' = (σ_{t-1}/σ_t)·x_t − α_{t-1}·(e^{−h} − 1)·D

    The first step (no history) and the final step (σ→0, where the
    second-order ratio degenerates) run first-order, which is exactly
    DDIM(η=0) — ``order=1`` forces first-order everywhere and is
    equality-tested against `ddim_sample_loop`.
    """
    if int(order) not in (1, 2):
        raise ValueError("dpmpp order must be 1 or 2 (2M)")
    second_order = int(order) == 2
    x, num_steps = _init_sample(
        diffusion, shape, rng, noise, skip_timesteps, init_image
    )

    # log-SNR tables over the respaced chain.  alphas_cumprod_prev[0] is
    # 1.0 (σ_prev = 0 → λ = +inf); the 1e-20 floor keeps the arithmetic
    # finite while staying within f32 of the analytic limit — at the
    # final step e^{-h} ≈ 0 and σ-ratio ≈ 0, so x' → D exactly as the
    # ODE prescribes (same limit DDIM's α_prev=1 endpoint hits).
    ac = diffusion.alphas_cumprod
    sigma_t = jnp.sqrt(1.0 - ac)
    lam_t = 0.5 * (jnp.log(ac) - jnp.log1p(-ac))
    ac_prev = diffusion.alphas_cumprod_prev
    alpha_prev = jnp.sqrt(ac_prev)
    sigma_prev = jnp.sqrt(jnp.maximum(1.0 - ac_prev, 1e-40))
    lam_prev = jnp.log(jnp.maximum(alpha_prev, 1e-20)) - jnp.log(sigma_prev)

    def get_x0(xc, t):
        out_orig = diffusion.p_mean_variance(
            model_fn, xc, t, cond,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            inpaint=inpaint,
        )
        out = (
            diffusion.condition_score(cond_fn, out_orig, xc, t, cond)
            if cond_fn is not None
            else out_orig
        )
        # f32 solver state: a bf16-compute model returns pred_xstart in
        # its compute dtype, and the multistep combination/carry must not
        # round (matches the other loops, whose updates promote through
        # the f32 schedule coefficients)
        return out["pred_xstart"].astype(jnp.float32)

    def body(carry, i):
        xc, x0_prev, h_prev, have_prev = carry
        t = jnp.full((shape[0],), i, jnp.int32)
        x0 = get_x0(xc, t)

        h = lam_prev[i] - lam_t[i]
        # second-order multistep combination; first step (no history) and
        # final step (i == 0, degenerate r) drop to first-order
        use2 = jnp.logical_and(have_prev > 0, i > 0) if second_order else False
        r_safe = jnp.where(use2, h_prev / h, 1.0)
        c = jnp.where(use2, 1.0 / (2.0 * r_safe), 0.0)
        d = (1.0 + c) * x0 - c * x0_prev

        x_next = (
            (sigma_prev[i] / sigma_t[i]) * xc
            - alpha_prev[i] * (jnp.exp(-h) - 1.0) * d
        )
        return (x_next, x0, h, jnp.int32(1)), None

    indices = jnp.arange(num_steps - 1, -1, -1)
    (final, _, _, _), _ = jax.lax.scan(
        body, (x, jnp.zeros_like(x), jnp.asarray(1.0, x.dtype),
               jnp.int32(0)),
        indices,
    )
    return final


def ar_chunk_step(
    diffusion: GaussianDiffusion,
    model_fn: ModelFn,
    shape: tuple[int, ...],
    rng: jax.Array,
    k: jax.Array,
    cond_c: Any,
    seed: jax.Array,
    seed_poses: int,
    *,
    loop: Callable = p_sample_loop,
    clip_denoised: bool = False,
    cond_precompute: Optional[Callable] = None,
    time_axis: int = -1,
) -> tuple[jax.Array, jax.Array]:
    """One chunk of the chunked-AR protocol: fold the take RNG by the
    chunk index, inject the carried seed poses into the conditioning,
    run one full denoise loop, and hand off the last ``seed_poses``
    frames for the next chunk (reference: sample/generate.py:91-130,
    hand-off :104-107).

    This is the SINGLE definition of the per-chunk math — the batch scan
    (`autoregressive_sample_loop`) and the live serving session
    (serve/streaming.py) both call it, so the two paths cannot diverge.

    Returns ``(chunk, handoff_seed)``.
    """
    tm = time_axis == 1 and len(shape) == 3
    chunk_rng = jax.random.fold_in(rng, k)
    cond = dict(cond_c)
    cond["seed"] = seed
    if cond_precompute is not None:
        cond = cond_precompute(cond)
    out = loop(
        diffusion, model_fn, shape, chunk_rng, cond,
        clip_denoised=clip_denoised,
    )
    handoff = out[:, -seed_poses:] if tm else out[..., -seed_poses:]
    return out, handoff


def autoregressive_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: ModelFn,
    shape: tuple[int, ...],
    rng: jax.Array,
    chunk_conds: Any,
    init_seed: jax.Array,
    seed_poses: int,
    *,
    loop: Callable = p_sample_loop,
    clip_denoised: bool = False,
    cond_precompute: Optional[Callable] = None,
    time_axis: int = -1,
) -> jax.Array:
    """Chunked autoregressive generation as ONE device program.

    The reference generates long takes chunk-by-chunk on the host, feeding
    the last `seed_poses` frames of chunk k as the seed conditioning of
    chunk k+1 (reference: sample/generate.py:91-130, hand-off :107).  Here
    the whole take is an outer `lax.scan` over chunks whose body is the
    full inner denoise scan — no per-chunk host dispatch or transfer.

    Args:
      chunk_conds: cond pytree with a leading chunk axis [C, ...] (the
        per-chunk mask/lengths/mfcc/scale/... arrays, WITHOUT 'seed').
      init_seed: [B, J, F, S] seed poses for the first chunk (dataset GT).
      seed_poses: S, frames handed off between chunks.
      cond_precompute: optional cond -> cond' transform run ONCE per chunk
        before the inner denoise scan — the hook for hoisting
        loop-invariant conditioning out of the 1000-step loop (see
        models/mdm_fastpath.py; pass its precompute with the matching
        fast model_fn).
      time_axis: which axis of `shape` is time, for the seed hand-off
        slice.  -1 (default) is the canonical [B, J, F, T] layout; pass 1
        for the time-major [B, T, J*F] fast layout (the carried seed is
        then [B, S, J*F]).

    Returns [C, B, J, F, T] samples for every chunk ([C, B, T, J*F] when
    time_axis=1).
    """
    if time_axis == 1 and len(shape) != 3:
        # time_axis=1 is exclusively the 3D time-major [B, T, J*F]
        # layout; on a canonical 4D shape it would silently slice the
        # JOINT axis for the seed hand-off
        raise ValueError(
            "time_axis=1 requires the 3D time-major [B, T, J*F] shape; "
            f"got shape {shape}"
        )
    if time_axis not in (-1, len(shape) - 1, 1):
        raise ValueError(f"unsupported time_axis {time_axis}")
    def body(carry, cond_c):
        seed, k = carry
        out, handoff = ar_chunk_step(
            diffusion, model_fn, shape, rng, k, cond_c, seed, seed_poses,
            loop=loop, clip_denoised=clip_denoised,
            cond_precompute=cond_precompute, time_axis=time_axis,
        )
        return (handoff, k + 1), out

    (_, _), outs = jax.lax.scan(
        body, (init_seed, jnp.asarray(0, jnp.int32)), chunk_conds
    )
    return outs


def make_sample_fn(
    diffusion: GaussianDiffusion, sampler: str = "ddpm", **default_kwargs
) -> Callable:
    """Convenience dispatcher: 'ddpm'|'ddim'|'plms'|'dpmpp' -> loop function."""
    loops = {
        "ddpm": p_sample_loop,
        "ddim": ddim_sample_loop,
        "plms": plms_sample_loop,
        "dpmpp": dpmpp_sample_loop,
    }
    if sampler not in loops:
        raise ValueError(f"unknown sampler {sampler}")
    return partial(loops[sampler], diffusion, **default_kwargs)
