"""Gaussian diffusion process math as a pytree of schedule arrays + pure fns.

Functional parity surface with the reference's guided-diffusion core
(reference: diffusion/gaussian_diffusion.py — q_sample:233,
q_posterior_mean_variance:253, p_mean_variance:277 incl. inpainting
imputation :307-311, x0/eps converters :390-411, classifier guidance
:418-494, masked_l2:201, training_losses:1227 with geometric losses
:1307-1347, VLB terms :1192) and the respacing wrapper
(diffusion/respace.py:64-129).

TPU design decisions:
  * The schedule is a frozen flax.struct pytree of device arrays — it flows
    through jit/scan/pjit without host sync.  All arrays are computed in
    numpy float64 then cast to float32 (the same precision the reference
    sees after `_extract_into_tensor(...).float()`).
  * Respacing is folded in: ``timestep_map`` translates internal timesteps
    to the model's training-time timestep ids inside the jitted graph
    (replacing the reference's `_WrappedModel`).
  * Optional behaviors that change the computation graph (inpainting,
    learned variance, geometric losses) are selected statically at trace
    time; per-step data-dependent logic is `jnp.where`.
  * RNG is explicit: every stochastic op takes a `jax.random` key.
"""

from __future__ import annotations

import enum
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.diffusion import schedules
from gesturediffusion_tpu.diffusion.losses import (
    discretized_gaussian_log_likelihood,
    mean_flat,
    normal_kl,
    sum_flat,
)


class ModelMeanType(enum.Enum):
    """What the denoiser predicts."""

    PREVIOUS_X = enum.auto()
    START_X = enum.auto()
    EPSILON = enum.auto()


class ModelVarType(enum.Enum):
    """How the reverse-process variance is chosen."""

    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


class LossType(enum.Enum):
    MSE = enum.auto()
    RESCALED_MSE = enum.auto()
    KL = enum.auto()
    RESCALED_KL = enum.auto()

    def is_vb(self) -> bool:
        return self in (LossType.KL, LossType.RESCALED_KL)


# Signature: model_fn(x, t_model, cond) -> model output (same shape as x,
# or 2x channels for learned-variance models).  `cond` is an arbitrary pytree.
ModelFn = Callable[[jax.Array, jax.Array, Any], jax.Array]
# cond_fn(x, t_model, cond) -> gradient of a conditional log-prob wrt x.
CondFn = Callable[[jax.Array, jax.Array, Any], jax.Array]


def _extract(arr: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Index a [T] schedule array at per-sample timesteps and broadcast."""
    out = jnp.take(arr, t)
    return out.reshape(out.shape + (1,) * (ndim - 1))


@flax.struct.dataclass
class GaussianDiffusion:
    """Immutable diffusion schedule + process math.

    Array fields are leaves (device arrays); configuration is static.
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    alphas_cumprod_next: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    fixed_large_variance: jax.Array
    fixed_large_log_variance: jax.Array
    log_betas: jax.Array
    timestep_map: jax.Array  # internal t -> model-facing t (respacing)

    num_timesteps: int = flax.struct.field(pytree_node=False)
    original_num_steps: int = flax.struct.field(pytree_node=False)
    model_mean_type: ModelMeanType = flax.struct.field(pytree_node=False)
    model_var_type: ModelVarType = flax.struct.field(pytree_node=False)
    loss_type: LossType = flax.struct.field(pytree_node=False)
    rescale_timesteps: bool = flax.struct.field(pytree_node=False)
    # Geometric-loss weights (gesture/a2m training).
    lambda_rcxyz: float = flax.struct.field(pytree_node=False, default=0.0)
    lambda_vel: float = flax.struct.field(pytree_node=False, default=0.0)
    lambda_fc: float = flax.struct.field(pytree_node=False, default=0.0)
    lambda_vel_rcxyz: float = flax.struct.field(pytree_node=False, default=0.0)
    data_rep: str = flax.struct.field(pytree_node=False, default="rot6d")

    # ------------------------------------------------------------------ #
    # Model-facing timestep translation (respacing + optional rescale)
    # ------------------------------------------------------------------ #
    def model_t(self, t: jax.Array) -> jax.Array:
        """Translate internal timesteps to the ids the model was trained on."""
        new_t = jnp.take(self.timestep_map, t)
        if self.rescale_timesteps:
            return new_t.astype(jnp.float32) * (1000.0 / self.original_num_steps)
        return new_t

    # ------------------------------------------------------------------ #
    # Forward process q
    # ------------------------------------------------------------------ #
    def q_mean_variance(self, x_start, t):
        nd = x_start.ndim
        mean = _extract(self.sqrt_alphas_cumprod, t, nd) * x_start
        variance = _extract(1.0 - self.alphas_cumprod, t, nd)
        log_variance = _extract(self.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """Sample q(x_t | x_0) with explicit noise."""
        nd = x_start.ndim
        return (
            _extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        nd = x_t.ndim
        posterior_mean = (
            _extract(self.posterior_mean_coef1, t, nd) * x_start
            + _extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        posterior_variance = _extract(self.posterior_variance, t, nd)
        posterior_log_variance = _extract(self.posterior_log_variance_clipped, t, nd)
        return posterior_mean, posterior_variance, posterior_log_variance

    # ------------------------------------------------------------------ #
    # x0 / eps converters
    # ------------------------------------------------------------------ #
    def predict_xstart_from_eps(self, x_t, t, eps):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - _extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps
        )

    def predict_xstart_from_xprev(self, x_t, t, xprev):
        nd = x_t.ndim
        return (
            _extract(1.0 / self.posterior_mean_coef1, t, nd) * xprev
            - _extract(self.posterior_mean_coef2 / self.posterior_mean_coef1, t, nd)
            * x_t
        )

    def predict_eps_from_xstart(self, x_t, t, pred_xstart):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, nd)

    # ------------------------------------------------------------------ #
    # Reverse process p
    # ------------------------------------------------------------------ #
    def p_mean_variance(
        self,
        model_fn: ModelFn,
        x: jax.Array,
        t: jax.Array,
        cond: Any,
        *,
        clip_denoised: bool = False,
        denoised_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
        inpaint: Optional[tuple[jax.Array, jax.Array]] = None,
    ) -> dict[str, jax.Array]:
        """Run the model and derive mean/variance of p(x_{t-1} | x_t) plus x0.

        ``inpaint`` is an optional ``(mask, motion)`` pair: where mask is
        True the model output is overwritten by the ground-truth motion every
        step (editing mechanism; reference surface: gaussian_diffusion.py
        :307-311).  Requires START_X prediction.
        """
        nd = x.ndim
        model_output = model_fn(x, self.model_t(t), cond)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            c = x.shape[1]
            model_output, model_var_values = jnp.split(model_output, [c], axis=1)

        # imputation targets the (x0-prediction) mean channels, so it must
        # run AFTER the learned-variance split — before it, the 2C-channel
        # output would shape-clash with the C-channel ground truth
        if inpaint is not None:
            assert self.model_mean_type == ModelMeanType.START_X, (
                "inpainting imputation supports START_X prediction only"
            )
            inpainting_mask, inpainted_motion = inpaint
            model_output = jnp.where(inpainting_mask, inpainted_motion, model_output)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            if self.model_var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _extract(self.posterior_log_variance_clipped, t, nd)
                max_log = _extract(self.log_betas, t, nd)
                frac = (model_var_values + 1) / 2
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        elif self.model_var_type == ModelVarType.FIXED_LARGE:
            model_variance = _extract(self.fixed_large_variance, t, nd)
            model_log_variance = _extract(self.fixed_large_log_variance, t, nd)
        else:  # FIXED_SMALL
            model_variance = _extract(self.posterior_variance, t, nd)
            model_log_variance = _extract(self.posterior_log_variance_clipped, t, nd)

        def process_xstart(xs):
            if denoised_fn is not None:
                xs = denoised_fn(xs)
            if clip_denoised:
                xs = jnp.clip(xs, -1.0, 1.0)
            return xs

        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(
                self.predict_xstart_from_xprev(x, t, model_output)
            )
            model_mean = model_output
        else:
            if self.model_mean_type == ModelMeanType.START_X:
                pred_xstart = process_xstart(model_output)
            else:  # EPSILON
                pred_xstart = process_xstart(
                    self.predict_xstart_from_eps(x, t, model_output)
                )
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    # ------------------------------------------------------------------ #
    # Classifier guidance
    # ------------------------------------------------------------------ #
    def condition_mean(self, cond_fn: CondFn, p_mean_var, x, t, cond):
        """Shift the posterior mean by variance * grad(log p(y|x))."""
        gradient = cond_fn(x, self.model_t(t), cond)
        return p_mean_var["mean"] + p_mean_var["variance"] * gradient

    def condition_score(self, cond_fn: CondFn, p_mean_var, x, t, cond):
        """Song et al. (2020) score-based conditioning."""
        nd = x.ndim
        alpha_bar = _extract(self.alphas_cumprod, t, nd)
        eps = self.predict_eps_from_xstart(x, t, p_mean_var["pred_xstart"])
        eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(x, self.model_t(t), cond)
        out = dict(p_mean_var)
        out["pred_xstart"] = self.predict_xstart_from_eps(x, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(out["pred_xstart"], x, t)
        return out

    # ------------------------------------------------------------------ #
    # Losses
    # ------------------------------------------------------------------ #
    @staticmethod
    def masked_l2(a: jax.Array, b: jax.Array, mask: jax.Array) -> jax.Array:
        """Length-mask-aware per-sample MSE.

        a, b: [B, J, F, T]; mask: [B, 1, 1, T].  Returns [B]
        (reference surface: gaussian_diffusion.py:201-213).
        """
        loss = sum_flat(((a - b) ** 2) * mask.astype(a.dtype))
        n_entries = a.shape[1] * a.shape[2]
        non_zero = sum_flat(mask.astype(a.dtype)) * n_entries
        # an all-padding sample (fully zero mask row) has loss 0; without
        # the clamp it would be 0/0 = NaN and poison the whole batch mean
        return loss / jnp.maximum(non_zero, 1.0)

    def _vb_terms_bpd(
        self, model_fn, x_start, x_t, t, cond, *, clip_denoised=False, inpaint=None
    ):
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(
            model_fn, x_t, t, cond, clip_denoised=clip_denoised, inpaint=inpaint
        )
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(
        self,
        model_fn: ModelFn,
        x_start: jax.Array,
        t: jax.Array,
        cond: Any,
        *,
        mask: jax.Array,
        noise: jax.Array,
        fk_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
        foot_joint_idx: tuple[int, ...] = (7, 10, 8, 11),
    ) -> dict[str, jax.Array]:
        """Per-sample training losses for one (already-sampled) timestep batch.

        ``fk_fn`` maps a model-space sample to xyz joint positions
        [B, J, 3, T]; required when any geometric lambda is nonzero
        (reference surface: gaussian_diffusion.py:1227-1347).
        """
        x_t = self.q_sample(x_start, t, noise)
        terms: dict[str, jax.Array] = {}

        if self.loss_type.is_vb():
            terms["loss"] = self._vb_terms_bpd(model_fn, x_start, x_t, t, cond)[
                "output"
            ]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        model_output = model_fn(x_t, self.model_t(t), cond)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            c = x_t.shape[1]
            model_output, model_var_values = jnp.split(model_output, [c], axis=1)
            frozen_out = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=1
            )
            terms["vb"] = self._vb_terms_bpd(
                lambda *_args: frozen_out, x_start, x_t, t, cond
            )["output"]
            if self.loss_type == LossType.RESCALED_MSE:
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)

        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            target = self.q_posterior_mean_variance(x_start, x_t, t)[0]
        elif self.model_mean_type == ModelMeanType.START_X:
            target = x_start
        else:
            target = noise

        terms["rot_mse"] = self.masked_l2(target, model_output, mask)

        target_xyz = model_output_xyz = None
        need_xyz = (
            self.lambda_rcxyz > 0 or self.lambda_vel_rcxyz > 0 or self.lambda_fc > 0
        )
        if need_xyz:
            if fk_fn is None:
                raise ValueError("geometric losses require fk_fn")
            target_xyz = fk_fn(target)
            model_output_xyz = fk_fn(model_output)

        if self.lambda_rcxyz > 0:
            terms["rcxyz_mse"] = self.masked_l2(target_xyz, model_output_xyz, mask)

        # NOTE: vel_xyz_mse is reported for monitoring but — exactly like
        # the reference (gaussian_diffusion.py:1345-1348 omits it from the
        # loss sum) — it does NOT contribute to terms["loss"]; the knob is
        # kept for flag parity, not as a training lever.
        if self.lambda_vel_rcxyz > 0:
            t_vel = target_xyz[..., 1:] - target_xyz[..., :-1]
            m_vel = model_output_xyz[..., 1:] - model_output_xyz[..., :-1]
            terms["vel_xyz_mse"] = self.masked_l2(t_vel, m_vel, mask[..., 1:])

        if self.lambda_fc > 0:
            # Foot-contact loss: penalize predicted foot velocity on frames
            # where the ground-truth foot is (nearly) static.
            gt_joint = target_xyz[:, list(foot_joint_idx), :, :]
            gt_vel = jnp.linalg.norm(
                gt_joint[..., 1:] - gt_joint[..., :-1], axis=2
            )  # [B, 4, T-1]
            fc_mask = (gt_vel <= 0.01)[:, :, None, :]  # [B, 4, 1, T-1]
            pred_joint = model_output_xyz[:, list(foot_joint_idx), :, :]
            pred_vel = pred_joint[..., 1:] - pred_joint[..., :-1]
            pred_vel = jnp.where(fc_mask, pred_vel, 0.0)
            terms["fc"] = self.masked_l2(
                pred_vel, jnp.zeros_like(pred_vel), mask[..., 1:]
            )

        if self.lambda_vel > 0:
            target_vel = target[..., 1:] - target[..., :-1]
            model_vel = model_output[..., 1:] - model_output[..., :-1]
            # Last joint row is the root location; excluded from the velocity
            # term (reference surface: gaussian_diffusion.py:1340).
            terms["vel_mse"] = self.masked_l2(
                target_vel[:, :-1], model_vel[:, :-1], mask[..., 1:]
            )

        terms["loss"] = (
            terms["rot_mse"]
            + terms.get("vb", 0.0)
            + self.lambda_vel * terms.get("vel_mse", 0.0)
            + self.lambda_rcxyz * terms.get("rcxyz_mse", 0.0)
            + self.lambda_fc * terms.get("fc", 0.0)
        )
        return terms


def create_diffusion(
    *,
    betas: Optional[np.ndarray] = None,
    noise_schedule: str = "cosine",
    steps: int = 1000,
    scale_beta: float = 1.0,
    timestep_respacing: str | set | None = None,
    model_mean_type: ModelMeanType = ModelMeanType.START_X,
    model_var_type: ModelVarType = ModelVarType.FIXED_SMALL,
    loss_type: LossType = LossType.MSE,
    rescale_timesteps: bool = False,
    lambda_rcxyz: float = 0.0,
    lambda_vel: float = 0.0,
    lambda_fc: float = 0.0,
    lambda_vel_rcxyz: float = 0.0,
    data_rep: str = "rot6d",
    dtype=jnp.float32,
) -> GaussianDiffusion:
    """Build a (optionally respaced) GaussianDiffusion pytree.

    Mirrors utils/model_util.py:create_gaussian_diffusion + respace.py.
    """
    if betas is None:
        betas = schedules.get_named_beta_schedule(noise_schedule, steps, scale_beta)
    betas = np.asarray(betas, np.float64)
    original_num_steps = len(betas)

    if timestep_respacing:
        use_timesteps = (
            timestep_respacing
            if isinstance(timestep_respacing, set)
            else schedules.space_timesteps(
                original_num_steps, timestep_respacing, betas=betas
            )
        )
        betas, timestep_map = schedules.respaced_betas(betas, use_timesteps)
    else:
        timestep_map = np.arange(original_num_steps, dtype=np.int64)

    assert (betas > 0).all() and (betas <= 1).all()
    num_timesteps = len(betas)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    if num_timesteps > 1:
        posterior_log_variance_clipped = np.log(
            np.append(posterior_variance[1], posterior_variance[1:])
        )
        fixed_large_variance = np.append(posterior_variance[1], betas[1:])
    else:
        # one-step chain (e.g. --sample_steps 1): there is no t=1 entry to
        # borrow a nonzero variance from; clamp so the log is finite
        # (posterior_variance[0] is exactly 0 — deterministic samplers
        # never read it, and a DDPM step at t=0 adds no noise anyway)
        posterior_log_variance_clipped = np.log(
            np.maximum(posterior_variance, 1e-20)
        )
        fixed_large_variance = betas.copy()

    def arr(x):
        return jnp.asarray(x, dtype)

    return GaussianDiffusion(
        betas=arr(betas),
        alphas_cumprod=arr(alphas_cumprod),
        alphas_cumprod_prev=arr(alphas_cumprod_prev),
        alphas_cumprod_next=arr(alphas_cumprod_next),
        sqrt_alphas_cumprod=arr(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=arr(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=arr(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=arr(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=arr(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=arr(posterior_variance),
        posterior_log_variance_clipped=arr(posterior_log_variance_clipped),
        posterior_mean_coef1=arr(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=arr(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        fixed_large_variance=arr(fixed_large_variance),
        fixed_large_log_variance=arr(np.log(fixed_large_variance)),
        log_betas=arr(np.log(betas)),
        timestep_map=jnp.asarray(timestep_map, jnp.int32),
        num_timesteps=num_timesteps,
        original_num_steps=original_num_steps,
        model_mean_type=model_mean_type,
        model_var_type=model_var_type,
        loss_type=loss_type,
        rescale_timesteps=rescale_timesteps,
        lambda_rcxyz=lambda_rcxyz,
        lambda_vel=lambda_vel,
        lambda_fc=lambda_fc,
        lambda_vel_rcxyz=lambda_vel_rcxyz,
        data_rep=data_rep,
    )
