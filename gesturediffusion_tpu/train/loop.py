"""Training loop: jitted GSPMD train step + host-side shell.

Functional parity surface with the reference trainer
(reference: train/training_loop.py — TrainLoop:29, run_loop:126,
forward_backward:211, importance-weighted loss :242, linear LR anneal
:248, checkpoint save/resume with `model{step:09d}` naming :102-124,
265-300, quartile loss logging :315-321; diffusion/fp16_util.py
MixedPrecisionTrainer:148).

TPU design decisions:
  * One jitted `train_step` fuses: timestep sampling, q_sample, model
    fwd/bwd, optax update, EMA, loss-aware-sampler update, and metric
    reduction — a single device program per step.
  * Parallelism is GSPMD data-parallel: params replicated, batch sharded
    over the mesh "data" axis; XLA inserts the gradient all-reduce.  The
    loss-aware sampler update consumes the full logical batch, replacing
    the reference's explicit `dist.all_gather` (resample.py:83-99).
  * Mixed precision is native bf16 compute (optional) — no loss-scaling
    state machine (fp16_util's overflow back-off is vestigial on TPU).
  * EMA of params is first-class (the reference ships `update_ema`
    unused; we wire it, default off for parity).
  * Checkpoints are Orbax pytrees in `model{step:09d}/` dirs next to an
    `args.json`, preserving the reference's resume-by-filename contract.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import time
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from gesturediffusion_tpu.data.collate import device_cond
from gesturediffusion_tpu.data.loader import DataLoader, infinite_batches
from gesturediffusion_tpu.diffusion.gaussian import GaussianDiffusion
from gesturediffusion_tpu.diffusion.resample import (
    LossSecondMomentState,
    UniformSampler,
    create_named_schedule_sampler,
)
from gesturediffusion_tpu.parallel import mesh as mesh_lib
from gesturediffusion_tpu.train.platforms import TrainPlatform
from gesturediffusion_tpu.utils import logger as log_lib


@dataclasses.dataclass
class TrainConfig:
    save_dir: str = "save/run"
    lr: float = 1e-4
    weight_decay: float = 0.0
    lr_anneal_steps: int = 0
    num_steps: int = 600_000
    batch_size: int = 256
    log_interval: int = 1_000
    save_interval: int = 50_000
    schedule_sampler: str = "uniform"
    ema_rate: float = 0.0  # 0 disables EMA
    use_bf16: bool = False
    # gradient accumulation: split each batch into microbatches of this
    # size (0 = off).  Per-chip microbatch <= 128 dodges the encoder's
    # large-batch cliff (see bench.py notes) and bounds activation memory.
    microbatch_size: int = 0
    seed: int = 10


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any
    sampler: Any
    # cumulative count of steps whose update was skipped because the loss
    # or grads were non-finite (self-healing; mirrors the role of the
    # reference's fp16 overflow back-off, fp16_util.py:189-207)
    nonfinite_skips: jax.Array = flax.struct.field(
        default_factory=lambda: jnp.asarray(0, jnp.int32)
    )
    # non-parameter model collections updated by the forward pass (e.g.
    # the WavEncoder's BatchNorm running stats); empty for most models
    model_state: Any = flax.struct.field(default_factory=dict)


def quartile_means(t: jax.Array, values: jax.Array, num_timesteps: int):
    """Mean of `values` per timestep quartile (reference logging contract)."""
    quart = (t * 4) // num_timesteps
    out = {}
    for q in range(4):
        sel = (quart == q).astype(values.dtype)
        denom = jnp.maximum(sel.sum(), 1.0)
        out[f"q{q}"] = (values * sel).sum() / denom
    return out


def global_norm(tree) -> jax.Array:
    return jnp.sqrt(
        sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree_util.tree_leaves(tree))
    )


def make_train_step(
    diffusion: GaussianDiffusion,
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    config: TrainConfig,
    fk_fn: Optional[Callable] = None,
):
    """Build the jitted train step.

    apply_fn(params, x, t, cond, rngs) -> model output (train mode); OR
    apply_fn(params, x, t, cond, rngs, model_state) ->
    (output, new_model_state) for models with mutable non-param
    collections (BatchNorm running stats).
    """
    import inspect

    accepts_model_state = (
        "model_state" in inspect.signature(apply_fn).parameters
    )

    def step_fn(
        state: TrainState,
        motion: jax.Array,
        cond: dict,
        rng: jax.Array,
        t: Optional[jax.Array] = None,
        noise: Optional[jax.Array] = None,
    ):
        """One update.  `t`/`noise` default to the sampler/PRNG draws;
        passing them explicitly gives deterministic replay (trajectory
        goldens vs the reference trainer, bug repros)."""
        rng = jax.random.fold_in(rng, state.step)
        rng_t, rng_noise, rng_drop, rng_mask = jax.random.split(rng, 4)
        b = motion.shape[0]
        if t is None:
            t, weights = state.sampler.sample(rng_t, b)
        else:
            # injected timesteps: uniform importance weights, like the
            # reference's UniformSampler (resample.py weights == 1)
            weights = jnp.ones((b,), jnp.float32)
        if noise is None:
            noise = jax.random.normal(rng_noise, motion.shape, motion.dtype)

        def model_fn_for(params, ms_in, ms_out, drop_rng, mask_rng):
            def model_fn(x, tt, cc):
                x_in = x.astype(jnp.bfloat16) if config.use_bf16 else x
                rngs = {"dropout": drop_rng, "cond_mask": mask_rng}
                if accepts_model_state:
                    out, new_ms = apply_fn(
                        params, x_in, tt, cc, rngs=rngs, model_state=ms_in,
                    )
                    ms_out.append(new_ms)
                else:
                    out = apply_fn(params, x_in, tt, cc, rngs=rngs)
                return out.astype(motion.dtype)

            return model_fn

        def compute(params, ms_in, mo, tt, no, ww, cc, drop_rng, mask_rng):
            """loss + grads on one (micro)batch."""

            def loss_fn(p):
                ms_out = []
                terms = diffusion.training_losses(
                    model_fn_for(p, ms_in, ms_out, drop_rng, mask_rng),
                    mo, tt, cc, mask=cc["mask"], noise=no, fk_fn=fk_fn,
                )
                loss = jnp.mean(terms["loss"] * ww)
                new_ms = ms_out[-1] if ms_out else ms_in
                return loss, (terms, new_ms)

            return jax.value_and_grad(loss_fn, has_aux=True)(params)

        mb = config.microbatch_size
        if mb and mb < b:
            # gradient accumulation over equal microbatches: dodges the
            # large-batch encoder cliff and bounds activation memory
            # (the real version of the reference's vestigial microbatch
            # loop, training_loop.py:211-216)
            if b % mb != 0:
                raise ValueError(
                    f"batch {b} not divisible by microbatch_size {mb}"
                )
            k = b // mb

            def resh(x):
                return x.reshape((k, mb) + x.shape[1:])

            xs = (
                resh(motion), resh(t), resh(noise), resh(weights),
                jax.tree_util.tree_map(resh, cond), jnp.arange(k),
            )

            def body(carry, xs_i):
                g_acc, loss_acc, ms = carry
                mo, tt, no, ww, cc, i = xs_i
                (loss_i, (terms_i, new_ms)), grads_i = compute(
                    state.params, ms, mo, tt, no, ww, cc,
                    jax.random.fold_in(rng_drop, i),
                    jax.random.fold_in(rng_mask, i),
                )
                g_acc = jax.tree_util.tree_map(
                    lambda a, g: a + g, g_acc, grads_i
                )
                return (g_acc, loss_acc + loss_i, new_ms), terms_i

            zero_g = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (g_sum, loss_sum, new_model_state), terms_k = jax.lax.scan(
                body, (zero_g, jnp.zeros((), jnp.float32),
                       state.model_state), xs,
            )
            grads = jax.tree_util.tree_map(lambda g: g / k, g_sum)
            loss = loss_sum / k
            # [k, mb, ...] -> [b, ...] (matches the order of t/weights)
            terms = jax.tree_util.tree_map(
                lambda x: x.reshape((b,) + x.shape[2:]), terms_k
            )
        else:
            (loss, (terms, new_model_state)), grads = compute(
                state.params, state.model_state, motion, t, noise, weights,
                cond, rng_drop, rng_mask,
            )
        grad_norm = global_norm(grads)
        # Self-heal on non-finite loss/grads: keep the old state and count
        # the skip instead of poisoning params (per-step, inside jit —
        # reference analogue: fp16_util.py:189-207 overflow back-off).
        ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)

        def keep_new(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old
            )

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = keep_new(new_params, state.params)
        new_opt_state = keep_new(new_opt_state, state.opt_state)

        if config.ema_rate > 0:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * config.ema_rate + p * (1 - config.ema_rate),
                state.ema_params,
                new_params,
            )
            new_ema = keep_new(new_ema, state.ema_params)
        else:
            new_ema = state.ema_params

        new_sampler = keep_new(
            state.sampler.update_with_losses(t, terms["loss"]), state.sampler
        )
        new_model_state = keep_new(new_model_state, state.model_state)
        new_skips = state.nonfinite_skips + (1 - ok.astype(jnp.int32))

        metrics = {"loss": loss, "grad_norm": grad_norm,
                   "param_norm": global_norm(new_params),
                   "nonfinite_skips": new_skips}
        for name, val in terms.items():
            # importance-weighted, like the reference's log_loss_dict
            # (training_loop.py:242-245 logs losses * weights) — so the
            # logged "loss" IS the optimized objective, not overwritten
            # by an unweighted mean
            wval = val * weights
            metrics[name] = jnp.mean(wval)
            for qname, qval in quartile_means(
                t, wval, diffusion.num_timesteps
            ).items():
                metrics[f"{name}_{qname}"] = qval

        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            sampler=new_sampler,
            nonfinite_skips=new_skips,
            model_state=new_model_state,
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """AdamW with the reference's linear LR anneal.

    The reference anneals AFTER each optimizer step
    (training_loop.py:206-209 run_step calls _anneal_lr after optimize,
    :248-253), so update k applies lr·(1 − (k−1)/N) — one step behind a
    plain linear schedule.  Matched exactly so training trajectories are
    reproducible against the reference (tests/test_train_golden.py).
    """
    if config.lr_anneal_steps:
        n = config.lr_anneal_steps
        lr0 = config.lr

        def schedule(count):
            frac_done = jnp.clip((count - 1) / n, 0.0, 1.0)
            return lr0 * (1.0 - frac_done)

    else:
        schedule = config.lr
    return optax.adamw(schedule, weight_decay=config.weight_decay)


class TrainLoop:
    """Host-side training shell: data, logging, checkpoints, resume."""

    def __init__(
        self,
        config: TrainConfig,
        diffusion: GaussianDiffusion,
        apply_fn: Callable,
        init_params: Any,
        data: DataLoader,
        mesh=None,
        platform: Optional[TrainPlatform] = None,
        fk_fn: Optional[Callable] = None,
        text_encoder: Optional[Callable] = None,
        args_to_save: Optional[dict] = None,
        eval_fn: Optional[Callable] = None,
        init_model_state: Any = None,
    ):
        self.config = config
        self.diffusion = diffusion
        self.data = data
        self.platform = platform or TrainPlatform(config.save_dir)
        self.text_encoder = text_encoder
        self.mesh = (
            mesh
            if mesh is not None
            else mesh_lib.make_data_mesh_for_batch(config.batch_size)
        )
        self.rng = jax.random.PRNGKey(config.seed)
        self.logger = log_lib.configure(config.save_dir)
        # optional in-training eval hook, called after each checkpoint save
        # (reference: train/training_loop.py:165-202 evaluate())
        self.eval_fn = eval_fn

        tx = make_optimizer(config)
        sampler = create_named_schedule_sampler(
            config.schedule_sampler, diffusion.num_timesteps
        )
        # empty pytree when EMA is off (aliasing params would break donation)
        ema = (
            jax.tree_util.tree_map(jnp.copy, init_params)
            if config.ema_rate > 0
            else {}
        )
        self.state = self._place_state(TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=init_params,
            opt_state=tx.init(init_params),
            ema_params=ema,
            sampler=sampler,
            model_state=init_model_state or {},
        ))
        self.train_step = make_train_step(
            diffusion, apply_fn, tx, config, fk_fn=fk_fn
        )

        os.makedirs(config.save_dir, exist_ok=True)
        if args_to_save is not None:
            with open(os.path.join(config.save_dir, "args.json"), "w") as f:
                json.dump(args_to_save, f, indent=4, sort_keys=True)

        self.resume_step = 0
        # host-side mirror of state.step: reading back eagerly-created device
        # scalars can stall on tunneled TPU backends, so never int(state.step)
        self.host_step = 0
        self._prev_skips = 0

    # ------------------------------------------------------------------ #
    # Checkpointing (Orbax; `model{step:09d}` naming contract)
    # ------------------------------------------------------------------ #
    def _place_state(self, state: "TrainState") -> "TrainState":
        """Commit every train-state leaf to the (global) mesh.

        Replicated by default; when the mesh has a model axis > 1,
        params/EMA/optimizer moments get the TP kernel sharding
        (mesh_lib.shard_params_tp — Adam's mu/nu mirror the kernel
        shapes, so the same shape heuristic places them consistently).
        Multi-host jit REQUIRES globally-placed inputs (process-local
        arrays from model.init cannot feed a global-mesh program);
        single-host this just commits to the local devices.  Applied at
        init and after every checkpoint load."""
        state = mesh_lib.replicate(self.mesh, state)
        if self.mesh.shape.get("model", 1) > 1:
            def tp(tree):
                return mesh_lib.shard_params_tp(tree, self.mesh)
            state = state.replace(
                params=tp(state.params),
                opt_state=tp(state.opt_state),
                ema_params=tp(state.ema_params)
                if state.ema_params else state.ema_params,
            )
        return state

    def _ckpt_dir(self, step: int) -> str:
        return os.path.abspath(
            os.path.join(self.config.save_dir, f"model{step:09d}")
        )

    def save(self) -> str:
        import orbax.checkpoint as ocp

        step = self.host_step
        path = self._ckpt_dir(step)
        ckptr = ocp.PyTreeCheckpointer()
        # "params" carries the FULL variables dict (params + any mutable
        # collections like batch_stats) so inference consumers can
        # model.apply(ckpt["params"], ...) directly
        ckptr.save(
            path,
            {
                "params": {**self.state.params, **self.state.model_state},
                "ema_params": self.state.ema_params,
                "opt_state": self.state.opt_state,
                "sampler": _sampler_arrays(self.state.sampler),
            },
            force=True,
        )
        log_lib.log(f"saved checkpoint {path}")
        return path

    def load(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        template = {
            "params": {**self.state.params, **self.state.model_state},
            "ema_params": self.state.ema_params,
            "opt_state": self.state.opt_state,
            "sampler": _sampler_arrays(self.state.sampler),
        }
        restored = ckptr.restore(os.path.abspath(path), item=template)
        step = parse_resume_step_from_filename(path)
        ms_keys = set(self.state.model_state)
        self.state = self._place_state(TrainState(
            step=jnp.asarray(step, jnp.int32),
            params={k: v for k, v in restored["params"].items()
                    if k not in ms_keys},
            opt_state=restored["opt_state"],
            ema_params=restored["ema_params"],
            sampler=_restore_sampler(self.state.sampler, restored["sampler"]),
            model_state={k: v for k, v in restored["params"].items()
                         if k in ms_keys},
        ))
        self.resume_step = step
        self.host_step = step
        log_lib.log(f"resumed from {path} at step {step}")

    def load_torch(self, path: str, model) -> None:
        """Fine-tune from a reference torch checkpoint (model*.pt): the
        converted weights replace params (and EMA restarts from them);
        optimizer + sampler state start FRESH (reference .pt files carry
        neither).  The step resumes from the filename, preserving the
        reference's `model{N:09d}` contract for lr annealing."""
        from gesturediffusion_tpu.utils.convert_torch import (
            load_torch_checkpoint,
        )

        variables = load_torch_checkpoint(path, model)
        ms_keys = set(self.state.model_state)
        params = {k: v for k, v in variables.items() if k not in ms_keys}
        model_state = {k: v for k, v in variables.items() if k in ms_keys}
        step = parse_resume_step_from_filename(path)
        ema = (
            jax.tree_util.tree_map(jnp.copy, params)
            if self.config.ema_rate > 0
            else {}
        )
        tx = make_optimizer(self.config)
        opt_state = tx.init(params)
        if step:
            # resume the LR-anneal schedule at the filename step (the
            # reference anneals on step + resume_step); Adam's own count
            # stays 0 — its moments ARE fresh, so fresh bias correction
            # is the correct pairing
            def _advance(s):
                if isinstance(s, optax.ScaleByScheduleState):
                    return optax.ScaleByScheduleState(
                        count=jnp.asarray(step, s.count.dtype)
                    )
                return s

            opt_state = jax.tree_util.tree_map(
                _advance, opt_state,
                is_leaf=lambda s: isinstance(s, optax.ScaleByScheduleState),
            )
        self.state = self._place_state(TrainState(
            step=jnp.asarray(step, jnp.int32),
            params=params,
            opt_state=opt_state,
            ema_params=ema,
            sampler=self.state.sampler,
            model_state=model_state or self.state.model_state,
        ))
        self.resume_step = step
        self.host_step = step
        log_lib.log(
            f"fine-tuning from reference torch checkpoint {path} "
            f"at step {step} (fresh optimizer state)"
        )

    # ------------------------------------------------------------------ #
    def _host_batches(self):
        """The production host pipeline: loader -> collate -> text-embed.

        Yields host-numpy `(motion, dcond)` pairs; upload happens once
        per step in `shard_batch` on the consuming side.
        """
        for motion, cond in infinite_batches(self.data):
            dcond = device_cond(cond)
            if self.text_encoder is not None and "text" in cond:
                dcond["text_emb"] = np.asarray(
                    self.text_encoder(cond["text"])
                )
            yield motion, dcond

    def run_loop(self, batch_source=None) -> None:
        """Run the training loop to `num_steps`.

        `batch_source` (optional): an iterator yielding ready
        `(motion, dcond)` pairs — already collated, text-embedded, and
        (typically) device-resident.  Used by `--device_batch_pool` /
        `tools/soak_train.py` to cycle a pre-staged on-device batch pool
        when the host->device transport is bandwidth-limited (e.g. a
        tunneled backend); `shard_batch` is a no-op for arrays already
        placed with the mesh sharding, so the jitted step, logging,
        checkpointing, and eval paths below are byte-identical to the
        production host path.
        """
        cfg = self.config
        if batch_source is None:
            batch_source = self._host_batches()
        t_start = time.time()
        for step in range(self.host_step, cfg.num_steps):
            motion, dcond = next(batch_source)
            # hand HOST numpy to shard_batch: it uploads exactly once
            # (device_put / make_array_from_process_local_data) — no
            # device->host round-trips on the hot path.  Device-resident
            # pool batches pass through unchanged (same sharding).
            motion = mesh_lib.shard_batch(self.mesh, motion)
            dcond = mesh_lib.shard_batch(self.mesh, dcond)
            self.state, metrics = self.train_step(
                self.state, motion, dcond, self.rng
            )
            self.host_step = step + 1

            if step % cfg.log_interval == 0:
                metrics = jax.device_get(metrics)
                skips = int(metrics.get("nonfinite_skips", 0))
                if skips > self._prev_skips:
                    # the jitted step already self-healed (update skipped,
                    # params untouched) — surface it loudly
                    log_lib.log(
                        f"WARNING: {skips - self._prev_skips} non-finite "
                        f"step(s) skipped since last log (total {skips})"
                    )
                if skips - self._prev_skips >= max(cfg.log_interval, 1):
                    # every step in the window diverged — persistent
                    # divergence, halt with the last clean state saved
                    self.save()
                    raise FloatingPointError(
                        f"all {cfg.log_interval} steps since last log were "
                        f"non-finite at step {step} — checkpoint saved"
                    )
                self._prev_skips = skips
                for k, v in metrics.items():
                    v = float(v)
                    if not np.isfinite(v):
                        # a self-healed skipped step reports NaN loss;
                        # don't poison the window's running means
                        # (nonfinite_skips already records the event)
                        continue
                    log_lib.logkv_mean(k, v)
                    if k in ("loss",):
                        self.platform.report_scalar(
                            k, v, iteration=step, group_name="Loss"
                        )
                log_lib.logkv("step", step)
                log_lib.logkv(
                    "steps/sec", (step - self.resume_step + 1)
                    / max(time.time() - t_start, 1e-9),
                )
                log_lib.dumpkvs()

            if step > 0 and step % cfg.save_interval == 0:
                self.save()
                if self.eval_fn is not None:
                    t_eval = time.time()
                    metrics = self.eval_fn(self.state, step)
                    for k, v in (metrics or {}).items():
                        log_lib.logkv(f"eval/{k}", float(v))
                        self.platform.report_scalar(
                            k, float(v), iteration=step, group_name="Eval"
                        )
                    log_lib.logkv("eval/wall_s", time.time() - t_eval)
                    log_lib.dumpkvs()
                if os.environ.get("DIFFUSION_TRAINING_TEST", ""):
                    return
        self.save()


def parse_resume_step_from_filename(path: str) -> int:
    """Extract N from a `model{N:09d}` checkpoint path (reference contract:
    train/training_loop.py:288-300)."""
    m = re.search(r"model(\d+)", os.path.basename(os.path.normpath(path)))
    return int(m.group(1)) if m else 0


def find_latest_checkpoint(save_dir: str) -> Optional[str]:
    """Newest `model{N}` checkpoint dir by STEP NUMBER (lexicographic
    order would misorder non-zero-padded names).  Wired to
    `--resume_checkpoint latest` in train_mdm."""
    if not os.path.isdir(save_dir):
        return None
    ckpts = sorted(
        (d for d in os.listdir(save_dir) if re.fullmatch(r"model\d+", d)),
        key=lambda d: int(d[len("model"):]),
    )
    return os.path.join(save_dir, ckpts[-1]) if ckpts else None


def _sampler_arrays(sampler):
    """Array leaves of a resampler state (for checkpointing)."""
    if isinstance(sampler, LossSecondMomentState):
        return {"history": sampler.history, "counts": sampler.counts}
    return {}


def _restore_sampler(sampler, arrays):
    if isinstance(sampler, LossSecondMomentState) and arrays:
        return sampler.replace(
            history=jnp.asarray(arrays["history"]),
            counts=jnp.asarray(arrays["counts"]),
        )
    return sampler
