"""Trajectory golden: N optimizer steps vs the REFERENCE torch trainer.

Converts one tiny randomly-initialized reference MDM into Flax
(utils/convert_torch.py), then drives BOTH trainers over the same
batches with injected identical timesteps and diffusion noise:

  * reference side: the exact run_step semantics of
    /root/reference/train/training_loop.py:205-248 — loss =
    (training_losses(...)['loss'] * weights).mean(), loss.backward(),
    torch AdamW(lr, weight_decay).step() (:66-68), then the post-step
    linear _anneal_lr (:248-253)
  * my side: the production jitted step from train/loop.py
    (make_train_step + make_optimizer) with t/noise injected

and asserts the per-step loss curves track and the final parameters
convert back within f32 tolerance.  This pins the optimizer + gradient
semantics (AdamW bias correction, decoupled weight decay, LR-anneal
off-by-one, masked-loss gradients) that forward-parity goldens cannot.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_convert_torch import _load_reference_mdm_module  # noqa: E402
from test_diffusion_golden import _load_reference_diffusion  # noqa: E402

from gesturediffusion_tpu.diffusion import (  # noqa: E402
    ModelMeanType,
    create_diffusion,
)
from gesturediffusion_tpu.diffusion.resample import (  # noqa: E402
    create_named_schedule_sampler,
)
from gesturediffusion_tpu.models.mdm import MDM  # noqa: E402
from gesturediffusion_tpu.train.loop import (  # noqa: E402
    TrainConfig,
    TrainState,
    make_optimizer,
    make_train_step,
)
from gesturediffusion_tpu.utils.convert_torch import (  # noqa: E402
    convert_mdm_state_dict,
    export_mdm_state_dict,
)

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "model", "mdm.py")),
    reason="reference not mounted",
)

B, J, T, S, D = 4, 24, 20, 3, 32
STEPS = 8  # diffusion steps
N_UPDATES = 25


def _build_models():
    """(reference torch MDM, my MDM, converted variables) — both
    deterministic in train mode (dropout=0, cond_mask_prob=0)."""
    import torch

    ref_mdm = _load_reference_mdm_module()
    torch.manual_seed(5)
    ref = ref_mdm.MDM(
        njoints=J, nfeats=1, pose_rep="genea_vec", data_rep="genea_vec",
        latent_dim=D, text_dim=8, ff_size=64, num_layers=2, num_heads=4,
        dropout=0.0, use_text=False, cond_mask_prob=0.0, seed_poses=S,
        mfcc_input=True,
    )
    mine = MDM(
        njoints=J, latent_dim=D, text_dim=8, ff_size=64, num_layers=2,
        num_heads=4, seed_poses=S, cond_mask_prob=0.0, mfcc_dim=26,
        use_text=False, window_size=10, cl_head=8, dropout=0.0,
    )
    variables = convert_mdm_state_dict(ref.state_dict(), mine)
    return ref, mine, variables


def _batches(n, seed=11):
    rs = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        out.append(
            dict(
                motion=rs.randn(B, J, 1, T).astype(np.float32) * 0.5,
                mfcc=rs.randn(B, 26, 1, T).astype(np.float32),
                seed=rs.randn(B, J, 1, S).astype(np.float32) * 0.5,
                t=rs.randint(0, STEPS, size=B).astype(np.int64),
                noise=rs.randn(B, J, 1, T).astype(np.float32),
            )
        )
    return out


def _run_reference(batches, lr, weight_decay, lr_anneal_steps):
    """The reference trainer inner loop, verbatim semantics
    (training_loop.py:205-248 + _anneal_lr :248-253; uniform sampler
    weights are 1, resample.py)."""
    import torch
    from torch.optim import AdamW

    gd, rsp = _load_reference_diffusion()
    betas = gd.get_named_beta_schedule("cosine", STEPS)
    diffusion = rsp.SpacedDiffusion(
        use_timesteps=range(STEPS),
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
        lambda_vel=0.0, lambda_rcxyz=0.0, lambda_fc=0.0,
    )

    ref, _, _ = _build_models()
    ref.train()
    opt = AdamW(ref.parameters(), lr=lr, weight_decay=weight_decay)

    mask = torch.ones(B, 1, 1, T, dtype=torch.bool)
    losses_hist = []
    for step, b in enumerate(batches):
        opt.zero_grad()
        losses = diffusion.training_losses(
            ref,
            torch.from_numpy(b["motion"]),
            torch.from_numpy(b["t"]),
            model_kwargs={
                "y": {
                    "mfcc": torch.from_numpy(b["mfcc"]),
                    "seed": torch.from_numpy(b["seed"]),
                    "mask": mask,
                }
            },
            noise=torch.from_numpy(b["noise"]),
        )
        loss = losses["loss"].mean()  # uniform weights == 1
        loss.backward()
        opt.step()
        if lr_anneal_steps:
            frac_done = step / lr_anneal_steps
            for group in opt.param_groups:
                group["lr"] = lr * (1 - frac_done)
        losses_hist.append(float(loss))
    return ref, np.asarray(losses_hist)


def _run_mine(batches, variables, model, lr, weight_decay, lr_anneal_steps):
    diffusion = create_diffusion(
        steps=STEPS, noise_schedule="cosine",
        model_mean_type=ModelMeanType.START_X,
    )

    def apply_fn(p, x, t, c, rngs=None):
        return model.apply(p, x, t, c, train=True, rngs=rngs)

    cfg = TrainConfig(
        lr=lr, weight_decay=weight_decay, lr_anneal_steps=lr_anneal_steps
    )
    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables,
        opt_state=tx.init(variables),
        ema_params={},
        sampler=create_named_schedule_sampler("uniform", STEPS),
    )
    step = make_train_step(diffusion, apply_fn, tx, cfg)

    mask = jnp.ones((B, 1, 1, T), bool)
    losses_hist = []
    rng = jax.random.PRNGKey(0)
    for b in batches:
        cond = {
            "mfcc": jnp.asarray(b["mfcc"]),
            "seed": jnp.asarray(b["seed"]),
            "mask": mask,
        }
        state, metrics = step(
            state, jnp.asarray(b["motion"]), cond, rng,
            jnp.asarray(b["t"], jnp.int32), jnp.asarray(b["noise"]),
        )
        losses_hist.append(float(metrics["loss"]))
    return state, np.asarray(losses_hist)


@pytest.mark.parametrize(
    "weight_decay,lr_anneal_steps",
    # wd=0.5 is deliberately large: a coupled-vs-decoupled or missing
    # decay shifts the mean param deviation by ~lr*wd*|p|*N ≈ 1.25e-3,
    # 15x the measured cross-framework noise floor (8e-5)
    [(0.0, 0), (0.5, 0), (0.0, 20)],
    ids=["plain", "weight_decay", "lr_anneal"],
)
def test_training_trajectory_tracks_reference(weight_decay, lr_anneal_steps):
    lr = 1e-3
    batches = _batches(N_UPDATES)

    ref_final, ref_losses = _run_reference(
        batches, lr, weight_decay, lr_anneal_steps
    )
    _, model, variables = _build_models()
    my_state, my_losses = _run_mine(
        batches, variables, model, lr, weight_decay, lr_anneal_steps
    )

    # per-step loss curves must track.  The step-0 gap (~2e-3 rel) is
    # pure cross-framework forward drift (XLA-vs-torch LayerNorm/GELU/
    # matmul orderings), present before any update; a wrong optimizer
    # (missing bias correction, coupled weight decay, lr off) diverges
    # by >10% within a few steps at this lr.
    np.testing.assert_allclose(my_losses, ref_losses, rtol=2.5e-2, atol=1e-4)
    # ...and the loss must actually have gone DOWN (the trajectory moved)
    assert my_losses[-1] < my_losses[0] * 0.9

    # Final parameters: Adam turns near-zero-gradient sign flips into
    # full-lr per-param differences, so individual params can drift by a
    # few lr (measured max 1.5e-2, p99 2.1e-3) — but the MEAN absolute
    # deviation across the whole model is the sharp statistic: measured
    # 8.3e-5, while a systematic optimizer error (wrong lr, missing bias
    # correction, coupled/missing weight decay at wd=0.5) shifts it by
    # >1e-3.
    my_sd = export_mdm_state_dict(my_state.params, model)
    ref_sd = {k: v.detach().numpy() for k, v in ref_final.state_dict().items()}
    diffs, checked = [], 0
    for k, v in my_sd.items():
        if k not in ref_sd:
            continue
        d = np.abs(np.asarray(v) - ref_sd[k])
        assert d.max() < 4e-2, (
            f"param {k} diverged by {d.max():.2e} after {N_UPDATES} updates"
        )
        diffs.append(d.ravel())
        checked += 1
    assert checked > 20  # the full model really was compared
    alldiff = np.concatenate(diffs)
    assert alldiff.mean() < 4e-4, f"mean param drift {alldiff.mean():.2e}"
    assert np.percentile(alldiff, 99) < 6e-3


def test_anneal_schedule_matches_reference_exactly():
    """make_optimizer's anneal must reproduce the reference's post-step
    _anneal_lr: update k applies lr*(1 - max(0, k-1)/N)."""
    lr, n = 1e-3, 10
    cfg = TrainConfig(lr=lr, lr_anneal_steps=n)
    tx = make_optimizer(cfg)

    params = {"w": jnp.zeros((3,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((3,))}

    applied = []
    for k in range(n + 3):
        updates, opt_state = tx.update(grads, opt_state, params)
        # unit gradient, fresh-ish Adam moments: |update| == current lr
        # only after bias correction settles; instead read the schedule
        # count's lr directly from the update magnitude ratio
        applied.append(float(-updates["w"][0]))

    # reference lr sequence: lr, lr, lr*(1-1/N), lr*(1-2/N), ...
    want = [lr * (1.0 - max(0, k - 1) / n) for k in range(n + 3)]
    # Adam with constant unit grads: update = lr_k * mhat/(sqrt(vhat)+eps)
    # where the moment ratio is IDENTICAL across k-sequences, so the
    # ratio applied[k]/applied[0] equals want[k]/want[0] up to the moment
    # trajectory — compare against a torch AdamW replay instead
    import torch

    tparams = [torch.zeros(3, requires_grad=True)]
    topt = torch.optim.AdamW(tparams, lr=lr, weight_decay=0.0)
    twant = []
    prev = tparams[0].detach().clone()
    for k in range(n + 3):
        tparams[0].grad = torch.ones(3)
        topt.step()
        twant.append(float((prev - tparams[0].detach())[0]))
        prev = tparams[0].detach().clone()
        frac_done = k / n
        for group in topt.param_groups:
            group["lr"] = lr * (1 - max(0.0, min(1.0, frac_done)))

    np.testing.assert_allclose(applied, twant, rtol=1e-5, atol=1e-9)
