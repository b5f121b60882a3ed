"""Evaluator-stack TRAINING on TPU: regenerate the frozen T2M evaluator
networks (finest.tar contents) from scratch.

Functional parity surface with the reference trainer *training* paths
(reference: data_loaders/humanml/networks/trainers.py —
DecompTrainerV3:25-108 movement autoencoder (L1 recon + latent sparsity
+ latent smoothness), LengthEstTrainer:748-877 caption->length-bucket
cross-entropy, TextMotionMatchTrainer:879-1080 text/motion contrastive
co-embedding; modules.py:11-24 ContrastiveLoss).  In the reference these
loops have no CLI entry point (dead code) — here they are importable and
jitted so the evaluator stack can be retrained on TPU.

TPU design: each trainer is a pure jitted step over a flax.struct state
(donated buffers, optax adam + global-norm clip where the reference
clips); the epoch loop stays host-side and tiny.  The reference's
host-side descending-length sort (pack_padded_sequence food) is
unnecessary — masked_gru handles ragged lengths natively — but the
embedding math is identical.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax


def contrastive_loss(emb1: jax.Array, emb2: jax.Array, label: jax.Array,
                     margin: float = 10.0) -> jax.Array:
    """Hadsell-Chopra-LeCun contrastive loss (reference:
    data_loaders/humanml/networks/modules.py:11-24): label 0 pulls the
    pair together (squared distance), label 1 pushes it past `margin`."""
    dist = jnp.sqrt(jnp.sum((emb1 - emb2) ** 2, axis=-1) + 1e-12)
    pos = (1.0 - label) * dist**2
    neg = label * jnp.maximum(margin - dist, 0.0) ** 2
    return jnp.mean(pos + neg)


class TrainerState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def _make_state(params, tx) -> TrainerState:
    return TrainerState(
        step=jnp.asarray(0, jnp.int32), params=params,
        opt_state=tx.init(params),
    )


def _adam_with_clip(lr: float, clip: Optional[float]) -> optax.GradientTransformation:
    if clip is None:
        return optax.adam(lr)
    return optax.chain(optax.clip_by_global_norm(clip), optax.adam(lr))


# ---------------------------------------------------------------------- #
# DecompTrainerV3: movement autoencoder
# ---------------------------------------------------------------------- #
def make_decomp_trainer(
    movement_enc,
    movement_dec,
    lr: float = 1e-4,
    lambda_sparsity: float = 0.001,
    lambda_smooth: float = 0.001,
):
    """Movement autoencoder trainer (reference: trainers.py:54-92 —
    recon L1 on the full pose, mean-|latent| sparsity, latent temporal
    smoothness L1; the reference never enables its commented-out grad
    clip).  Returns (init_fn(rng, sample_motion) -> state,
    step_fn(state, motions) -> (state, metrics))."""
    tx = _adam_with_clip(lr, None)

    def init(rng, motions) -> TrainerState:
        k1, k2 = jax.random.split(rng)
        enc_p = movement_enc.init(k1, motions[..., :-4])["params"]
        lat = movement_enc.apply({"params": enc_p}, motions[..., :-4])
        dec_p = movement_dec.init(k2, lat)["params"]
        return _make_state({"enc": enc_p, "dec": dec_p}, tx)

    def loss_fn(params, motions):
        # encoder sees dim_pose-4 (contact features stripped), decoder
        # reconstructs the FULL pose — reference trainers.py:57-61
        # (l1_criterion(recon_motions, motions), decoder built with
        # output dim_pose)
        latents = movement_enc.apply({"params": params["enc"]},
                                     motions[..., :-4])
        recon = movement_dec.apply({"params": params["dec"]}, latents)
        loss_rec = jnp.mean(jnp.abs(recon - motions))
        loss_sparsity = jnp.mean(jnp.abs(latents))
        loss_smooth = jnp.mean(jnp.abs(latents[:, 1:] - latents[:, :-1]))
        loss = (loss_rec + lambda_sparsity * loss_sparsity
                + lambda_smooth * loss_smooth)
        return loss, {"loss": loss, "loss_rec": loss_rec,
                      "loss_sparsity": loss_sparsity,
                      "loss_smooth": loss_smooth}

    @jax.jit
    def step(state: TrainerState, motions):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, motions
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state,
        ), metrics

    return init, step


# ---------------------------------------------------------------------- #
# LengthEstTrainer: caption -> motion-length bucket
# ---------------------------------------------------------------------- #
def make_length_est_trainer(
    estimator, lr: float = 1e-4, unit_length: int = 4,
    clip: float = 0.5,
):
    """Length-estimator trainer (reference: trainers.py:790-877 —
    cross-entropy vs m_lens // unit_length, clip_grad_norm 0.5)."""
    tx = _adam_with_clip(lr, clip)

    def init(rng, word_embs, pos_ohot, cap_lens) -> TrainerState:
        params = estimator.init(rng, word_embs, pos_ohot, cap_lens)["params"]
        return _make_state(params, tx)

    def loss_fn(params, word_embs, pos_ohot, cap_lens, m_lens):
        logits = estimator.apply({"params": params}, word_embs, pos_ohot,
                                 cap_lens)
        labels = m_lens // unit_length
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        )
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, {"loss": loss, "acc": acc}

    @jax.jit
    def step(state: TrainerState, word_embs, pos_ohot, cap_lens, m_lens):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, word_embs, pos_ohot, cap_lens, m_lens
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state,
        ), metrics

    return init, step


# ---------------------------------------------------------------------- #
# TextMotionMatchTrainer: contrastive co-embedding
# ---------------------------------------------------------------------- #
def make_text_motion_match_trainer(
    text_encoder,
    motion_encoder,
    movement_encoder,
    movement_params: Any,
    lr: float = 1e-4,
    negative_margin: float = 10.0,
    unit_length: int = 4,
    clip: float = 0.5,
):
    """Text-motion matching trainer (reference: trainers.py:941-998):
    the FROZEN movement encoder (from the decomp stage) feeds the motion
    encoder; positive pairs pull, index-shifted negative pairs push past
    `negative_margin`; both encoders train with clip_grad_norm 0.5.

    step(state, rng, word_embs, pos_ohot, cap_lens, motions, m_lens):
    the reference draws the negative shift with host numpy randint; here
    it comes from `rng` inside the jitted step."""
    tx = _adam_with_clip(lr, clip)

    def init(rng, word_embs, pos_ohot, cap_lens, motions,
             m_lens) -> TrainerState:
        k1, k2 = jax.random.split(rng)
        movements = movement_encoder.apply(
            {"params": movement_params}, motions[..., :-4]
        )
        params = {
            "text": text_encoder.init(
                k1, word_embs, pos_ohot, cap_lens)["params"],
            "motion": motion_encoder.init(
                k2, movements, m_lens // unit_length)["params"],
        }
        return _make_state(params, tx)

    def embed(params, word_embs, pos_ohot, cap_lens, motions, m_lens):
        movements = jax.lax.stop_gradient(
            movement_encoder.apply({"params": movement_params},
                                   motions[..., :-4])
        )
        motion_emb = motion_encoder.apply(
            {"params": params["motion"]}, movements, m_lens // unit_length
        )
        text_emb = text_encoder.apply(
            {"params": params["text"]}, word_embs, pos_ohot, cap_lens
        )
        return text_emb, motion_emb

    def loss_fn(params, shift, word_embs, pos_ohot, cap_lens, motions,
                m_lens):
        text_emb, motion_emb = embed(params, word_embs, pos_ohot,
                                     cap_lens, motions, m_lens)
        b = text_emb.shape[0]
        loss_pos = contrastive_loss(
            text_emb, motion_emb, jnp.zeros((b,)), negative_margin
        )
        mis_idx = (jnp.arange(b) + shift) % b
        loss_neg = contrastive_loss(
            text_emb, motion_emb[mis_idx], jnp.ones((b,)), negative_margin
        )
        loss = loss_pos + loss_neg
        return loss, {"loss": loss, "loss_pos": loss_pos,
                      "loss_neg": loss_neg}

    @jax.jit
    def step(state: TrainerState, rng, word_embs, pos_ohot, cap_lens,
             motions, m_lens):
        b = word_embs.shape[0]
        shift = jax.random.randint(rng, (), 1, b)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, shift, word_embs, pos_ohot, cap_lens, motions,
            m_lens,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state,
        ), metrics

    @jax.jit
    def val_loss(state: TrainerState, word_embs, pos_ohot, cap_lens,
                 motions, m_lens):
        """Deterministic validation loss (shift 1, like an epoch-start
        reference draw); used by fit loops to pick `finest`.  Jitted:
        every device-touching step in this module is one compiled
        program — an eager forward is a per-op round-trip storm on
        tunneled TPU backends (see bench.py "measurement gotcha")."""
        loss, metrics = loss_fn(
            state.params, jnp.asarray(1), word_embs, pos_ohot, cap_lens,
            motions, m_lens,
        )
        return metrics

    return init, step, val_loss


# ---------------------------------------------------------------------- #
# Action-classifier trainer (a2m GRU / FID feature net)
# ---------------------------------------------------------------------- #
def make_action_classifier_trainer(classifier, lr: float = 1e-4,
                                   clip: Optional[float] = None):
    """Cross-entropy trainer for the a2m GRU classifier
    (eval/networks.py MotionDiscriminator).  The reference ships its a2m
    recognition models pretrained from the action2motion release with no
    training entry point (prepare/download_recognition_models.sh); this
    closes the regenerate-the-evaluator-assets gap the same way the T2M
    trainers above do.

    Returns (init_fn(rng, motions, lengths) -> state,
    step_fn(state, motions, lengths, labels) -> (state, metrics));
    motions are [B, J, 3, T] xyz like the evaluation batches."""
    tx = _adam_with_clip(lr, clip)

    def init(rng, motions, lengths) -> TrainerState:
        params = classifier.init(rng, motions, lengths)["params"]
        return _make_state(params, tx)

    def loss_fn(params, motions, lengths, labels):
        logits = classifier.apply({"params": params}, motions, lengths)
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        )
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, {"loss": loss, "acc": acc}

    @jax.jit
    def step(state: TrainerState, motions, lengths, labels):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, motions, lengths, labels
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state,
        ), metrics

    return init, step


def fit(step_fn, state, batches, log_every: int = 0,
        log: Callable = print):
    """Minimal host epoch loop: run step_fn over an iterable of
    argument tuples, return (state, mean metrics)."""
    sums: dict = {}
    n = 0
    for batch in batches:
        state, metrics = step_fn(state, *batch)
        n += 1
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        if log_every and n % log_every == 0:
            log(f"step {n}: " + ", ".join(
                f"{k}={sums[k] / n:.4f}" for k in sorted(sums)))
    return state, {k: v / max(n, 1) for k, v in sums.items()}


def save_finest(path: str, params: dict) -> None:
    """Write retrained evaluator params as an Orbax dir consumable by
    EvaluatorWrapper(params=...) via load_checkpoint."""
    import orbax.checkpoint as ocp

    import os

    ocp.PyTreeCheckpointer().save(
        os.path.abspath(path),
        jax.tree_util.tree_map(np.asarray, params), force=True,
    )
