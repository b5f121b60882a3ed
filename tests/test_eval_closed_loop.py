"""Closed-loop eval discrimination rehearsal: the metric stack must RANK
models, not just execute.

Today every full-protocol run uses pretrained (or random) evaluator
weights; a sign-flipped FID, a broken renorm, or a co-embedding mismatch
would pass every identity test.  This rehearsal closes the loop
hermetically, end to end through the SAME code paths the real protocol
uses (reference protocol: eval/eval_humanml.py:138-226,
eval/a2m/action2motion/evaluate.py):

  t2m: build a synthetic paired text<->motion world with K latent
  classes -> train the T2M evaluator stack from scratch with
  eval/trainers.py (decomp movement AE, then contrastive text-motion
  match) -> train a tiny MotionMDM diffusion model on the same world ->
  run eval/eval_humanml.evaluation() on the trained model vs an
  UNTRAINED twin -> assert FID(trained) < FID(untrained),
  R-precision(trained) > R-precision(untrained), matching score
  (trained) < (untrained), and FID(ground truth) ~ 0.

  a2m: train the GRU action classifier (eval/trainers.py
  make_action_classifier_trainer) on synthetic labeled xyz motions ->
  run eval/eval_a2m.A2MEvaluation.evaluate() on a faithful generator vs
  a noise generator -> assert accuracy and FID rank them correctly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.diffusion import ModelMeanType, create_diffusion
from gesturediffusion_tpu.diffusion.resample import (
    create_named_schedule_sampler,
)
from gesturediffusion_tpu.diffusion.sampling import p_sample_loop
from gesturediffusion_tpu.eval.comp_v6 import MovementConvDecoder
from gesturediffusion_tpu.eval.eval_a2m import A2MEvaluation
from gesturediffusion_tpu.eval.eval_humanml import (
    GeneratedMotionSet,
    GroundTruthMotionSet,
    evaluation,
)
from gesturediffusion_tpu.eval.evaluator_wrapper import EvaluatorWrapper
from gesturediffusion_tpu.eval.networks import (
    MotionDiscriminator,
    MotionEncoderBiGRUCo,
    MovementConvEncoder,
    TextEncoderBiGRUCo,
)
from gesturediffusion_tpu.eval.trainers import (
    make_action_classifier_trainer,
    make_decomp_trainer,
    make_text_motion_match_trainer,
)
from gesturediffusion_tpu.models.mdm_t2m import MotionMDM
from gesturediffusion_tpu.train.loop import (
    TrainConfig,
    TrainState,
    make_optimizer,
    make_train_step,
)

# ----------------------------------------------------------------------- #
# Synthetic paired text<->motion world
# ----------------------------------------------------------------------- #
# 32 classes with eval batch_size 32 and items ordered i % K means every
# evaluation batch holds each class exactly once, so a perfect evaluator
# can reach R-precision ~1.0 (with K < batch size, same-class duplicate
# captions inside the batch cap top-k at k * K / batch_size).
K = 32         # latent classes
DP = 23        # dim_pose (last 4 = foot-contact features, evaluator strips)
TW = 6         # caption tokens
TM = 32        # motion frames (divisible by unit_length 4)
CLIP_DIM = 16  # tiny "CLIP" text embedding for the generator

_WORLD = np.random.RandomState(99)
CLASS_WORDS = _WORLD.randn(K, TW, 300).astype(np.float32)      # captions
CLASS_POS = np.eye(15, dtype=np.float32)[_WORLD.randint(0, 15, (K, TW))]
# smooth class-distinct motion templates
_t = np.linspace(0, 2 * np.pi, TM)[:, None]
CLASS_MOTION = np.stack(
    [
        np.sin(_t * _WORLD.uniform(0.5, 3.0, DP) + _WORLD.uniform(0, 6, DP))
        * _WORLD.uniform(0.5, 1.5, DP)
        for _ in range(K)
    ]
).astype(np.float32)  # [K, TM, DP]
CLASS_TEXT_EMB = _WORLD.randn(K, CLIP_DIM).astype(np.float32)


class SyntheticPairedT2M:
    """Eval-item contract of Text2MotionDatasetV2 (motion/length/text/
    word_embeddings/pos_one_hots/sent_len) over the synthetic world."""

    def __init__(self, n, seed, noise=0.08):
        self.n = n
        self.rs = np.random.RandomState(seed)
        self.noise = noise
        self._items = [self._make(i) for i in range(n)]

    def _make(self, i):
        c = i % K
        return {
            "motion": CLASS_MOTION[c]
            + self.rs.randn(TM, DP).astype(np.float32) * self.noise,
            "length": TM,
            "text": f"class {c}",
            "word_embeddings": CLASS_WORDS[c]
            + self.rs.randn(TW, 300).astype(np.float32) * 0.01,
            "pos_one_hots": CLASS_POS[c],
            "sent_len": TW,
        }

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self._items[i]


def _text_encoder(captions):
    return np.stack([CLASS_TEXT_EMB[int(c.split()[-1])] for c in captions])


def _train_evaluator(seed=0):
    """Train the full-size T2M evaluator stack (the EvaluatorWrapper
    architectures) on the synthetic world: decomp AE then contrastive
    text-motion match."""
    rs = np.random.RandomState(seed)
    mov_enc = MovementConvEncoder(hidden_size=512, output_size=512)
    mov_dec = MovementConvDecoder(hidden_size=512, output_size=DP)
    d_init, d_step = make_decomp_trainer(mov_enc, mov_dec, lr=1e-3)

    def batch(bs=32):
        idx = rs.randint(0, K, bs)
        motions = CLASS_MOTION[idx] + rs.randn(bs, TM, DP).astype(
            np.float32
        ) * 0.08
        return idx, jnp.asarray(motions)

    _, m0 = None, None
    state = d_init(jax.random.PRNGKey(seed), batch()[1])
    for _ in range(30):
        state, dm = d_step(state, batch()[1])
    movement_params = state.params["enc"]

    text_enc = TextEncoderBiGRUCo(word_size=300, pos_size=15,
                                  hidden_size=512, output_size=512)
    mot_enc = MotionEncoderBiGRUCo(input_size=512, hidden_size=1024,
                                   output_size=512)
    m_init, m_step, m_val = make_text_motion_match_trainer(
        text_enc, mot_enc, mov_enc, movement_params, lr=1e-3,
    )

    def tm_batch(bs=32):
        idx, motions = batch(bs)
        words = jnp.asarray(
            CLASS_WORDS[idx] + rs.randn(bs, TW, 300).astype(np.float32) * 0.01
        )
        pos = jnp.asarray(CLASS_POS[idx])
        cap_lens = jnp.full((bs,), TW, jnp.int32)
        m_lens = jnp.full((bs,), TM, jnp.int32)
        return words, pos, cap_lens, motions, m_lens

    w, p, cl, mo, ml = tm_batch()
    state = m_init(jax.random.PRNGKey(seed + 1), w, p, cl, mo, ml)
    rng = jax.random.PRNGKey(seed + 2)
    first = last = None
    for i in range(150):
        rng, srng = jax.random.split(rng)
        state, tm = m_step(state, srng, *tm_batch())
        if first is None:
            first = float(tm["loss"])
        last = float(tm["loss"])
    assert last < first, "contrastive evaluator training did not learn"
    return {
        "text": state.params["text"],
        "motion": state.params["motion"],
        "movement": movement_params,
    }


def _train_generator(n_steps, seed=3):
    """A tiny MotionMDM trained (or not, n_steps=0) on the world."""
    model = MotionMDM(
        njoints=DP, nfeats=1, latent_dim=32, ff_size=64, num_layers=1,
        num_heads=2, dropout=0.0, clip_dim=CLIP_DIM, cond_mode="text",
        cond_mask_prob=0.0,
    )
    diffusion = create_diffusion(
        steps=8, noise_schedule="cosine",
        model_mean_type=ModelMeanType.START_X,
    )
    rs = np.random.RandomState(seed)
    B = 32

    def batch():
        idx = rs.randint(0, K, B)
        motions = (
            CLASS_MOTION[idx] + rs.randn(B, TM, DP).astype(np.float32) * 0.08
        ).transpose(0, 2, 1)[:, :, None, :]  # [B, DP, 1, TM]
        cond = {
            "text_emb": jnp.asarray(CLASS_TEXT_EMB[idx]),
            "mask": jnp.ones((B, 1, 1, TM), bool),
        }
        return jnp.asarray(motions), cond

    x0, cond0 = batch()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed), x0, jnp.zeros((B,), jnp.int32),
        {"text_emb": cond0["text_emb"]},
    )

    def apply_fn(p, x, t, c, rngs=None):
        return model.apply(p, x, t, c, train=True, rngs=rngs)

    cfg = TrainConfig(lr=3e-3)
    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=params,
        opt_state=tx.init(params), ema_params={},
        sampler=create_named_schedule_sampler("uniform", 8),
    )
    step = make_train_step(diffusion, apply_fn, tx, cfg)
    rng = jax.random.PRNGKey(seed + 1)
    for _ in range(n_steps):
        motion, cond = batch()
        state, metrics = step(state, motion, cond, rng)

    final_params = state.params

    def sample_fn(srng, dcond):
        return p_sample_loop(
            diffusion,
            lambda x, t, c: model.apply(final_params, x, t, c),
            (dcond["text_emb"].shape[0], DP, 1, TM), srng, dcond,
        )

    return jax.jit(sample_fn)


@pytest.mark.slow
def test_t2m_eval_stack_discriminates(tmp_path):
    evaluator_params = _train_evaluator()
    wrapper = EvaluatorWrapper(
        dataset_name="humanml", params=evaluator_params, dim_pose=DP
    )

    ds = SyntheticPairedT2M(64, seed=21)
    gt_loader = GroundTruthMotionSet(ds, batch_size=32, max_frames=TM,
                                     cache=True)

    trained_fn = _train_generator(n_steps=400)
    untrained_fn = _train_generator(n_steps=0)

    def make_loader(fn, seed):
        def make(replication):
            return (
                GeneratedMotionSet(
                    fn, SyntheticPairedT2M(64, seed=seed + replication),
                    text_encoder=_text_encoder, batch_size=32,
                    max_frames=TM, scale=1.0, seed=seed + replication,
                ),
                {},
            )

        return make

    mean_dict = evaluation(
        wrapper, gt_loader,
        {
            "trained": make_loader(trained_fn, 100),
            "untrained": make_loader(untrained_fn, 200),
        },
        log_file=str(tmp_path / "closed_loop.log"),
        replication_times=1, diversity_times=30, run_mm=False,
    )

    fid_gt = mean_dict["FID_ground truth"]
    fid_tr = mean_dict["FID_trained"]
    fid_un = mean_dict["FID_untrained"]
    assert fid_gt < 0.1 * fid_tr, (fid_gt, fid_tr)
    assert fid_tr < 0.6 * fid_un, (
        f"FID does not rank models: trained {fid_tr}, untrained {fid_un}"
    )

    r_tr = mean_dict["R_precision_trained"]
    r_un = mean_dict["R_precision_untrained"]
    r_gt = mean_dict["R_precision_ground truth"]
    assert r_gt[2] > 0.9, f"evaluator failed to learn the world: {r_gt}"
    assert r_tr[2] > r_un[2] + 0.1, (
        f"R-precision does not rank models: trained {r_tr}, "
        f"untrained {r_un}"
    )

    ms_tr = mean_dict["Matching Score_trained"]
    ms_un = mean_dict["Matching Score_untrained"]
    assert ms_tr < ms_un, (ms_tr, ms_un)


# ----------------------------------------------------------------------- #
# a2m: trained GRU classifier ranks a faithful vs a noise generator
# ----------------------------------------------------------------------- #
@pytest.mark.slow
def test_a2m_eval_stack_discriminates():
    KA, JA, TA, BA = 6, 8, 16, 48
    rs = np.random.RandomState(7)
    templates = rs.randn(KA, JA, 3, TA).astype(np.float32)

    def draw(labels, noise=0.1, rsd=None):
        r = rsd or rs
        return (
            templates[labels]
            + r.randn(len(labels), JA, 3, TA).astype(np.float32) * noise
        )

    # hidden_size 128 / 2 layers = the real humanact12_gru architecture
    # A2MEvaluation hardcodes (eval_a2m.py:63-70)
    clf = MotionDiscriminator(input_size=JA * 3, hidden_size=128,
                              hidden_layer=2, output_size=KA)
    init, step = make_action_classifier_trainer(clf, lr=2e-3)
    lengths = jnp.full((BA,), TA, jnp.int32)
    labels0 = rs.randint(0, KA, BA)
    state = init(jax.random.PRNGKey(0), jnp.asarray(draw(labels0)), lengths)
    acc = 0.0
    for i in range(150):
        labels = rs.randint(0, KA, BA)
        state, m = step(state, jnp.asarray(draw(labels)), lengths,
                        jnp.asarray(labels))
        acc = float(m["acc"])
        if acc == 1.0 and i > 20:
            break
    assert acc > 0.9, f"classifier failed to train (acc {acc})"

    evaluator = A2MEvaluation(
        input_size_raw=JA * 3, num_classes=KA,
        classifier_params=state.params,
    )

    def batches(kind, seed):
        r = np.random.RandomState(seed)
        out = []
        for _ in range(3):
            labels = r.randint(0, KA, BA)
            if kind == "faithful":
                xyz = draw(labels, rsd=r)
            else:  # noise generator (untrained model analogue)
                xyz = r.randn(BA, JA, 3, TA).astype(np.float32)
            out.append({
                "output_xyz": xyz,
                "lengths": np.full((BA,), TA, np.int64),
                "y": labels,
            })
        return out

    metrics = evaluator.evaluate({
        "gt": batches("faithful", 11),
        "good": batches("faithful", 22),
        "bad": batches("noise", 33),
    })

    assert metrics["accuracy_good"] > 0.9
    assert metrics["accuracy_good"] > metrics["accuracy_bad"] + 0.3
    assert metrics["fid_gt"] < 0.1 * max(metrics["fid_good"], 1e-6) or (
        metrics["fid_gt"] < metrics["fid_good"]
    )
    assert metrics["fid_good"] < 0.2 * metrics["fid_bad"], (
        f"a2m FID does not rank: good {metrics['fid_good']}, "
        f"bad {metrics['fid_bad']}"
    )
