"""Guo et al. text2motion baseline generator (CompV6), inference path.

Functional parity surface with the reference baseline used at eval time
(reference: data_loaders/humanml/networks/trainers.py CompTrainerV6:211
generate:382-446; modules.py — TextEncoderBiGRU:267, TextDecoder
(prior):187, TextVAEDecoder:123, AttLayer:232, MovementConvDecoder:101,
MotionLenEstimatorBiGRU:389; comp_v6_model_dataset.py
CompV6GeneratedDataset:50 with length-estimator sampling :77-94).

Only inference is ported (the reference trains these offline); weights
convert 1:1 from the released torch checkpoints.  The autoregressive
snippet loop is a `lax.scan` over movement steps.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.eval.networks import masked_gru, torch_gru_uniform
from gesturediffusion_tpu.models.embeddings import sinusoidal_table


class TextEncoderBiGRU(nn.Module):
    """Per-word BiGRU encoder -> (word_hids [B,T,2H], last hidden [B,2H])."""

    word_size: int = 300
    pos_size: int = 15
    hidden_size: int = 512

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        b, t, _ = word_embs.shape
        inputs = word_embs + nn.Dense(self.word_size, name="pos_emb")(
            pos_onehot
        )
        x = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        hidden = self.param(
            "hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size)
        )

        def gp(direction):
            def mk(name, shape):
                return self.param(
                    f"gru_{direction}_{name}",
                    torch_gru_uniform(self.hidden_size),
                    shape,
                )

            return {
                "w_ih": mk("w_ih", (3 * self.hidden_size, self.hidden_size)),
                "w_hh": mk("w_hh", (3 * self.hidden_size, self.hidden_size)),
                "b_ih": mk("b_ih", (3 * self.hidden_size,)),
                "b_hh": mk("b_hh", (3 * self.hidden_size,)),
            }

        h0f = jnp.broadcast_to(hidden[0], (b, self.hidden_size))
        h0b = jnp.broadcast_to(hidden[1], (b, self.hidden_size))
        fwd_seq, h_fwd = masked_gru(x, cap_lens, h0f, gp("fwd"))
        bwd_seq, h_bwd = masked_gru(x, cap_lens, h0b, gp("bwd"), reverse=True)
        # reference flips the backward outputs within each caption length
        idx = jnp.arange(t)[None, :]
        valid = (idx < cap_lens[:, None])[..., None]
        flip_idx = jnp.clip(cap_lens[:, None] - 1 - idx, 0, t - 1)
        bwd_flipped = jnp.take_along_axis(bwd_seq, flip_idx[..., None], axis=1)
        # torch's pad_packed_sequence zero-fills positions >= cap_len — the
        # downstream AttLayer attends over ALL T positions, so padded keys
        # must be zeros (not frozen GRU states / initial hiddens)
        fwd_seq = jnp.where(valid, fwd_seq, 0.0)
        bwd_seq = jnp.where(valid, bwd_flipped, 0.0)
        word_hids = jnp.concatenate([fwd_seq, bwd_seq], axis=-1)
        return word_hids, jnp.concatenate([h_fwd, h_bwd], axis=-1)


class AttLayer(nn.Module):
    value_dim: int = 512

    @nn.compact
    def __call__(self, query, key_mat):
        q = nn.Dense(self.value_dim, name="W_q")(query)[..., None]
        k = nn.Dense(self.value_dim, use_bias=False, name="W_k")(key_mat)
        v = nn.Dense(self.value_dim, name="W_v")(key_mat)
        weights = jnp.matmul(k, q) / np.sqrt(self.value_dim)
        co_weights = jax.nn.softmax(weights, axis=1)
        return (v * co_weights).sum(axis=1), co_weights


class _GRUCellStack(nn.Module):
    """n_layers torch GRUCells with explicit param layout."""

    hidden_size: int
    n_layers: int

    @nn.compact
    def __call__(self, x, hidden: list):
        from gesturediffusion_tpu.eval.networks import gru_cell

        new_hidden = []
        h_in = x
        for i in range(self.n_layers):
            in_size = h_in.shape[-1]

            def mk(name, shape, i=i):
                return self.param(
                    f"gru_{i}_{name}",
                    torch_gru_uniform(self.hidden_size),
                    shape,
                )

            h = gru_cell(
                hidden[i], h_in,
                mk("w_ih", (3 * self.hidden_size, in_size)),
                mk("w_hh", (3 * self.hidden_size, self.hidden_size)),
                mk("b_ih", (3 * self.hidden_size,)),
                mk("b_hh", (3 * self.hidden_size,)),
            )
            new_hidden.append(h)
            h_in = h
        return h_in, new_hidden


class TextDecoder(nn.Module):
    """Sequence prior: (inputs, hidden, tta) -> (z, mu, logvar, hidden)."""

    text_size: int = 1024
    output_size: int = 128
    hidden_size: int = 1024
    n_layers: int = 1

    @nn.compact
    def __call__(self, inputs, hidden, p, rng):
        h = nn.Dense(self.hidden_size, name="emb_0")(inputs)
        h = nn.LayerNorm(epsilon=1e-5, name="emb_1")(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        pe = sinusoidal_table(300, self.hidden_size)
        h = h + jnp.take(pe, jnp.clip(p, 0, 299), axis=0)
        h, hidden = _GRUCellStack(
            self.hidden_size, self.n_layers, name="gru"
        )(h, hidden)
        mu = nn.Dense(self.output_size, name="mu_net")(h)
        logvar = nn.Dense(self.output_size, name="logvar_net")(h)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        return z, mu, logvar, hidden


class TextVAEDecoder(nn.Module):
    """Snippet decoder: (inputs, hidden, tta) -> (movement, hidden)."""

    text_size: int = 1024
    output_size: int = 512
    hidden_size: int = 1024
    n_layers: int = 1

    @nn.compact
    def __call__(self, inputs, hidden, p):
        h = nn.Dense(self.hidden_size, name="emb_0")(inputs)
        h = nn.LayerNorm(epsilon=1e-5, name="emb_1")(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        pe = sinusoidal_table(300, self.hidden_size)
        h = h + jnp.take(pe, jnp.clip(p, 0, 299), axis=0)
        h, hidden = _GRUCellStack(
            self.hidden_size, self.n_layers, name="gru"
        )(h, hidden)
        out = nn.Dense(self.hidden_size, name="output_0")(h)
        out = nn.LayerNorm(epsilon=1e-5, name="output_1")(out)
        out = nn.leaky_relu(out, negative_slope=0.2)
        out = nn.Dense(self.output_size, name="output_3")(out)
        return out, hidden


class MovementConvDecoder(nn.Module):
    """Movement latents -> pose snippets (2x ConvTranspose upsampling)."""

    hidden_size: int = 512
    output_size: int = 259  # dim_pose - 4

    @nn.compact
    def __call__(self, inputs):
        # torch ConvTranspose1d(k=4, s=2, p=1) == VALID + crop 1 per side
        x = nn.ConvTranspose(
            self.hidden_size, kernel_size=(4,), strides=(2,),
            padding="VALID", name="deconv0",
        )(inputs)[:, 1:-1]
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.ConvTranspose(
            self.output_size, kernel_size=(4,), strides=(2,),
            padding="VALID", name="deconv1",
        )(x)[:, 1:-1]
        x = nn.leaky_relu(x, negative_slope=0.2)
        return nn.Dense(self.output_size, name="out_net")(x)


class MotionLenEstimatorBiGRU(nn.Module):
    """Caption -> motion-length distribution logits."""

    word_size: int = 300
    pos_size: int = 15
    hidden_size: int = 512
    output_size: int = 50

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        b = word_embs.shape[0]
        inputs = word_embs + nn.Dense(self.word_size, name="pos_emb")(
            pos_onehot
        )
        x = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        hidden = self.param(
            "hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size)
        )

        def gp(direction):
            def mk(name, shape):
                return self.param(
                    f"gru_{direction}_{name}",
                    torch_gru_uniform(self.hidden_size),
                    shape,
                )

            return {
                "w_ih": mk("w_ih", (3 * self.hidden_size, self.hidden_size)),
                "w_hh": mk("w_hh", (3 * self.hidden_size, self.hidden_size)),
                "b_ih": mk("b_ih", (3 * self.hidden_size,)),
                "b_hh": mk("b_hh", (3 * self.hidden_size,)),
            }

        h0f = jnp.broadcast_to(hidden[0], (b, self.hidden_size))
        h0b = jnp.broadcast_to(hidden[1], (b, self.hidden_size))
        _, h_fwd = masked_gru(x, cap_lens, h0f, gp("fwd"))
        _, h_bwd = masked_gru(x, cap_lens, h0b, gp("bwd"), reverse=True)
        h = jnp.concatenate([h_fwd, h_bwd], axis=-1)

        nd = 512
        for i, width in enumerate([nd, nd // 2, nd // 4]):
            h = nn.Dense(width, name=f"output_{3 * i}")(h)
            h = nn.LayerNorm(epsilon=1e-5, name=f"output_{3 * i + 1}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
        return nn.Dense(self.output_size, name="output_9")(h)


# ---------------------------------------------------------------------- #
# torch checkpoint converters
# ---------------------------------------------------------------------- #
def _lin(sd, name):
    return {
        "kernel": np.asarray(sd[f"{name}.weight"]).T,
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def _ln(sd, name):
    return {
        "scale": np.asarray(sd[f"{name}.weight"]),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def _bigru(sd, prefix="gru"):
    from gesturediffusion_tpu.eval.networks import convert_torch_gru

    out = {}
    for k, v in convert_torch_gru(sd, prefix).items():
        out[f"gru_fwd_{k}"] = v
    for k, v in convert_torch_gru(sd, prefix, "_reverse").items():
        out[f"gru_bwd_{k}"] = v
    return out


def convert_text_encoder_bigru(sd: dict) -> dict:
    params = {
        "pos_emb": _lin(sd, "pos_emb"),
        "input_emb": _lin(sd, "input_emb"),
        "hidden": np.asarray(sd["hidden"]),
    }
    params.update(_bigru(sd))
    return params


def convert_grucell_stack(sd: dict, n_layers: int) -> dict:
    out = {}
    for i in range(n_layers):
        out[f"gru_{i}_w_ih"] = np.asarray(sd[f"gru.{i}.weight_ih"])
        out[f"gru_{i}_w_hh"] = np.asarray(sd[f"gru.{i}.weight_hh"])
        out[f"gru_{i}_b_ih"] = np.asarray(sd[f"gru.{i}.bias_ih"])
        out[f"gru_{i}_b_hh"] = np.asarray(sd[f"gru.{i}.bias_hh"])
    return {"gru": out}


def convert_seq_prior(sd: dict, n_layers: int = 1) -> tuple[dict, dict]:
    """torch TextDecoder -> (flax params, z2init params)."""
    params = {
        "emb_0": _lin(sd, "emb.0"),
        "emb_1": _ln(sd, "emb.1"),
        "mu_net": _lin(sd, "mu_net"),
        "logvar_net": _lin(sd, "logvar_net"),
    }
    params.update(convert_grucell_stack(sd, n_layers))
    return params, _lin(sd, "z2init")


def convert_seq_decoder(sd: dict, n_layers: int = 1) -> tuple[dict, dict]:
    """torch TextVAEDecoder -> (flax params, z2init params)."""
    params = {
        "emb_0": _lin(sd, "emb.0"),
        "emb_1": _ln(sd, "emb.1"),
        "output_0": _lin(sd, "output.0"),
        "output_1": _ln(sd, "output.1"),
        "output_3": _lin(sd, "output.3"),
    }
    params.update(convert_grucell_stack(sd, n_layers))
    return params, _lin(sd, "z2init")


def convert_att_layer(sd: dict) -> dict:
    return {
        "W_q": _lin(sd, "W_q"),
        "W_k": {"kernel": np.asarray(sd["W_k.weight"]).T},
        "W_v": _lin(sd, "W_v"),
    }


def convert_movement_decoder(sd: dict) -> dict:
    def deconv(name):
        # torch ConvTranspose1d weight [in, out, k] -> flax [k, in, out]
        # with a spatial flip (flax's transposed conv correlates, torch's
        # convolves)
        w = np.asarray(sd[f"{name}.weight"]).transpose(2, 0, 1)[::-1].copy()
        return {"kernel": w, "bias": np.asarray(sd[f"{name}.bias"])}

    return {
        "deconv0": deconv("main.0"),
        "deconv1": deconv("main.2"),
        "out_net": _lin(sd, "out_net"),
    }


def convert_len_estimator(sd: dict) -> dict:
    params = {
        "pos_emb": _lin(sd, "pos_emb"),
        "input_emb": _lin(sd, "input_emb"),
        "hidden": np.asarray(sd["hidden"]),
    }
    params.update(_bigru(sd))
    for i in (0, 3, 6, 9):
        params[f"output_{i}"] = _lin(sd, f"output.{i}")
        if i < 9:
            params[f"output_{i + 1}"] = _ln(sd, f"output.{i + 1}")
    return params


def convert_comp_v6_checkpoint(ckpt: dict, len_est_ckpt: dict) -> dict:
    """Released torch tars -> CompV6Generator params dict."""
    from gesturediffusion_tpu.eval.networks import convert_movement_encoder

    def sd(d, key):
        return {k: np.asarray(v) for k, v in d[key].items()}

    pri, z2init_pri = convert_seq_prior(sd(ckpt, "seq_pri"))
    dec, z2init_dec = convert_seq_decoder(sd(ckpt, "seq_dec"))
    return {
        "text_enc": convert_text_encoder_bigru(sd(ckpt, "text_enc")),
        "seq_pri": pri,
        "seq_dec": dec,
        "z2init_pri": z2init_pri,
        "z2init_dec": z2init_dec,
        "att_layer": convert_att_layer(sd(ckpt, "att_layer")),
        "mov_enc": convert_movement_encoder(sd(ckpt, "mov_enc")),
        "mov_dec": convert_movement_decoder(sd(ckpt, "mov_dec")),
        "len_estimator": convert_len_estimator(
            sd(len_est_ckpt, "estimator")
        ),
    }


class CompV6Generator:
    """Inference bundle mirroring CompTrainerV6.generate.

    All sub-network params live in `self.params` (converted from the
    released torch checkpoint or randomly initialized for smoke runs).
    """

    def __init__(
        self,
        dim_pose: int = 263,
        unit_length: int = 4,
        text_hidden: int = 512,
        movement_latent: int = 512,
        z_dim: int = 128,
        hidden_size: int = 1024,
        n_layers: int = 1,
        params: Optional[dict] = None,
        seed: int = 0,
    ):
        self.dim_pose = dim_pose
        self.unit_length = unit_length
        text_size = 2 * text_hidden

        from gesturediffusion_tpu.eval.networks import MovementConvEncoder

        self.text_enc = TextEncoderBiGRU(hidden_size=text_hidden)
        self.seq_pri = TextDecoder(
            text_size=text_size, output_size=z_dim,
            hidden_size=hidden_size, n_layers=n_layers,
        )
        self.seq_dec = TextVAEDecoder(
            text_size=text_size, output_size=movement_latent,
            hidden_size=hidden_size, n_layers=n_layers,
        )
        self.att_layer = AttLayer(value_dim=text_size)
        self.mov_enc = MovementConvEncoder(
            hidden_size=movement_latent, output_size=movement_latent
        )
        # decoder outputs the FULL pose incl. contact features
        # (reference: comp_v6_model_dataset.py:37 builds it with
        # opt.dim_pose; the eval pipeline slices [..., :-4] later)
        self.mov_dec = MovementConvDecoder(
            hidden_size=movement_latent, output_size=dim_pose
        )
        self.len_estimator = MotionLenEstimatorBiGRU()
        # z2init projections (hidden -> initial GRU states); standalone
        # Dense modules because only the generate() entry uses them
        self._z2init_pri = nn.Dense(hidden_size * n_layers)
        self._z2init_dec = nn.Dense(hidden_size * n_layers)

        if params is not None:
            self.params = params
        else:
            self.params = self._init_random(seed)

    def _init_random(self, seed):
        k = jax.random.split(jax.random.PRNGKey(seed), 8)
        b, t = 1, 8
        word = jnp.zeros((b, t, 300))
        pos = jnp.zeros((b, t, 15))
        lens = jnp.asarray([t])
        text_size = 2 * self.text_enc.hidden_size
        mov = jnp.zeros((b, self.unit_length, self.dim_pose - 4))
        hidden1 = [jnp.zeros((b, self.seq_pri.hidden_size))]
        return {
            "text_enc": self.text_enc.init(k[0], word, pos, lens)["params"],
            "seq_pri": self.seq_pri.init(
                k[1],
                jnp.zeros((b, 512 + text_size)),
                hidden1, jnp.zeros((b,), jnp.int32), k[6],
            )["params"],
            "seq_dec": self.seq_dec.init(
                k[2],
                jnp.zeros((b, 512 + text_size + 128)),
                hidden1, jnp.zeros((b,), jnp.int32),
            )["params"],
            "att_layer": self.att_layer.init(
                k[3], jnp.zeros((b, self.seq_pri.hidden_size)),
                jnp.zeros((b, t, text_size)),
            )["params"],
            "mov_enc": self.mov_enc.init(k[4], mov)["params"],
            "mov_dec": self.mov_dec.init(
                k[5], jnp.zeros((b, 2, 512))
            )["params"],
            "len_estimator": self.len_estimator.init(
                k[7], word, pos, lens
            )["params"],
            "z2init_pri": self._z2init_pri.init(
                k[6], jnp.zeros((b, text_size))
            )["params"],
            "z2init_dec": self._z2init_dec.init(
                k[5], jnp.zeros((b, text_size))
            )["params"],
        }

    def estimate_length_logits(self, word_embs, pos_ohot, cap_lens):
        return self.len_estimator.apply(
            {"params": self.params["len_estimator"]},
            jnp.asarray(word_embs), jnp.asarray(pos_ohot),
            jnp.asarray(cap_lens),
        )

    def generate(
        self, word_embs, pos_ohot, cap_lens, m_lens, mov_len: int, rng
    ):
        """Autoregressive snippet generation (trainers.py:382-446)."""
        b = word_embs.shape[0]

        mov_in0 = self.mov_enc.apply(
            {"params": self.params["mov_enc"]},
            jnp.zeros((b, self.unit_length, self.dim_pose - 4)),
        )[:, 0]

        word_hids, hidden = self.text_enc.apply(
            {"params": self.params["text_enc"]},
            jnp.asarray(word_embs), jnp.asarray(pos_ohot),
            jnp.asarray(cap_lens),
        )

        def init_hidden(module, which):
            h = module.apply({"params": self.params[which]}, hidden)
            return list(jnp.split(h, self.seq_pri.n_layers, axis=-1))

        hidden_pri = init_hidden(self._z2init_pri, "z2init_pri")
        hidden_dec = init_hidden(self._z2init_dec, "z2init_dec")

        movements = []
        mov_in = mov_in0
        m_lens = jnp.asarray(m_lens)
        for i in range(mov_len):
            att_vec, _ = self.att_layer.apply(
                {"params": self.params["att_layer"]},
                hidden_dec[-1], word_hids,
            )
            tta = (m_lens // self.unit_length - i).astype(jnp.int32)
            rng, zrng = jax.random.split(rng)
            pri_in = jnp.concatenate([mov_in, att_vec], axis=-1)
            z_pri, _, _, hidden_pri = self.seq_pri.apply(
                {"params": self.params["seq_pri"]},
                pri_in, hidden_pri, tta, zrng,
            )
            dec_in = jnp.concatenate([mov_in, att_vec, z_pri], axis=-1)
            fake_mov, hidden_dec = self.seq_dec.apply(
                {"params": self.params["seq_dec"]},
                dec_in, hidden_dec, tta,
            )
            movements.append(fake_mov[:, None])
            mov_in = fake_mov

        fake_movements = jnp.concatenate(movements, axis=1)
        fake_motions = self.mov_dec.apply(
            {"params": self.params["mov_dec"]}, fake_movements
        )
        return fake_motions  # [B, mov_len * unit_length, dim_pose]
