"""Frozen evaluator networks in Flax.

Functional parity surface with the reference evaluator nets
(reference: data_loaders/humanml/networks/modules.py —
MovementConvEncoder:79, TextEncoderBiGRUCo:311, MotionEncoderBiGRUCo:353;
eval/a2m/action2motion/models.py — MotionDiscriminator:6 /
MotionDiscriminatorForFID:44).

These stay frozen at eval time; metric parity (FID / R-precision) hinges on
bit-accurate ports, so:
  * GRU weights use the torch layout (w_ih [3H, in] with gate order r,z,n)
    and the torch gate math, enabling 1:1 weight conversion from the
    released `finest.tar` / `humanact12_gru.tar` checkpoints
    (see convert_torch_gru / converters below).
  * torch's pack_padded_sequence semantics are reproduced with a masked
    `lax.scan` (updates frozen past each sample's length; the backward
    direction starts at each sample's last valid frame).

Deviation noted: the reference initializes the a2m classifier hidden state
with UNSEEDED torch.randn at every eval call (action2motion/models.py:41)
— nondeterministic eval.  We default to zeros (deterministic); pass
`hidden` explicitly to reproduce stochastic behavior.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------- #
# torch-layout GRU
# ---------------------------------------------------------------------- #
def torch_gru_uniform(hidden_size: int):
    """torch nn.GRU reset_parameters init: U(-1/sqrt(H), +1/sqrt(H)).

    flax nn.initializers.uniform samples [0, scale) — strictly positive
    weights, a badly biased recurrent init for the from-scratch
    evaluator-retraining path (eval/trainers.py).  Inference from
    converted checkpoints never sees this."""
    bound = 1.0 / hidden_size**0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def gru_cell(h, x, w_ih, w_hh, b_ih, b_hh):
    """One torch-semantics GRU step.  Gate order r, z, n."""
    gi = x @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h


def masked_gru(
    inputs: jax.Array,  # [B, T, D]
    lengths: jax.Array,  # [B]
    h0: jax.Array,  # [B, H]
    params: dict,  # w_ih, w_hh, b_ih, b_hh
    reverse: bool = False,
):
    """Run a GRU over valid frames only; returns (outputs [B,T,H], h_last).

    Forward: h stops updating at t >= length (h_last = state at length-1).
    Reverse: iterate T-1..0 skipping t >= length — identical to running on
    the reversed valid segment (pack_padded_sequence backward semantics).
    """
    b, t, _ = inputs.shape

    def step(h, xt_t):
        xt, tt = xt_t
        h_new = gru_cell(h, xt, params["w_ih"], params["w_hh"],
                         params["b_ih"], params["b_hh"])
        valid = (tt < lengths)[:, None]
        h = jnp.where(valid, h_new, h)
        return h, h

    ts = jnp.arange(t)
    xs = jnp.moveaxis(inputs, 1, 0)  # [T, B, D]
    if reverse:
        xs, ts = xs[::-1], ts[::-1]
    h_last, outs = jax.lax.scan(step, h0, (xs, ts))
    outs = jnp.moveaxis(outs, 0, 1)
    if reverse:
        outs = outs[:, ::-1]
    return outs, h_last


class BiGRUCo(nn.Module):
    """Shared BiGRU encoder trunk: input_emb -> BiGRU -> output MLP."""

    input_size: int
    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, inputs: jax.Array, lengths: jax.Array) -> jax.Array:
        b = inputs.shape[0]
        x = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        hidden = self.param(
            "hidden",
            nn.initializers.normal(1.0),
            (2, 1, self.hidden_size),
        )
        h0f = jnp.broadcast_to(hidden[0], (b, self.hidden_size))
        h0b = jnp.broadcast_to(hidden[1], (b, self.hidden_size))

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

        _, h_fwd = masked_gru(x, lengths, h0f, gp("fwd"))
        _, h_bwd = masked_gru(x, lengths, h0b, gp("bwd"), reverse=True)
        h = jnp.concatenate([h_fwd, h_bwd], axis=-1)

        h = nn.Dense(self.hidden_size, name="output_net_0")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="output_net_1")(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        return nn.Dense(self.output_size, name="output_net_3")(h)


class TextEncoderBiGRUCo(nn.Module):
    """Caption encoder: GloVe + POS -> co-embedding."""

    word_size: int = 300
    pos_size: int = 15
    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        pos_embs = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        inputs = word_embs + pos_embs
        return BiGRUCo(
            self.word_size, self.hidden_size, self.output_size, name="trunk"
        )(inputs, cap_lens)


class MotionEncoderBiGRUCo(nn.Module):
    """Movement-feature encoder -> co-embedding."""

    input_size: int = 512
    hidden_size: int = 1024
    output_size: int = 512

    @nn.compact
    def __call__(self, inputs, m_lens):
        return BiGRUCo(
            self.input_size, self.hidden_size, self.output_size, name="trunk"
        )(inputs, m_lens)


class MovementConvEncoder(nn.Module):
    """2x stride-2 conv downsampler (the 'unit_length=4' movement encoder)."""

    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, inputs: jax.Array) -> jax.Array:
        # inputs [B, T, D] (channel-last; reference permutes to Conv1d NCT)
        x = nn.Conv(self.hidden_size, kernel_size=(4,), strides=(2,),
                    padding=[(1, 1)], name="conv0")(inputs)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Conv(self.output_size, kernel_size=(4,), strides=(2,),
                    padding=[(1, 1)], name="conv1")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        return nn.Dense(self.output_size, name="out_net")(x)


class MotionDiscriminator(nn.Module):
    """A2M GRU action classifier (2-layer unidirectional GRU)."""

    input_size: int
    hidden_size: int = 128
    hidden_layer: int = 2
    output_size: int = 12
    return_fid_features: bool = False

    @nn.compact
    def __call__(
        self,
        motion: jax.Array,  # [B, J, F, T]
        lengths: jax.Array,
        hidden: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, j, f, t = motion.shape
        x = motion.reshape(b, j * f, t).transpose(0, 2, 1)  # [B, T, D]

        for layer in range(self.hidden_layer):
            def mk(name, shape, layer=layer):
                return self.param(
                    f"gru_l{layer}_{name}",
                    torch_gru_uniform(self.hidden_size),
                    shape,
                )

            in_size = self.input_size if layer == 0 else self.hidden_size
            params = {
                "w_ih": mk("w_ih", (3 * self.hidden_size, in_size)),
                "w_hh": mk("w_hh", (3 * self.hidden_size, self.hidden_size)),
                "b_ih": mk("b_ih", (3 * self.hidden_size,)),
                "b_hh": mk("b_hh", (3 * self.hidden_size,)),
            }
            h0 = (
                hidden[layer]
                if hidden is not None
                else jnp.zeros((b, self.hidden_size), x.dtype)
            )
            x, _ = masked_gru(x, lengths, h0, params)

        # last valid output per sample
        idx = jnp.clip(lengths - 1, 0, t - 1)
        out = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
        lin1 = jnp.tanh(nn.Dense(30, name="linear1")(out))
        if self.return_fid_features:
            return lin1
        return nn.Dense(self.output_size, name="linear2")(lin1)


# ---------------------------------------------------------------------- #
# torch checkpoint -> flax param converters
# ---------------------------------------------------------------------- #
def convert_torch_gru(sd: dict, prefix: str, direction_suffix: str = ""):
    """torch nn.GRU layer-0 weights -> masked_gru param dict (numpy)."""
    import numpy as np

    return {
        "w_ih": np.asarray(sd[f"{prefix}.weight_ih_l0{direction_suffix}"]),
        "w_hh": np.asarray(sd[f"{prefix}.weight_hh_l0{direction_suffix}"]),
        "b_ih": np.asarray(sd[f"{prefix}.bias_ih_l0{direction_suffix}"]),
        "b_hh": np.asarray(sd[f"{prefix}.bias_hh_l0{direction_suffix}"]),
    }


def convert_text_encoder(sd: dict) -> dict:
    """torch TextEncoderBiGRUCo state_dict -> flax params dict."""
    import numpy as np

    def lin(name):
        return {
            "kernel": np.asarray(sd[f"{name}.weight"]).T,
            "bias": np.asarray(sd[f"{name}.bias"]),
        }

    fwd = convert_torch_gru(sd, "gru")
    bwd = convert_torch_gru(sd, "gru", "_reverse")
    trunk = {
        "input_emb": lin("input_emb"),
        "hidden": np.asarray(sd["hidden"]),
        "output_net_0": lin("output_net.0"),
        "output_net_1": {
            "scale": np.asarray(sd["output_net.1.weight"]),
            "bias": np.asarray(sd["output_net.1.bias"]),
        },
        "output_net_3": lin("output_net.3"),
    }
    for k, v in fwd.items():
        trunk[f"gru_fwd_{k}"] = v
    for k, v in bwd.items():
        trunk[f"gru_bwd_{k}"] = v
    return {"pos_emb": lin("pos_emb"), "trunk": trunk}


def convert_motion_encoder(sd: dict) -> dict:
    import numpy as np

    def lin(name):
        return {
            "kernel": np.asarray(sd[f"{name}.weight"]).T,
            "bias": np.asarray(sd[f"{name}.bias"]),
        }

    fwd = convert_torch_gru(sd, "gru")
    bwd = convert_torch_gru(sd, "gru", "_reverse")
    trunk = {
        "input_emb": lin("input_emb"),
        "hidden": np.asarray(sd["hidden"]),
        "output_net_0": lin("output_net.0"),
        "output_net_1": {
            "scale": np.asarray(sd["output_net.1.weight"]),
            "bias": np.asarray(sd["output_net.1.bias"]),
        },
        "output_net_3": lin("output_net.3"),
    }
    for k, v in fwd.items():
        trunk[f"gru_fwd_{k}"] = v
    for k, v in bwd.items():
        trunk[f"gru_bwd_{k}"] = v
    return {"trunk": trunk}


def convert_movement_encoder(sd: dict) -> dict:
    import numpy as np

    def conv(name):
        # torch Conv1d weight [out, in, k] -> flax [k, in, out]
        return {
            "kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 1, 0),
            "bias": np.asarray(sd[f"{name}.bias"]),
        }

    return {
        "conv0": conv("main.0"),
        "conv1": conv("main.3"),
        "out_net": {
            "kernel": np.asarray(sd["out_net.weight"]).T,
            "bias": np.asarray(sd["out_net.bias"]),
        },
    }


def convert_motion_discriminator(sd: dict, hidden_layer: int = 2) -> dict:
    import numpy as np

    out = {}
    for layer in range(hidden_layer):
        for short, t_name in [
            ("w_ih", "weight_ih"), ("w_hh", "weight_hh"),
            ("b_ih", "bias_ih"), ("b_hh", "bias_hh"),
        ]:
            out[f"gru_l{layer}_{short}"] = np.asarray(
                sd[f"recurrent.{t_name}_l{layer}"]
            )
    for name in ("linear1", "linear2"):
        if f"{name}.weight" in sd:
            out[name] = {
                "kernel": np.asarray(sd[f"{name}.weight"]).T,
                "bias": np.asarray(sd[f"{name}.bias"]),
            }
    return out
