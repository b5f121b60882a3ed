"""Fused encoder-layer Pallas kernel: parity + param-tree compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.models.transformer import (
    FusedTransformerEncoderLayer,
    TransformerEncoder,
    TransformerEncoderLayer,
)
from gesturediffusion_tpu.ops.pallas_encoder import fused_encoder_layer


def _layer_args(params):
    p = params
    return (
        p["self_attn"]["in_proj"]["kernel"], p["self_attn"]["in_proj"]["bias"],
        p["self_attn"]["out_proj"]["kernel"],
        p["self_attn"]["out_proj"]["bias"],
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["linear1"]["kernel"], p["linear1"]["bias"],
        p["linear2"]["kernel"], p["linear2"]["bias"],
        p["norm2"]["scale"], p["norm2"]["bias"],
    )


class TestFusedEncoderLayerKernel:
    @pytest.mark.parametrize("b,t,d,h,f", [
        (5, 81, 256, 4, 1024),   # gesture (CFG batch is 2x41, odd T)
        (3, 24, 128, 4, 256),    # small/odd
    ])
    def test_matches_xla_layer(self, b, t, d, h, f):
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(b, t, d) * 0.5, jnp.float32)
        layer = TransformerEncoderLayer(
            d_model=d, num_heads=h, dim_feedforward=f, dropout=0.0
        )
        params = layer.init(jax.random.PRNGKey(0), x)["params"]
        want = layer.apply({"params": params}, x, deterministic=True)
        got = fused_encoder_layer(
            x, *_layer_args(params), num_heads=h, block_b=2, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )

    def test_module_param_tree_identical(self):
        """FusedTransformerEncoderLayer must load checkpoints trained with
        TransformerEncoderLayer (identical tree: names + shapes)."""
        x = jnp.zeros((2, 12, 64))
        kw = dict(d_model=64, num_heads=4, dim_feedforward=128)
        p_xla = TransformerEncoderLayer(**kw).init(
            jax.random.PRNGKey(0), x
        )["params"]
        p_fused = FusedTransformerEncoderLayer(**kw).init(
            jax.random.PRNGKey(0), x
        )["params"]
        flat_a = jax.tree_util.tree_map(jnp.shape, p_xla)
        flat_b = jax.tree_util.tree_map(jnp.shape, p_fused)
        assert flat_a == flat_b

    def test_fused_module_matches_xla_with_same_params(self):
        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.randn(3, 20, 64), jnp.float32)
        kw = dict(d_model=64, num_heads=4, dim_feedforward=128, dropout=0.1)
        xla = TransformerEncoderLayer(**kw)
        params = xla.init(jax.random.PRNGKey(0), x)
        want = xla.apply(params, x, deterministic=True)
        got = FusedTransformerEncoderLayer(**kw, block_b=2).apply(
            params, x, deterministic=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )

    def test_encoder_flag_swaps_layers(self):
        rs = np.random.RandomState(2)
        x = jnp.asarray(rs.randn(2, 16, 64), jnp.float32)
        kw = dict(num_layers=2, d_model=64, num_heads=4, dim_feedforward=128)
        enc = TransformerEncoder(**kw)
        params = enc.init(jax.random.PRNGKey(0), x)
        want = enc.apply(params, x, deterministic=True)
        got = TransformerEncoder(**kw, use_fused_layer=True).apply(
            params, x, deterministic=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )

    def test_fused_stack_pads_once_unaligned_shapes(self):
        """The padded-I/O stacking path (pad once around the layer loop,
        T % 8 != 0 and B % block_b != 0) must match the unfused stack —
        garbage in the padded region may never leak into real rows."""
        rs = np.random.RandomState(7)
        x = jnp.asarray(rs.randn(5, 13, 64), jnp.float32)
        kw = dict(num_layers=3, d_model=64, num_heads=4, dim_feedforward=96)
        enc = TransformerEncoder(**kw)
        params = enc.init(jax.random.PRNGKey(0), x)
        want = enc.apply(params, x, deterministic=True)
        got = TransformerEncoder(**kw, use_fused_layer=True).apply(
            params, x, deterministic=True
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )

    def test_auto_block_b_known_shapes(self):
        """The VMEM-fit + pad-minimizing rule must reproduce the
        measured-good blocks: gesture [82,82,256]/ff1024 -> 21 (pads 82
        -> 84, not the 88 the max-fitting block 22 would), t2m
        [64,200,512]/ff1024 -> 8 (exact division)."""
        from gesturediffusion_tpu.ops.pallas_encoder import (
            _auto_block_b, pick_block_b,
        )

        assert _auto_block_b(82, 88, 1024) == 21
        assert _auto_block_b(64, 200, 1024) == 8
        # tiny batches never pad up past one grid step
        assert _auto_block_b(3, 88, 1024) == 3
        # pad-minimizing selection: exact divisor wins over max block
        assert pick_block_b(82, 22) == 21       # 84 padded rows, not 88
        assert pick_block_b(328, 23) == 22      # serving layout: 330
        assert pick_block_b(7, 4) == 4          # 8 rows either way
        assert pick_block_b(5, 22) == 5         # b <= max: one grid step
        assert pick_block_b(9, 0) == 1          # degenerate budget

    def test_auto_block_matches_explicit(self):
        """block_b=None (auto) must be numerically identical to explicit."""
        rs = np.random.RandomState(7)
        x = jnp.asarray(rs.randn(5, 81, 256) * 0.5, jnp.float32)
        layer = TransformerEncoderLayer(
            d_model=256, num_heads=4, dim_feedforward=1024, dropout=0.0
        )
        params = layer.init(jax.random.PRNGKey(0), x)["params"]
        want = fused_encoder_layer(
            x, *_layer_args(params), num_heads=4, block_b=2, interpret=True
        )
        got = fused_encoder_layer(
            x, *_layer_args(params), num_heads=4, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )

    def test_fused_layer_rejects_training_mode(self):
        x = jnp.zeros((2, 12, 64))
        kw = dict(d_model=64, num_heads=4, dim_feedforward=128)
        layer = FusedTransformerEncoderLayer(**kw)
        params = layer.init(jax.random.PRNGKey(0), x)
        with pytest.raises(NotImplementedError):
            layer.apply(params, x, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})


class TestFusedEncoderInModels:
    def test_motionmdm_fused_matches(self):
        from gesturediffusion_tpu.models.mdm_t2m import MotionMDM

        rs = np.random.RandomState(3)
        B, J, T = 3, 16, 24
        x = jnp.asarray(rs.randn(B, J, 1, T), jnp.float32)
        t = jnp.zeros((B,), jnp.int32)
        cond = {"text_emb": jnp.asarray(rs.randn(B, 512), jnp.float32)}
        kw = dict(njoints=J, latent_dim=64, num_layers=2, ff_size=128,
                  cond_mode="text", cond_mask_prob=0.1)
        m = MotionMDM(**kw)
        params = m.init(jax.random.PRNGKey(0), x, t, cond)
        want = m.apply(params, x, t, cond)
        got = MotionMDM(**kw, use_fused_encoder=True).apply(
            params, x, t, cond
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )

    def test_mdm_gesture_fused_matches(self):
        from gesturediffusion_tpu.models.mdm import MDM

        rs = np.random.RandomState(4)
        B, J, T, S = 3, 16, 20, 4
        x = jnp.asarray(rs.randn(B, J, 1, T), jnp.float32)
        t = jnp.zeros((B,), jnp.int32)
        cond = {
            "mfcc": jnp.asarray(rs.randn(B, 26, 1, T), jnp.float32),
            "seed": jnp.asarray(rs.randn(B, J, 1, S), jnp.float32),
        }
        kw = dict(njoints=J, latent_dim=32, num_layers=2, ff_size=64,
                  seed_poses=S, cl_head=4, window_size=10)
        m = MDM(**kw)
        params = m.init(jax.random.PRNGKey(0), x, t, cond)
        want = m.apply(params, x, t, cond)
        got = MDM(**kw, use_fused_encoder=True).apply(params, x, t, cond)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )
