"""CompV6 baseline generator tests + torch golden parity of sub-nets."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.eval.comp_v6 import (
    AttLayer,
    CompV6Generator,
    MovementConvDecoder,
    TextEncoderBiGRU,
    convert_att_layer,
    convert_movement_decoder,
    convert_text_encoder_bigru,
)

RS = np.random.RandomState(0)


class TestCompV6Smoke:
    def test_generate_shapes(self):
        gen = CompV6Generator(dim_pose=67)
        b, t = 2, 8
        word = RS.randn(b, t, 300).astype(np.float32)
        pos = RS.randn(b, t, 15).astype(np.float32)
        lens = np.asarray([8, 5])
        out = gen.generate(word, pos, lens, m_lens=np.asarray([16, 16]),
                           mov_len=4, rng=jax.random.PRNGKey(0))
        # FULL pose width (reference comp_v6_model_dataset.py:37 builds
        # the decoder with opt.dim_pose; the eval pipeline slices later)
        assert out.shape == (2, 16, 67)  # mov_len * unit_length, dim_pose
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_length_estimator(self):
        gen = CompV6Generator(dim_pose=67)
        word = RS.randn(1, 6, 300).astype(np.float32)
        pos = RS.randn(1, 6, 15).astype(np.float32)
        logits = gen.estimate_length_logits(word, pos, np.asarray([6]))
        assert logits.shape == (1, 50)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data_loaders/humanml/networks/modules.py"),
    reason="reference not mounted",
)
class TestTorchParity:
    @classmethod
    def _ref(cls):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_modules2",
            "/root/reference/data_loaders/humanml/networks/modules.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_text_encoder_bigru_parity(self):
        import torch

        ref = self._ref()
        torch.manual_seed(0)
        net = ref.TextEncoderBiGRU(word_size=20, pos_size=15,
                                   hidden_size=16, device="cpu")
        net.eval()
        b, t = 3, 9
        word = RS.randn(b, t, 20).astype(np.float32)
        pos = RS.randn(b, t, 15).astype(np.float32)
        lens = np.asarray([9, 6, 4])
        with torch.no_grad():
            seq_t, last_t = net(
                torch.from_numpy(word), torch.from_numpy(pos),
                torch.from_numpy(lens),
            )
        flax_net = TextEncoderBiGRU(word_size=20, pos_size=15,
                                    hidden_size=16)
        params = {"params": convert_text_encoder_bigru(
            {k: v.numpy() for k, v in net.state_dict().items()}
        )}
        seq_j, last_j = flax_net.apply(
            params, jnp.asarray(word), jnp.asarray(pos), jnp.asarray(lens)
        )
        np.testing.assert_allclose(np.asarray(last_j), last_t.numpy(),
                                   atol=2e-5)
        # FULL sequences including padding: torch pad_packed_sequence
        # zero-fills positions >= cap_len, and the AttLayer downstream
        # attends over all T positions, so padding must match exactly
        np.testing.assert_allclose(
            np.asarray(seq_j), seq_t.numpy(), atol=2e-5
        )
        for i, length in enumerate(lens):
            np.testing.assert_allclose(
                np.asarray(seq_j)[i, length:], 0.0, atol=0.0
            )

    def test_att_layer_parity(self):
        import torch

        ref = self._ref()
        torch.manual_seed(1)
        net = ref.AttLayer(query_dim=12, key_dim=20, value_dim=16)
        net.eval()
        q = RS.randn(2, 12).astype(np.float32)
        k = RS.randn(2, 7, 20).astype(np.float32)
        with torch.no_grad():
            pred_t, w_t = net(torch.from_numpy(q), torch.from_numpy(k))
        flax_net = AttLayer(value_dim=16)
        params = {"params": convert_att_layer(
            {n: v.numpy() for n, v in net.state_dict().items()}
        )}
        pred_j, w_j = flax_net.apply(params, jnp.asarray(q), jnp.asarray(k))
        np.testing.assert_allclose(np.asarray(pred_j), pred_t.numpy(),
                                   atol=2e-5)

    def test_movement_decoder_parity(self):
        import torch

        ref = self._ref()
        torch.manual_seed(2)
        net = ref.MovementConvDecoder(input_size=24, hidden_size=16,
                                      output_size=10)
        net.eval()
        x = RS.randn(2, 6, 24).astype(np.float32)
        with torch.no_grad():
            out_t = net(torch.from_numpy(x)).numpy()
        flax_net = MovementConvDecoder(hidden_size=16, output_size=10)
        params = {"params": convert_movement_decoder(
            {n: v.numpy() for n, v in net.state_dict().items()}
        )}
        out_j = flax_net.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5)
