"""CLIP text tower tests: architecture contracts + tokenizer mechanics."""

import gzip

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.models.clip_text import (
    CLIPTextEncoder,
    SimpleTokenizer,
    tokenize,
)
from gesturediffusion_tpu.utils.text_embedder import HashTextEmbedder


def tiny_clip(**kw):
    kw.setdefault("vocab_size", 600)
    kw.setdefault("width", 32)
    kw.setdefault("heads", 4)
    kw.setdefault("layers", 2)
    kw.setdefault("embed_dim", 16)
    return CLIPTextEncoder(**kw)


class TestCLIPText:
    def test_forward_shape(self):
        m = tiny_clip()
        tokens = jnp.asarray(np.random.RandomState(0).randint(1, 600, (3, 77)))
        params = m.init(jax.random.PRNGKey(0), tokens)
        out = m.apply(params, tokens)
        assert out.shape == (3, 16)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_eot_pooling_position(self):
        """Pooled output reads the position of the max token id (EOT)."""
        m = tiny_clip()
        rs = np.random.RandomState(1)
        base = rs.randint(1, 500, (1, 10)).astype(np.int32)
        t1 = base.copy()
        t1[0, 4] = 599  # EOT at position 4
        t2 = base.copy()
        t2[0, 4] = 599
        t2[0, 7] = 17  # change a token AFTER the EOT position
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(t1))
        o1 = m.apply(params, jnp.asarray(t1))
        o2 = m.apply(params, jnp.asarray(t2))
        # causal mask ⇒ positions after EOT cannot affect the pooled output
        np.testing.assert_allclose(o1, o2, atol=1e-6)

    def test_causal_prefix_dependency(self):
        m = tiny_clip()
        rs = np.random.RandomState(2)
        t1 = rs.randint(1, 500, (1, 10)).astype(np.int32)
        t1[0, 9] = 599
        t2 = t1.copy()
        t2[0, 2] = (t2[0, 2] + 1) % 500 + 1  # change a PREFIX token
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(t1))
        o1 = m.apply(params, jnp.asarray(t1))
        o2 = m.apply(params, jnp.asarray(t2))
        assert float(jnp.abs(o1 - o2).max()) > 1e-6


@pytest.fixture()
def bpe_file(tmp_path):
    """Minimal valid merges file: header + a couple of merges."""
    path = tmp_path / "bpe.txt.gz"
    content = "#version: 0.2\nh e\nhe l</w>\n"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write(content)
    return str(path)


class TestTokenizer:
    def test_byte_fallback_roundtrip(self, bpe_file):
        tok = SimpleTokenizer(bpe_file)
        ids = tok.encode("hello world")
        assert len(ids) > 0
        # decode by vocab lookup
        text = "".join(tok.decoder[i] for i in ids)
        assert "w" in text and "d" in text

    def test_tokenize_array_layout(self, bpe_file):
        tok = SimpleTokenizer(bpe_file)
        arr = tokenize(tok, ["hi", "longer sentence here"], context_length=22)
        assert arr.shape == (2, 22)
        sot = tok.encoder["<|startoftext|>"]
        eot = tok.encoder["<|endoftext|>"]
        assert arr[0, 0] == sot
        assert eot in arr[0]
        # zero-padded after EOT
        eot_pos = int(np.argwhere(arr[0] == eot)[0])
        assert np.all(arr[0, eot_pos + 1 :] == 0)

    def test_merges_applied(self, bpe_file):
        tok = SimpleTokenizer(bpe_file)
        # 'hel' -> merge 'h e' -> 'he', then 'he l</w>' -> 'hel</w>'
        out = tok.bpe("hel")
        assert out == "hel</w>"


class TestHashEmbedder:
    def test_deterministic(self):
        emb = HashTextEmbedder(64)
        a = emb(["walk forward", "wave"])
        b = emb(["walk forward", "wave"])
        np.testing.assert_array_equal(a, b)
        assert a.shape == (2, 64)
        assert not np.allclose(a[0], a[1])
