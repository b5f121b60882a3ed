"""CLIP text encoder (ViT-B/32 text tower) in Flax + BPE tokenizer.

Functional parity surface with the reference's frozen CLIP usage
(reference: model/mdm.py:229-240 load_and_freeze_clip, encode_text
:252-267 with the 20-token context + 77-token zero-pad trick).

Architecture (OpenAI CLIP text transformer): token embedding (49408) +
positional embedding (77) -> 12 pre-LN residual attention blocks
(width 512, 8 heads, QuickGELU MLP x4) -> final LayerNorm -> take the
EOT-token activation -> text projection to 512.

Weights convert 1:1 from an OpenAI CLIP checkpoint via
`convert_clip_text_weights` (the checkpoint is an external asset; see
HashTextEmbedder in utils/text_embedder.py for the asset-free fallback).
The tokenizer is the standard byte-level BPE, reading the public
`bpe_simple_vocab_16e6.txt.gz` merges file.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------- #
# byte-level BPE tokenizer (standard algorithm)
# ---------------------------------------------------------------------- #
@functools.lru_cache()
def bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    import re

    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    """CLIP's byte-level BPE tokenizer (requires the public merges file)."""

    def __init__(self, bpe_path: str):
        # CLIP's pattern needs unicode classes (\p{L}/\p{N}); the `regex`
        # module provides them (ASCII fallback only if it's missing, which
        # changes tokenization of non-ASCII prompts)
        try:
            import regex as re

            pat = (
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
                r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
            )
        except ImportError:
            import re

            pat = (
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
                r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+"
            )
        self._pat_re = re.compile(pat, re.IGNORECASE)
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.pat = self._pat_re

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if (
                    word[i] == first
                    and i < len(word) - 1
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        word = " ".join(word)
        self.cache[token] = word
        return word

    def encode(self, text: str) -> list[int]:
        bpe_tokens: list[int] = []
        text = whitespace_clean(basic_clean(text)).lower()
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(
                self.encoder[t] for t in self.bpe(token).split(" ")
            )
        return bpe_tokens


def tokenize(
    tokenizer: SimpleTokenizer,
    texts: list[str],
    context_length: int = 77,
    truncate: bool = True,
) -> np.ndarray:
    """texts -> [B, context_length] int token array (sot ... eot pad0)."""
    sot = tokenizer.encoder["<|startoftext|>"]
    eot = tokenizer.encoder["<|endoftext|>"]
    result = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        tokens = [sot] + tokenizer.encode(text) + [eot]
        if len(tokens) > context_length:
            if truncate:
                tokens = tokens[:context_length]
                tokens[-1] = eot
            else:
                raise RuntimeError(f"input too long: {text}")
        result[i, : len(tokens)] = tokens
    return result


# ---------------------------------------------------------------------- #
# text transformer
# ---------------------------------------------------------------------- #
class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array, attn_mask: jax.Array) -> jax.Array:
        b, t, d = x.shape
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * d, name="attn_in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        dh = d // self.heads

        def heads(y):
            return y.reshape(b, t, self.heads, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        sim = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * (dh**-0.5)
        sim = sim + attn_mask
        attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.Dense(d, name="attn_out_proj")(out)

        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * d, name="mlp_c_fc")(h)
        h = QuickGELU()(h)
        h = nn.Dense(d, name="mlp_c_proj")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """OpenAI CLIP text tower -> pooled text embedding."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        b, t = tokens.shape
        tok_emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
        )
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = jnp.take(tok_emb, tokens, axis=0) + pos_emb[:t]
        x = x.astype(self.dtype)

        causal = jnp.triu(
            jnp.full((t, t), -jnp.finfo(jnp.float32).max), k=1
        )
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, name=f"resblock_{i}"
            )(x, causal)

        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # pooled: activation at the EOT token (highest token id)
        eot_idx = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim),
        )
        return pooled @ text_projection


def convert_clip_text_weights(state_dict: dict) -> dict:
    """OpenAI CLIP checkpoint state_dict -> CLIPTextEncoder flax params."""

    def np_(key):
        v = state_dict[key]
        return np.asarray(v.float().numpy() if hasattr(v, "float") else v)

    params: dict = {
        "token_embedding": np_("token_embedding.weight"),
        "positional_embedding": np_("positional_embedding"),
        "text_projection": np_("text_projection"),
        "ln_final": {
            "scale": np_("ln_final.weight"),
            "bias": np_("ln_final.bias"),
        },
    }
    layer = 0
    while f"transformer.resblocks.{layer}.attn.in_proj_weight" in state_dict:
        p = f"transformer.resblocks.{layer}"
        params[f"resblock_{layer}"] = {
            "ln_1": {"scale": np_(f"{p}.ln_1.weight"),
                     "bias": np_(f"{p}.ln_1.bias")},
            "ln_2": {"scale": np_(f"{p}.ln_2.weight"),
                     "bias": np_(f"{p}.ln_2.bias")},
            "attn_in_proj": {
                "kernel": np_(f"{p}.attn.in_proj_weight").T,
                "bias": np_(f"{p}.attn.in_proj_bias"),
            },
            "attn_out_proj": {
                "kernel": np_(f"{p}.attn.out_proj.weight").T,
                "bias": np_(f"{p}.attn.out_proj.bias"),
            },
            "mlp_c_fc": {
                "kernel": np_(f"{p}.mlp.c_fc.weight").T,
                "bias": np_(f"{p}.mlp.c_fc.bias"),
            },
            "mlp_c_proj": {
                "kernel": np_(f"{p}.mlp.c_proj.weight").T,
                "bias": np_(f"{p}.mlp.c_proj.bias"),
            },
        }
        layer += 1
    return params


class CLIPTextEmbedder:
    """Host-facing text encoder with the reference's MDM tokenization trick.

    encode(texts) mirrors MDM.encode_text (model/mdm.py:252-267): tokenize
    with context 20+2, zero-pad to 77, run the frozen tower.
    """

    def __init__(
        self,
        params: dict,
        bpe_path: str,
        max_text_len: Optional[int] = 20,
        **model_kw,
    ):
        self.model = CLIPTextEncoder(**model_kw)
        self.params = {"params": params}
        self.tokenizer = SimpleTokenizer(bpe_path)
        self.max_text_len = max_text_len
        self._jit = jax.jit(
            lambda tok: self.model.apply(self.params, tok)
        )

    @classmethod
    def from_torch_checkpoint(cls, ckpt_path: str, bpe_path: str, **kw):
        import torch

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        return cls(convert_clip_text_weights(sd), bpe_path, **kw)

    def __call__(self, texts: list[str]) -> jax.Array:
        if self.max_text_len is not None:
            context_length = self.max_text_len + 2
            tokens = tokenize(
                self.tokenizer, texts, context_length, truncate=True
            )
            pad = np.zeros((tokens.shape[0], 77 - context_length), np.int32)
            tokens = np.concatenate([tokens, pad], axis=1)
        else:
            tokens = tokenize(self.tokenizer, texts, 77, truncate=True)
        return self._jit(jnp.asarray(tokens))


def default_bpe_path() -> Optional[str]:
    for cand in (
        os.environ.get("CLIP_BPE_PATH", ""),
        "assets/clip/bpe_simple_vocab_16e6.txt.gz",
    ):
        if cand and os.path.isfile(cand):
            return cand
    return None
