"""ST-GCN skeleton action classifier in Flax.

Functional parity surface with the reference ST-GCN stack
(reference: eval/a2m/recognition/models/stgcn.py:11-210 — 10 st_gcn
blocks, edge-importance weighting, data BN, avgpool + 1x1 conv head;
stgcnutils/tgcn.py ConvTemporalGraphical; stgcnutils/graph.py — layouts
openpose(18) / smpl(24) / smpl_noglobal(23) / ntu + 'spatial' partition
strategy; eval/unconstrained/models/* — the MoDi variant with the
15-joint openpose layout).

Used frozen at eval time (UESTC accuracy/FID, unconstrained FID/KID/
precision/recall); weights convert from the released torch tars via
convert_stgcn.  Graph adjacency math is host numpy (static metadata).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.models.smpl import SMPL_PARENTS


# ---------------------------------------------------------------------- #
# graph construction (host-side, static)
# ---------------------------------------------------------------------- #
def _layout_edges(layout: str, parents: Optional[Sequence[int]] = None):
    if layout == "openpose":  # 18-joint original
        num_node = 18
        neighbor = [(4, 3), (3, 2), (7, 6), (6, 5), (13, 12), (12, 11),
                    (10, 9), (9, 8), (11, 5), (8, 2), (5, 1), (2, 1),
                    (0, 1), (15, 0), (14, 0), (17, 15), (16, 14)]
        center = 1
    elif layout == "openpose15":  # MoDi-struct 15-joint variant
        num_node = 15
        neighbor = [(4, 3), (3, 2), (2, 1), (7, 6), (6, 5), (5, 1), (1, 0),
                    (14, 13), (13, 12), (12, 8), (11, 10), (10, 9), (9, 8),
                    (8, 1)]
        center = 1
    elif layout == "smpl":
        num_node = 24
        parents = parents or SMPL_PARENTS
        neighbor = [(j, parents[j]) for j in range(1, num_node)]
        center = 0
    elif layout == "smpl_noglobal":
        parents = parents or SMPL_PARENTS
        neighbor = [
            (j - 1, parents[j] - 1)
            for j in range(1, 24)
            if parents[j] != 0 and j != 0
        ]
        num_node = 23
        center = 0
    elif layout == "ntu-rgb+d":
        num_node = 25
        neighbor_1base = [(1, 2), (2, 21), (3, 21), (4, 3), (5, 21), (6, 5),
                          (7, 6), (8, 7), (9, 21), (10, 9), (11, 10),
                          (12, 11), (13, 1), (14, 13), (15, 14), (16, 15),
                          (17, 1), (18, 17), (19, 18), (20, 19), (22, 23),
                          (23, 8), (24, 25), (25, 12)]
        neighbor = [(i - 1, j - 1) for (i, j) in neighbor_1base]
        center = 20
    else:
        raise NotImplementedError(f"layout {layout}")
    self_link = [(i, i) for i in range(num_node)]
    return num_node, self_link + neighbor, center


def _hop_distance(num_node: int, edges, max_hop: int = 1) -> np.ndarray:
    A = np.zeros((num_node, num_node))
    for i, j in edges:
        A[j, i] = 1
        A[i, j] = 1
    hop_dis = np.full((num_node, num_node), np.inf)
    transfer = [np.linalg.matrix_power(A, d) for d in range(max_hop + 1)]
    arrive = np.stack(transfer) > 0
    for d in range(max_hop, -1, -1):
        hop_dis[arrive[d]] = d
    return hop_dis


def _normalize_digraph(A: np.ndarray) -> np.ndarray:
    Dl = A.sum(0)
    Dn = np.zeros_like(A)
    idx = Dl > 0
    Dn[np.where(idx)[0], np.where(idx)[0]] = Dl[idx] ** -1
    return A @ Dn


def build_graph(
    layout: str = "openpose15",
    strategy: str = "spatial",
    max_hop: int = 1,
    parents: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """Adjacency stack [K, V, V] (spatial partitioning per ST-GCN paper)."""
    num_node, edges, center = _layout_edges(layout, parents)
    hop_dis = _hop_distance(num_node, edges, max_hop)
    valid_hop = range(0, max_hop + 1)
    adjacency = np.zeros((num_node, num_node))
    for hop in valid_hop:
        adjacency[hop_dis == hop] = 1
    norm_adj = _normalize_digraph(adjacency)

    if strategy == "uniform":
        return norm_adj[None]
    if strategy == "distance":
        A = np.zeros((len(list(valid_hop)), num_node, num_node))
        for i, hop in enumerate(valid_hop):
            A[i][hop_dis == hop] = norm_adj[hop_dis == hop]
        return A
    if strategy == "spatial":
        A = []
        for hop in valid_hop:
            a_root = np.zeros((num_node, num_node))
            a_close = np.zeros((num_node, num_node))
            a_further = np.zeros((num_node, num_node))
            for i in range(num_node):
                for j in range(num_node):
                    if hop_dis[j, i] == hop:
                        if hop_dis[j, center] == hop_dis[i, center]:
                            a_root[j, i] = norm_adj[j, i]
                        elif hop_dis[j, center] > hop_dis[i, center]:
                            a_close[j, i] = norm_adj[j, i]
                        else:
                            a_further[j, i] = norm_adj[j, i]
            if hop == 0:
                A.append(a_root)
            else:
                A.append(a_root + a_close)
                A.append(a_further)
        return np.stack(A)
    raise NotImplementedError(f"strategy {strategy}")


# ---------------------------------------------------------------------- #
# network
# ---------------------------------------------------------------------- #
class GraphConv(nn.Module):
    """ConvTemporalGraphical: 1x1 conv to K*C then contraction with A."""

    out_channels: int
    spatial_kernel: int

    @nn.compact
    def __call__(self, x: jax.Array, A: jax.Array) -> jax.Array:
        # x [N, T, V, C_in] channel-last
        n, t, v, _ = x.shape
        h = nn.Conv(
            self.out_channels * self.spatial_kernel, kernel_size=(1, 1),
            name="conv",
        )(x)
        h = h.reshape(n, t, v, self.spatial_kernel, self.out_channels)
        return jnp.einsum("ntvkc,kvw->ntwc", h, A)


class STGCNBlock(nn.Module):
    out_channels: int
    temporal_kernel: int = 9
    stride: int = 1
    residual: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, A: jax.Array, *, train: bool = False):
        in_channels = x.shape[-1]
        if not self.residual:
            res = 0.0
        elif in_channels == self.out_channels and self.stride == 1:
            res = x
        else:
            res = nn.Conv(
                self.out_channels, kernel_size=(1, 1),
                strides=(self.stride, 1), name="res_conv",
            )(x)
            res = nn.BatchNorm(
                use_running_average=not train, name="res_bn"
            )(res)

        h = GraphConv(
            self.out_channels, A.shape[0], name="gcn"
        )(x, A)
        h = nn.BatchNorm(use_running_average=not train, name="tcn_bn1")(h)
        h = nn.relu(h)
        pad = (self.temporal_kernel - 1) // 2
        h = nn.Conv(
            self.out_channels,
            kernel_size=(self.temporal_kernel, 1),
            strides=(self.stride, 1),
            padding=[(pad, pad), (0, 0)],
            name="tcn_conv",
        )(h)
        h = nn.BatchNorm(use_running_average=not train, name="tcn_bn2")(h)
        return nn.relu(h + res)


# block configurations: (channels, strides)
STGCN_VARIANTS = {
    # 10-block stack (reference: eval/a2m/recognition/models/stgcn.py:50-62)
    "recognition": (
        (64, 64, 64, 64, 128, 128, 128, 256, 256, 256),
        (1, 1, 1, 1, 2, 1, 1, 2, 1, 1),
    ),
    # 6-block MoDi stack (reference: eval/unconstrained/models/stgcn.py:52-61)
    "modi": ((64, 64, 64, 128, 128, 256), (1, 1, 1, 2, 1, 2)),
}


class STGCN(nn.Module):
    """ST-GCN classifier; input [N, C, T, V]."""

    in_channels: int = 3
    num_class: int = 12
    layout: str = "openpose15"
    strategy: str = "spatial"
    edge_importance_weighting: bool = True
    variant: str = "modi"

    def setup(self):
        self.A = jnp.asarray(
            build_graph(self.layout, self.strategy), jnp.float32
        )
        channels, strides = STGCN_VARIANTS[self.variant]
        self.blocks = [
            STGCNBlock(
                out_channels=c, stride=s, residual=(i != 0),
                name=f"st_gcn_{i}",
            )
            for i, (c, s) in enumerate(zip(channels, strides))
        ]
        if self.edge_importance_weighting:
            self.edge_importance = [
                self.param(
                    f"edge_importance_{i}", nn.initializers.ones, self.A.shape
                )
                for i in range(len(self.blocks))
            ]
        else:
            self.edge_importance = [1.0] * len(self.blocks)
        self.data_bn = nn.BatchNorm(use_running_average=True, name="data_bn")
        self.fcn = nn.Dense(self.num_class, name="fcn")

    def __call__(
        self, x: jax.Array, *, train: bool = False, return_features=False
    ):
        # x: [N, C, T, V]
        n, c, t, v = x.shape
        # data BN over V*C per frame (reference: data_bn on [N, V*C, T])
        h = x.transpose(0, 2, 3, 1).reshape(n, t, v * c)
        h = self.data_bn(h)
        h = h.reshape(n, t, v, c)

        for block, imp in zip(self.blocks, self.edge_importance):
            h = block(h, self.A * imp, train=train)

        # global average pool over (T, V)
        feats = h.mean(axis=(1, 2))  # [N, 256]
        logits = self.fcn(feats)
        if return_features:
            return logits, feats
        return logits


def load_stgcn_checkpoint(path_or_ckpt) -> dict:
    """Load + convert a released ST-GCN tar into flax variables.

    Accepts a path or an already-`torch.load`ed object (callers that
    inspect the raw file, e.g. prepare/verify_assets.py, don't pay a
    second load); unwraps the reference's ``{"model": state_dict}``
    wrapper when present.  The single load+convert definition shared by
    STGCNA2MEvaluation (eval_a2m.py) and UnconstrainedEvaluator
    (eval_unconstrained.py)."""
    import os

    if isinstance(path_or_ckpt, (str, bytes, os.PathLike)):
        import torch

        sd = torch.load(path_or_ckpt, map_location="cpu",
                        weights_only=False)
    else:
        sd = path_or_ckpt
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return convert_stgcn({k: v.numpy() for k, v in sd.items()})


def convert_stgcn(sd: dict, num_blocks: int | None = None) -> dict:
    """torch STGCN state_dict -> flax params (frozen eval use)."""
    import numpy as np
    import re

    if num_blocks is None:
        num_blocks = 1 + max(
            int(m.group(1))
            for k in sd
            if (m := re.match(r"st_gcn_networks\.(\d+)", k))
        )

    def conv(name):
        return {
            "kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[f"{name}.bias"]),
        }

    def bn(name):
        return {
            "scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"]),
        }

    def bn_stats(name):
        return {
            "mean": np.asarray(sd[f"{name}.running_mean"]),
            "var": np.asarray(sd[f"{name}.running_var"]),
        }

    params: dict = {"data_bn": bn("data_bn")}
    batch_stats: dict = {"data_bn": bn_stats("data_bn")}
    fcn_w = np.asarray(sd["fcn.weight"])  # [num_class, 256, 1, 1]
    params["fcn"] = {
        "kernel": fcn_w[:, :, 0, 0].T,
        "bias": np.asarray(sd["fcn.bias"]),
    }
    for i in range(num_blocks):
        p = f"st_gcn_networks.{i}"
        blk = {
            "gcn": {"conv": conv(f"{p}.gcn.conv")},
            "tcn_bn1": bn(f"{p}.tcn.0"),
            "tcn_conv": conv(f"{p}.tcn.2"),
            "tcn_bn2": bn(f"{p}.tcn.3"),
        }
        stats = {
            "tcn_bn1": bn_stats(f"{p}.tcn.0"),
            "tcn_bn2": bn_stats(f"{p}.tcn.3"),
        }
        if f"{p}.residual.0.weight" in sd:
            blk["res_conv"] = conv(f"{p}.residual.0")
            blk["res_bn"] = bn(f"{p}.residual.1")
            stats["res_bn"] = bn_stats(f"{p}.residual.1")
        params[f"st_gcn_{i}"] = blk
        batch_stats[f"st_gcn_{i}"] = stats
    for i in range(num_blocks):
        key = f"edge_importance.{i}"
        if key in sd:
            params[f"edge_importance_{i}"] = np.asarray(sd[key])
    return {"params": params, "batch_stats": batch_stats}
