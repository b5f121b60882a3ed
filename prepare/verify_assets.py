"""Asset-arrival parity harness.

One command that, for every external asset the framework can consume
(prepare/README.md table; reference: prepare/*.sh), checks presence,
records a content hash, runs the asset through its converter, runs the
relevant golden forward, and emits a PARITY.md report:

    python prepare/verify_assets.py --root . --out PARITY.md

Statuses:
  OK        present, converter ran, forward finite, shape-plausible as
            the released artifact (content parity vs released metric
            values still requires running the eval protocols)
  SYNTHETIC present and loadable, but provably NOT the released
            artifact: wrong shape/size for the real asset, or carries an
            explicit synthetic marker (the fixtures below embed one)
  MISSING   nothing at the resolved path
  ERROR     present but the converter/forward failed (corrupt download,
            wrong file)

`make_synthetic_assets(root)` fabricates a full synthetic stand-in set
(used by tests/test_verify_assets.py): every torch checkpoint is built
by round-tripping a randomly-initialized flax network through the
inverse of its converter, so converters and golden forwards run for real
even without the released files.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
from typing import Callable, Optional

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

OK, SYNTHETIC, MISSING, ERROR = "OK", "SYNTHETIC", "MISSING", "ERROR"


def _content_hash(path: str, limit: int = 1 << 30) -> str:
    """sha256 over the first `limit` bytes (defence against multi-GB
    dataset files), truncated to 16 hex chars.  The report column is
    labelled accordingly — this is a change-detection fingerprint, not a
    full-file digest."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(1 << 20):
            h.update(chunk)
            limit -= len(chunk)
            if limit <= 0:
                break
    return h.hexdigest()[:16]


def _fingerprint(x) -> float:
    return float(np.sum(np.asarray(x, np.float64)))


def _torch_load(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _marked_synthetic(ckpt) -> bool:
    return isinstance(ckpt, dict) and bool(ckpt.get("synthetic"))


# ---------------------------------------------------------------------- #
# per-asset checks: path -> (status, detail string)
# ---------------------------------------------------------------------- #
def check_smpl(path: str):
    import jax.numpy as jnp

    from gesturediffusion_tpu.models.rotation2xyz import rotation2xyz
    from gesturediffusion_tpu.models.smpl import load_smpl_pickle

    smpl = load_smpl_pickle(path)
    n_verts = smpl.v_template.shape[0]
    pose = jnp.zeros((1, 25, 6, 2))
    pose = pose.at[:, :24, 0, :].set(1.0).at[:, :24, 4, :].set(1.0)
    xyz = rotation2xyz(smpl, pose, pose_rep="rot6d", translation=True,
                       glob=True, jointstype="smpl", vertstrans=False)
    assert np.all(np.isfinite(np.asarray(xyz))), "non-finite FK output"
    status = OK if n_verts == 6890 else SYNTHETIC
    return status, (f"verts={n_verts} joints={smpl.j_regressor.shape[0]} "
                    f"fk_fingerprint={_fingerprint(xyz):.4f}")


def check_gmm(path: str):
    import jax.numpy as jnp

    from gesturediffusion_tpu.viz.prior import load_gmm_prior

    with open(path, "rb") as f:
        import pickle

        raw = pickle.load(f, encoding="latin1")
    prior = load_gmm_prior(path)
    val = prior(jnp.zeros((1, 69)))
    assert np.all(np.isfinite(np.asarray(val)))
    k, d = prior.means.shape
    synthetic = _marked_synthetic(raw) or (k, d) != (8, 69)
    return (SYNTHETIC if synthetic else OK,
            f"components={k} dim={d} prior(0)={_fingerprint(val):.4f}")


def check_smpl_mean(path: str):
    import h5py

    from gesturediffusion_tpu.viz.joints2smpl import load_smpl_mean_pose

    pose = load_smpl_mean_pose(path)
    assert pose is not None and pose.shape == (24, 3)
    assert np.all(np.isfinite(pose)), "non-finite mean pose"
    with h5py.File(path, "r") as f:
        synthetic = bool(f.attrs.get("synthetic", False))
    return (SYNTHETIC if synthetic else OK,
            f"pose_norm={float(np.linalg.norm(pose)):.4f}")


def check_glove(path: str):
    from gesturediffusion_tpu.data.humanml import WordVectorizer

    vec = WordVectorizer(path, "our_vab")
    n = len(vec)
    dim = next(iter(vec.word2vec.values())).shape[0]
    status = OK if (dim == 300 and n >= 5000) else SYNTHETIC
    return status, f"vocab={n} dim={dim}"


def check_t2m_evaluator(path: str):
    from gesturediffusion_tpu.eval.evaluator_wrapper import EvaluatorWrapper

    ckpt = _torch_load(path)  # single load: converted params passed in
    ev = EvaluatorWrapper(
        "humanml", params=EvaluatorWrapper.load_torch_checkpoint(ckpt)
    )
    rs = np.random.RandomState(0)
    motions = rs.randn(4, 40, 263).astype(np.float32)
    emb = ev.get_motion_embeddings(motions, np.full((4,), 40, np.int64))
    assert np.all(np.isfinite(emb))
    status = SYNTHETIC if _marked_synthetic(ckpt) else OK
    return status, f"motion_emb[4,{emb.shape[1]}] sum={_fingerprint(emb):.4f}"


def check_a2m_gru(path: str):
    import jax.numpy as jnp

    from gesturediffusion_tpu.eval.eval_a2m import A2MEvaluation

    ckpt = _torch_load(path)  # single load: converted params passed in
    ev = A2MEvaluation(
        classifier_params=A2MEvaluation.load_torch_checkpoint(ckpt)
    )
    rs = np.random.RandomState(0)
    feats = ev._jit_feats(
        jnp.asarray(rs.randn(2, 24, 3, 8), jnp.float32),
        jnp.asarray([8, 8]),
    )
    assert np.all(np.isfinite(np.asarray(feats)))
    status = SYNTHETIC if _marked_synthetic(ckpt) else OK
    return status, f"feat_dim={feats.shape[-1]} sum={_fingerprint(feats):.4f}"


def check_uestc_stgcn(path: str):
    import jax.numpy as jnp

    from gesturediffusion_tpu.eval.eval_a2m import STGCNA2MEvaluation

    from gesturediffusion_tpu.eval.stgcn import load_stgcn_checkpoint

    ckpt = _torch_load(path)  # single load: converted variables passed in
    ev = STGCNA2MEvaluation(variables=load_stgcn_checkpoint(ckpt))
    rs = np.random.RandomState(0)
    logits, feats = ev._jit_fwd(
        jnp.asarray(rs.randn(2, 24, 6, 16), jnp.float32)
    )
    assert np.all(np.isfinite(np.asarray(logits)))
    status = SYNTHETIC if _marked_synthetic(ckpt) else OK
    return status, (f"classes={logits.shape[-1]} "
                    f"logit_sum={_fingerprint(logits):.4f}")


def check_modi_stgcn(path: str):
    from gesturediffusion_tpu.eval.eval_unconstrained import (
        UnconstrainedEvaluator,
    )

    from gesturediffusion_tpu.eval.stgcn import load_stgcn_checkpoint

    ckpt = _torch_load(path)  # single load: converted variables passed in
    ev = UnconstrainedEvaluator(variables=load_stgcn_checkpoint(ckpt))
    rs = np.random.RandomState(0)
    feats, preds = ev.compute_features(
        rs.randn(2, 15, 3, 16).astype(np.float32)
    )
    assert np.all(np.isfinite(feats))
    status = SYNTHETIC if _marked_synthetic(ckpt) else OK
    return status, f"feat_dim={feats.shape[-1]} sum={_fingerprint(feats):.4f}"


def check_clip(path: str):
    import jax
    import jax.numpy as jnp

    from gesturediffusion_tpu.models.clip_text import (
        CLIPTextEncoder,
        convert_clip_text_weights,
    )

    sd = _torch_load(path)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    marked = _marked_synthetic(sd)
    sd = {k: v for k, v in sd.items() if k != "synthetic"}
    params = convert_clip_text_weights(sd)
    vocab, width = params["token_embedding"].shape
    context = params["positional_embedding"].shape[0]
    layers = sum(1 for k in params if k.startswith("resblock_"))
    embed_dim = params["text_projection"].shape[1]
    model = CLIPTextEncoder(
        vocab_size=vocab, context_length=context, width=width,
        heads=max(width // 64, 1), layers=layers, embed_dim=embed_dim,
    )
    tokens = jnp.asarray(
        np.random.RandomState(0).randint(0, vocab, (2, context))
    )
    out = model.apply({"params": params}, tokens)
    assert np.all(np.isfinite(np.asarray(out)))
    real_shape = (vocab, width, layers, embed_dim) == (49408, 512, 12, 512)
    status = SYNTHETIC if (marked or not real_shape) else OK
    return status, (f"vocab={vocab} width={width} layers={layers} "
                    f"emb_sum={_fingerprint(out):.4f}")


def check_bpe(path: str):
    import gzip

    from gesturediffusion_tpu.models.clip_text import SimpleTokenizer

    tok = SimpleTokenizer(path)
    ids = tok.encode("a person walks forward")
    assert len(ids) > 0
    with gzip.open(path, "rt", encoding="utf-8") as f:
        n_merges = sum(1 for _ in f) - 1  # header line
    # the released file carries ~48894 usable merges
    status = OK if n_merges >= 40_000 else SYNTHETIC
    return status, f"merges={n_merges} encode(...)={ids[:4]}..."


def check_humanact12(path: str):
    from gesturediffusion_tpu.data.a2m import HumanAct12Poses

    ds = HumanAct12Poses(path, num_frames=16, pose_rep="rot6d",
                         split="test")
    item = ds[0]
    status = OK if len(ds) >= 1000 else SYNTHETIC
    return status, f"clips={len(ds)} item_pose={item['pose'].shape}"


def check_uestc(path: str):
    from gesturediffusion_tpu.data.a2m import A2MSplitView
    from gesturediffusion_tpu.data.uestc import UESTC

    # one construction (the multi-GB vibe cache loads + view-corrects
    # once); both splits are index views over it
    ds = UESTC(path, num_frames=60, pose_rep="rot6d", split="train")
    tr, te = A2MSplitView(ds, "train"), A2MSplitView(ds, "test")
    status = OK if len(tr) + len(te) >= 10_000 else SYNTHETIC
    return status, f"train={len(tr)} test={len(te)}"


def check_unconstrained_npy(path: str):
    arr = np.load(path, allow_pickle=True)
    status = OK if len(arr) >= 500 else SYNTHETIC
    return status, f"motions={len(arr)} first={np.asarray(arr[0]).shape}"


def check_eval_norm_stats(path: str):
    """T2M/KIT evaluator-convention mean/std (263-/251-dim), shipped
    in-repo (the reference vendors them at dataset/{t2m,kit}_{mean,std}
    .npy); both halves must exist and agree in shape."""
    mean = np.load(path)
    std = np.load(path.replace("_mean.npy", "_std.npy"))
    want = 251 if "kit" in os.path.basename(path) else 263
    if mean.shape != (want,) or std.shape != (want,):
        raise ValueError(
            f"expected ({want},) stats, got {mean.shape}/{std.shape}"
        )
    if not (std > 0).all():
        raise ValueError("std has non-positive entries")
    return OK, f"dim={want} mean[0]={mean[0]:.4g}"


# (name, env var, default relative path, is_dir, check fn)
ASSETS: list[tuple[str, Optional[str], str, bool, Callable]] = [
    ("SMPL neutral model", "SMPL_MODEL_PATH",
     "body_models/smpl/SMPL_NEUTRAL.pkl", False, check_smpl),
    ("SMPLify GMM prior", None,
     "body_models/joints2smpl/gmm_08.pkl", False, check_gmm),
    ("SMPLify mean params", "SMPL_MEAN_PATH",
     "body_models/joints2smpl/neutral_smpl_mean_params.h5", False,
     check_smpl_mean),
    ("GloVe vectors", None, "glove", True, check_glove),
    ("T2M evaluator (finest.tar)", "T2M_EVALUATOR_PATH",
     "t2m/text_mot_match/model/finest.tar", False, check_t2m_evaluator),
    ("A2M GRU classifier", "A2M_CLASSIFIER_PATH",
     "assets/actionrecognition/humanact12_gru.tar", False, check_a2m_gru),
    ("UESTC ST-GCN", "UESTC_STGCN_PATH",
     "assets/actionrecognition/uestc_rot6d_stgcn.tar", False,
     check_uestc_stgcn),
    ("MoDi ST-GCN", "MODI_STGCN_PATH",
     "assets/actionrecognition/humanact12_gru_modi_struct.pth.tar", False,
     check_modi_stgcn),
    ("CLIP ViT-B/32", "CLIP_CHECKPOINT",
     "assets/clip/ViT-B-32.pt", False, check_clip),
    ("CLIP BPE merges", "CLIP_BPE_PATH",
     "assets/clip/bpe_simple_vocab_16e6.txt.gz", False, check_bpe),
    ("HumanAct12 dataset", None,
     "dataset/HumanAct12Poses", True, check_humanact12),
    ("UESTC dataset", None, "dataset/uestc", True, check_uestc),
    ("Unconstrained GT motions", "UNCONSTRAINED_DATASET_PATH",
     "dataset/HumanAct12Poses/humanact12_unconstrained_modi_struct.npy",
     False, check_unconstrained_npy),
    ("T2M eval norm stats (shipped)", None, "dataset/t2m_mean.npy",
     False, check_eval_norm_stats),
    ("KIT eval norm stats (shipped)", None, "dataset/kit_mean.npy",
     False, check_eval_norm_stats),
]


def run_checks(root: str) -> list[dict]:
    rows = []
    for name, env, rel, is_dir, fn in ASSETS:
        path = os.environ.get(env) if env else None
        path = path or os.path.join(root, rel)
        row = {"asset": name, "path": path}
        exists = os.path.isdir(path) if is_dir else os.path.isfile(path)
        if not exists:
            row.update(status=MISSING, hash="-", detail=(
                f"fetch with prepare/ scripts; env override ${env}"
                if env else "fetch with prepare/ scripts"))
            rows.append(row)
            continue
        row["hash"] = "-" if is_dir else _content_hash(path)
        try:
            status, detail = fn(path)
            row.update(status=status, detail=detail)
        except Exception as e:  # noqa: BLE001 — report, don't die
            row.update(status=ERROR, detail=f"{type(e).__name__}: {e}")
        rows.append(row)
    return rows


def write_report(rows: list[dict], out: str) -> None:
    lines = [
        "# Asset parity report",
        "",
        "Generated by `python prepare/verify_assets.py`. `SYNTHETIC` "
        "means the file works but is a stand-in (wrong shape/size for "
        "the released artifact) — metrics computed with it are NOT "
        "reference-comparable. Re-run after `prepare/download_*.sh`.",
        "",
        "| Asset | Status | sha256/16 (first GiB) | Detail |",
        "|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['asset']} | {r['status']} | `{r['hash']}` "
            f"| {r['detail']} |"
        )
    counts: dict = {}
    for r in rows:
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    lines += ["", "Summary: " + ", ".join(
        f"{v} {k}" for k, v in sorted(counts.items())), ""]
    with open(out, "w") as f:
        f.write("\n".join(lines))


# ---------------------------------------------------------------------- #
# synthetic stand-in fabrication (inverse converters)
# ---------------------------------------------------------------------- #
def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x, np.float32))


def _inv_lin(p):
    return {"weight": _t(np.asarray(p["kernel"]).T), "bias": _t(p["bias"])}


def _inv_bigru_trunk(trunk, prefix="gru"):
    """Inverse of convert_text/motion_encoder's trunk mapping."""
    sd = {}
    for k, v in _inv_lin(trunk["input_emb"]).items():
        sd[f"input_emb.{k}"] = v
    sd["hidden"] = _t(trunk["hidden"])
    for suffix, key in (("", "fwd"), ("_reverse", "bwd")):
        for short, t_name in (("w_ih", "weight_ih"), ("w_hh", "weight_hh"),
                              ("b_ih", "bias_ih"), ("b_hh", "bias_hh")):
            sd[f"{prefix}.{t_name}_l0{suffix}"] = _t(
                trunk[f"gru_{key}_{short}"]
            )
    for k, v in _inv_lin(trunk["output_net_0"]).items():
        sd[f"output_net.0.{k}"] = v
    sd["output_net.1.weight"] = _t(trunk["output_net_1"]["scale"])
    sd["output_net.1.bias"] = _t(trunk["output_net_1"]["bias"])
    for k, v in _inv_lin(trunk["output_net_3"]).items():
        sd[f"output_net.3.{k}"] = v
    return sd


def _inv_movement(p):
    def conv(cp):
        return {
            "weight": _t(np.asarray(cp["kernel"]).transpose(2, 1, 0)),
            "bias": _t(cp["bias"]),
        }

    sd = {}
    for name, cp in (("main.0", p["conv0"]), ("main.3", p["conv1"])):
        for k, v in conv(cp).items():
            sd[f"{name}.{k}"] = v
    for k, v in _inv_lin(p["out_net"]).items():
        sd[f"out_net.{k}"] = v
    return sd


def _inv_motion_discriminator(p, hidden_layer=2):
    sd = {}
    for layer in range(hidden_layer):
        for short, t_name in (("w_ih", "weight_ih"), ("w_hh", "weight_hh"),
                              ("b_ih", "bias_ih"), ("b_hh", "bias_hh")):
            sd[f"recurrent.{t_name}_l{layer}"] = _t(
                p[f"gru_l{layer}_{short}"]
            )
    for name in ("linear1", "linear2"):
        if name in p:
            for k, v in _inv_lin(p[name]).items():
                sd[f"{name}.{k}"] = v
    return sd


def _inv_stgcn(variables):
    """Inverse of eval/stgcn.py::convert_stgcn."""
    p, stats = variables["params"], variables["batch_stats"]
    sd = {}

    def put_bn(name, bp, bs):
        sd[f"{name}.weight"] = _t(bp["scale"])
        sd[f"{name}.bias"] = _t(bp["bias"])
        sd[f"{name}.running_mean"] = _t(bs["mean"])
        sd[f"{name}.running_var"] = _t(bs["var"])

    def put_conv(name, cp):
        sd[f"{name}.weight"] = _t(
            np.asarray(cp["kernel"]).transpose(3, 2, 0, 1)
        )
        sd[f"{name}.bias"] = _t(cp["bias"])

    put_bn("data_bn", p["data_bn"], stats["data_bn"])
    fcn_k = np.asarray(p["fcn"]["kernel"])  # [256, num_class]
    sd["fcn.weight"] = _t(fcn_k.T[:, :, None, None])
    sd["fcn.bias"] = _t(p["fcn"]["bias"])
    i = 0
    while f"st_gcn_{i}" in p:
        blk, bst = p[f"st_gcn_{i}"], stats[f"st_gcn_{i}"]
        put_conv(f"st_gcn_networks.{i}.gcn.conv", blk["gcn"]["conv"])
        put_bn(f"st_gcn_networks.{i}.tcn.0", blk["tcn_bn1"],
               bst["tcn_bn1"])
        put_conv(f"st_gcn_networks.{i}.tcn.2", blk["tcn_conv"])
        put_bn(f"st_gcn_networks.{i}.tcn.3", blk["tcn_bn2"],
               bst["tcn_bn2"])
        if "res_conv" in blk:
            put_conv(f"st_gcn_networks.{i}.residual.0", blk["res_conv"])
            put_bn(f"st_gcn_networks.{i}.residual.1", blk["res_bn"],
                   bst["res_bn"])
        if f"edge_importance_{i}" in p:
            sd[f"edge_importance.{i}"] = _t(p[f"edge_importance_{i}"])
        i += 1
    return sd


def make_synthetic_assets(root: str) -> str:
    """Fabricate the full stand-in asset tree under `root` (all files the
    ASSETS table resolves relative to --root).  Torch checkpoints carry
    {'synthetic': True} so verify_assets flags them."""
    import gzip
    import pickle

    import jax
    import jax.numpy as jnp
    import torch

    from gesturediffusion_tpu.data.a2m import make_synthetic_humanact12
    from gesturediffusion_tpu.data.uestc import make_synthetic_uestc
    from gesturediffusion_tpu.eval.evaluator_wrapper import EvaluatorWrapper
    from gesturediffusion_tpu.eval.networks import MotionDiscriminator
    from gesturediffusion_tpu.eval.stgcn import STGCN
    from gesturediffusion_tpu.models.smpl import save_synthetic_smpl_pickle
    from gesturediffusion_tpu.viz.prior import make_synthetic_gmm

    def at(rel):
        path = os.path.join(root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        return path

    save_synthetic_smpl_pickle(at("body_models/smpl/SMPL_NEUTRAL.pkl"))

    gmm = dict(make_synthetic_gmm(), synthetic=True)
    with open(at("body_models/joints2smpl/gmm_08.pkl"), "wb") as f:
        pickle.dump(gmm, f)

    rs = np.random.RandomState(0)

    import h5py

    with h5py.File(
        at("body_models/joints2smpl/neutral_smpl_mean_params.h5"), "w"
    ) as f:
        f["pose"] = (rs.randn(72) * 0.05).astype(np.float32)
        f["shape"] = np.zeros(10, np.float32)
        f.attrs["synthetic"] = True
    words = [f"word{i}" for i in range(64)] + ["a", "person", "walks"]
    os.makedirs(os.path.join(root, "glove"), exist_ok=True)
    with open(at("glove/our_vab_words.pkl"), "wb") as f:
        pickle.dump(words, f)
    with open(at("glove/our_vab_idx.pkl"), "wb") as f:
        pickle.dump({w: i for i, w in enumerate(words)}, f)
    np.save(at("glove/our_vab_data.npy"),
            rs.randn(len(words), 300).astype(np.float32))

    # T2M evaluator: random flax params -> inverse converters -> tar
    ev = EvaluatorWrapper("humanml")  # warns + random-inits (no asset)
    torch.save(
        {
            "text_encoder": _inv_bigru_trunk(
                ev.params["text"]["trunk"])
            | {f"pos_emb.{k}": v
               for k, v in _inv_lin(ev.params["text"]["pos_emb"]).items()},
            "motion_encoder": _inv_bigru_trunk(
                ev.params["motion"]["trunk"]),
            "movement_encoder": _inv_movement(ev.params["movement"]),
            "synthetic": True,
        },
        at("t2m/text_mot_match/model/finest.tar"),
    )

    disc = MotionDiscriminator(input_size=72, hidden_size=128,
                               hidden_layer=2, output_size=12)
    dp = disc.init(jax.random.PRNGKey(0), jnp.zeros((2, 24, 3, 8)),
                   jnp.asarray([8, 8]))["params"]
    torch.save(
        {"model": _inv_motion_discriminator(dp), "synthetic": True},
        at("assets/actionrecognition/humanact12_gru.tar"),
    )

    stgcn = STGCN(in_channels=6, num_class=40, layout="smpl",
                  strategy="spatial", edge_importance_weighting=True,
                  variant="recognition")
    sv = stgcn.init(jax.random.PRNGKey(1), jnp.zeros((2, 6, 16, 24)))
    torch.save(
        {"model": _inv_stgcn(sv), "synthetic": True},
        at("assets/actionrecognition/uestc_rot6d_stgcn.tar"),
    )

    modi = STGCN(in_channels=3, num_class=12, layout="openpose15",
                 strategy="spatial", edge_importance_weighting=True)
    mv = modi.init(jax.random.PRNGKey(2), jnp.zeros((2, 3, 16, 15)))
    torch.save(
        {"model": _inv_stgcn(mv), "synthetic": True},
        at("assets/actionrecognition/"
           "humanact12_gru_modi_struct.pth.tar"),
    )

    # reduced-width CLIP text tower (keys mirror the OpenAI layout)
    width, layers, vocab, ctx = 64, 2, 512, 77
    clip_sd = {
        "token_embedding.weight": _t(rs.randn(vocab, width) * 0.02),
        "positional_embedding": _t(rs.randn(ctx, width) * 0.01),
        "text_projection": _t(rs.randn(width, width) * width**-0.5),
        "ln_final.weight": _t(np.ones(width)),
        "ln_final.bias": _t(np.zeros(width)),
        "synthetic": _t(np.ones(1)),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        clip_sd |= {
            f"{p}.ln_1.weight": _t(np.ones(width)),
            f"{p}.ln_1.bias": _t(np.zeros(width)),
            f"{p}.ln_2.weight": _t(np.ones(width)),
            f"{p}.ln_2.bias": _t(np.zeros(width)),
            f"{p}.attn.in_proj_weight": _t(rs.randn(3 * width, width) * 0.02),
            f"{p}.attn.in_proj_bias": _t(np.zeros(3 * width)),
            f"{p}.attn.out_proj.weight": _t(rs.randn(width, width) * 0.02),
            f"{p}.attn.out_proj.bias": _t(np.zeros(width)),
            f"{p}.mlp.c_fc.weight": _t(rs.randn(4 * width, width) * 0.02),
            f"{p}.mlp.c_fc.bias": _t(np.zeros(4 * width)),
            f"{p}.mlp.c_proj.weight": _t(rs.randn(width, 4 * width) * 0.02),
            f"{p}.mlp.c_proj.bias": _t(np.zeros(width)),
        }
    torch.save(clip_sd, at("assets/clip/ViT-B-32.pt"))

    # minimal-but-valid BPE merges file (gzip text; first line is a header)
    merges = ["#version: synthetic"] + [
        f"{a} {b}</w>" for a in "abcdefgh" for b in "abcdefgh"
    ]
    with gzip.open(at("assets/clip/bpe_simple_vocab_16e6.txt.gz"),
                   "wt") as f:
        f.write("\n".join(merges))

    make_synthetic_humanact12(at("dataset/HumanAct12Poses"))
    make_synthetic_uestc(at("dataset/uestc"))
    np.save(
        at("dataset/HumanAct12Poses/"
           "humanact12_unconstrained_modi_struct.npy"),
        rs.randn(32, 16, 3, 60).astype(np.float32),
    )

    # the T2M/KIT eval norm stats ship in-repo (they're real, not
    # synthetic): mirror them into the stand-in root so a hermetic run
    # checks the same files a real deployment would
    repo_dataset = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "dataset")
    for fn in ("t2m_mean.npy", "t2m_std.npy",
               "kit_mean.npy", "kit_std.npy"):
        src = os.path.join(repo_dataset, fn)
        if os.path.isfile(src):
            shutil.copyfile(src, at(f"dataset/{fn}"))
    return root


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--root", default=".",
                    help="base dir the default asset paths resolve from")
    ap.add_argument("--out", default="PARITY.md")
    ap.add_argument("--make-synthetic", action="store_true",
                    help="fabricate the full synthetic stand-in set under "
                         "--root first (hermetic smoke test)")
    ap.add_argument("--json", action="store_true",
                    help="also print one JSON line per asset")
    args = ap.parse_args(argv)

    if args.make_synthetic:
        make_synthetic_assets(args.root)
    rows = run_checks(args.root)
    write_report(rows, args.out)
    for r in rows:
        print(f"[{r['status']:9s}] {r['asset']}: {r['detail']}")
        if args.json:
            print(json.dumps(r))
    print(f"report written to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
