"""Golden test: reference torch MDM checkpoint -> Flax conversion.

Loads the REAL reference model (reference: model/mdm.py) with its CLIP /
rot2xyz dependencies stubbed (both are parameter-free for genea_vec
inference), converts its randomly-initialized state dict with
utils/convert_torch.py, and asserts full forward parity — the strongest
possible check that reference users can carry their checkpoints over.
"""

import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.models.mdm import MDM
from gesturediffusion_tpu.models.mdm_t2m import MotionMDM
from gesturediffusion_tpu.utils.convert_torch import (
    convert_mdm_state_dict,
    convert_motion_mdm_state_dict,
    load_torch_checkpoint,
)

REF = "/root/reference"

B, J, T, S, D = 2, 24, 20, 3, 32  # T divisible by the local window (10)


def _load_reference_mdm_module():
    """Import reference model/mdm.py with clip + rotation2xyz stubbed."""
    import torch  # noqa: F401  (reference needs it importable)

    if "model.mdm" in sys.modules:
        return sys.modules["model.mdm"]

    clip_stub = types.ModuleType("clip")
    sys.modules.setdefault("clip", clip_stub)

    pkg = types.ModuleType("model")
    pkg.__path__ = [os.path.join(REF, "model")]
    sys.modules["model"] = pkg

    rot_stub = types.ModuleType("model.rotation2xyz")

    class _SmplStub:
        def train(self, *a, **k):
            return self

        def eval(self, *a, **k):
            return self

    class Rotation2xyz:  # parameter-free stand-in
        def __init__(self, *a, **k):
            self.smpl_model = _SmplStub()

    rot_stub.Rotation2xyz = Rotation2xyz
    sys.modules["model.rotation2xyz"] = rot_stub

    for name in ("local_attention", "mdm"):
        spec = importlib.util.spec_from_file_location(
            f"model.{name}", os.path.join(REF, "model", f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"model.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["model.mdm"]


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "model", "mdm.py")),
    reason="reference not mounted",
)
class TestConvertMDM:
    def _build_pair(self):
        import torch

        ref_mdm = _load_reference_mdm_module()
        torch.manual_seed(0)
        ref = ref_mdm.MDM(
            njoints=J, nfeats=1, pose_rep="genea_vec", data_rep="genea_vec",
            latent_dim=D, text_dim=8, ff_size=64, num_layers=2, num_heads=4,
            dropout=0.1, use_text=False, cond_mask_prob=0.1, seed_poses=S,
            mfcc_input=True,
        )
        # the reference's train() override returns None, so .eval()
        # (which returns self.train(False)) can't be chained
        ref.eval()
        ours = MDM(
            njoints=J, latent_dim=D, text_dim=8, ff_size=64, num_layers=2,
            num_heads=4, seed_poses=S, cond_mask_prob=0.1, mfcc_dim=26,
            use_text=False, window_size=10, cl_head=8,
        )
        return ref, ours

    def test_forward_parity(self):
        import torch

        ref, ours = self._build_pair()
        variables = convert_mdm_state_dict(ref.state_dict(), ours)

        rs = np.random.RandomState(0)
        x = rs.randn(B, J, 1, T).astype(np.float32)
        mfcc = rs.randn(B, 26, 1, T).astype(np.float32)
        seed = rs.randn(B, J, 1, S).astype(np.float32)
        t = np.asarray([3, 11])

        with torch.no_grad():
            want = ref(
                torch.from_numpy(x), torch.from_numpy(t),
                y={"mfcc": torch.from_numpy(mfcc),
                   "seed": torch.from_numpy(seed)},
            ).numpy()

        got = np.asarray(ours.apply(
            variables, jnp.asarray(x), jnp.asarray(t, jnp.int32),
            {"mfcc": jnp.asarray(mfcc), "seed": jnp.asarray(seed)},
        ))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_file_roundtrip(self, tmp_path):
        import torch

        ref, ours = self._build_pair()
        path = str(tmp_path / "model000001234.pt")
        torch.save(ref.state_dict(), path)
        variables = load_torch_checkpoint(path, ours)
        out = ours.apply(
            variables,
            jnp.zeros((1, J, 1, T)), jnp.zeros((1,), jnp.int32),
            {"mfcc": jnp.zeros((1, 26, 1, T)),
             "seed": jnp.zeros((1, J, 1, S))},
        )
        assert np.all(np.isfinite(np.asarray(out)))

    def test_wrapped_state_dict_unwraps(self, tmp_path):
        """Some reference tooling saves {'model': state_dict} wrappers —
        load_torch_checkpoint must unwrap them."""
        import torch

        ref, ours = self._build_pair()
        path = str(tmp_path / "model000000009.pt")
        torch.save({"model": ref.state_dict()}, path)
        variables = load_torch_checkpoint(path, ours)
        assert "params" in variables

    def test_v1_checkpoint_clear_error(self):
        """A V1 state dict hitting the V2 converter must explain itself."""
        _, ours = self._build_pair()
        with pytest.raises(ValueError, match="mdm_old"):
            convert_mdm_state_dict(
                {"input_process.poseEmbedding.weight": np.zeros((2, 2))},
                ours,
            )

    def test_layout_drift_fails_loudly(self):
        ref, ours = self._build_pair()
        sd = dict(ref.state_dict())
        sd["seqTransEncoder.layers.0.bogus_new_param"] = sd[
            "project_to_lat.bias"
        ]
        with pytest.raises(ValueError, match="unconverted"):
            convert_mdm_state_dict(sd, ours)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "model", "mdm_old.py")),
    reason="reference not mounted",
)
class TestConvertMDMOld:
    def test_forward_parity(self):
        import importlib.util as ilu

        import torch

        from gesturediffusion_tpu.models.mdm_old import MDMOld
        from gesturediffusion_tpu.utils.convert_torch import (
            convert_mdm_old_state_dict,
        )

        _load_reference_mdm_module()  # installs the model pkg + stubs
        if "model.mdm_old" not in sys.modules:
            spec = ilu.spec_from_file_location(
                "model.mdm_old", os.path.join(REF, "model", "mdm_old.py")
            )
            mod = ilu.module_from_spec(spec)
            sys.modules["model.mdm_old"] = mod
            spec.loader.exec_module(mod)
        ref_mod = sys.modules["model.mdm_old"]

        torch.manual_seed(2)
        ref = ref_mod.MDM_Old(
            njoints=J, nfeats=1, translation=True, pose_rep="genea_vec",
            glob=True, glob_rot=True, latent_dim=D, ff_size=64,
            num_layers=2, num_heads=4, dropout=0.1, data_rep="genea_vec",
            cond_mask_prob=0.1, seed_poses=S,
        )
        ref.eval()
        ours = MDMOld(
            njoints=J, latent_dim=D, ff_size=64, num_layers=2, num_heads=4,
            cond_mask_prob=0.1, seed_poses=S, mfcc_dim=26,
        )
        variables = convert_mdm_old_state_dict(ref.state_dict(), ours)

        rs = np.random.RandomState(3)
        x = rs.randn(B, J, 1, T).astype(np.float32)
        mfcc = rs.randn(B, 26, 1, T).astype(np.float32)
        seed = rs.randn(B, J, 1, S).astype(np.float32)
        t = np.asarray([1, 7])
        with torch.no_grad():
            want = ref(
                torch.from_numpy(x), torch.from_numpy(t),
                y={"mfcc": torch.from_numpy(mfcc),
                   "seed": torch.from_numpy(seed)},
            ).numpy()
        got = np.asarray(ours.apply(
            variables, jnp.asarray(x), jnp.asarray(t, jnp.int32),
            {"mfcc": jnp.asarray(mfcc), "seed": jnp.asarray(seed)},
        ))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "model", "mdm.py")),
    reason="reference not mounted",
)
class TestExportMDM:
    def test_export_loads_and_matches(self, tmp_path):
        """Flax -> torch export must load through the reference's own
        contract (load_model_wo_clip: strict=False, only clip_model.*
        missing, zero unexpected) and reproduce our forward."""
        import torch

        from gesturediffusion_tpu.utils.convert_torch import (
            save_torch_checkpoint,
        )

        ref_mdm = _load_reference_mdm_module()
        ours = MDM(
            njoints=J, latent_dim=D, text_dim=8, ff_size=64, num_layers=2,
            num_heads=4, seed_poses=S, cond_mask_prob=0.1, mfcc_dim=26,
            use_text=False, window_size=10, cl_head=8,
        )
        rs = np.random.RandomState(5)
        x = rs.randn(B, J, 1, T).astype(np.float32)
        mfcc = rs.randn(B, 26, 1, T).astype(np.float32)
        seed = rs.randn(B, J, 1, S).astype(np.float32)
        t = np.asarray([2, 9])
        variables = ours.init(
            jax.random.PRNGKey(1), jnp.asarray(x),
            jnp.asarray(t, jnp.int32),
            {"mfcc": jnp.asarray(mfcc), "seed": jnp.asarray(seed)},
        )
        path = str(tmp_path / "export000000042.pt")
        save_torch_checkpoint(path, variables, ours)

        ref = ref_mdm.MDM(
            njoints=J, nfeats=1, pose_rep="genea_vec", data_rep="genea_vec",
            latent_dim=D, text_dim=8, ff_size=64, num_layers=2, num_heads=4,
            dropout=0.1, use_text=False, cond_mask_prob=0.1, seed_poses=S,
            mfcc_input=True,
        )
        sd = torch.load(path, map_location="cpu", weights_only=True)
        # the reference's load contract (utils/model_util.py:6-9)
        missing, unexpected = ref.load_state_dict(sd, strict=False)
        assert len(unexpected) == 0, unexpected
        assert all(k.startswith("clip_model.") for k in missing), missing
        ref.eval()

        with torch.no_grad():
            want = ref(
                torch.from_numpy(x), torch.from_numpy(t),
                y={"mfcc": torch.from_numpy(mfcc),
                   "seed": torch.from_numpy(seed)},
            ).numpy()
        got = np.asarray(ours.apply(
            variables, jnp.asarray(x), jnp.asarray(t, jnp.int32),
            {"mfcc": jnp.asarray(mfcc), "seed": jnp.asarray(seed)},
        ))
        # flax inits give larger activations than the torch inits of the
        # import-direction test; tolerance covers f32 accumulation-order
        # noise (measured max 6.4e-4 on outputs of magnitude ~3)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


class TestExportCLI:
    def test_orbax_to_pt_roundtrip(self, tmp_path):
        """export_torch CLI: Orbax dir + args.json -> .pt; converting the
        .pt back must reproduce the original params exactly."""
        import orbax.checkpoint as ocp

        from gesturediffusion_tpu.utils import export_torch
        from gesturediffusion_tpu.utils.convert_torch import (
            convert_mdm_state_dict,
        )
        from gesturediffusion_tpu.utils.model_factory import create_model

        import argparse
        import json

        train_args = {
            "dataset": "synthetic", "layers": 2, "latent_dim": D,
            "cond_mask_prob": 0.1, "seed_poses": S, "unconstrained": False,
            "use_text": False, "use_audio": False, "mfcc_input": True,
            "use_wav_enc": False,
        }
        model = create_model(argparse.Namespace(**train_args))
        rs = np.random.RandomState(0)
        nj = model.njoints
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(rs.randn(1, nj, 1, T), jnp.float32),
            jnp.zeros((1,), jnp.int32),
            {"mfcc": jnp.asarray(rs.randn(1, 26, 1, T), jnp.float32),
             "seed": jnp.asarray(rs.randn(1, nj, 1, S), jnp.float32)},
        )
        ckpt_dir = tmp_path / "model000000007"
        ocp.PyTreeCheckpointer().save(
            str(ckpt_dir), {"params": variables}
        )
        (tmp_path / "args.json").write_text(json.dumps(train_args))

        out = str(tmp_path / "export.pt")
        export_torch.main(["--model_path", str(ckpt_dir), "--out", out])

        import torch

        sd = torch.load(out, map_location="cpu", weights_only=True)
        rt = convert_mdm_state_dict(sd, model)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            variables["params"], rt["params"],
        )
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6


class TestWavEncoderRoundtrip:
    def test_export_import_with_batch_stats(self, tmp_path):
        """use_wav_enc: Conv/BatchNorm params + running stats must
        round-trip through the torch layout (batch_stats collection)."""
        import torch

        from gesturediffusion_tpu.utils.convert_torch import (
            convert_mdm_state_dict,
            save_torch_checkpoint,
        )

        model = MDM(
            njoints=J, latent_dim=D, ff_size=64, num_layers=1, num_heads=4,
            seed_poses=S, cond_mask_prob=0.1, mfcc_input=False,
            use_wav_enc=True, window_size=10, cl_head=8,
        )
        rs = np.random.RandomState(4)
        variables = model.init(
            jax.random.PRNGKey(3),
            jnp.asarray(rs.randn(1, J, 1, T), jnp.float32),
            jnp.zeros((1,), jnp.int32),
            {"audio": jnp.asarray(rs.randn(1, 16000), jnp.float32),
             "seed": jnp.asarray(rs.randn(1, J, 1, S), jnp.float32)},
        )
        assert "batch_stats" in variables
        path = str(tmp_path / "wav.pt")
        save_torch_checkpoint(path, variables, model)
        sd = torch.load(path, map_location="cpu", weights_only=True)
        rt = convert_mdm_state_dict(sd, model)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            dict(variables), rt,
        )
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6

    def test_ema_export_without_batch_stats_errors(self):
        """An EMA tree (params only, no batch_stats) must produce a clear
        error, not a KeyError (EMA never tracks BN running stats)."""
        from gesturediffusion_tpu.utils.convert_torch import (
            export_mdm_state_dict,
        )

        model = MDM(
            njoints=J, latent_dim=D, ff_size=64, num_layers=1, num_heads=4,
            seed_poses=S, cond_mask_prob=0.1, mfcc_input=False,
            use_wav_enc=True, window_size=10, cl_head=8,
        )
        rs = np.random.RandomState(4)
        variables = model.init(
            jax.random.PRNGKey(3),
            jnp.asarray(rs.randn(1, J, 1, T), jnp.float32),
            jnp.zeros((1,), jnp.int32),
            {"audio": jnp.asarray(rs.randn(1, 16000), jnp.float32),
             "seed": jnp.asarray(rs.randn(1, J, 1, S), jnp.float32)},
        )
        ema_like = {"params": variables["params"]}  # no batch_stats
        with pytest.raises(ValueError, match="batch_stats"):
            export_mdm_state_dict(ema_like, model)


class TestConvertMotionMDM:
    """Upstream-MDM layout (text/action) — structural conversion checks
    (the upstream torch source is not vendored, so parity is covered by
    the per-component golden tests: transformer encoder, timestep
    embedder via TestConvertMDM)."""

    def _synthetic_sd(self, cond="text", d=D, layers=2, njoints=25):
        import torch
        import torch.nn as nn

        torch.manual_seed(1)
        mods = {
            "input_process.poseEmbedding": nn.Linear(njoints, d),
            "output_process.poseFinal": nn.Linear(d, njoints),
            "embed_timestep.time_embed.0": nn.Linear(d, d),
            "embed_timestep.time_embed.2": nn.Linear(d, d),
        }
        if cond == "text":
            mods["embed_text"] = nn.Linear(512, d)
        sd = {}
        for prefix, m in mods.items():
            for k, v in m.state_dict().items():
                sd[f"{prefix}.{k}"] = v
        enc = nn.TransformerEncoder(
            nn.TransformerEncoderLayer(
                d_model=d, nhead=4, dim_feedforward=64, dropout=0.1
            ),
            num_layers=layers,
        )
        for k, v in enc.state_dict().items():
            sd[f"seqTransEncoder.{k}"] = v
        if cond == "action":
            sd["embed_action.action_embedding"] = torch.randn(12, d)
        return sd

    @pytest.mark.parametrize("cond", ["text", "action"])
    def test_export_import_roundtrip(self, cond, tmp_path):
        """MotionMDM export -> .pt -> import reproduces params exactly."""
        import torch

        from gesturediffusion_tpu.utils.convert_torch import (
            convert_motion_mdm_state_dict,
            save_torch_checkpoint,
        )

        model = MotionMDM(
            njoints=25, latent_dim=D, ff_size=64, num_layers=2,
            num_heads=4, cond_mode=cond, cond_mask_prob=0.1,
            num_actions=12,
        )
        cond_in = (
            {"text_emb": jnp.zeros((1, 512))}
            if cond == "text"
            else {"action": jnp.zeros((1,), jnp.int32)}
        )
        variables = model.init(
            jax.random.PRNGKey(2), jnp.zeros((1, 25, 1, T)),
            jnp.zeros((1,), jnp.int32), cond_in,
        )
        path = str(tmp_path / f"mm_{cond}.pt")
        save_torch_checkpoint(path, variables, model)
        sd = torch.load(path, map_location="cpu", weights_only=True)
        rt = convert_motion_mdm_state_dict(sd, model)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            variables["params"], rt["params"],
        )
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6

    @pytest.mark.parametrize("cond", ["text", "action"])
    def test_converts_and_runs(self, cond):
        model = MotionMDM(
            njoints=25, latent_dim=D, ff_size=64, num_layers=2,
            num_heads=4, cond_mode=cond, cond_mask_prob=0.1,
            num_actions=12,
        )
        variables = convert_motion_mdm_state_dict(
            self._synthetic_sd(cond), model
        )
        # the converted tree must match the model's own init structure
        cond_in = (
            {"text_emb": jnp.zeros((1, 512))}
            if cond == "text"
            else {"action": jnp.zeros((1,), jnp.int32)}
        )
        ref_tree = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 25, 1, T)),
            jnp.zeros((1,), jnp.int32), cond_in,
        )
        want_paths = jax.tree_util.tree_structure(ref_tree)
        got_paths = jax.tree_util.tree_structure(variables)
        assert want_paths == got_paths
        out = model.apply(
            variables, jnp.zeros((1, 25, 1, T)),
            jnp.zeros((1,), jnp.int32), cond_in,
        )
        assert np.all(np.isfinite(np.asarray(out)))
