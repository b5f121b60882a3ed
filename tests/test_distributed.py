"""Multi-host scaffolding: per-process batch slicing + global assembly,
plus REAL 2-process execution (TestRealMultiProcess): jax.distributed
over a localhost coordinator with actual cross-process collectives.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.data.collate import collate_gesture
from gesturediffusion_tpu.data.loader import DataLoader
from gesturediffusion_tpu.data.synthetic import SyntheticGesture
from gesturediffusion_tpu.parallel import distributed as dist_lib
from gesturediffusion_tpu.parallel import mesh as mesh_lib


class TestLocalBatchSlice:
    def test_slices_partition_the_batch(self):
        n_proc, bs = 4, 32
        seen = []
        for pid in range(n_proc):
            s = dist_lib.local_batch_slice(bs, n_proc, pid)
            seen.extend(range(bs)[s])
        assert sorted(seen) == list(range(bs))

    def test_indivisible_batch_raises(self):
        with pytest.raises(ValueError):
            dist_lib.local_batch_slice(10, 3, 0)

    def test_bad_process_id_raises(self):
        with pytest.raises(ValueError):
            dist_lib.local_batch_slice(8, 2, 2)


class TestPerProcessLoader:
    def _loaders(self, n_proc):
        ds = SyntheticGesture(n_items=32, window=12, pose_dim=8,
                              n_seed_poses=2)
        mk = lambda pc, pi: DataLoader(  # noqa: E731
            ds, batch_size=8, collate_fn=collate_gesture, shuffle=True,
            num_workers=1, seed=7, process_count=pc, process_index=pi,
        )
        return mk(1, 0), [mk(n_proc, i) for i in range(n_proc)]

    def test_process_shards_partition_each_global_batch(self):
        full, shards = self._loaders(2)
        full_batches = [m for m, _ in full]
        shard_batches = [[m for m, _ in ld] for ld in shards]
        assert len(full_batches) == len(shard_batches[0])
        for k, fb in enumerate(full_batches):
            got = np.concatenate([shard_batches[p][k] for p in range(2)], 0)
            np.testing.assert_array_equal(got, fb)

    def test_local_batch_size(self):
        _, shards = self._loaders(4)
        m, cond = next(iter(shards[0]))
        assert m.shape[0] == 2  # 8 global / 4 processes

    def test_indivisible_raises(self):
        ds = SyntheticGesture(n_items=8, window=12, pose_dim=8,
                              n_seed_poses=2)
        with pytest.raises(ValueError):
            DataLoader(ds, batch_size=8, collate_fn=collate_gesture,
                       process_count=3)


class TestGlobalAssembly:
    def test_make_global_batch_single_process(self):
        mesh = mesh_lib.make_mesh()
        x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
        arr = dist_lib.make_global_batch(mesh, {"x": x})["x"]
        assert arr.shape == (8, 3)
        np.testing.assert_array_equal(np.asarray(arr), x)
        # sharded over the data axis
        assert len(arr.sharding.device_set) == mesh.shape["data"]

    def test_shard_batch_matches_device_put(self):
        mesh = mesh_lib.make_mesh()
        x = np.random.RandomState(0).randn(8, 4).astype(np.float32)
        a = mesh_lib.shard_batch(mesh, {"x": jnp.asarray(x)})["x"]
        np.testing.assert_array_equal(np.asarray(a), x)

    def test_maybe_initialize_is_noop_without_env(self, monkeypatch):
        monkeypatch.delenv("GDT_COORDINATOR_ADDRESS", raising=False)
        assert dist_lib.maybe_initialize() is False


class TestShardedSampling:
    """Data-parallel SAMPLING over the mesh (the serving-scale story:
    per-chip batches scale over the data axis with zero code changes —
    GSPMD shards the whole denoise scan)."""

    def test_dp_sharded_ar_sampling_matches_single_device(self):
        import jax.numpy as jnp
        import numpy as np

        from gesturediffusion_tpu.diffusion import (
            ModelMeanType,
            create_diffusion,
        )
        from gesturediffusion_tpu.diffusion.sampling import (
            autoregressive_sample_loop,
        )
        from gesturediffusion_tpu.models.cfg import classifier_free_guidance
        from gesturediffusion_tpu.models.mdm import MDM

        B, J, T, S, C = 8, 16, 16, 2, 2
        model = MDM(njoints=J, latent_dim=32, num_layers=1, ff_size=64,
                    seed_poses=S, cl_head=4, window_size=5,
                    cond_mask_prob=0.1)
        diffusion = create_diffusion(
            steps=4, model_mean_type=ModelMeanType.START_X
        )
        rs = np.random.RandomState(0)
        x0 = jnp.asarray(rs.randn(B, J, 1, T), jnp.float32)
        seed0 = jnp.asarray(rs.randn(B, J, 1, S), jnp.float32)
        cc = {"mfcc": jnp.asarray(rs.randn(C, B, 26, 1, T), jnp.float32),
              "scale": jnp.full((C, B), 2.5, jnp.float32)}
        params = model.init(
            jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32),
            {"mfcc": jnp.asarray(cc["mfcc"][0]), "seed": seed0},
        )
        fn = classifier_free_guidance(
            lambda x, t, c: model.apply(params, x, t, c), 0.1
        )

        def sample(conds, seed):
            return autoregressive_sample_loop(
                diffusion, fn, (B, J, 1, T), jax.random.PRNGKey(7),
                conds, seed, S,
            )

        want = np.asarray(jax.jit(sample)(cc, seed0))

        mesh = mesh_lib.make_mesh()
        bsh = mesh_lib.batch_sharding(mesh)
        # chunk_conds carry the batch on axis 1 ([C, B, ...]); seed on 0
        from jax.sharding import NamedSharding, PartitionSpec as P

        cc_sh = {
            "mfcc": jax.device_put(
                cc["mfcc"], NamedSharding(mesh, P(None, "data"))
            ),
            "scale": jax.device_put(
                cc["scale"], NamedSharding(mesh, P(None, "data"))
            ),
        }
        seed_sh = jax.device_put(seed0, bsh)
        got = np.asarray(jax.jit(sample)(cc_sh, seed_sh))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestMeshClamp:
    """A smoke-size batch on a many-device host must not crash the default
    data mesh (regression: train CLI with batch 4 under 8 virtual devices
    raised on the batch-axis device_put)."""

    def test_indivisible_batch_clamps_data_axis(self):
        with pytest.warns(UserWarning, match="not divisible"):
            mesh = mesh_lib.make_data_mesh_for_batch(4)
        assert mesh.shape["data"] == 4
        batch = jnp.zeros((4, 3, 1, 8))
        out = mesh_lib.shard_batch(mesh, batch)
        assert out.shape == batch.shape

    def test_divisible_batch_uses_all_devices(self):
        mesh = mesh_lib.make_data_mesh_for_batch(32)
        assert mesh.shape["data"] == jax.device_count()

    def test_clamp_picks_largest_batch_divisor_not_gcd(self):
        # batch 12 on 8 devices: gcd(12, 8) = 4 but dp 6 fits and
        # divides the batch — 2 idle devices, not 4
        with pytest.warns(UserWarning, match="not divisible"):
            mesh = mesh_lib.make_data_mesh_for_batch(12)
        assert mesh.shape["data"] == 6

    def test_prime_batch_wider_than_nothing(self):
        # 7 is prime but 7 <= 8, so dp 7 (one idle device) beats dp 1
        with pytest.warns(UserWarning, match="not divisible"):
            mesh = mesh_lib.make_data_mesh_for_batch(7)
        assert mesh.shape["data"] == 7

    def test_coprime_oversized_batch_falls_back_to_single_device(self):
        with pytest.warns(UserWarning, match="not divisible"):
            mesh = mesh_lib.make_data_mesh_for_batch(13)
        assert mesh.shape["data"] == 1

    def test_multiprocess_never_clamps(self, monkeypatch):
        # a subset mesh can exclude every device some process owns —
        # multi-process runs must raise instead of shrinking
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        with pytest.raises(ValueError, match="Multi-process"):
            mesh_lib.make_data_mesh_for_batch(12)


class TestRealMultiProcess:
    """REAL 2-process execution: jax.distributed over a localhost
    coordinator, a global (data,) mesh spanning both processes' CPU
    devices, per-process loader slices, make_global_batch assembly, and
    two jitted train steps with actual cross-process collectives.

    The losses must (a) agree across the two processes and (b) match a
    single-process run over the same 8 devices — every input is
    deterministic, so the global computation is identical."""

    def _spawn(self, tmp_path):
        import socket
        import subprocess
        import sys

        with socket.socket() as s:  # free localhost port
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        procs = []
        for pid in range(2):
            env = dict(
                os.environ,
                JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=4",
                GDT_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                GDT_NUM_PROCESSES="2",
                GDT_PROCESS_ID=str(pid),
                GDT_MP_SAVE_DIR=str(tmp_path),
            )
            procs.append(subprocess.Popen(
                [sys.executable,
                 os.path.join(os.path.dirname(__file__),
                              "mp_train_worker.py")],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            ))
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outs.append(out)
        return procs, outs

    def test_two_process_train_step_matches_single_process(self, tmp_path):
        procs, outs = self._spawn(tmp_path)
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-3000:]
            assert "WORKER_OK" in out, out[-3000:]
            assert "global=8" in out, out[-2000:]

        def losses(out):
            return [float(ln.split()[2]) for ln in out.splitlines()
                    if ln.startswith("MPLOSS")]

        l0, l1 = losses(outs[0]), losses(outs[1])
        assert len(l0) == len(l1) == 2
        np.testing.assert_allclose(l0, l1, rtol=1e-6)

        def checksum(out):
            return [float(ln.split()[1]) for ln in out.splitlines()
                    if ln.startswith("MPSAMPLE")]

        s0, s1 = checksum(outs[0]), checksum(outs[1])
        assert len(s0) == len(s1) == 1
        np.testing.assert_allclose(s0, s1, rtol=1e-6)

        # coordinated orbax save -> load -> step under the global mesh
        def resume(out):
            return [float(ln.split()[1]) for ln in out.splitlines()
                    if ln.startswith("MPRESUME")]

        r0, r1 = resume(outs[0]), resume(outs[1])
        assert len(r0) == len(r1) == 1
        np.testing.assert_allclose(r0, r1, rtol=1e-6)

        # single-process reference over the same 8 devices
        from tests.mp_train_common import build_loop, run_sample, run_steps

        mesh = mesh_lib.make_mesh(model=1)
        loop = build_loop(mesh, save_dir=str(tmp_path / "single"))
        ref = run_steps(loop, n=2)
        np.testing.assert_allclose(l0, ref, rtol=1e-5)
        # dp-sharded SAMPLING checksum matches too
        np.testing.assert_allclose(s0, [run_sample(loop)], rtol=1e-5)


class TestFusedKernelsShardedMesh:
    """The fused Pallas kernels compose with the (data, model) mesh via
    shard_map: batch shards over 'data' (weights replicated), and the
    flash kernel's head axis shards over 'model'.  Mirrors the
    `fused_sharded` section of __graft_entry__.dryrun_multichip."""

    def _mesh(self):
        return mesh_lib.make_mesh(jax.devices()[:8], model=2)

    def test_fused_encoder_layer_dp(self):
        import functools

        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        from gesturediffusion_tpu.ops.pallas_encoder import (
            fused_encoder_layer,
        )

        rs = np.random.RandomState(0)
        mesh = self._mesh()
        d, f, nh = 16, 32, 4
        x = jnp.asarray(rs.randn(16, 8, d), jnp.float32)
        ws = [
            jnp.asarray(rs.randn(*shp) * 0.2, jnp.float32)
            for shp in ((d, 3 * d), (3 * d,), (d, d), (d,), (d,), (d,),
                        (d, f), (f,), (f, d), (d,), (d,), (d,))
        ]
        fn = functools.partial(
            fused_encoder_layer, num_heads=nh, interpret=True
        )
        want = np.asarray(fn(x, *ws))
        sharded = shard_map(
            fn, mesh=mesh, in_specs=(P("data"),) + (P(),) * len(ws),
            out_specs=P("data"), check_vma=False,
        )
        got = np.asarray(jax.jit(sharded)(x, *ws))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_flash_attention_dp_tp(self):
        import functools

        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        from gesturediffusion_tpu.ops.pallas_flash import (
            fused_self_attention,
        )

        rs = np.random.RandomState(1)
        mesh = self._mesh()
        q, k, v = (
            jnp.asarray(rs.randn(8, 4, 16, 8), jnp.float32)
            for _ in range(3)
        )
        fn = functools.partial(fused_self_attention, interpret=True)
        want = np.asarray(fn(q, k, v))
        sharded = shard_map(
            fn, mesh=mesh, in_specs=(P("data", "model"),) * 3,
            out_specs=P("data", "model"), check_vma=False,
        )
        got = np.asarray(jax.jit(sharded)(q, k, v))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
