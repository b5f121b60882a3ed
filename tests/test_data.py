"""Data pipeline tests: synthetic GENEA layout, windowing, collate, loader."""

import os
import time
import numpy as np
import pytest

from gesturediffusion_tpu.data.collate import collate_gesture, device_cond
from gesturediffusion_tpu.data.genea import Genea2023
from gesturediffusion_tpu.data.loader import DataLoader
from gesturediffusion_tpu.data.registry import get_dataset_loader
from gesturediffusion_tpu.data.synthetic import (
    SyntheticGesture,
    make_synthetic_genea2023,
)
from gesturediffusion_tpu.ops.mfcc import mfcc


@pytest.fixture(scope="module")
def genea_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("genea")
    return make_synthetic_genea2023(
        str(root), n_takes=2, frames_per_take=200, pose_dim=24
    )


class TestMFCC:
    def test_frame_alignment(self):
        """80 motion frames @30fps of 22.05kHz audio -> 80 MFCC rows."""
        sr, fps, window = 22050, 30, 80
        audio = np.random.RandomState(0).randn(int(window * sr / fps))
        feats = mfcc(audio, samplerate=sr, winstep=1.0 / fps)
        assert feats.shape[0] == window

    def test_numcep_clamped_to_nfilt(self):
        """numcep=27 with nfilt=26 yields 26 columns (reference behavior)."""
        audio = np.random.RandomState(0).randn(22050)
        feats = mfcc(audio, numcep=27, nfilt=26)
        assert feats.shape[1] == 26

    def test_finite_and_deterministic(self):
        audio = np.random.RandomState(1).randn(44100) * 0.1
        a = mfcc(audio)
        b = mfcc(audio)
        assert np.all(np.isfinite(a))
        np.testing.assert_array_equal(a, b)

    @pytest.mark.skipif(
        not _has_psf() if (_has_psf := lambda: False)() else True,
        reason="python_speech_features not installed",
    )
    def test_golden_vs_python_speech_features(self):  # pragma: no cover
        import python_speech_features as psf

        audio = np.random.RandomState(0).randn(44100) * 0.1
        ours = mfcc(audio, samplerate=22050, winlen=0.06, winstep=1 / 30,
                    numcep=27, nfft=5000)
        ref = psf.mfcc(audio, winlen=0.06, winstep=1 / 30, samplerate=22050,
                       numcep=27, nfft=5000)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestGenea2023:
    def test_dataset_length_and_item(self, genea_root):
        ds = Genea2023(genea_root, split="train", window=80, step=30,
                       n_seed_poses=10)
        # 2 takes, 200 frames: floor((200-80)/30)=4 windows each
        assert len(ds) == 8
        item = ds[0]
        assert item["motion"].shape == (80, 24)
        assert item["seed"].shape == (10, 24)
        assert item["mfcc"].shape[0] == 80
        assert isinstance(item["text"], str)

    def test_val_split_uses_window_step(self, genea_root):
        ds = Genea2023(genea_root, split="val", window=80)
        assert ds.step == 80
        assert len(ds) == 2  # floor((200-80)/80)=1 per take

    def test_znorm_roundtrip(self, genea_root):
        ds = Genea2023(genea_root, split="train", window=80)
        item = ds[3]
        raw = ds.inv_transform(item["motion"])
        renorm = (raw - ds.mean) / ds.std
        np.testing.assert_allclose(renorm, item["motion"], atol=1e-5)

    def test_windowing_matches_files(self, genea_root):
        import os

        ds = Genea2023(genea_root, split="train", window=80, step=30)
        item = ds[1]  # second window of take 0
        motion_file = np.load(
            os.path.join(
                genea_root,
                "trn/main-agent/motion_npy_rotpos",
                ds.takes[0] + ".npy",
            )
        )
        expected = (motion_file[30:110] - ds.mean) / ds.std
        np.testing.assert_allclose(item["motion"], expected, atol=1e-5)
        # seed poses are the first n frames of the SAME window
        np.testing.assert_allclose(item["seed"], expected[:10], atol=1e-5)

    def test_text_window_nonempty(self, genea_root):
        ds = Genea2023(genea_root, split="train", window=80)
        texts = [ds[i]["text"] for i in range(len(ds))]
        assert any(len(t) > 0 for t in texts)


class TestCollate:
    def test_contract_shapes(self):
        ds = SyntheticGesture(n_items=6, window=20, pose_dim=16, n_seed_poses=4)
        motion, cond = collate_gesture([ds[i] for i in range(4)])
        assert motion.shape == (4, 16, 1, 20)
        assert cond["mask"].shape == (4, 1, 1, 20)
        assert cond["mask"].dtype == bool
        assert cond["mfcc"].shape == (4, 26, 1, 20)
        assert cond["seed"].shape == (4, 16, 1, 4)
        assert cond["lengths"].tolist() == [20] * 4
        assert len(cond["text"]) == 4

    def test_pad_to_max_frames(self):
        ds = SyntheticGesture(n_items=2, window=20, pose_dim=8, n_seed_poses=2)
        motion, cond = collate_gesture([ds[0], ds[1]], max_frames=32)
        assert motion.shape == (2, 8, 1, 32)
        assert cond["mask"][0, 0, 0, 19]
        assert not cond["mask"][0, 0, 0, 20]

    def test_device_cond_strips_text(self):
        ds = SyntheticGesture(n_items=2, window=20, pose_dim=8, n_seed_poses=2)
        _, cond = collate_gesture([ds[0], ds[1]])
        dc = device_cond(cond)
        assert "text" not in dc and "mask" in dc


class TestLoader:
    def test_iterates_and_drops_last(self):
        ds = SyntheticGesture(n_items=10, window=16, pose_dim=8, n_seed_poses=2)
        dl = DataLoader(ds, batch_size=4, collate_fn=collate_gesture,
                        num_workers=2)
        batches = list(dl)
        assert len(batches) == 2
        motion, cond = batches[0]
        assert motion.shape == (4, 8, 1, 16)

    def test_shuffle_determinism_by_seed(self):
        ds = SyntheticGesture(n_items=12, window=16, pose_dim=8, n_seed_poses=2)
        a = [m.sum() for m, _ in DataLoader(ds, 4, collate_gesture, seed=7)]
        b = [m.sum() for m, _ in DataLoader(ds, 4, collate_gesture, seed=7)]
        np.testing.assert_allclose(a, b)

    def test_registry_synthetic(self):
        dl = get_dataset_loader("synthetic", batch_size=4, num_frames=16,
                                n_seed_poses=2, num_workers=1,
                                pose_dim=8, n_items=8)
        motion, cond = next(iter(dl))
        assert motion.shape == (4, 8, 1, 16)

    def test_registry_synthetic_scales_to_batch(self):
        """Without an explicit n_items the synthetic set sizes itself to
        the requested batch (the production soak runs the train CLI at
        batch 256 against it)."""
        dl = get_dataset_loader("synthetic", batch_size=96, num_frames=16,
                                n_seed_poses=2, num_workers=1, pose_dim=8)
        assert len(dl.dataset) == 192
        motion, cond = next(iter(dl))
        assert motion.shape == (96, 8, 1, 16)

    def test_registry_genea(self, genea_root):
        dl = get_dataset_loader(
            "genea2023", batch_size=2, num_frames=80, datapath=genea_root,
            num_workers=2,
        )
        motion, cond = next(iter(dl))
        assert motion.shape == (2, 24, 1, 80)
        assert cond["mfcc"].shape[1] == 26


class TestMFCCCache:
    def test_cached_vs_exact_window_features(self, genea_root):
        """Take-level cached MFCC slices ~= exact per-chunk recompute."""
        ds_cache = Genea2023(genea_root, split="train", window=80,
                             use_mfcc_cache=True)
        ds_exact = Genea2023(genea_root, split="train", window=80,
                             use_mfcc_cache=False)
        a = ds_cache[1]["mfcc"]
        b = ds_exact[1]["mfcc"]
        assert a.shape == b.shape
        # identical except boundary frames (pre-emphasis/pad edge effects)
        diff = np.abs(a - b).max(axis=1)
        assert np.median(diff) < 1e-3


class TestGenea2022:
    def test_dataset_splits_and_items(self, tmp_path):
        from gesturediffusion_tpu.data.genea import Genea2022
        from gesturediffusion_tpu.data.synthetic import (
            make_synthetic_genea2022,
        )

        root = make_synthetic_genea2022(
            str(tmp_path / "g22"), n_takes=2, frames_per_take=300,
            pose_dim=12,
        )
        ds_tr = Genea2022(root, split="train", window=80, step=30)
        ds_va = Genea2022(root, split="val", window=80, step=30)
        total = ds_tr.length + ds_va.length
        # 2 takes x floor((300-80)/30)=7 windows
        assert total == 14
        assert ds_tr.length == int(14 * 0.7)
        item = ds_tr[0]
        assert item["motion"].shape == (80, 12)
        assert item["mfcc"].shape[0] == 80
        assert "seed" not in item  # 2022 has no seed poses

    def test_rejects_seed_poses(self, tmp_path):
        from gesturediffusion_tpu.data.genea import Genea2022

        with pytest.raises(NotImplementedError):
            Genea2022(str(tmp_path), n_seed_poses=10)


class TestReviewFixesRound3f:
    """Regressions from the data-package review (round 3)."""

    def test_short_take_contributes_zero_windows(self, tmp_path):
        """A take shorter than the window must contribute 0 samples —
        a negative count made samples_cumulative non-monotonic and
        silently corrupted the searchsorted index mapping."""
        root = make_synthetic_genea2023(
            str(tmp_path), n_takes=3, frames_per_take=200, pose_dim=24
        )
        src = os.path.join(root, "trn", "main-agent")
        # shrink the MIDDLE take below the window
        frames = np.load(os.path.join(src, "rotpos_frames.npy"))
        frames[1] = 40
        np.save(os.path.join(src, "rotpos_frames.npy"), frames)
        takes = sorted(
            f[:-4] for f in os.listdir(os.path.join(src, "motion_npy_rotpos"))
        )
        short = np.load(
            os.path.join(src, "motion_npy_rotpos", takes[1] + ".npy")
        )[:40]
        np.save(os.path.join(src, "motion_npy_rotpos", takes[1] + ".npy"),
                short)

        ds = Genea2023(root, split="train", window=80, step=30,
                       use_mfcc_cache=False)
        assert ds.samples_per_file[1] == 0
        per = [c for c in ds.samples_per_file if c > 0]
        assert len(ds) == sum(ds.samples_per_file) == sum(per)
        # every index must resolve to a take with enough frames
        for i in range(len(ds)):
            item = ds[i]
            assert item["motion"].shape[0] == 80

    def test_hash_vectorizer_is_process_stable(self):
        """hash(word) is salted per process; the fallback embeddings
        must come from a stable digest so metrics reproduce."""
        import hashlib
        import subprocess
        import sys

        from gesturediffusion_tpu.data.humanml import HashVectorizer

        v = HashVectorizer()
        w1, _ = v["walking/VERB"]
        seed = int.from_bytes(
            hashlib.md5(b"walking").digest()[:4], "little"
        )
        expect = np.random.RandomState(seed).randn(300).astype(
            np.float32
        ) * 0.1
        np.testing.assert_allclose(w1, expect)
        # a fresh interpreter (different hash salt) agrees
        out = subprocess.run(
            [sys.executable, "-c",
             "from gesturediffusion_tpu.data.humanml import HashVectorizer;"
             "import numpy as np;"
             "print(float(HashVectorizer()['walking/VERB'][0].sum()))"],
            capture_output=True, text=True,
            env=dict(os.environ, PYTHONHASHSEED="12345",
                     JAX_PLATFORMS="cpu"),
        )
        assert abs(float(out.stdout.strip()) - float(w1.sum())) < 1e-5

    def test_loader_abandoned_iteration_prefetch1_no_leak(self):
        """Breaking out of iteration with prefetch=1 must let the
        producer thread exit (the final sentinel put used to block
        forever on the full queue)."""
        import threading

        from gesturediffusion_tpu.data.loader import DataLoader

        class DS:
            def __len__(self):
                return 64

            def __getitem__(self, i):
                return {"x": np.zeros(4, np.float32)}

        loader = DataLoader(DS(), batch_size=4,
                            collate_fn=lambda items: items,
                            num_workers=2, prefetch=1)
        before = threading.active_count()
        for _ in range(3):
            for b in loader:
                break  # abandon immediately
        time.sleep(1.0)
        assert threading.active_count() <= before + 1

    def test_audio_pad_is_static(self, genea_root):
        """Audio must pad to the static t*735 contract, not the
        per-batch max (dynamic shapes retrace the jit)."""
        from gesturediffusion_tpu.data.collate import (
            AUDIO_SAMPLES_PER_FRAME,
            collate_gesture,
        )

        ds = Genea2023(genea_root, split="train", window=80, step=30,
                       use_mfcc_cache=False)
        items = [ds[0], ds[1]]
        items[1]["audio"] = items[1]["audio"][:-100]  # short tail
        _, cond = collate_gesture(items, max_frames=80)
        assert cond["audio"].shape == (2, 80 * AUDIO_SAMPLES_PER_FRAME)

    def test_mfcc_std_zero_guard(self, tmp_path):
        root = make_synthetic_genea2023(
            str(tmp_path), n_takes=2, frames_per_take=200, pose_dim=24
        )
        std_p = os.path.join(root, "trn", "main-agent", "mfccs_Std.npy")
        s = np.load(std_p)
        s[0] = 0.0
        np.save(std_p, s)
        ds = Genea2023(root, split="train", window=80, step=30,
                       use_mfcc_cache=False)
        assert np.isfinite(ds[0]["mfcc"]).all()
