"""Gesture generation CLI: `python -m gesturediffusion_tpu.sample.generate`.

Functional parity surface with the reference generator
(reference: sample/generate.py:23-304): load checkpoint args, val split,
chunked autoregressive sampling over takes (seed hand-off of the last
`seed_poses` frames between chunks :104-107), CFG scale injection
:114-115, inverse z-norm + interleaved position/rotation split :132-146,
results.npy/txt dump :208-216, stick-figure video :238, BVH export for
generated and GT motion :246-284, audio mux :297-301.

TPU design: the WHOLE take is one device program — an outer `lax.scan`
over chunks (seed hand-off in the scan carry) whose body is the inner
denoise scan with the CFG pair batched.  The reference's
14 chunks × 1000 steps × 2 CFG passes of host round-trips collapse to a
single dispatch (diffusion/sampling.py autoregressive_sample_loop).
"""

from __future__ import annotations

import os
import shutil
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.data.collate import collate_gesture, device_cond
from gesturediffusion_tpu.data.registry import get_dataset
from gesturediffusion_tpu.diffusion import sampling
from gesturediffusion_tpu.utils import logger as log_lib
from gesturediffusion_tpu.utils import paramutil
from gesturediffusion_tpu.utils.cache import enable_compilation_cache
from gesturediffusion_tpu.utils.checkpoint import load_checkpoint
from gesturediffusion_tpu.utils.fixseed import fixseed
from gesturediffusion_tpu.utils.model_factory import create_model_and_diffusion
from gesturediffusion_tpu.utils import parser as parser_lib
from gesturediffusion_tpu.utils.parser import generate_args


def split_pose_vector(vec: np.ndarray, n_joints: int):
    """Interleaved 6-per-joint pose vector -> (positions, rotations).

    vec [..., n_joints*6] with per-joint layout [rx, ry, rz, px, py, pz]
    (reference: sample/generate.py:138-146).
    Returns (positions [..., J, 3], rotations [..., J, 3]).
    """
    idx_pos = np.asarray(
        [[i * 6 + 3, i * 6 + 4, i * 6 + 5] for i in range(n_joints)]
    ).flatten()
    idx_rot = np.asarray(
        [[i * 6, i * 6 + 1, i * 6 + 2] for i in range(n_joints)]
    ).flatten()
    pos = vec[..., idx_pos].reshape(vec.shape[:-1] + (n_joints, 3))
    rot = vec[..., idx_rot].reshape(vec.shape[:-1] + (n_joints, 3))
    return pos, rot


def take_layout(dataset):
    """Per-take window layout of a dataset split, in DATASET-LOCAL
    indices (the ones ``dataset[i]`` accepts).

    ``samples_cumulative`` is a whole-corpus table; splits that window a
    contiguous slice of it (Genea2022's 70/30 split stores the slice
    offset in ``dataset.begin`` and adds it inside ``__getitem__``) must
    have that offset subtracted before the boundaries are usable as
    item indices.  Returns ``(counts, starts, take_ids)`` over the takes
    that have at least one window in this split (``take_ids`` indexes
    ``dataset.takes`` for naming), or ``None`` when the dataset has no
    take structure.
    """
    if not hasattr(dataset, "samples_cumulative"):
        return None
    cum = np.asarray(dataset.samples_cumulative, dtype=np.int64)
    begin = int(getattr(dataset, "begin", 0))
    bounds = np.clip(cum - begin, 0, len(dataset))
    starts = np.concatenate([[0], bounds[:-1]])
    counts = bounds - starts
    (keep,) = np.nonzero(counts > 0)
    return counts[keep], starts[keep], keep


def load_reference_skeleton(dataset):
    """The dataset's reference BVH skeleton (real joint names/offsets),
    parsed once, or None when the asset is absent (synthetic runs)."""
    from gesturediffusion_tpu.viz.bvh import read_bvh

    path = os.path.join(
        getattr(dataset, "datapath", ""), "trn/main-agent/bvh/reference.bvh"
    )
    return read_bvh(path, skip_motion=True) if os.path.isfile(path) else None


def main(argv=None):
    args = generate_args(argv)
    fixseed(args.seed)
    from gesturediffusion_tpu.utils.fixseed import set_prng_impl

    set_prng_impl(getattr(args, "prng", "rbg"))
    enable_compilation_cache()

    fps = 30
    out_path = args.output_dir or parser_lib.default_output_dir(
        args.model_path, "samples", f"seed{args.seed}"
    )

    from gesturediffusion_tpu.utils.model_factory import GESTURE_DATASETS

    if args.dataset not in GESTURE_DATASETS:
        # the reference fork's generate.py is gesture-only (hardcoded
        # takes/chunks + audio conditioning, sample/generate.py:46-47);
        # text/action models sample via sample.predict (programmatic) or
        # the eval protocols
        raise SystemExit(
            f"sample.generate is the GESTURE generator (audio-conditioned "
            f"chunked AR), like the reference fork's; --dataset "
            f"{args.dataset} has no audio takes. Use "
            f"gesturediffusion_tpu.sample.predict (text-to-motion) or the "
            f"eval CLIs instead."
        )

    log_lib.log("Loading dataset...")
    dataset = get_dataset(
        args.dataset,
        args.num_frames,
        split="val",
        datapath=args.data_dir or None,
        n_seed_poses=args.seed_poses,
    )
    n_joints = dataset.pose_dim // 6

    # takes / chunks: the reference hardcodes 41 takes x 14 chunks; we take
    # what the val split actually has, capped by num_samples.
    layout = take_layout(dataset)
    if layout is not None:
        per_take, take_starts, take_ids = layout
        n_takes = min(args.num_samples, len(per_take))
        chunks_per_take = int(per_take[:n_takes].min())
        step = int(getattr(dataset, "step", args.num_frames))
        if chunks_per_take > 1 and step != args.num_frames:
            # chunk k+1 must start exactly where chunk k ends for the
            # AR seed hand-off + concatenation to form a real take;
            # Genea2022's fixed step=30 < window makes consecutive
            # windows OVERLAP, so stitching would repeat content
            raise SystemExit(
                f"chunked AR generation needs non-overlapping windows "
                f"(dataset step {step} != num_frames {args.num_frames}); "
                f"this split's windows overlap — use --num_samples per "
                f"single window or a split with step == window (like the "
                f"genea2023 val split)"
            )
    else:
        n_takes = min(args.num_samples, len(dataset))
        chunks_per_take = 1
        per_take = np.ones(len(dataset), np.int64)
        take_starts = np.arange(len(dataset), dtype=np.int64)
        take_ids = take_starts

    log_lib.log(
        f"Generating {n_takes} takes x {chunks_per_take} chunks "
        f"of {args.num_frames} frames"
    )

    log_lib.log("Creating model and diffusion...")
    model, diffusion = create_model_and_diffusion(args, dataset)
    ckpt = load_checkpoint(args.model_path, model=model)
    params = ckpt["params"]

    # MDM sampling fast path: hoist the loop-invariant conditioning out of
    # the denoise scan (models/mdm_fastpath.py); exact in f32, bf16-rounding
    # otherwise.  --no_fast_sampler falls back to the straight module apply.
    from gesturediffusion_tpu.models.mdm_fastpath import (
        select_sampling_model_fn,
    )

    cond_precompute, model_fn = select_sampling_model_fn(
        model, params, args.guidance_param, args.cond_mask_prob,
        no_fast=getattr(args, "no_fast_sampler", False),
    )

    shape = (n_takes, dataset.pose_dim, 1, args.num_frames)
    sampler_name = getattr(args, "sampler", "ddpm")
    loop = {
        "ddpm": sampling.p_sample_loop,
        "ddim": sampling.ddim_sample_loop,
        "plms": sampling.plms_sample_loop,
        "dpmpp": sampling.dpmpp_sample_loop,
    }[sampler_name]

    # ---- pre-collate every chunk host-side (cheap numpy) ------------ #
    chunk_dconds, chunk_gts = [], []
    all_text, all_audio, all_lengths = [], [], []
    for chunk in range(chunks_per_take):
        items = []
        for take in range(n_takes):
            if chunk >= int(per_take[take]):
                raise ValueError(f"chunk {chunk} out of range for take {take}")
            items.append(dataset[int(take_starts[take]) + chunk])
        gt_motion, cond = collate_gesture(items, max_frames=args.num_frames)
        chunk_dconds.append(device_cond(cond))
        chunk_gts.append(gt_motion)
        all_text += cond.get("text", [""] * n_takes)
        if "audio" in cond:
            all_audio.append(np.asarray(cond["audio"]))
        all_lengths.append(np.asarray(cond["lengths"]))

    # first chunk's dataset seed initializes the AR carry; later chunks'
    # dataset seeds are superseded by the hand-off (reference :104-107)
    if "seed" in chunk_dconds[0]:
        init_seed = jnp.asarray(chunk_dconds[0]["seed"])
    else:
        init_seed = jnp.zeros(
            (n_takes, dataset.pose_dim, 1, args.seed_poses), jnp.float32
        )
    stacked_conds = {
        k: jnp.asarray(np.stack([np.asarray(d[k]) for d in chunk_dconds]))
        for k in chunk_dconds[0]
        if k != "seed"
    }
    if args.guidance_param != 1:
        stacked_conds["scale"] = jnp.full(
            (chunks_per_take, n_takes), args.guidance_param
        )

    # multi-chip: shard the take batch over the mesh's data axis — GSPMD
    # shards the whole denoise scan (equivalence tested on the virtual
    # mesh, tests/test_distributed.py::TestShardedSampling)
    if jax.device_count() > 1:
        from gesturediffusion_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_data_mesh_for_batch(n_takes)
        dp = mesh.shape["data"]
        if dp > 1:
            cc_sh = mesh_lib.axis1_batch_sharding(mesh)
            stacked_conds = {
                k: jax.device_put(v, cc_sh)
                for k, v in stacked_conds.items()
            }
            init_seed = jax.device_put(
                init_seed, mesh_lib.batch_sharding(mesh)
            )
            log_lib.log(f"sampling data-parallel over {dp} devices")
        else:
            log_lib.log(
                f"n_takes={n_takes} shares no factor with the device "
                "count — sampling unsharded"
            )

    log_lib.log(
        f"### Sampling all {chunks_per_take} chunks as one device program"
    )

    @jax.jit
    def sample_take(rng, chunk_conds, seed0):
        return sampling.autoregressive_sample_loop(
            diffusion, model_fn, shape, rng, chunk_conds, seed0,
            args.seed_poses, loop=loop, clip_denoised=False,
            cond_precompute=cond_precompute,
        )

    outs = np.asarray(
        sample_take(jax.random.PRNGKey(args.seed), stacked_conds, init_seed)
    )  # [C, B, J, 1, T]

    all_motions, all_rot, all_gt_pos, all_gt_rot = [], [], [], []
    for chunk in range(chunks_per_take):
        sample_np = dataset.inv_transform(
            outs[chunk][:, :, 0, :].transpose(0, 2, 1)
        )  # [B, T, D]
        pos, rot = split_pose_vector(sample_np, n_joints)
        gt_np = dataset.inv_transform(
            chunk_gts[chunk][:, :, 0, :].transpose(0, 2, 1)
        )
        gpos, grot = split_pose_vector(gt_np, n_joints)
        all_motions.append(pos)       # [B, T, J, 3]
        all_rot.append(rot)
        all_gt_pos.append(gpos)
        all_gt_rot.append(grot)

    motions = np.concatenate(all_motions, axis=1)  # [B, T_total, J, 3]
    rotations = np.concatenate(all_rot, axis=1)
    gt_pos = np.concatenate(all_gt_pos, axis=1)
    gt_rot = np.concatenate(all_gt_rot, axis=1)
    audios = np.concatenate(all_audio, axis=1) if all_audio else None
    # reference contract (sample/generate.py:190-191): text/lengths are
    # TRIMMED to the sample count so they pair 1:1 with the motion rows.
    # Deliberate divergence: the reference stores one CHUNK's length (80)
    # next to a stitched chunks*80-frame row — a consumer masking
    # motion[..., :length] would drop all but the first chunk — so we
    # store the TAKE total instead.
    all_text = all_text[:n_takes]
    lengths = (
        np.concatenate(all_lengths, axis=0)[:n_takes] * chunks_per_take
    )

    if os.path.exists(out_path):
        shutil.rmtree(out_path)
    os.makedirs(out_path)

    npy_path = os.path.join(out_path, "results.npy")
    log_lib.log(f"saving results file to [{npy_path}]")
    np.save(
        npy_path,
        {
            "motion": motions.transpose(0, 2, 3, 1),  # [B, J, 3, T] contract
            "text": all_text,
            "lengths": lengths,
            "num_samples": n_takes,
            "num_chunks": chunks_per_take,
        },
    )
    with open(npy_path.replace(".npy", ".txt"), "w") as fw:
        fw.write("\n".join(all_text))
    with open(npy_path.replace(".npy", "_len.txt"), "w") as fw:
        fw.write("\n".join(str(int(l)) for l in lengths))

    # ---- visualization + BVH export -------------------------------- #
    from gesturediffusion_tpu.viz.bvh import export_gesture_bvh
    from gesturediffusion_tpu.viz.plot import plot_3d_motion

    chains = (
        paramutil.genea2022_kinematic_chain
        if n_joints >= 83
        else [[i, i + 1] for i in range(n_joints - 1)]
    )
    takes = getattr(dataset, "takes", [f"take_{i}" for i in range(n_takes)])

    # parse the reference skeleton ONCE (read_bvh tokenizes the whole
    # file; re-reading per take wastes seconds of host time on large BVHs)
    reference = load_reference_skeleton(dataset)

    for i in range(n_takes):
        t = int(take_ids[i])
        save_file = takes[t] if t < len(takes) else f"take_{t}"
        anim_path = os.path.join(out_path, str(save_file))
        log_lib.log(f"Saving take {i}: {save_file}")
        try:
            plot_3d_motion(
                anim_path + ".mp4", chains, motions[i], dataset=args.dataset,
                title="", fps=fps,
            )
        except Exception as e:  # viz is best-effort (headless envs)
            log_lib.log(f"  (video skipped: {e})")
        export_gesture_bvh(
            anim_path + ".bvh", rotations[i], motions[i][:, 0, :],
            reference=reference, fps=fps,
        )
        export_gesture_bvh(
            anim_path + "_gt.bvh", gt_rot[i], gt_pos[i][:, 0, :],
            reference=reference, fps=fps,
        )
        if audios is not None:
            from scipy.io import wavfile

            wavfile.write(
                anim_path + ".wav", 22050,
                (audios[i] * 32767).astype(np.int16),
            )
            if shutil.which("ffmpeg") and os.path.isfile(anim_path + ".mp4"):
                import subprocess

                # list argv: paths with spaces/metacharacters stay intact
                r = subprocess.run(
                    ["ffmpeg", "-y", "-loglevel", "warning",
                     "-i", anim_path + ".mp4", "-i", anim_path + ".wav",
                     "-c:v", "copy", "-map", "0:v:0", "-map", "1:a:0",
                     "-c:a", "aac", "-b:a", "192k",
                     anim_path + "_audio.mp4"],
                )
                if r.returncode != 0:
                    log_lib.log(f"  (audio mux failed: ffmpeg rc {r.returncode})")

    log_lib.log(f"[Done] Results are at [{os.path.abspath(out_path)}]")
    return out_path


if __name__ == "__main__":
    main(sys.argv[1:])
