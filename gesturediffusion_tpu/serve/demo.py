"""Live-serving demo CLI: `python -m gesturediffusion_tpu.serve.demo`.

The batch generator (sample/generate.py) needs every audio chunk up
front; this CLI drives the incremental serving path instead
(serve/streaming.py StreamingGestureSession): chunks are fed one at a
time — the way a live agent receives audio — with the seed-pose carry
held on device, and per-chunk wall latency is reported as it happens.

Two chunk sources:
  * default: the val split's own windows (conditioning identical to the
    batch path — reference: sample/generate.py:91-130 — so the output
    matches `sample.generate` for the same seed);
  * ``--wav somefile.wav``: a raw mono recording, run through the
    dataset's MFCC + z-norm front end per window (chunk 0 seeds from
    zeros in z-normalized space, i.e. the dataset mean pose, since a
    novel recording has no GT seed).

Outputs per stream: a BVH take + results.npy (same contract as
sample/generate.py), plus a latency report (compile-excluded
steady-state mean/worst and the realtime speedup).

Example (44 ms/chunk serving config):
    python -m gesturediffusion_tpu.serve.demo \\
        --model_path save/run/model000600000 \\
        --sampler ddim --sample_steps 50 --streams 1
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import jax
import numpy as np

from gesturediffusion_tpu.data.collate import collate_gesture, device_cond
from gesturediffusion_tpu.data.registry import get_dataset
from gesturediffusion_tpu.serve import StreamingGestureSession
from gesturediffusion_tpu.utils import logger as log_lib
from gesturediffusion_tpu.utils.cache import enable_compilation_cache
from gesturediffusion_tpu.utils.checkpoint import load_checkpoint
from gesturediffusion_tpu.utils.fixseed import fixseed, set_prng_impl
from gesturediffusion_tpu.utils.model_factory import (
    create_gaussian_diffusion,
    create_model_and_diffusion,
)
from gesturediffusion_tpu.diffusion.schedules import respacing_string
from gesturediffusion_tpu.utils.parser import default_output_dir, serve_args

FPS = 30
SR = 22050


def _dataset_chunk_feeder(dataset, streams: int, num_frames: int,
                          seed_poses: int):
    """Yield per-chunk cond dicts from the val split (batch-path layout:
    stream s serves take s; chunk k is that take's k-th window), plus the
    GT seed for chunk 0.

    Datasets without take structure (no ``samples_cumulative``, e.g. the
    synthetic smoke dataset) partition their windows into ``streams``
    contiguous runs and serve each run as consecutive chunks."""
    from gesturediffusion_tpu.sample.generate import take_layout

    layout = take_layout(dataset)
    if layout is not None:
        per_take, take_starts, _ = layout
        if streams > len(per_take):
            raise SystemExit(
                f"--streams {streams} > {len(per_take)} takes in the "
                "val split"
            )
        chunks_per_take = int(per_take[:streams].min())
        starts = [int(take_starts[s]) for s in range(streams)]
    else:
        chunks_per_take = len(dataset) // streams
        if chunks_per_take == 0:
            raise SystemExit(
                f"--streams {streams} > {len(dataset)} windows in the "
                "val split"
            )
        starts = [s * chunks_per_take for s in range(streams)]

    def chunk_cond(k):
        items = [dataset[starts[s] + k] for s in range(streams)]
        _, cond = collate_gesture(items, max_frames=num_frames)
        # keep EVERY conditioning key (mfcc for the MFCC path, audio for
        # wav-encoder checkpoints, masks/lengths when present); 'seed' is
        # the session's on-device carry and must not come from the host
        return {
            k2: np.asarray(v)
            for k2, v in device_cond(cond).items()
            if k2 != "seed"
        }, cond

    first_cond, cond0 = chunk_cond(0)
    if "seed" in cond0:
        init_seed = np.asarray(cond0["seed"], np.float32)
    else:
        # dataset provides no GT seed poses: start from the z-normalized
        # mean pose (zeros), same convention as the wav path; sized by
        # the SESSION's seed_poses (the dataset has none to consult)
        item0 = dataset[starts[0]]
        j = np.asarray(item0["motion"]).shape[-1]
        init_seed = np.zeros((streams, j, 1, seed_poses), np.float32)

    def conds():
        yield first_cond  # chunk 0 was already collated for the seed
        for k in range(1, chunks_per_take):
            yield chunk_cond(k)[0]

    return conds(), chunks_per_take, init_seed


def _wav_chunk_feeder(path: str, dataset, streams: int, num_frames: int,
                      seed_poses: int):
    """Yield raw-audio windows from a wav file (broadcast to every
    stream); chunk 0 seeds from zeros (the z-normalized mean pose)."""
    from scipy.io import wavfile

    sr, audio = wavfile.read(path)
    if sr != SR:
        raise SystemExit(f"--wav must be {SR} Hz mono (got {sr} Hz); "
                         f"resample first (e.g. ffmpeg -ar {SR})")
    # int->float BEFORE the stereo downmix: mean(axis=1) promotes to
    # float64 and would skip the integer-scale normalization
    if np.issubdtype(audio.dtype, np.integer):
        audio = audio.astype(np.float32) / np.iinfo(audio.dtype).max
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    window = int(num_frames * SR / FPS)
    n = len(audio) // window
    if n == 0:
        raise SystemExit(f"--wav shorter than one {num_frames}-frame chunk")

    def windows():
        for k in range(n):
            yield audio[k * window : (k + 1) * window].astype(np.float32)

    init_seed = np.zeros(
        (streams, dataset.pose_dim, 1, seed_poses), np.float32
    )
    return windows(), n, init_seed


def main(argv=None):
    args = serve_args(argv)
    fixseed(args.seed)
    set_prng_impl(getattr(args, "prng", "rbg"))
    enable_compilation_cache()

    out_path = args.output_dir or default_output_dir(
        args.model_path, "serve", f"seed{args.seed}"
    )
    if args.num_chunks < 0:
        raise SystemExit(f"--num_chunks must be >= 0, got {args.num_chunks}")

    log_lib.log("Loading dataset (stats + conditioning source)...")
    dataset = get_dataset(
        args.dataset, args.num_frames, split="val",
        datapath=args.data_dir or None, n_seed_poses=args.seed_poses,
    )

    log_lib.log("Creating model...")
    model, _ = create_model_and_diffusion(args, dataset)
    params = load_checkpoint(args.model_path, model=model)["params"]

    # diffusion built from the checkpoint's own flags (sigma_small etc.,
    # utils/model_factory.py) with the serving respacing applied; the
    # respacing-string mapping is the session's own helper
    diffusion = create_gaussian_diffusion(
        args,
        timestep_respacing=respacing_string(
            args.sample_steps or None, args.sampler, args.step_spacing
        ),
    )

    session = StreamingGestureSession(
        model, params,
        guidance_param=args.guidance_param,
        cond_mask_prob=args.cond_mask_prob,
        sampler=args.sampler, diffusion=diffusion,
        streams=args.streams, chunk_frames=args.num_frames,
        seed_poses=args.seed_poses, fps=FPS,
        no_fast=getattr(args, "no_fast_sampler", False),
    )

    from_wav = bool(args.wav)
    if from_wav:
        feeder, n_chunks, init_seed = _wav_chunk_feeder(
            args.wav, dataset, args.streams, args.num_frames,
            args.seed_poses,
        )
    else:
        feeder, n_chunks, init_seed = _dataset_chunk_feeder(
            dataset, args.streams, args.num_frames, args.seed_poses
        )
    if args.num_chunks:
        n_chunks = min(n_chunks, args.num_chunks)

    log_lib.log(
        f"Serving {n_chunks} chunks x {args.streams} stream(s), "
        f"{args.sampler}"
        + (f"-{args.sample_steps}" if args.sample_steps else "-full")
    )
    session.start(init_seed, rng=args.seed)

    motion_s = args.num_frames / FPS
    chunks = []
    compile_latency = 0.0
    for k, payload in enumerate(feeder):
        if k >= n_chunks:
            break
        if from_wav:
            out = session.feed_audio(
                payload, samplerate=SR,
                mfcc_mean=getattr(dataset, "mfcc_mean", None),
                mfcc_std=getattr(dataset, "mfcc_std", None),
            )
        else:
            out = session.feed(payload)
        chunks.append(out)
        dt = session.stats().last_latency_s
        note = " (includes jit compile)" if k == 0 else ""
        log_lib.log(
            f"chunk {k}: {dt * 1e3:7.1f} ms "
            f"({motion_s / dt:5.1f}x realtime){note}"
        )
        if k == 0:
            compile_latency = dt
            if n_chunks > 1:
                # steady-state stats exclude compile; with a single
                # chunk there IS no steady state — keep the stats so
                # the report shows the one real latency, not zeros
                session.reset_stats()
    if not chunks:
        raise SystemExit("no chunks served (empty source)")

    stats = session.stats()
    report = {
        "streams": args.streams,
        "chunks_served": len(chunks),
        "sampler": args.sampler,
        "sample_steps": args.sample_steps or diffusion.num_timesteps,
        "first_chunk_s": round(compile_latency, 4),
        "steady_mean_latency_s": round(stats.mean_latency_s, 4),
        "steady_worst_latency_s": round(stats.worst_latency_s, 4),
        "realtime_speedup": round(stats.realtime_speedup, 2),
    }
    if len(chunks) == 1:
        report["note"] = "single chunk: steady fields include jit compile"
    log_lib.log("serving report: " + json.dumps(report))

    # ---- persist: results.npy + one BVH per stream ------------------- #
    from gesturediffusion_tpu.sample.generate import (
        load_reference_skeleton,
        split_pose_vector,
    )
    from gesturediffusion_tpu.viz.bvh import export_gesture_bvh

    # same skeleton contract as sample/generate.py — use the dataset's
    # reference BVH (real joint names/offsets) when present
    reference = load_reference_skeleton(dataset)

    if os.path.exists(out_path):
        shutil.rmtree(out_path)
    os.makedirs(out_path)

    outs = np.stack(chunks)  # [C, B, J, 1, T]
    n_joints = dataset.pose_dim // 6
    pos_chunks, rot_chunks = [], []
    for c in range(outs.shape[0]):
        vec = dataset.inv_transform(outs[c][:, :, 0, :].transpose(0, 2, 1))
        pos, rot = split_pose_vector(vec, n_joints)
        pos_chunks.append(pos)
        rot_chunks.append(rot)
    motions = np.concatenate(pos_chunks, axis=1)  # [B, T_total, J, 3]
    rotations = np.concatenate(rot_chunks, axis=1)

    np.save(
        os.path.join(out_path, "results.npy"),
        {
            "motion": motions.transpose(0, 2, 3, 1),  # [B, J, 3, T]
            "text": [""] * args.streams,
            "lengths": np.full((args.streams,), motions.shape[1]),
            "num_samples": args.streams,
            "num_chunks": len(chunks),
            "serving_report": report,
        },
    )
    for s in range(args.streams):
        export_gesture_bvh(
            os.path.join(out_path, f"stream_{s}.bvh"),
            rotations[s], motions[s][:, 0, :], reference=reference,
            fps=FPS,
        )
    with open(os.path.join(out_path, "serving_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    log_lib.log(f"[Done] Results are at [{os.path.abspath(out_path)}]")
    return out_path


if __name__ == "__main__":
    main(sys.argv[1:])
