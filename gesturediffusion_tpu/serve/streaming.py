"""Real-time streaming gesture serving.

The batch path (`sample/generate.py`) runs a whole take as ONE device
program — the highest-throughput layout (see bench.py) — but it needs
every audio chunk up front.  A live agent only has audio up to "now", so
serving must be incremental.  This module rebuilds the reference's
host-side per-chunk loop (reference: sample/generate.py:91-130, seed
hand-off :104-107) as a TPU serving session:

  * ONE jitted per-chunk program, compiled on the FIRST ``feed()``
    (jit traces on real shapes, so ``start()`` cannot compile it —
    budget the first chunk's latency accordingly, or absorb it with a
    throwaway warm-up feed before going live); every later chunk is a
    single device dispatch of the same executable (the chunk index is a
    traced scalar, so there is no per-chunk retrace).
  * the seed-pose carry stays ON DEVICE between chunks; per-chunk host
    traffic is the incoming conditioning window in and the finished
    motion chunk out.
  * ``streams`` concurrent takes batch onto the chip as one program
    (multi-tenant serving — the take-set ladder in bench.py shows
    per-chip throughput *rises* with batched streams).
  * an optional respaced sampler (``sample_steps=N`` → N-step DDPM /
    DDIM / PLMS / DPM-Solver++(2M) via the standard respacing surface,
    diffusion/schedules.py) trades sampling fidelity for per-chunk
    latency — the knob the reference exposes as ``--sample_steps`` style
    respacing (reference: diffusion/respace.py).  ``sampler="dpmpp"``
    is the low-latency pick: second-order in log-SNR time, it holds
    quality at far fewer steps than DDIM (measured ladder in README).

Feeding the same per-chunk conditioning in sequence reproduces the
batch path exactly: chunk k is denoised with ``fold_in(rng, k)`` and the
last ``seed_poses`` frames of chunk k condition chunk k+1, the identical
math `autoregressive_sample_loop` runs inside its scan (equivalence
tested in tests/test_streaming.py).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.diffusion import (
    GaussianDiffusion,
    ModelMeanType,
    create_diffusion,
)
from gesturediffusion_tpu.diffusion import sampling


@dataclasses.dataclass
class StreamStats:
    """Per-session serving latency accounting (wall seconds per chunk)."""

    chunks: int = 0
    total_latency_s: float = 0.0
    last_latency_s: float = 0.0
    worst_latency_s: float = 0.0
    motion_seconds_per_chunk: float = 0.0

    @property
    def mean_latency_s(self) -> float:
        return self.total_latency_s / self.chunks if self.chunks else 0.0

    @property
    def realtime_speedup(self) -> float:
        """Seconds of motion produced per wall second (>1 = real-time OK).

        Uses the mean chunk latency; the first ``feed()`` of a fresh
        session includes jit-compile time, so call
        ``session.reset_stats()`` after a warm-up chunk (or look at
        ``last_latency_s``) for steady-state numbers.
        """
        mean = self.mean_latency_s
        return self.motion_seconds_per_chunk / mean if mean > 0 else 0.0


class StreamingGestureSession:
    """Incremental chunked-AR gesture generation for live serving.

    Usage::

        session = StreamingGestureSession(model, params, streams=1)
        session.start(init_seed, rng=0)          # dataset GT seed poses
        chunk = session.feed({"mfcc": mfcc})     # [B, J, 1, T] per window
        ...                                      # repeat per audio window

    ``feed_audio`` accepts a raw mono window instead and runs the
    dataset's MFCC + z-norm front end host-side (ops/mfcc.py).

    Pass ``mesh=`` (a (data, model) mesh from parallel/mesh.py) to shard
    the streams axis over the mesh's data axis — multi-chip serving with
    GSPMD sharding the whole denoise loop, same scheme as
    sample/generate.py's data-parallel sampling.
    """

    def __init__(
        self,
        model: Any,
        params: Any,
        *,
        guidance_param: float = 2.5,
        cond_mask_prob: float = 0.1,
        sampler: str = "ddpm",
        sample_steps: Optional[int] = None,
        step_spacing: str = "uniform",
        diffusion: Optional[GaussianDiffusion] = None,
        diffusion_steps: int = 1000,
        noise_schedule: str = "cosine",
        streams: int = 1,
        chunk_frames: int = 80,
        seed_poses: int = 10,
        fps: float = 30.0,
        no_fast: bool = False,
        clip_denoised: bool = False,
        mesh: Optional[Any] = None,
    ):
        if diffusion is not None and (
            sample_steps is not None or step_spacing != "uniform"
        ):
            raise ValueError(
                "pass either a prebuilt `diffusion` or "
                "`sample_steps`/`step_spacing` (respacing is baked into "
                "the diffusion pytree), not both"
            )
        if diffusion is None:
            from gesturediffusion_tpu.diffusion.schedules import (
                respacing_string,
            )

            # logsnr spacing concentrates the respaced steps where the
            # ODE moves fastest — measurably tighter low-step sampling
            # for every solver (tests/test_diffusion.py)
            diffusion = create_diffusion(
                steps=diffusion_steps,
                noise_schedule=noise_schedule,
                model_mean_type=ModelMeanType.START_X,
                timestep_respacing=respacing_string(
                    sample_steps, sampler, step_spacing
                ),
            )
        self._diffusion = diffusion

        from gesturediffusion_tpu.models.mdm_fastpath import (
            select_sampling_model_fn,
        )

        cond_precompute, model_fn = select_sampling_model_fn(
            model, params, guidance_param, cond_mask_prob, no_fast=no_fast
        )
        loops = {
            "ddpm": sampling.p_sample_loop,
            "ddim": sampling.ddim_sample_loop,
            "plms": sampling.plms_sample_loop,
            "dpmpp": sampling.dpmpp_sample_loop,
        }
        if sampler not in loops:
            raise ValueError(f"unknown sampler {sampler!r}")
        loop = loops[sampler]

        self._streams = streams
        self._chunk_frames = chunk_frames
        self._seed_poses = seed_poses
        self._fps = fps
        self._njoints = model.njoints
        self._nfeats = getattr(model, "nfeats", 1)
        self._shape = (streams, model.njoints, self._nfeats, chunk_frames)
        self._scale = (
            jnp.full((streams,), guidance_param, jnp.float32)
            if guidance_param != 1 else None
        )

        def chunk_program(rng, k, cond, seed):
            # the per-chunk math is sampling.ar_chunk_step — the SAME
            # function the batch path's scan body calls, so the
            # streaming and batch paths cannot diverge
            return sampling.ar_chunk_step(
                self._diffusion, model_fn, self._shape, rng, k, cond,
                seed, seed_poses, loop=loop, clip_denoised=clip_denoised,
                cond_precompute=cond_precompute,
            )

        self._chunk_program: Callable = jax.jit(chunk_program)
        # multi-chip serving: shard the streams axis over the mesh's
        # 'data' axis — GSPMD shards the whole denoise loop (same scheme
        # as sample/generate.py's data-parallel sampling)
        self._batch_sh = None
        if mesh is not None:
            from gesturediffusion_tpu.parallel import mesh as mesh_lib

            dp = mesh.shape["data"]
            if streams % dp != 0:
                raise ValueError(
                    f"streams={streams} is not divisible by the mesh's "
                    f"data axis ({dp})"
                )
            self._batch_sh = mesh_lib.batch_sharding(mesh)
        self._seed: Optional[jax.Array] = None
        self._rng: Optional[jax.Array] = None
        self._k = 0
        self._stats = StreamStats(
            motion_seconds_per_chunk=chunk_frames / fps
        )

    # ------------------------------------------------------------------ #

    def start(
        self, init_seed: np.ndarray, rng: jax.Array | int = 0
    ) -> None:
        """Begin a take: set the first chunk's seed poses and the RNG.

        ``init_seed`` is [streams, J, F, seed_poses] (the dataset GT seed,
        z-normalized — reference seeds chunk 0 from GT, generate.py:104).
        """
        init_seed = jnp.asarray(init_seed, jnp.float32)
        want = (
            self._streams, self._njoints, self._nfeats, self._seed_poses
        )
        if init_seed.shape != want:
            raise ValueError(
                f"init_seed shape {init_seed.shape} != {want} "
                "(streams, njoints, nfeats, seed_poses)"
            )
        if self._batch_sh is not None:
            init_seed = jax.device_put(init_seed, self._batch_sh)
        self._seed = init_seed
        self._rng = (
            jax.random.PRNGKey(rng) if isinstance(rng, int) else rng
        )
        self._k = 0
        self._stats = StreamStats(
            motion_seconds_per_chunk=self._chunk_frames / self._fps
        )

    def feed(self, cond: dict) -> np.ndarray:
        """Denoise one chunk from per-window conditioning.

        ``cond`` holds the per-window arrays with a leading streams axis
        (e.g. ``{"mfcc": [B, 26, 1, T]}``); ``seed`` and ``scale`` are
        managed by the session.  Returns the motion chunk [B, J, 1, T]
        (z-normalized model space; ``dataset.inv_transform`` recovers
        poses) after a full device->host readback, so the measured
        latency covers everything a caller would wait for.
        """
        if self._seed is None:
            raise RuntimeError("call start() before feed()")
        t0 = time.perf_counter()
        if self._batch_sh is not None:
            dc = {
                k: jax.device_put(np.asarray(v), self._batch_sh)
                for k, v in cond.items()
            }
        else:
            dc = {k: jnp.asarray(v) for k, v in cond.items()}
        if self._scale is not None and "scale" not in dc:
            dc["scale"] = self._scale
        out, self._seed = self._chunk_program(
            self._rng, jnp.asarray(self._k, jnp.int32), dc, self._seed
        )
        out_np = np.asarray(out)  # forced full readback (see bench.py
        #                           "measurement gotcha": block_until_ready
        #                           alone is not a sync through the tunnel)
        dt = time.perf_counter() - t0
        self._k += 1
        s = self._stats
        s.chunks += 1
        s.total_latency_s += dt
        s.last_latency_s = dt
        s.worst_latency_s = max(s.worst_latency_s, dt)
        return out_np

    def feed_audio(
        self,
        audio: np.ndarray,
        *,
        samplerate: float = 22050,
        mfcc_mean: Optional[np.ndarray] = None,
        mfcc_std: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Denoise one chunk straight from a raw mono audio window.

        Runs the dataset front end host-side: frame-aligned MFCCs
        (ops/mfcc.py, the reference's python_speech_features settings)
        z-normalized with the training stats (data/genea.py:226), padded
        or truncated to the chunk length.  ``audio`` is [L] (broadcast to
        every stream) or [streams, L].
        """
        from gesturediffusion_tpu.ops.mfcc import mfcc_for_window

        if (mfcc_mean is None) != (mfcc_std is None):
            raise ValueError("pass mfcc_mean and mfcc_std together")
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 1:
            audio = np.broadcast_to(audio, (self._streams,) + audio.shape)
        if audio.ndim != 2 or audio.shape[0] != self._streams:
            raise ValueError(
                f"audio must be [L] or [streams, L]; got {audio.shape}"
            )
        t = self._chunk_frames
        rows = []
        for wav in audio:
            feats = mfcc_for_window(
                wav, fps=self._fps, samplerate=samplerate
            ).astype(np.float32)
            if mfcc_mean is not None:
                feats = (feats - mfcc_mean) / mfcc_std
            rows.append(feats[:t])
        c = rows[0].shape[1]
        mf = np.zeros((self._streams, c, 1, t), np.float32)
        for i, feats in enumerate(rows):
            mf[i, :, 0, : feats.shape[0]] = feats.T
        return self.feed({"mfcc": mf})

    def reset_stats(self) -> None:
        """Zero the latency accounting without touching the take state.

        Call after a warm-up ``feed()`` so the jit-compile latency of the
        first chunk doesn't pollute steady-state serving numbers."""
        self._stats = StreamStats(
            motion_seconds_per_chunk=self._chunk_frames / self._fps
        )

    def stats(self) -> StreamStats:
        return dataclasses.replace(self._stats)
