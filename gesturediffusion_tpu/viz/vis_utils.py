"""results.npy -> SMPL mesh OBJ export.

Functional parity surface with the reference mesh pipeline
(reference: visualize/vis_utils.py:8-66 npy2obj — SMPLify fit for xyz
inputs :26-29, rot2xyz to vertices :35-39, OBJ export :46-54,
smpl_params.npy :56-66; visualize/render_mesh.py CLI).  trimesh is
replaced by a direct OBJ writer.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.models.rotation2xyz import rotation2xyz
from gesturediffusion_tpu.models.smpl import SMPLModel
from gesturediffusion_tpu.ops import rotations as R


def write_obj(path: str, vertices: np.ndarray, faces: Optional[np.ndarray]):
    """Minimal OBJ writer (1-based face indices)."""
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        if faces is not None:
            for face in faces:
                f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


class Npy2Obj:
    """Load a results.npy, fit/convert to SMPL, export per-frame OBJs."""

    def __init__(
        self,
        npy_path: str,
        sample_idx: int,
        rep_idx: int,
        smpl: SMPLModel,
        faces: Optional[np.ndarray] = None,
        num_smplify_iters: int = 150,
    ):
        self.smpl = smpl
        self.faces = faces
        data = np.load(npy_path, allow_pickle=True).item()
        motions = data["motion"]
        num_samples = data.get("num_samples", motions.shape[0])
        self.absl_idx = rep_idx * num_samples + sample_idx
        motion = motions[self.absl_idx]  # [J, 3/6, T]
        self.nframes = motion.shape[-1]

        if motion.shape[1] == 3:  # xyz input -> SMPLify fit
            from gesturediffusion_tpu.viz.joints2smpl import joints2smpl

            fit = joints2smpl(
                smpl, motion.transpose(2, 0, 1),
                num_smplify_iters=num_smplify_iters,
            )
            self.thetas = fit["thetas"]  # [T, 24, 3]
            self.root_translation = fit["root_translation"]
            mats = R.axis_angle_to_matrix(jnp.asarray(self.thetas))
        else:  # rot6d input: feed rotation2xyz-style vec
            rot6d = jnp.asarray(motion[:24].transpose(2, 0, 1))
            mats = R.rotation_6d_to_matrix(rot6d)
            self.thetas = np.asarray(R.matrix_to_axis_angle(mats))
            self.root_translation = motion[24, :3].T

        verts, _ = smpl.lbs(
            jnp.zeros((self.nframes, smpl.num_betas)),
            mats,
            jnp.asarray(self.root_translation, jnp.float32),
        )
        self.vertices = np.asarray(verts)  # [T, V, 3]

    def save_obj(self, save_path: str, frame_i: int) -> str:
        write_obj(save_path, self.vertices[frame_i], self.faces)
        return save_path

    def save_npy(self, save_path: str) -> None:
        np.save(
            save_path,
            {
                "motion": self.thetas.transpose(1, 2, 0)[None],
                "thetas": self.thetas,
                "root_translation": self.root_translation,
                "faces": self.faces,
                "vertices": self.vertices,
                "num_frames": self.nframes,
            },
        )


def main(argv=None):
    """CLI mirroring visualize/render_mesh.py."""
    import argparse

    from gesturediffusion_tpu.models.smpl import (
        load_smpl_pickle,
        make_synthetic_smpl,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--input_path", required=True,
                        help="stick figure results.npy path")
    parser.add_argument("--sample_idx", type=int, default=0)
    parser.add_argument("--rep_idx", type=int, default=0)
    parser.add_argument("--smpl_model", default=os.environ.get(
        "SMPL_MODEL_PATH", "body_models/smpl/SMPL_NEUTRAL.pkl"))
    args = parser.parse_args(argv)

    smpl = (
        load_smpl_pickle(args.smpl_model)
        if os.path.isfile(args.smpl_model)
        else make_synthetic_smpl()
    )
    out_dir = args.input_path.replace(".npy", "_obj")
    os.makedirs(out_dir, exist_ok=True)
    converter = Npy2Obj(args.input_path, args.sample_idx, args.rep_idx, smpl)
    for i in range(converter.nframes):
        converter.save_obj(
            os.path.join(out_dir, f"frame{i:03d}.obj"), i
        )
    converter.save_npy(os.path.join(out_dir, "smpl_params.npy"))
    print(f"saved {converter.nframes} OBJs to {out_dir}")


if __name__ == "__main__":
    main()
