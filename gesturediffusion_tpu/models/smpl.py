"""SMPL body model: linear blend skinning in JAX.

Functional parity surface with the reference SMPL wrapper
(reference: model/smpl.py:64-97 — smplx.SMPLLayer forward + extra joint
regressor + vibe/a2m/smpl/a2mpl joint-set maps; JOINT_MAP/JOINT_NAMES
tables :22-60).  The smplx dependency is replaced by a native LBS
implementation (shape blendshapes -> pose blendshapes -> kinematic-chain
rigid transforms -> skinning), jit/vmap-friendly with the 24-joint chain
unrolled at trace time.

Weights: `load_smpl_pickle` converts the official SMPL pkl (which contains
chumpy arrays) without chumpy installed, via a stub unpickler.
`make_synthetic_smpl` builds a random small model for hermetic tests.
"""

from __future__ import annotations

import io
import pickle
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

# SMPL kinematic tree (24 joints), parent of joint i:
SMPL_PARENTS = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
    18, 19, 20, 21,
)

# Extra surface-vertex "joints" appended by smplx's VertexJointSelector
# (public constants from smplx/vertex_ids.py, 'smplh' mapping) — these give
# joints 24..44 of the 45-joint output the reference indexes into.
SMPL_VERTEX_JOINT_IDS = {
    "nose": 332, "reye": 6260, "leye": 2800, "rear": 4071, "lear": 583,
    "rthumb": 6191, "rindex": 5782, "rmiddle": 5905, "rring": 6016,
    "rpinky": 6133, "lthumb": 2746, "lindex": 2319, "lmiddle": 2445,
    "lring": 2556, "lpinky": 2673, "LBigToe": 3216, "LSmallToe": 3226,
    "LHeel": 3387, "RBigToe": 6617, "RSmallToe": 6624, "RHeel": 6787,
}
# order used by smplx.VertexJointSelector (face, then feet, then hands)
SMPL_VERTEX_JOINT_ORDER = (
    "nose", "reye", "leye", "rear", "lear",
    "LBigToe", "LSmallToe", "LHeel", "RBigToe", "RSmallToe", "RHeel",
    "lthumb", "lindex", "lmiddle", "lring", "lpinky",
    "rthumb", "rindex", "rmiddle", "rring", "rpinky",
)

# joint-set index maps (reference: model/smpl.py:11-84)
ACTION2MOTION_JOINTS = (8, 1, 2, 3, 4, 5, 6, 7, 0, 9, 10, 11, 12, 13, 14,
                        21, 24, 38)

JOINT_MAP = {
    "OP Nose": 24, "OP Neck": 12, "OP RShoulder": 17, "OP RElbow": 19,
    "OP RWrist": 21, "OP LShoulder": 16, "OP LElbow": 18, "OP LWrist": 20,
    "OP MidHip": 0, "OP RHip": 2, "OP RKnee": 5, "OP RAnkle": 8,
    "OP LHip": 1, "OP LKnee": 4, "OP LAnkle": 7, "OP REye": 25,
    "OP LEye": 26, "OP REar": 27, "OP LEar": 28, "OP LBigToe": 29,
    "OP LSmallToe": 30, "OP LHeel": 31, "OP RBigToe": 32,
    "OP RSmallToe": 33, "OP RHeel": 34, "Right Ankle": 8, "Right Knee": 5,
    "Right Hip": 45, "Left Hip": 46, "Left Knee": 4, "Left Ankle": 7,
    "Right Wrist": 21, "Right Elbow": 19, "Right Shoulder": 17,
    "Left Shoulder": 16, "Left Elbow": 18, "Left Wrist": 20,
    "Neck (LSP)": 47, "Top of Head (LSP)": 48, "Pelvis (MPII)": 49,
    "Thorax (MPII)": 50, "Spine (H36M)": 51, "Jaw (H36M)": 52,
    "Head (H36M)": 53, "Nose": 24, "Left Eye": 26, "Right Eye": 25,
    "Left Ear": 28, "Right Ear": 27,
}

JOINT_NAMES = [
    "OP Nose", "OP Neck", "OP RShoulder", "OP RElbow", "OP RWrist",
    "OP LShoulder", "OP LElbow", "OP LWrist", "OP MidHip", "OP RHip",
    "OP RKnee", "OP RAnkle", "OP LHip", "OP LKnee", "OP LAnkle",
    "OP REye", "OP LEye", "OP REar", "OP LEar", "OP LBigToe",
    "OP LSmallToe", "OP LHeel", "OP RBigToe", "OP RSmallToe", "OP RHeel",
    "Right Ankle", "Right Knee", "Right Hip", "Left Hip", "Left Knee",
    "Left Ankle", "Right Wrist", "Right Elbow", "Right Shoulder",
    "Left Shoulder", "Left Elbow", "Left Wrist", "Neck (LSP)",
    "Top of Head (LSP)", "Pelvis (MPII)", "Thorax (MPII)",
    "Spine (H36M)", "Jaw (H36M)", "Head (H36M)", "Nose", "Left Eye",
    "Right Eye", "Left Ear", "Right Ear",
]

JOINTSTYPE_ROOT = {"a2m": 0, "smpl": 0, "a2mpl": 0, "vibe": 8}


@flax.struct.dataclass
class SMPLModel:
    """SMPL parameters as device arrays + static topology."""

    v_template: jax.Array  # [V, 3]
    shapedirs: jax.Array  # [V, 3, n_betas]
    posedirs: jax.Array  # [(J-1)*9, V*3]
    j_regressor: jax.Array  # [J, V]
    lbs_weights: jax.Array  # [V, J]
    j_regressor_extra: Optional[jax.Array] = None  # [9, V]
    parents: tuple = flax.struct.field(
        pytree_node=False, default=SMPL_PARENTS
    )
    vertex_joint_ids: tuple = flax.struct.field(
        pytree_node=False,
        default=tuple(
            SMPL_VERTEX_JOINT_IDS[n] for n in SMPL_VERTEX_JOINT_ORDER
        ),
    )

    @property
    def num_joints(self) -> int:
        return len(self.parents)

    @property
    def num_betas(self) -> int:
        return int(self.shapedirs.shape[-1])

    # ------------------------------------------------------------------ #
    def lbs(
        self,
        betas: jax.Array,  # [B, n_betas]
        pose_mats: jax.Array,  # [B, J, 3, 3] incl. global orient at 0
        transl: Optional[jax.Array] = None,  # [B, 3]
    ) -> tuple[jax.Array, jax.Array]:
        """Linear blend skinning -> (vertices [B,V,3], joints [B,J,3])."""
        b = betas.shape[0]
        nj = self.num_joints

        v_shaped = self.v_template + jnp.einsum(
            "bl,vdl->bvd", betas, self.shapedirs
        )
        joints_rest = jnp.einsum("jv,bvd->bjd", self.j_regressor, v_shaped)

        eye = jnp.eye(3, dtype=pose_mats.dtype)
        pose_feature = (pose_mats[:, 1:] - eye).reshape(b, -1)
        pose_offsets = (pose_feature @ self.posedirs).reshape(b, -1, 3)
        v_posed = v_shaped + pose_offsets

        # rigid transforms down the (static) kinematic tree, unrolled
        def make_tf(rot, t):
            # [B, 3, 3], [B, 3] -> [B, 4, 4]
            top = jnp.concatenate([rot, t[..., None]], axis=-1)
            bottom = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 0.0, 1.0], rot.dtype), (b, 1, 4)
            )
            return jnp.concatenate([top, bottom], axis=-2)

        transforms = [make_tf(pose_mats[:, 0], joints_rest[:, 0])]
        for j in range(1, nj):
            p = self.parents[j]
            local = make_tf(
                pose_mats[:, j], joints_rest[:, j] - joints_rest[:, p]
            )
            transforms.append(
                jnp.matmul(
                    transforms[p], local,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
        G = jnp.stack(transforms, axis=1)  # [B, J, 4, 4]
        joints_posed = G[..., :3, 3]

        # remove the rest-pose transform contribution
        rest = jnp.einsum("bjmn,bjn->bjm", G[..., :3, :3], joints_rest)
        A = G.at[..., :3, 3].add(-rest)

        T = jnp.einsum("vj,bjmn->bvmn", self.lbs_weights, A)
        verts = (
            jnp.einsum("bvmn,bvn->bvm", T[..., :3, :3], v_posed)
            + T[..., :3, 3]
        )
        if transl is not None:
            verts = verts + transl[:, None]
            joints_posed = joints_posed + transl[:, None]
        return verts, joints_posed

    def __call__(
        self,
        body_pose: jax.Array,  # [B, J-1, 3, 3]
        global_orient: jax.Array,  # [B, 3, 3]
        betas: Optional[jax.Array] = None,
        transl: Optional[jax.Array] = None,
    ) -> dict:
        """Reference-contract forward: dict of vertices + joint sets."""
        b = body_pose.shape[0]
        if betas is None:
            betas = jnp.zeros((b, self.num_betas), body_pose.dtype)
        pose_mats = jnp.concatenate([global_orient[:, None], body_pose], 1)
        verts, joints = self.lbs(betas, pose_mats, transl)

        # 45-joint smplx-style output: 24 skeleton + 21 surface vertices
        vertex_joints = verts[:, list(self.vertex_joint_ids)]
        all_joints = jnp.concatenate([joints, vertex_joints], axis=1)
        if self.j_regressor_extra is not None:
            extra = jnp.einsum("jv,bvd->bjd", self.j_regressor_extra, verts)
            all_joints = jnp.concatenate([all_joints, extra], axis=1)

        out = {"vertices": verts, "smpl": joints}
        n_all = all_joints.shape[1]
        # a2m/vibe indices go through JOINT_MAP (reference: smpl.py:76-84);
        # ACTION2MOTION_JOINTS are positions in JOINT_NAMES, never direct
        # joint ids — when the extra regressor is absent and an index is
        # out of range, omit the set rather than return scrambled joints
        vibe_idx = np.asarray([JOINT_MAP[n] for n in JOINT_NAMES])
        a2m_idx = vibe_idx[list(ACTION2MOTION_JOINTS)]
        if n_all > int(vibe_idx.max()):
            out["vibe"] = all_joints[:, vibe_idx]
        if n_all > int(a2m_idx.max()):
            out["a2m"] = all_joints[:, a2m_idx]
            out["a2mpl"] = all_joints[
                :, np.unique(np.r_[np.arange(24), a2m_idx])
            ]
        return out


# ---------------------------------------------------------------------- #
# weight loading / synthesis
# ---------------------------------------------------------------------- #
class _ChumpyStub:
    """Absorbs pickled chumpy arrays; numpy payload lives in its state."""

    def __setstate__(self, state):
        self.__dict__.update(state)

    def to_numpy(self):
        for key in ("x", "v", "r", "a"):
            if key in self.__dict__:
                val = self.__dict__[key]
                if isinstance(val, _ChumpyStub):
                    return val.to_numpy()
                return np.asarray(val)
        raise ValueError("cannot extract array from chumpy stub")


class _SMPLUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyStub
        return super().find_class(module, name)


def _to_np(x):
    if isinstance(x, _ChumpyStub):
        return x.to_numpy()
    if hasattr(x, "toarray"):  # scipy sparse
        return np.asarray(x.toarray())
    return np.asarray(x)


def load_smpl_pickle(path: str, dtype=jnp.float32) -> SMPLModel:
    """Official SMPL pkl -> SMPLModel (chumpy-free)."""
    with open(path, "rb") as f:
        data = _SMPLUnpickler(f, encoding="latin1").load()
    shapedirs = _to_np(data["shapedirs"])[..., :10]
    posedirs = _to_np(data["posedirs"])
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # [(J-1)*9, V*3]
    v_template = _to_np(data["v_template"])
    n_verts = v_template.shape[0]

    # surface-joint vertex ids: official pkls don't carry them (the real
    # SMPL mesh uses the constant table); synthetic stand-ins persist
    # theirs.  For a small mesh the constant ids would be out of range —
    # JAX clamps gathers SILENTLY, so remap deterministically instead.
    if "vertex_joint_ids" in data:
        vertex_ids = tuple(int(i) for i in data["vertex_joint_ids"])
    else:
        vertex_ids = tuple(
            SMPL_VERTEX_JOINT_IDS[n] for n in SMPL_VERTEX_JOINT_ORDER
        )
        if n_verts <= max(vertex_ids):
            vertex_ids = tuple(i % n_verts for i in vertex_ids)
    extra = (
        jnp.asarray(_to_np(data["J_regressor_extra"]), dtype)
        if "J_regressor_extra" in data
        else None
    )
    return SMPLModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        j_regressor=jnp.asarray(_to_np(data["J_regressor"]), dtype),
        lbs_weights=jnp.asarray(_to_np(data["weights"]), dtype),
        j_regressor_extra=extra,
        parents=_parents_from_kintree(data) if "kintree_table" in data
        else SMPL_PARENTS,
        vertex_joint_ids=vertex_ids,
    )


def _parents_from_kintree(data) -> tuple:
    # root parent is stored as uint32(-1) in the official pkl
    parents = _to_np(data["kintree_table"])[0].astype(np.int64)
    parents[0] = -1
    return tuple(int(p) for p in parents)


def save_synthetic_smpl_pickle(
    path: str, n_vertices: int = 96, seed: int = 0
) -> str:
    """Write a random small SMPL model in the OFFICIAL pkl layout
    (v_template / shapedirs [V,3,B] / posedirs [V,3,(J-1)*9] /
    J_regressor / weights / kintree_table) so `load_smpl_pickle` and the
    CLIs can be exercised hermetically without the real asset."""
    import pickle

    m = make_synthetic_smpl(n_vertices=n_vertices, seed=seed)
    nj = 24
    posedirs = np.asarray(m.posedirs).T.reshape(n_vertices, 3, (nj - 1) * 9)
    kintree = np.zeros((2, nj), np.uint32)
    kintree[0] = np.asarray(
        [np.uint32(p) if p >= 0 else np.uint32(2**32 - 1)
         for p in m.parents], np.uint32
    )
    kintree[1] = np.arange(nj, dtype=np.uint32)
    data = {
        "v_template": np.asarray(m.v_template),
        "shapedirs": np.asarray(m.shapedirs),
        "posedirs": posedirs,
        "J_regressor": np.asarray(m.j_regressor),
        "weights": np.asarray(m.lbs_weights),
        "kintree_table": kintree,
        # non-official extras so the round trip preserves the synthetic
        # model's surface joints + vibe regressor (the real pkl omits
        # them; the loader falls back to the constant tables)
        "vertex_joint_ids": np.asarray(m.vertex_joint_ids, np.int64),
        "J_regressor_extra": np.asarray(m.j_regressor_extra),
    }
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


def make_synthetic_smpl(
    n_vertices: int = 128, n_betas: int = 10, seed: int = 0
) -> SMPLModel:
    """Random small SMPL-like model (24 joints) for hermetic tests."""
    rs = np.random.RandomState(seed)
    nj = 24
    v_template = rs.randn(n_vertices, 3).astype(np.float32) * 0.3
    # j_regressor: each joint regresses from a few nearby vertices
    j_reg = np.zeros((nj, n_vertices), np.float32)
    for j in range(nj):
        ids = rs.choice(n_vertices, 4, replace=False)
        j_reg[j, ids] = 0.25
    lbs_w = rs.rand(n_vertices, nj).astype(np.float32) ** 4
    lbs_w = lbs_w / lbs_w.sum(-1, keepdims=True)
    vertex_ids = tuple(
        int(i) for i in rs.choice(n_vertices, 21, replace=False)
    )
    # 9-joint extra regressor so the vibe/a2m joint sets are exercised
    extra_reg = np.zeros((9, n_vertices), np.float32)
    for j in range(9):
        ids = rs.choice(n_vertices, 4, replace=False)
        extra_reg[j, ids] = 0.25
    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(
            rs.randn(n_vertices, 3, n_betas).astype(np.float32) * 0.01
        ),
        posedirs=jnp.asarray(
            rs.randn((nj - 1) * 9, n_vertices * 3).astype(np.float32) * 0.001
        ),
        j_regressor=jnp.asarray(j_reg),
        lbs_weights=jnp.asarray(lbs_w),
        j_regressor_extra=jnp.asarray(extra_reg),
        parents=SMPL_PARENTS,
        vertex_joint_ids=vertex_ids,
    )
