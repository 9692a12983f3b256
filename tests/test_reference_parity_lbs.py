"""LBS-core parity against the reference's standalone torch LBS.

sings/rec/utils/body_model/smpl.py:274-520 carries its own copies of the
smplx primitives (blend_shapes, vertices2joints, batch_rodrigues,
batch_rigid_transform, full lbs) with no external deps, so the actual
reference math runs here on CPU torch against our JAX kinematics on a
synthetic body model (no licensed SMPL assets needed).
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "sings")),
                                reason="reference repo not present")

torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)

import jax.numpy as jnp  # noqa: E402

from sings_tpu.kinematics import lbs as ours  # noqa: E402


def _synthetic_model(V=50, J=6, NB=4, B=2, seed=0):
    rng = np.random.RandomState(seed)
    parents = np.array([-1, 0, 1, 1, 0, 4], np.int64)
    v_template = rng.normal(0, 0.4, (V, 3)).astype(np.float32)
    shapedirs = rng.normal(0, 0.02, (V, 3, NB)).astype(np.float32)
    posedirs = rng.normal(0, 0.01, ((J - 1) * 9, V * 3)).astype(np.float32)
    j_regressor = rng.rand(J, V).astype(np.float32)
    j_regressor /= j_regressor.sum(1, keepdims=True)
    lbs_weights = rng.rand(V, J).astype(np.float32)
    lbs_weights /= lbs_weights.sum(1, keepdims=True)
    betas = rng.normal(0, 1, (B, NB)).astype(np.float32)
    pose = rng.normal(0, 0.4, (B, J * 3)).astype(np.float32)
    return (parents, v_template, shapedirs, posedirs, j_regressor,
            lbs_weights, betas, pose)


def test_lbs_full_matches_reference():
    from sings.rec.utils.body_model.smpl import lbs as ref_lbs

    (parents, v_template, shapedirs, posedirs, j_regressor, lbs_weights,
     betas, pose) = _synthetic_model()
    B = betas.shape[0]

    rv, rj = ref_lbs(
        torch.from_numpy(betas), torch.from_numpy(pose),
        torch.from_numpy(np.tile(v_template[None], (B, 1, 1))),
        torch.from_numpy(shapedirs), torch.from_numpy(posedirs),
        torch.from_numpy(j_regressor), torch.from_numpy(parents),
        torch.from_numpy(lbs_weights), pose2rot=True)

    # the reference's standalone lbs computes pose blend offsets then
    # DISCARDS them (v_posed = v_shaped, smpl.py:343) — so compare with
    # posedirs disabled; the posedirs-applied path is covered by the
    # smplx-semantics golden tests in test_kinematics.py
    out = ours.lbs(jnp.asarray(betas), jnp.asarray(pose),
                   jnp.asarray(v_template), jnp.asarray(shapedirs),
                   jnp.asarray(posedirs), jnp.asarray(j_regressor),
                   parents, jnp.asarray(lbs_weights),
                   disable_posedirs=True)
    np.testing.assert_allclose(np.asarray(out.verts), rv.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.joints), rj.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_lbs_pose2rot_false_matches_reference():
    from sings.rec.utils.body_model.smpl import batch_rodrigues, lbs as ref_lbs

    (parents, v_template, shapedirs, posedirs, j_regressor, lbs_weights,
     betas, pose) = _synthetic_model(seed=4)
    B, J = betas.shape[0], parents.shape[0]
    rot_mats = batch_rodrigues(
        torch.from_numpy(pose.reshape(-1, 3))).reshape(B, J, 3, 3)

    rv, rj = ref_lbs(
        torch.from_numpy(betas), rot_mats,
        torch.from_numpy(np.tile(v_template[None], (B, 1, 1))),
        torch.from_numpy(shapedirs), torch.from_numpy(posedirs),
        torch.from_numpy(j_regressor), torch.from_numpy(parents),
        torch.from_numpy(lbs_weights), pose2rot=False)

    out = ours.lbs(jnp.asarray(betas), jnp.asarray(rot_mats.numpy()),
                   jnp.asarray(v_template), jnp.asarray(shapedirs),
                   jnp.asarray(posedirs), jnp.asarray(j_regressor),
                   parents, jnp.asarray(lbs_weights), pose2rot=False,
                   disable_posedirs=True)
    np.testing.assert_allclose(np.asarray(out.verts), rv.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.joints), rj.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_rigid_transform_chain_matches_reference():
    from sings.rec.utils.body_model.smpl import (
        batch_rigid_transform as ref_brt, batch_rodrigues as ref_rod,
    )

    (parents, _, _, _, _, _, _, pose) = _synthetic_model(seed=9)
    B, J = pose.shape[0], parents.shape[0]
    joints = np.random.RandomState(2).normal(0, 0.3, (B, J, 3)).astype(
        np.float32)
    rm = ref_rod(torch.from_numpy(pose.reshape(-1, 3))).reshape(B, J, 3, 3)

    rj, ra = ref_brt(rm, torch.from_numpy(joints),
                     torch.from_numpy(parents))
    oj, oa = ours.batch_rigid_transform(jnp.asarray(rm.numpy()),
                                        jnp.asarray(joints), parents)
    np.testing.assert_allclose(np.asarray(oj), rj.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(oa), ra.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_lbs_extra_deformation_matches_reference_composition():
    """lbs_extra(A, pts, W) == apply W-blended A to homogeneous points;
    verified against the reference lbs' T when return_T is available,
    else against an explicit torch einsum composition."""
    from sings.rec.utils.body_model.smpl import (
        batch_rigid_transform as ref_brt, batch_rodrigues as ref_rod,
    )

    (parents, v_template, _, _, j_regressor, lbs_weights, _,
     pose) = _synthetic_model(seed=13)
    B, J = pose.shape[0], parents.shape[0]
    v = torch.from_numpy(np.tile(v_template[None], (B, 1, 1)))
    joints = torch.from_numpy(
        np.einsum("jv,bvc->bjc", j_regressor,
                  np.tile(v_template[None], (B, 1, 1))).astype(np.float32))
    rm = ref_rod(torch.from_numpy(pose.reshape(-1, 3))).reshape(B, J, 3, 3)
    _, A = ref_brt(rm, joints, torch.from_numpy(parents))

    W = torch.from_numpy(lbs_weights)
    T = torch.einsum("vj,bjrc->bvrc", W, A)
    hom = torch.cat([v, torch.ones(B, v.shape[1], 1)], dim=2)
    ref_verts = torch.einsum("bvrc,bvc->bvr", T, hom)[:, :, :3]

    ov, oT = ours.lbs_extra(jnp.asarray(A.numpy()), jnp.asarray(v.numpy()),
                            jnp.asarray(lbs_weights))
    np.testing.assert_allclose(np.asarray(ov), ref_verts.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(oT), T.numpy(), rtol=1e-4,
                               atol=1e-5)
