"""SMPL refinement: recover a perturbed pose from silhouettes."""
import jax.numpy as jnp
import numpy as np

from sings_tpu.kinematics.body_model import synthetic_template
from sings_tpu.kinematics.template import DeviceTemplate, smpl_forward
from sings_tpu.ops.graphics import make_camera
from sings_tpu.preprocess.refine import (
    RefineConfig, _silhouette, coco17_to_smpl, refine_smpl,
)


def test_keypoint_mappings():
    kp, valid = coco17_to_smpl(np.random.rand(17, 2).astype(np.float32))
    assert kp.shape == (24, 2)
    assert valid.sum() == 12


def test_refine_recovers_translation():
    tpl = synthetic_template(num_betas=4, n_seg=4, n_ring=6)
    dt = DeviceTemplate.from_host(tpl)
    hw = 64
    K = np.array([[80.0, 0, hw / 2], [0, 80.0, hw / 2], [0, 0, 1]],
                 np.float32)
    cam = make_camera(np.eye(4, dtype=np.float32), hw, hw, K=K)
    kw = dict(tile=16, chunk=8, max_span=8, interpret=True)

    true = {
        "betas": np.zeros(4, np.float32),
        "global_orient": np.zeros((2, 3), np.float32),
        "body_pose": np.zeros((2, 69), np.float32),
        "transl": np.tile(np.array([[0.0, 0.25, 3.0]], np.float32), (2, 1)),
    }
    cfg = RefineConfig(steps=60, lr=0.02, render_downscale=1,
                       splat_scale=0.03, w_keypoints=0.0, w_prior=0.01)

    # ground-truth masks from the true pose
    out = smpl_forward(dt, jnp.zeros((1, 4)), jnp.zeros((1, 69)))
    masks = []
    for i in range(2):
        verts = out.verts[0] + jnp.asarray(true["transl"][i])[None]
        masks.append(np.asarray(
            _silhouette(verts, cam, cfg, kw) > 0.3, np.float32))
    masks = np.stack(masks)
    assert masks.sum() > 50  # the body is actually visible

    init = {k: v.copy() for k, v in true.items()}
    init["transl"] = true["transl"] + np.array([[0.12, -0.08, 0.0]],
                                               np.float32)
    res = refine_smpl(dt, cam, K, init, masks, cfg=cfg, raster_kw=kw)

    err0 = np.abs(init["transl"] - true["transl"]).max()
    err1 = np.abs(res["transl"] - true["transl"]).max()
    assert res["losses"][-1] < res["losses"][0]
    assert err1 < err0, (err0, err1)


def test_refine_retries_on_device_fault(monkeypatch):
    """An injected UNAVAILABLE fault mid-fit is retried with a halved
    scan_chunk and the fit still completes all steps (VERDICT r3 weak
    #3: the r3b run needed three manual launches)."""
    from sings_tpu.preprocess import refine as refine_mod

    tpl = synthetic_template(num_betas=4, n_seg=4, n_ring=6)
    dt = DeviceTemplate.from_host(tpl)
    hw = 32
    K = np.array([[40.0, 0, hw / 2], [0, 40.0, hw / 2], [0, 0, 1]],
                 np.float32)
    cam = make_camera(np.eye(4, dtype=np.float32), hw, hw, K=K)
    kw = dict(tile=16, chunk=8, max_span=4, interpret=True)
    init = {
        "betas": np.zeros(4, np.float32),
        "global_orient": np.zeros((1, 3), np.float32),
        "body_pose": np.zeros((1, 69), np.float32),
        "transl": np.array([[0.0, 0.25, 3.0]], np.float32),
    }
    masks = np.ones((1, hw, hw), np.float32)

    calls = []

    def fault_once(done):
        calls.append(done)
        if len(calls) == 2:  # fault on the SECOND chunk dispatch
            raise RuntimeError("UNAVAILABLE: TPU worker process crashed")

    monkeypatch.setattr(refine_mod, "_fault_hook", fault_once)
    cfg = RefineConfig(steps=8, lr=0.01, render_downscale=1,
                       splat_scale=0.03, w_keypoints=0.0,
                       scan_chunk=4)
    res = refine_smpl(dt, cam, K, init, masks, cfg=cfg, raster_kw=kw)
    # all 8 steps ran despite the fault; the faulted chunk was resumed
    # from the host snapshot at step 4 with scan_chunk halved to 2
    assert len(res["losses"]) == 8
    assert np.all(np.isfinite(res["losses"]))
    assert calls == [0, 4, 4, 6]


def test_refine_nonfault_errors_propagate(monkeypatch):
    """Programming errors must NOT be swallowed by the retry loop."""
    import pytest

    from sings_tpu.preprocess import refine as refine_mod

    tpl = synthetic_template(num_betas=4, n_seg=4, n_ring=6)
    dt = DeviceTemplate.from_host(tpl)
    hw = 32
    K = np.array([[40.0, 0, hw / 2], [0, 40.0, hw / 2], [0, 0, 1]],
                 np.float32)
    cam = make_camera(np.eye(4, dtype=np.float32), hw, hw, K=K)
    kw = dict(tile=16, chunk=8, max_span=4, interpret=True)
    init = {
        "betas": np.zeros(4, np.float32),
        "global_orient": np.zeros((1, 3), np.float32),
        "body_pose": np.zeros((1, 69), np.float32),
        "transl": np.array([[0.0, 0.25, 3.0]], np.float32),
    }
    masks = np.ones((1, hw, hw), np.float32)

    def always_typeerror(done):
        raise TypeError("not a device fault")

    monkeypatch.setattr(refine_mod, "_fault_hook", always_typeerror)
    cfg = RefineConfig(steps=4, lr=0.01, render_downscale=1,
                       splat_scale=0.03, w_keypoints=0.0, scan_chunk=4)
    with pytest.raises(TypeError):
        refine_smpl(dt, cam, K, init, masks, cfg=cfg, raster_kw=kw)
