"""Preprocess math tests: plane RANSAC, translation refinement, scale solve,
SMPL pose refinement, rasterizer overlay."""

import numpy as np
import pytest

from neuman_tpu.preprocess import alignment


def test_ransac_plane_recovers_ground():
    rng = np.random.default_rng(0)
    n = 500
    xy = rng.uniform(-2, 2, size=(n, 2))
    ground = np.concatenate(
        [xy, (0.5 + 0.002 * rng.normal(size=(n, 1)))], axis=1
    )  # z ~= 0.5
    outliers = rng.uniform(-2, 2, size=(150, 3))
    pts = np.concatenate([ground, outliers])
    model, inliers = alignment.ransac_plane(pts, 0.02, 500)
    a, b, c, d = model
    # plane z = 0.5 -> normal +-(0,0,1), d = -+0.5
    assert abs(abs(c) - 1.0) < 0.01
    assert abs(abs(d) - 0.5) < 0.02
    assert len(inliers) > 400


def test_solve_translation_recovers_shift():
    rng = np.random.default_rng(1)
    k = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    mvp = k @ np.eye(4)[:3]  # identity extrinsics
    true_t = np.array([0.05, -0.08, 0.1])
    p3d = rng.uniform([-0.5, -0.5, 2.0], [0.5, 0.5, 3.0], size=(24, 3))
    shifted = p3d + true_t
    cam = shifted @ mvp[:3, :3].T + mvp[:, 3]
    p2d = cam[:, :2] / cam[:, 2:3]
    t = alignment.solve_translation(
        p3d.astype(np.float32), p2d.astype(np.float32), mvp.astype(np.float32),
        total_iters=2000, lr=5e-3,
    )
    np.testing.assert_allclose(t[0], true_t, atol=0.02)


def test_solve_scale():
    from neuman_tpu.cameras.pinhole import PinholeCamera
    from neuman_tpu.cameras.pose import CameraPose
    from neuman_tpu.cameras.capture import ResizedPinholeCapture
    from neuman_tpu.geometry.rotation import Rotation, Translation

    cam = PinholeCamera(64, 48, 50, 50, 32, 24)
    pose = CameraPose(
        Translation(np.array([0, 0, 0], dtype=np.float32)),
        Rotation(np.array([1.0, 0, 0, 0])),
    )
    cap = ResizedPinholeCapture(cam, pose, (48, 64))
    # camera at origin; ground plane y = -1 (normal (0,1,0), d=1)
    plane = np.array([0.0, 1.0, 0.0, 1.0])
    # a joint halfway to the plane along -y: scale should be 2
    joints = np.array([[0.0, -0.5, 1.0]])
    s = alignment.solve_scale(joints, cap, plane)
    assert np.isclose(s, 2.0, atol=1e-6)


def test_optimize_smpl_runs(smpl_data_root):
    import jax.numpy as jnp

    from neuman_tpu.cameras.pinhole import PinholeCamera
    from neuman_tpu.cameras.pose import CameraPose
    from neuman_tpu.cameras.capture import ResizedPinholeCapture
    from neuman_tpu.geometry.rotation import Rotation, Translation
    from neuman_tpu.data_io.neuman import NeuManReader
    from neuman_tpu.preprocess.optimize_smpl import optimize_smpl_frame

    body_model = NeuManReader._body_model()
    rng = np.random.default_rng(0)
    cam = PinholeCamera(64, 48, 40, 40, 32, 24)
    pose = CameraPose(
        Translation(np.array([0, 0, 2.5], dtype=np.float32)),
        Rotation(np.array([1.0, 0, 0, 0])),
    )
    cap = ResizedPinholeCapture(cam, pose, (48, 64))
    cap.binary_mask = np.zeros((48, 64), np.uint8)
    cap.binary_mask[16:32, 24:40] = 1
    cap.keypoints = rng.uniform([5, 5, 0.5], [60, 44, 1.0], size=(17, 3))
    cap.densepose = np.arange(25)  # everything visible

    frame = {
        "pose": rng.normal(size=(72,)).astype(np.float32) * 0.1,
        "betas": rng.normal(size=(10,)).astype(np.float32) * 0.1,
    }
    out = optimize_smpl_frame(
        cap, frame, body_model, np.eye(4), scale=1.0, num_iters=3
    )
    assert out.shape == (72,)
    assert np.isfinite(out).all()
    # gradient-gated joints must move only where allowed; pose changed somewhere
    assert not np.allclose(out, frame["pose"])


def test_coco_to_smpl_mapping():
    from neuman_tpu.preprocess.optimize_smpl import coco_to_smpl

    coco = np.arange(34, dtype=np.float64).reshape(17, 2)
    smpl = coco_to_smpl(coco)
    assert smpl.shape == (24, 2)
    np.testing.assert_allclose(smpl[1], coco[11])
    np.testing.assert_allclose(smpl[21], coco[10])
    assert smpl[0].sum() == 0  # pelvis unmapped


def test_rasterizer_overlay():
    from neuman_tpu.cameras.pinhole import PinholeCamera
    from neuman_tpu.cameras.pose import CameraPose
    from neuman_tpu.cameras.capture import ResizedPinholeCapture
    from neuman_tpu.geometry.rotation import Rotation, Translation
    from neuman_tpu.render.rasterize import overlay_smpl, rasterize_mesh

    cam = PinholeCamera(64, 48, 60, 60, 32, 24)
    pose = CameraPose(
        Translation(np.array([0, 0, 3.0], dtype=np.float32)),
        Rotation(np.array([1.0, 0, 0, 0])),
    )
    cap = ResizedPinholeCapture(cam, pose, (48, 64))
    # a quad in front of the camera (two triangles)
    verts = np.array(
        [[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.5, 0.5, 0.0], [-0.5, 0.5, 0.0]]
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    rgba = rasterize_mesh(verts, faces, cap)
    assert rgba.shape == (48, 64, 4)
    assert rgba[..., 3].sum() > 50  # quad covers pixels
    assert rgba[24, 32, 3] == 1.0  # center covered
    assert rgba[2, 2, 3] == 0.0  # corner not covered

    img = np.full((48, 64, 3), 255, np.uint8)
    out = overlay_smpl(img, verts, np.concatenate([faces, faces], axis=1), cap)
    assert out.shape == (48, 64, 3)
    assert (out[24, 32] != 255).any()  # mesh visible at center


def _articulated_tube_model(num_joints=24, ring=6, radius=0.28, seg=0.09):
    """Chain-kinematic tube body with one-hot skinning: every joint rotation
    visibly swings the segment below it, so pose recovery from keypoints +
    silhouette is well-posed (unlike the random-regressor session model,
    where pose barely moves the projection)."""
    import jax.numpy as jnp

    from neuman_tpu.models import smpl as smpl_module

    ang = np.linspace(0, 2 * np.pi, ring, endpoint=False)
    v = num_joints * ring
    verts = []
    w = np.zeros((v, num_joints), np.float32)
    jr = np.zeros((num_joints, v), np.float32)
    for j in range(num_joints):
        cy = -seg * j
        ring_v = np.stack(
            [radius * np.cos(ang), np.full(ring, cy), radius * np.sin(ang)], 1
        )
        verts.append(ring_v)
        w[j * ring : (j + 1) * ring, j] = 1.0
        jr[j, j * ring : (j + 1) * ring] = 1.0 / ring
    faces = []
    for j in range(num_joints - 1):
        for k in range(ring):
            a = j * ring + k
            b = j * ring + (k + 1) % ring
            c = (j + 1) * ring + k
            d = (j + 1) * ring + (k + 1) % ring
            faces += [[a, b, c], [b, d, c]]
    return smpl_module.SMPLModel(
        v_template=jnp.asarray(np.concatenate(verts).astype(np.float32)),
        shapedirs=jnp.zeros((v, 3, 10)),
        posedirs=jnp.zeros(((num_joints - 1) * 9, v * 3)),
        J_regressor=jnp.asarray(jr),
        lbs_weights=jnp.asarray(w),
        parents=tuple([-1] + list(range(num_joints - 1))),
        faces=np.array(faces, np.int32),
    )


def test_optimize_smpl_recovers_perturbed_pose():
    """Quantified refinement parity for the documented soft-splat divergence
    (ref optimize_smpl.py:84-102 uses pytorch3d's face-rasterized
    SoftSilhouetteShader; ours splats per-vertex Gaussians). Ground-truth
    recovery on an articulated-tube fixture: build keypoint + silhouette
    targets from a KNOWN pose using the reference-style FACE RASTERIZER
    (render/rasterize.py), perturb the gradient-enabled joints, refine, and
    require the 3D vertex and reprojection errors to drop substantially —
    i.e. the divergent silhouette term still drives poses to the same
    place the reference's rasterized term would. (Joint ANGLES are only
    partially observable — rotation about a tube segment's own axis is a
    null direction — so the gate is on vertex/keypoint error, the
    quantities the refinement exists to fix.)"""
    import jax.numpy as jnp

    from neuman_tpu.cameras.pinhole import PinholeCamera
    from neuman_tpu.cameras.pose import CameraPose
    from neuman_tpu.cameras.capture import ResizedPinholeCapture
    from neuman_tpu.geometry.rotation import Rotation, Translation
    from neuman_tpu.preprocess import optimize_smpl as osm
    from neuman_tpu.render.rasterize import rasterize_mesh

    body_model = _articulated_tube_model()
    rng = np.random.default_rng(3)
    limits = osm.clip_smpl_vals()
    # margin must respect zero-width limits (e.g. knee y/z are pinned [0,0])
    margin = np.minimum(0.05, (limits[:, 1] - limits[:, 0]) / 4)
    pose_gt = np.clip(
        rng.normal(size=(72,)) * 0.1, limits[:, 0] + margin,
        limits[:, 1] - margin,
    ).astype(np.float32)
    betas = np.zeros(10, np.float32)

    v_gt, j_gt = osm.vertex_forward(
        jnp.asarray(pose_gt), jnp.asarray(betas), jnp.eye(4), body_model, 1.0
    )
    v_gt, j_gt = np.asarray(v_gt), np.asarray(j_gt)

    cam = PinholeCamera(64, 48, 55, 55, 32, 24)
    pose_c = CameraPose(
        Translation(np.array([0, -1.0, 3.0], dtype=np.float32)),
        Rotation(np.array([1.0, 0, 0, 0])),
    )
    cap = ResizedPinholeCapture(cam, pose_c, (48, 64))

    # reference-style face-rasterized silhouette as the mask target
    rgba = rasterize_mesh(v_gt, np.asarray(body_model.faces), cap)
    mask_gt = (rgba[..., 3] > 0.5).astype(np.uint8)
    assert mask_gt.sum() > 40, "GT body not in view"
    cap.binary_mask = mask_gt
    cap.densepose = np.arange(25)  # everything visible -> all limbs enabled

    # keypoint targets: project GT smpl joints into the COCO slots that
    # coco_to_smpl maps back (inverse of the mapping table)
    k_mat = np.asarray(cap.intrinsic_matrix)
    w2c = np.asarray(cap.cam_pose.world_to_camera)
    cj = j_gt @ w2c[:3, :3].T + w2c[:3, 3]
    img_j = cj @ k_mat.T
    img_j = img_j[:, :2] / img_j[:, 2:3]
    coco = np.zeros((17, 3))
    mapping = {1: 11, 2: 12, 4: 13, 5: 14, 7: 15, 8: 16,
               16: 5, 17: 6, 18: 7, 19: 8, 20: 9, 21: 10}
    for s, c in mapping.items():
        coco[c, :2] = img_j[s]
        coco[c, 2] = 1.0
    cap.keypoints = coco

    # perturb only the gradient-enabled components (limbs)
    grad_mask = osm.turn_smpl_gradient_on(cap.densepose)
    enabled = grad_mask.astype(bool)
    delta = np.zeros(72, np.float32)
    delta[enabled] = (rng.normal(size=enabled.sum()) * 0.15).astype(np.float32)
    start_margin = np.minimum(0.02, (limits[:, 1] - limits[:, 0]) / 8)
    pose_start = np.clip(
        pose_gt + delta, limits[:, 0] + start_margin,
        limits[:, 1] - start_margin,
    ).astype(np.float32)

    def metrics(pose):
        v, j = osm.vertex_forward(
            jnp.asarray(pose), jnp.asarray(betas), jnp.eye(4), body_model, 1.0
        )
        v, j = np.asarray(v), np.asarray(j)
        verr = np.linalg.norm(v - v_gt, axis=1).mean()
        pj = j @ w2c[:3, :3].T + w2c[:3, 3]
        pj = pj @ k_mat.T
        pj = pj[:, :2] / pj[:, 2:3]
        mapped = sorted(mapping)
        kerr = np.linalg.norm(pj[mapped] - img_j[mapped], axis=1).mean()
        return float(verr), float(kerr)

    refined = osm.optimize_smpl_frame(
        cap, {"pose": pose_start, "betas": betas}, body_model,
        np.eye(4), scale=1.0, num_iters=400, lr=2e-3,
    )
    v0, k0 = metrics(pose_start)
    v1, k1 = metrics(refined)
    print(
        f"optimize_smpl recovery: vertex err {v0:.4f} -> {v1:.4f}, "
        f"keypoint err {k0:.2f}px -> {k1:.2f}px"
    )
    # gradient gating: untouched components stay where they STARTED
    np.testing.assert_allclose(
        refined[~enabled], pose_start[~enabled], atol=1e-6
    )
    assert v1 < 0.4 * v0, f"vertex error not recovered: {v0:.4f} -> {v1:.4f}"
    assert k1 < 0.2 * k0, f"keypoint error not recovered: {k0:.2f} -> {k1:.2f}"

    # quantify the silhouette-term divergence itself: soft splat vs the
    # face-rasterized mask at the SAME pose must agree on coarse coverage
    stride = 2
    vi = v_gt @ w2c[:3, :3].T + w2c[:3, 3]
    vi = vi @ k_mat.T
    vi = vi[:, :2] / vi[:, 2:3]
    soft = np.asarray(
        osm.soft_silhouette(
            jnp.asarray(vi, jnp.float32), None, 48, 64, stride=stride
        )
    )
    hard = mask_gt[::stride, ::stride] > 0
    soft_m = soft > 0.5
    iou = (soft_m & hard).sum() / max((soft_m | hard).sum(), 1)
    print(f"soft-splat vs rasterized silhouette IoU at GT pose: {iou:.3f}")
    assert iou >= 0.3, f"soft silhouette diverges too far from raster ({iou:.3f})"


def test_soft_face_rasterizer_matches_hard_mask_and_is_differentiable():
    """The default silhouette term (soft_raster.soft_rasterize_silhouette,
    pytorch3d SoftSilhouetteShader semantics — ref optimize_smpl.py:84-102)
    must (a) agree with the hard z-buffer rasterizer's mask far more
    tightly than the legacy point-splat, (b) be ~binary away from
    boundaries at sigma=1e-4, and (c) carry finite, useful gradients that
    point a misplaced triangle toward the target coverage."""
    import jax
    import jax.numpy as jnp

    from neuman_tpu.preprocess.soft_raster import soft_rasterize_silhouette

    # (a)+(b): articulated tube body vs render/rasterize.py's hard mask
    from neuman_tpu.cameras.pinhole import PinholeCamera
    from neuman_tpu.cameras.pose import CameraPose
    from neuman_tpu.cameras.capture import ResizedPinholeCapture
    from neuman_tpu.geometry.rotation import Rotation, Translation
    from neuman_tpu.preprocess import optimize_smpl as osm
    from neuman_tpu.render.rasterize import rasterize_mesh

    body_model = _articulated_tube_model()
    pose = np.zeros(72, np.float32)
    v, _ = osm.vertex_forward(
        jnp.asarray(pose), jnp.zeros(10), jnp.eye(4), body_model, 1.0
    )
    v = np.asarray(v)
    cam = PinholeCamera(64, 48, 55, 55, 32, 24)
    pose_c = CameraPose(
        Translation(np.array([0, -1.0, 3.0], dtype=np.float32)),
        Rotation(np.array([1.0, 0, 0, 0])),
    )
    cap = ResizedPinholeCapture(cam, pose_c, (48, 64))
    faces = np.asarray(body_model.faces, np.int32)
    hard = rasterize_mesh(v, faces, cap)[..., 3] > 0.5
    assert hard.sum() > 40

    w2c = np.asarray(cap.cam_pose.world_to_camera)
    k_mat = np.asarray(cap.intrinsic_matrix)
    ci = v @ w2c[:3, :3].T + w2c[:3, 3]
    vi = ci @ k_mat.T
    vi = vi[:, :2] / vi[:, 2:3]

    stride = 2
    alpha = np.asarray(
        soft_rasterize_silhouette(
            jnp.asarray(vi, jnp.float32), jnp.asarray(faces), 48, 64,
            stride=stride,
        )
    )
    hard_s = hard[::stride, ::stride]
    assert alpha.shape == hard_s.shape
    iou = ((alpha > 0.5) & hard_s).sum() / max(((alpha > 0.5) | hard_s).sum(), 1)
    print(f"soft-face-raster vs hard-raster IoU: {iou:.3f}")
    assert iou >= 0.8, f"face rasterizer diverges from hard mask ({iou:.3f})"
    # near-binary at sigma=1e-4: interior pixels saturate
    assert alpha.min() >= 0.0 and alpha.max() <= 1.0
    assert np.median(alpha[hard_s]) > 0.9

    # (c): gradient pulls a displaced triangle toward the target mask
    tri_faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    target_tri = jnp.asarray([[10.0, 10.0], [30.0, 10.0], [20.0, 30.0]])
    target = soft_rasterize_silhouette(target_tri, tri_faces, 48, 64, stride=1)

    def loss(offset):
        a = soft_rasterize_silhouette(
            target_tri + offset[None], tri_faces, 48, 64, stride=1,
            sigma=1.0,  # wide blend: gradient must reach across the gap
        )
        return jnp.mean((a - target) ** 2)

    off0 = jnp.asarray([6.0, -4.0])
    g = jax.grad(loss)(off0)
    assert np.all(np.isfinite(np.asarray(g))) and float(jnp.sum(g * g)) > 0
    # one gradient step with a small lr must DECREASE the loss
    l0 = float(loss(off0))
    l1 = float(loss(off0 - 2.0 * g / (jnp.linalg.norm(g) + 1e-12)))
    print(f"face-raster grad step: loss {l0:.5f} -> {l1:.5f}, grad {np.asarray(g)}")
    assert l1 < l0


def test_soft_face_rasterizer_znear_culls_behind_camera_faces():
    """Faces with a vertex at/behind the camera plane project to garbage
    2D coords (pytorch3d culls them at znear); with vert_z given they must
    contribute nothing — to the silhouette OR its gradient."""
    import jax
    import jax.numpy as jnp

    from neuman_tpu.preprocess.soft_raster import soft_rasterize_silhouette

    # one valid in-frustum triangle + one "exploded" triangle whose verts
    # came from projecting through z <= 0 (huge flipped coords covering
    # the whole image)
    verts = jnp.asarray(
        [[10.0, 10.0], [30.0, 10.0], [20.0, 30.0],
         [-900.0, -900.0], [900.0, -900.0], [0.0, 900.0]]
    )
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    vert_z = jnp.asarray([2.0, 2.0, 2.0, -0.5, 0.0, -1.0])

    clean = soft_rasterize_silhouette(verts[:3], faces[:1], 48, 64, stride=1)
    culled = soft_rasterize_silhouette(
        verts, faces, 48, 64, stride=1, vert_z=vert_z
    )
    np.testing.assert_allclose(
        np.asarray(culled), np.asarray(clean), atol=1e-6
    )
    # without culling the garbage face floods the image
    flooded = soft_rasterize_silhouette(verts, faces, 48, 64, stride=1)
    assert float(jnp.mean(flooded)) > float(jnp.mean(clean)) + 0.1

    # gradient w.r.t. the culled verts is exactly zero
    def mean_alpha(v):
        return jnp.mean(
            soft_rasterize_silhouette(v, faces, 48, 64, stride=1,
                                      vert_z=vert_z)
        )

    g = np.asarray(jax.grad(mean_alpha)(verts))
    assert np.all(np.isfinite(g))
    assert np.abs(g[3:]).max() == 0.0
    assert np.abs(g[:3]).max() > 0.0
