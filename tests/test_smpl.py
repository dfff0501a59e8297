"""JAX SMPL tests: Rodrigues, kinematic chain, LBS invariants, gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from neuman_tpu.models import smpl as smpl_module


def test_batch_rodrigues_identity():
    r = smpl_module.batch_rodrigues(jnp.zeros((5, 3)))
    np.testing.assert_allclose(np.asarray(r), np.stack([np.eye(3)] * 5), atol=1e-6)


def test_batch_rodrigues_known_rotation():
    # pi/2 about z maps x->y
    r = smpl_module.batch_rodrigues(jnp.array([[0.0, 0.0, np.pi / 2]]))
    np.testing.assert_allclose(
        np.asarray(r[0]) @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6
    )


def test_batch_rodrigues_orthonormal():
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(10, 3)).astype(np.float32)
    r = np.asarray(smpl_module.batch_rodrigues(jnp.asarray(vecs)))
    for m in r:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        assert np.isclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_lbs_zero_pose_is_identity_transform():
    model = smpl_module.synthetic_smpl_model(num_verts=32, num_joints=5)
    betas = jnp.zeros((1, 10))
    pose = jnp.zeros((1, 5 * 3))
    t_per_vert, v_posed = smpl_module.lbs(betas, pose, model, return_T=True)
    np.testing.assert_allclose(
        np.asarray(t_per_vert), np.broadcast_to(np.eye(4), (1, 32, 4, 4)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(v_posed[0]), np.asarray(model.v_template), atol=1e-6)
    # forward with zero pose returns the shaped template
    verts, joints = smpl_module.smpl_forward(model, pose, betas)
    np.testing.assert_allclose(np.asarray(verts[0]), np.asarray(model.v_template), atol=1e-5)


def test_lbs_global_rotation():
    """Rotating only the root joint rigidly rotates the whole body about it."""
    model = smpl_module.synthetic_smpl_model(num_verts=32, num_joints=5)
    betas = jnp.zeros((1, 10))
    pose = jnp.zeros((1, 15)).at[0, 2].set(np.pi / 2)  # root rot about z
    verts, joints = smpl_module.smpl_forward(model, pose, betas)

    rest_joints = np.asarray(
        smpl_module.vertices2joints(model.J_regressor, model.v_template[None])
    )[0]
    root = rest_joints[0]
    rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    expected = (np.asarray(model.v_template) - root) @ rz.T + root
    np.testing.assert_allclose(np.asarray(verts[0]), expected, atol=1e-4)


def test_lbs_betas_move_verts():
    model = smpl_module.synthetic_smpl_model(num_verts=32, num_joints=5)
    pose = jnp.zeros((1, 15))
    v0, _ = smpl_module.smpl_forward(model, pose, jnp.zeros((1, 10)))
    v1, _ = smpl_module.smpl_forward(model, pose, jnp.ones((1, 10)))
    assert not np.allclose(np.asarray(v0), np.asarray(v1))


def test_verts_transformations_consistency():
    """Applying the per-vertex T to rest verts must equal forward posed verts."""
    model = smpl_module.synthetic_smpl_model(num_verts=32, num_joints=5)
    rng = np.random.default_rng(1)
    pose = jnp.asarray(rng.normal(size=(1, 15)).astype(np.float32) * 0.3)
    betas = jnp.asarray(rng.normal(size=(1, 10)).astype(np.float32) * 0.5)
    v_rest, t = smpl_module.verts_transformations(model, pose, betas)
    homog = jnp.concatenate([v_rest, jnp.ones_like(v_rest[..., :1])], axis=-1)
    warped = jnp.einsum("bvij,bvj->bvi", t, homog)[..., :3]
    verts, _ = smpl_module.smpl_forward(model, pose, betas)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(verts), atol=1e-5)


def test_verts_transformations_transl():
    model = smpl_module.synthetic_smpl_model(num_verts=16, num_joints=4)
    pose = jnp.zeros((1, 12))
    betas = jnp.zeros((1, 10))
    transl = jnp.array([[1.0, 2.0, 3.0]])
    _, t = smpl_module.verts_transformations(model, pose, betas, transl=transl)
    np.testing.assert_allclose(
        np.asarray(t[0, 0]),
        np.eye(4) + np.pad(np.array([[1.0], [2.0], [3.0]]), ((0, 1), (3, 0))),
        atol=1e-5,
    )


def test_concat_joints_shapes():
    model = smpl_module.synthetic_smpl_model(num_verts=16, num_joints=4)
    pose = jnp.zeros((1, 12))
    betas = jnp.zeros((1, 10))
    t, v = smpl_module.lbs(betas, pose, model, return_T=True, concat_joints=True)
    assert t.shape == (1, 16 + 4, 4, 4)
    assert v.shape == (1, 16 + 4, 3)


def test_lbs_differentiable_wrt_pose_and_betas():
    model = smpl_module.synthetic_smpl_model(num_verts=16, num_joints=4)

    def loss(pose, betas):
        verts, _ = smpl_module.smpl_forward(model, pose, betas)
        return jnp.sum(verts**2)

    g_pose, g_betas = jax.grad(loss, argnums=(0, 1))(
        jnp.ones((1, 12)) * 0.1, jnp.ones((1, 10)) * 0.1
    )
    assert np.isfinite(np.asarray(g_pose)).all()
    assert np.isfinite(np.asarray(g_betas)).all()
    assert np.abs(np.asarray(g_pose)).max() > 0
    assert np.abs(np.asarray(g_betas)).max() > 0


def test_lbs_jit_compatible():
    model = smpl_module.synthetic_smpl_model(num_verts=16, num_joints=4)
    f = jax.jit(lambda p, b: smpl_module.smpl_forward(model, p, b)[0])
    out = f(jnp.zeros((1, 12)), jnp.zeros((1, 10)))
    assert out.shape == (1, 16, 3)


def test_da_pose_vector():
    da = smpl_module.da_pose_vector(24)
    assert da.shape == (1, 72)
    np.testing.assert_allclose(da.reshape(-1, 3)[1], [0, 0, 1.0])
    np.testing.assert_allclose(da.reshape(-1, 3)[2], [0, 0, -1.0])
    assert np.abs(da.reshape(-1, 3)[3:]).sum() == 0
