"""Training-objective golden parity vs the torch reference.

Runs the reference `HumanNeRFTrainer.loss_func` VERBATIM
(human_nerf_trainer.py:382-446, called unbound on a faked trainer
namespace — no optimizer/datasets/tensorboard needed) on one synthetic
batch with converted weights, and asserts that BOTH of our loss
formulations (the reference-shaped oracle and the planarized production
path, trainers/human.py) reproduce every loss value and the
poses/betas/alignments/canonical-net/offset-net gradients.

This closes the one composite that previously had only indirect parity
evidence: per-op parity (embedder/MLP/sample_pdf/raw2outputs/LBS/warp) and
eval-image parity existed, and the in-repo planar-vs-reference-shaped
oracle proved the two internal formulations agree — but nothing could
catch a shared misreading of the reference objective itself.

Determinism strategy: the reference loss draws randomness from
torch.randn (color-range dummy dirs), torch.rand (shape-reg dummy box
points), random.choice (offset net / canonical cap — both single-element
here), and np.random.randint (sparsity pixel coords); perturb=0 makes
stratified sampling deterministic. The test monkeypatches the torch/numpy
draws to fixed arrays and feeds the identical values to our loss through
the `parity_inject` hook (trainers/human.py).

Exclusion: lpips_loss. The reference delegates it to the pretrained
`lpips` pip package (human_nerf_trainer.py:153), which is
environment-blocked (no egress) and stubbed; our AlexNet-LPIPS
architecture has its own unit tests (models/lpips.py). Both sides run
with penalize_lpips=0 and the test asserts the term is exactly zero.

igl is shimmed by the repo's brute-force numpy/JAX oracles (the
test_image_parity.py recipe): igl is an external library the reference
treats as ground truth, so sharing the mesh-query backend isolates the
comparison to the trainer formulation under test.
"""

import random
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_image_parity import _install_igl_shim  # noqa: E402
from test_reference_parity import (  # noqa: E402
    _reference_smpl_object,
    load_reference,
    ref_opt,
    t2n,
)


def _body_model():
    """Watertight sphere-proxy SMPL body (the quality-gate body):
    synthetic_smpl_model's random triangulation has degenerate incidence
    statistics that collapse the KNN face recall the warp relies on."""
    from neuman_tpu.utils.synthetic_body import body_proxy_smpl_model

    return body_proxy_smpl_model(subdivisions=3)

R, S, IMP = 64, 16, 16
NUM_VIEWS = 2
CAN_H, CAN_W = 24, 32

PEN = dict(
    penalize_smpl_alpha=0.4,
    penalize_dummy=0.7,
    penalize_symmetric_alpha=0.15,
    penalize_color_range=0.2,
    penalize_mask=0.05,
    penalize_sharp_edge=0.12,
    penalize_hard_surface=0.08,
    penalize_lpips=0.0,
    penalize_outside_factor=2.0,
    dist_exponent=1.0,
)
INTERVAL_COMP = 1.3
OFFSET_SCALE = 0.5  # runtime ramp value (ref sets offset_nets[0].nerf.scale)


def _install_signed_distance_shim():
    """igl.signed_distance backed by the repo's exact brute-force method
    (ops/mesh.py signed_distance(method='brute') — itself validated against
    numpy oracles in test_mesh_ops.py)."""
    from neuman_tpu.ops import mesh as mesh_ops

    igl = sys.modules["igl"]

    def signed_distance(pts, verts, faces):
        topo = mesh_ops.MeshTopology.build(
            np.asarray(faces, np.int32), len(verts)
        )
        sd, f_id, cp = mesh_ops.signed_distance(
            jnp.asarray(pts, jnp.float32), jnp.asarray(verts, jnp.float32),
            topo, method="brute",
        )
        return (
            np.asarray(sd, np.float64),
            np.asarray(f_id, np.int64),
            np.asarray(cp, np.float64),
        )

    igl.signed_distance = signed_distance


def _alive_net(ref):
    """Reference HumanNeRF with alpha biased up: a random-init net can trip
    the dead-restart branch (human_nerf_trainer.py:437-442), which zeroes
    every loss and would make the comparison vacuous."""
    torch.manual_seed(3)
    opt = ref_opt(
        nerf_width=32,
        samples_per_ray=S,
        importance_samples_per_ray=IMP,
        perturb=0,
        white_bkg=True,
        penalize_outside_factor=PEN["penalize_outside_factor"],
        dist_exponent=PEN["dist_exponent"],
    )
    net = ref.human_nerf.HumanNeRF(opt)
    with torch.no_grad():
        for joiner in (
            net.coarse_bkg_net, net.fine_bkg_net, net.coarse_human_net
        ):
            joiner.nerf.alpha_linear.bias.add_(0.6)
            joiner.nerf.alpha_linear.weight.mul_(3.0)
            joiner.nerf.rgb_linear.weight.mul_(4.0)
    net.offset_nets[0].nerf.scale = OFFSET_SCALE
    return net, opt


def _attach_smpl(ref, net, model):
    rng = np.random.default_rng(21)
    poses = (rng.normal(size=(NUM_VIEWS, 72)) * 0.2).astype(np.float32)
    betas = (rng.normal(size=(NUM_VIEWS, 10)) * 0.3).astype(np.float32)
    affine = np.tile(np.eye(4, dtype=np.float32)[None], (NUM_VIEWS, 1, 1))
    affine[:, :3, 3] = rng.normal(size=(NUM_VIEWS, 3)).astype(np.float32) * 0.1
    aligns = np.ascontiguousarray(np.swapaxes(affine, 1, 2))
    scale = 1.4

    net.body_model = _reference_smpl_object(ref, model)
    net.poses = torch.nn.Parameter(torch.from_numpy(poses))
    net.betas = torch.nn.Parameter(torch.from_numpy(betas))
    net.alignments = torch.nn.Parameter(torch.from_numpy(aligns))
    net.scale = scale
    da = torch.zeros(24, 3)
    da[1] = torch.tensor([0, 0, 1.0])
    da[2] = torch.tensor([0, 0, -1.0])
    net.da_smpl = torch.nn.Parameter(da.reshape(1, -1), requires_grad=False)
    return scale


def _batch_arrays(center, posed_verts, faces, rng):
    """One synthetic ray batch aimed at FACE CENTROIDS of the posed body,
    with a tight sampling shell around the hit distance (what the real
    geometry-guided near/far produces). Geometry matters for the GRADIENT
    comparison: at a closest-point tie (sample nearest to a mesh edge/
    vertex, or on the medial axis deep inside the body) the closest FACE
    is ambiguous — the reference (float64 brute argmin) and our KNN then
    resolve the tie differently, which changes the (genuinely ambiguous)
    subgradient routing through the barycentric blend even though the
    warped values agree to 3e-5. Face interiors have a unique closest
    face. is_hit/is_bkg mix exercises the hit-masked RGB loss and the
    mask-loss target."""
    origins = (
        center[None] + np.array([0.0, 0.0, -2.5], np.float32)
        + rng.normal(size=(R, 3)).astype(np.float32) * 0.05
    )
    tri = posed_verts[faces[rng.integers(0, len(faces), R)]]  # [R, 3, 3]
    targets = tri.mean(axis=1)
    dirs = targets - origins
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    dist = np.linalg.norm(targets - origins, axis=-1, keepdims=True)
    batch = dict(
        origin=origins.astype(np.float32),
        direction=dirs.astype(np.float32),
        bkg_near=np.full((R, 1), 0.8, np.float32),
        bkg_far=np.full((R, 1), 5.0, np.float32),
        human_near=(dist - 0.3).astype(np.float32),
        human_far=(dist + 0.3).astype(np.float32),
        color=rng.uniform(size=(R, 3)).astype(np.float32),
        is_hit=(np.arange(R) % 4 != 3).astype(np.float32),
        is_bkg=(np.arange(R) % 3 == 0).astype(np.float32),
        cur_view_f=np.float32(0.37),
        cap_id=np.int32(1),
        patch_counter=np.int32(0),
    )
    return batch


def _torch_batch(b):
    out = {}
    for k, v in b.items():
        t = torch.as_tensor(np.asarray(v))
        out[k] = t[None]  # DataLoader-collated leading axis
    return out


class _FixedDraws:
    """Queue-mock for torch.randn / torch.rand / np.random.randint — each
    call must match the expected shape and pops a pinned array."""

    def __init__(self, entries):
        self.entries = list(entries)

    def __call__(self, *shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, torch.Size)):
            shape = tuple(shape[0])
        want, arr = self.entries.pop(0)
        assert tuple(shape) == tuple(want), (shape, want)
        return torch.from_numpy(arr)


def test_human_loss_golden_parity():
    ref = load_reference()
    _install_igl_shim()
    _install_signed_distance_shim()

    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.models import smpl as smpl_module
    from neuman_tpu.ops import mesh as mesh_ops
    from neuman_tpu.options.config import NeuManConfig
    from neuman_tpu.trainers import checkpoint as ckpt
    from neuman_tpu.trainers.human import (
        make_human_loss_fn,
        make_human_loss_fn_reference,
    )

    model = _body_model()
    net, opt = _alive_net(ref)
    scale = _attach_smpl(ref, net, model)
    rng = np.random.default_rng(5)

    # ---- shared geometry ---------------------------------------------------
    da_np = t2n(net.da_smpl)
    can_verts = (
        t2n(
            net.body_model(
                return_tensor=True, return_joints=False,
                poses=net.da_smpl, betas=net.betas[1][None], transl=None,
            )
        )
        * scale
    ).astype(np.float32)
    faces = np.asarray(model.faces, np.int32)

    with torch.no_grad():
        posed_verts, _ = net.vertex_forward(1)
    pv = t2n(posed_verts)[0].astype(np.float32)
    center = pv.mean(axis=0)
    batch_np = _batch_arrays(center, pv, faces, rng)

    # ---- pinned randomness ---------------------------------------------------
    raw_color = rng.normal(size=(R, S, 3)).astype(np.float32)
    color_dirs = raw_color / np.linalg.norm(raw_color, axis=-1, keepdims=True)
    raw_dummy = rng.uniform(size=(R, S, 3)).astype(np.float32)
    dummy_pts = (raw_dummy - 0.5) * 3.0
    can_idx = rng.integers(0, CAN_H * CAN_W, 128).astype(np.int64)
    can_x = (can_idx % CAN_W).astype(np.float32)
    can_y = (can_idx // CAN_W).astype(np.float32)

    # ---- canonical cap (sparsity reg), same K/c2w both sides ---------------
    focal = 1.3 * CAN_W
    can_k = np.array(
        [[focal, 0, CAN_W / 2.0], [0, focal, CAN_H / 2.0], [0, 0, 1.0]],
        np.float32,
    )
    can_c2w = np.eye(4, dtype=np.float32)
    can_c2w[:3, 3] = can_verts.mean(axis=0) + np.array(
        [0, 0, -2.0], np.float32
    )
    can_cap = types.SimpleNamespace(
        shape=(CAN_H, CAN_W),
        intrinsic_matrix=can_k,
        cam_pose=types.SimpleNamespace(
            camera_to_world=can_c2w,
            camera_center_in_world=can_c2w[:3, 3].copy(),
        ),
    )

    # ---- reference loss_func, verbatim --------------------------------------
    cap = types.SimpleNamespace(
        posed_mesh_cpu=types.SimpleNamespace(
            faces_packed=lambda: torch.from_numpy(faces)
        ),
        can_mesh=types.SimpleNamespace(
            verts_packed=lambda: torch.from_numpy(can_verts),
            faces_packed=lambda: torch.from_numpy(faces),
        ),
    )
    fake_self = types.SimpleNamespace(
        opt=opt,
        net=net,
        interval_comp=INTERVAL_COMP,
        can_caps=[can_cap],
        val_dataset=types.SimpleNamespace(
            scene=types.SimpleNamespace(captures=[cap, cap])
        ),
        penalize_smpl_alpha=PEN["penalize_smpl_alpha"],
        penalize_symmetric_alpha=PEN["penalize_symmetric_alpha"],
        penalize_dummy=PEN["penalize_dummy"],
        penalize_hard_surface=PEN["penalize_hard_surface"],
        penalize_color_range=PEN["penalize_color_range"],
        penalize_mask=PEN["penalize_mask"],
        penalize_lpips=PEN["penalize_lpips"],
        penalize_sharp_edge=PEN["penalize_sharp_edge"],
    )
    # bind the real methods
    trainer_cls = _import_trainer_cls(ref)
    for name in (
        "_eval_bkg_samples", "_eval_human_samples",
        "_color_range_regularization", "_smpl_symmetry_regularization",
        "_smpl_shape_regularization", "_sparsity_regularization",
    ):
        setattr(
            fake_self, name,
            getattr(trainer_cls, name).__get__(fake_self),
        )

    saved = (torch.randn, torch.rand, np.random.randint)
    torch.randn = _FixedDraws([((R, S, 3), raw_color)])
    torch.rand = _FixedDraws([((R, S, 3), raw_dummy)])
    np.random.randint = lambda lo, hi, n: can_idx
    random.seed(0)  # single-element choices; seed for hygiene
    try:
        tb = _torch_batch(batch_np)
        loss_dict = trainer_cls.loss_func(fake_self, tb)
        ref_total = (
            loss_dict["fine_rgb_loss"] + loss_dict["color_range_reg"]
            + loss_dict["lpips_loss"] + loss_dict["smpl_sym_reg"]
            + loss_dict["smpl_shape_reg"] + loss_dict["mask_loss"]
            + loss_dict["sparsity_reg"]
        )
        ref_total.backward()
    finally:
        torch.randn, torch.rand, np.random.randint = saved

    ref_losses = {k: float(v) for k, v in loss_dict.items()}
    # non-vacuity: every compared term must actually fire
    for name in (
        "fine_rgb_loss", "color_range_reg", "smpl_sym_reg",
        "smpl_shape_reg", "mask_loss", "sparsity_reg",
    ):
        assert abs(ref_losses[name]) > 1e-7, (name, ref_losses)
    assert ref_losses["lpips_loss"] == 0.0

    # ---- ours: converted weights, injected randomness -----------------------
    cfg = NeuManConfig(
        nerf_width=32, samples_per_ray=S, importance_samples_per_ray=IMP,
        perturb=0.0, white_bkg=True, offset_scale_type="tanh",
        compute_dtype="float32", delay_iters=0, **PEN,
    )
    spec = hn.build_human_nerf_spec(cfg)
    params = ckpt.convert_hybrid_state_dict(
        {k: t2n(v) for k, v in net.state_dict().items()},
        num_offset_nets=1, depth=8, specular_can=True,
    )
    topo = mesh_ops.MeshTopology.build(faces, model.num_verts)
    ctx = {
        "body_model": model,
        "da_smpl": da_np,
        "scale": scale,
        "topo": topo,
        "can_verts": jnp.asarray(np.stack([can_verts, can_verts])),
        "can_k": jnp.asarray(can_k)[None],
        "can_c2w": jnp.asarray(can_c2w)[None],
        "can_hw": (CAN_H, CAN_W),
        "interval_comp": INTERVAL_COMP,
        "lpips_params": None,
        "scene_ids": jnp.arange(NUM_VIEWS, dtype=jnp.int32),
        "grad_masks": jnp.ones((NUM_VIEWS, 72)),
        "knn_k": 8,
    }
    inject = {
        "color_dirs": color_dirs,
        "dummy_pts": dummy_pts.astype(np.float32),
        "can_cam": 0,
        "can_x": can_x,
        "can_y": can_y,
    }
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    keys = {
        n: k
        for n, k in zip(
            ("perturb", "offset", "color", "dummy", "can_cam", "can_pix",
             "can_perturb"),
            jax.random.split(jax.random.PRNGKey(0), 7),
        )
    }
    anneals = {
        "iteration": jnp.int32(1000),
        "mask_w": PEN["penalize_mask"],
        "sym_w": PEN["penalize_symmetric_alpha"],
        "dummy_w": PEN["penalize_dummy"],
        "smpl_alpha_w": PEN["penalize_smpl_alpha"],
        "offset_scale": OFFSET_SCALE,
    }

    # torch grads -> our layout (the converter is linear: transposes only)
    grad_sd = {
        k: t2n(p.grad) if p.grad is not None else np.zeros_like(t2n(p))
        for k, p in net.named_parameters()
    }
    ref_grads = ckpt.convert_hybrid_state_dict(
        grad_sd, num_offset_nets=1, depth=8, specular_can=True
    )

    for make, label in (
        (make_human_loss_fn_reference, "reference-shaped"),
        (make_human_loss_fn, "planar"),
    ):
        loss_fn = make(spec, cfg, ctx, parity_inject=inject)
        total, aux = loss_fn(params, batch, keys, anneals)
        got = {k: float(v) for k, v in aux["losses"].items()}
        for name, want in ref_losses.items():
            assert np.isclose(got[name], want, rtol=2e-3, atol=2e-5), (
                label, name, got[name], want
            )
        assert np.isclose(float(total), float(ref_total), rtol=2e-3), label

        grads = jax.grad(lambda p: loss_fn(p, batch, keys, anneals)[0])(
            params
        )
        # Tolerance calibration: the MLP weight grads agree to ~1e-3
        # relative. The SMPL-chain grads (poses/betas/alignments) and the
        # tiny offset-net grads carry residual closest-point TIE noise
        # (see _batch_arrays): at a tie the subgradient through the
        # barycentric blend depends on which of the equidistant faces is
        # picked, and the reference (float64 brute argmin) and our KNN
        # resolve ties differently. Measured tie noise here is <=6% of
        # the grad max; the bounds below (10% + floors) still catch any
        # formulation error (wrong weight/sign/missing term moves grads
        # by O(100%)).
        for name in ("poses", "betas", "alignments"):
            g, w = np.asarray(grads[name]), np.asarray(ref_grads[name])
            np.testing.assert_allclose(
                g, w, atol=max(5e-4, 1e-1 * np.abs(w).max()),
                err_msg=f"{label}:{name}",
            )
        # offset-net grads are dL/dcan summed over samples — as directly
        # tie-routed as the SMPL chain (an offset bias translates every
        # canonical point), so they get the same 10% relative bound
        for net_name, floor, rel in (
            ("coarse_human_net", 3e-4, 3e-3), ("offset_nets", 1.5e-3, 1e-1)
        ):
            flat_g = jax.tree_util.tree_leaves(grads[net_name])
            flat_w = jax.tree_util.tree_leaves(ref_grads[net_name])
            assert len(flat_g) == len(flat_w)
            for g, w in zip(flat_g, flat_w):
                g, w = np.asarray(g), np.asarray(w)
                np.testing.assert_allclose(
                    g, w, atol=max(floor, rel * np.abs(w).max()),
                    err_msg=f"{label}:{net_name}",
                )


def _import_trainer_cls(ref):
    """Import the reference HumanNeRFTrainer class itself (not instantiable
    here: __init__ wants loaders/optimizer/tensorboard); its loss methods
    are called unbound on a faked namespace. Stubs the UI-only deps the
    module imports at top level (torchvision, tqdm) — none are touched by
    the loss path."""
    for name, attrs in (
        ("torchvision", {}),
        ("torchvision.utils", {"make_grid": None, "save_image": None}),
        ("tqdm", {"tqdm": (lambda x, **k: x), "trange": range}),
    ):
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    if "torchvision" in sys.modules and "torchvision.utils" in sys.modules:
        sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
    sys.path.insert(0, "/root/reference")
    try:
        from trainers import human_nerf_trainer as tmod
    finally:
        sys.path.remove("/root/reference")
    return tmod.HumanNeRFTrainer
