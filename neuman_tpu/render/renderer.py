"""Full-image renderers (jit-compiled, static shapes).

TPU-first reformulation of the reference renderers
(utils/render_utils.py:108-461):

- Ray grids are generated on device (`ops.rays.pixels_to_rays`), not by CPU
  loops; images render in fixed-size ray chunks through top-level jitted
  chunk functions (compiled once per shape, cached across frames).
- The reference's boolean-mask control flow (hit/miss rays short-circuiting,
  render_utils.py:199-233, 300-353) becomes static-shape `where` masking:
  every ray evaluates the human branch, misses get dummy far-z samples with
  zero density — the generalization of the reference's own multi-person
  trick (render_utils.py:417-419) applied everywhere.
- The canonical warp runs on device through ops.mesh (no igl CPU round
  trips).

Entry points mirror the reference API: render_vanilla, render_smpl_nerf,
render_hybrid_nerf, render_hybrid_nerf_multi_persons.

Dispatch protocols (the `dispatch` argument on every entry point):

- "loop" — one host dispatch per ray chunk (the round-1..4 behavior).
  Through the axon tunnel each dispatch pays ~30-85 ms of latency; a 720p
  frame at 4096-ray chunks re-pays it ~225 times.
- "scan" — the whole frame's chunks are stacked [n_chunks, chunk, ...] and
  the chunk function runs under `lax.map` inside ONE jit: one dispatch per
  frame, chunks run back-to-back on chip.
- "compact" (default for the planar human paths) — the TPU analog of the
  reference's boolean-mask short-circuit (render_utils.py:300-353, which
  skips the human branch for rays that miss the SMPL bounds): a cheap
  whole-frame near/far pass (one matmul per chunk) computes the hit mask,
  the expensive human branch (mesh-query warp + canonical MLP + z-merge)
  runs ONLY on hit rays gathered into dense chunks (padded to a power-of-2
  chunk count to bound recompiles), and miss rays take a bkg-only pass
  that is bit-identical to the hybrid chunk's bkg branch (all per-ray math
  is row-independent, so compact == loop exactly; tested). A frame whose
  human covers ~20% of pixels skips ~80% of the dominant branch.
"""

import warnings
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from neuman_tpu.models import human_nerf as hn
from neuman_tpu.models import nerf as nerf_module
from neuman_tpu.ops import mesh as mesh_ops
from neuman_tpu.ops import rays as ray_ops
from neuman_tpu.ops import volume
from neuman_tpu.utils.constants import DEFAULT_GEO_THRESH

# fraction of VMEM-friendly rays per compiled chunk; callers can override


def _cap_rays(cap):
    h, w = cap.shape
    coords = ray_ops.image_coords(h, w)
    origins, dirs = ray_ops.pixels_to_rays(
        coords,
        jnp.asarray(cap.intrinsic_matrix, dtype=jnp.float32),
        jnp.asarray(cap.cam_pose.camera_to_world, dtype=jnp.float32),
    )
    return origins, dirs


def _warn_unsharded(chunk, mesh):
    warnings.warn(
        f"render: chunk size {chunk} is not divisible by the mesh size "
        f"{mesh.devices.size}; rendering UNSHARDED on one device. Pick "
        "rays_per_batch as a multiple of the device count to parallelize.",
        stacklevel=3,
    )


def _chunked(fn, arrays, total, chunk, mesh=None, data_axis="data"):
    """Apply jitted `fn` over fixed-size chunks (last chunk zero-padded).

    With `mesh`, each chunk's ray axis is device_put row-sharded over the
    mesh before the call, so XLA partitions the whole chunk computation
    across chips (render-time data parallelism; rays are independent).
    """
    sharding = None
    if mesh is not None:
        if chunk % mesh.devices.size != 0:
            _warn_unsharded(chunk, mesh)
        else:
            from neuman_tpu.parallel.mesh import row_sharded

            sharding = row_sharded(mesh, data_axis)
    outs = []
    for i in range(0, total, chunk):
        sl = []
        for a in arrays:
            piece = a[i : i + chunk]
            if piece.shape[0] < chunk:
                pad = chunk - piece.shape[0]
                piece = jnp.concatenate(
                    [piece, jnp.repeat(piece[-1:], pad, axis=0)], axis=0
                )
            if sharding is not None:
                piece = jax.device_put(piece, sharding)
            sl.append(piece)
        outs.append(fn(*sl))
    return [
        jnp.concatenate([o[j] for o in outs], axis=0)[:total]
        for j in range(len(outs[0]))
    ]


def _stack_chunks(arrays, total, chunk):
    """Pad (edge rows) and reshape flat ray arrays to [n_chunks, chunk, ...]."""
    pad = (-total) % chunk
    out = []
    for a in arrays:
        if pad:
            a = jnp.concatenate(
                [a, jnp.repeat(a[-1:], pad, axis=0)], axis=0
            )
        out.append(a.reshape(-1, chunk, *a.shape[1:]))
    return out


def _maybe_shard_stacked(arrays, mesh, chunk, data_axis="data"):
    """Row-shard each stacked chunk's ray axis (axis 1) over the mesh."""
    if mesh is None:
        return arrays
    if chunk % mesh.devices.size != 0:
        _warn_unsharded(chunk, mesh)
        return arrays
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(None, data_axis))
    return [jax.device_put(a, sh) for a in arrays]


def _unstack(stacked, total):
    """[n_chunks, chunk, ...] device output -> [total, ...] numpy (writable
    copy: compact dispatch scatters hit-ray results into it)."""
    a = np.array(stacked)
    return a.reshape(-1, *a.shape[2:])[:total]


def _pow2_hit_chunks(idx, chunk, total):
    """Pad hit-ray indices to a bucketed number of chunks: buckets are
    multiples of 1/8 of the frame's chunk count, so across a clip the
    human pass compiles at most 8 shapes while padding waste stays under
    12.5% of the frame (padding duplicates the last hit ray, whose
    re-render is overwritten by itself)."""
    frame_chunks = -(-total // chunk)
    granule = max(1, -(-frame_chunks // 8))
    nch = max(1, -(-idx.size // chunk))
    nch = min(-(-nch // granule) * granule, frame_chunks)
    padded = np.full(nch * chunk, idx[-1], dtype=np.int32)
    padded[: idx.size] = idx
    return padded


# ---------------------------------------------------------------------------
# vanilla background renderer (ref: render_utils.py:108-161)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "spec", "samples_per_ray", "importance_samples_per_ray", "white_bkg",
        "use_fine", "use_time",
    ),
)
def _vanilla_chunk(
    spec, coarse_params, fine_params, origins, dirs, near, far, time_val,
    samples_per_ray, importance_samples_per_ray, white_bkg, use_fine, use_time,
):
    r = origins.shape[0]
    t_c = (
        jnp.full((r, samples_per_ray, 1), time_val) if use_time else None
    )
    pts, sdirs, z_vals = ray_ops.ray_to_samples(
        origins, dirs, near, far, samples_per_ray, append_t=t_c
    )
    out = nerf_module.apply_joiner(spec, coarse_params, pts, sdirs)
    rgb, disp, acc, weights, depth = volume.raw2outputs(
        out, z_vals, sdirs[:, 0, :], white_bkg=white_bkg
    )
    if use_fine:
        t_f = (
            jnp.full((r, samples_per_ray + importance_samples_per_ray, 1), time_val)
            if use_time
            else None
        )
        pts, sdirs, z_vals = ray_ops.ray_to_importance_samples(
            origins, dirs, z_vals, weights, importance_samples_per_ray,
            det=True, append_t=t_f,
        )
        out = nerf_module.apply_joiner(spec, fine_params, pts, sdirs)
        rgb, disp, acc, weights, depth = volume.raw2outputs(
            out, z_vals, sdirs[:, 0, :], white_bkg=white_bkg
        )
    return rgb, depth


@partial(
    jax.jit,
    static_argnames=(
        "spec", "samples_per_ray", "importance_samples_per_ray", "white_bkg",
        "compute_dtype_name", "use_fine", "use_pallas",
    ),
)
def _vanilla_frame_fused(
    spec, coarse_params, fine_params, origins_st, dirs_st, near, far,
    samples_per_ray, importance_samples_per_ray, white_bkg,
    compute_dtype_name, use_fine, use_pallas,
):
    from neuman_tpu.ops.fused import fused_vanilla_render

    if use_pallas:
        from neuman_tpu.ops.pallas import raymarch

        compute_dtype = (
            jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
        )
        chunk = raymarch.make_fused_render(
            spec, samples_per_ray, importance_samples_per_ray,
            compute_dtype=compute_dtype,
        )
        body_fn = lambda o, d: chunk(coarse_params, fine_params, o, d, near, far)
    else:
        body_fn = lambda o, d: fused_vanilla_render(
            spec, coarse_params, fine_params, o, d, near, far,
            samples_per_ray=samples_per_ray,
            importance_samples_per_ray=importance_samples_per_ray,
            white_bkg=white_bkg, compute_dtype_name=compute_dtype_name,
            use_fine=use_fine,
        )
    return jax.lax.map(lambda od: body_fn(*od), (origins_st, dirs_st))


def render_vanilla(
    spec, coarse_params, cap, fine_params=None, rays_per_batch=32768,
    samples_per_ray=64, importance_samples_per_ray=128, white_bkg=True,
    near_far_source="bkg", return_depth=False, ablate_nerft=False,
    compute_dtype_name="bfloat16", mesh=None, use_pallas=False,
    dispatch="scan",
):
    origins, dirs = _cap_rays(cap)
    total = origins.shape[0]
    near = jnp.full((rays_per_batch, 1), cap.near[near_far_source], jnp.float32)
    far = jnp.full((rays_per_batch, 1), cap.far[near_far_source], jnp.float32)
    time_val = (
        cap.frame_id["frame_id"] / cap.frame_id["total_frames"]
        if ablate_nerft
        else 0.0
    )
    if not ablate_nerft:
        # feature-major fused path (ops/fused.py) — the performance
        # formulation; the NeRF-T time-channel ablation falls back to the
        # reference-shaped chunk below.
        from neuman_tpu.ops.fused import fused_vanilla_render

        pallas_ok = use_pallas and fine_params is not None and white_bkg
        if dispatch in ("scan", "compact"):
            chunk = rays_per_batch
            o_st, d_st = _maybe_shard_stacked(
                _stack_chunks([origins, dirs], total, chunk), mesh, chunk
            )
            rgb_st, depth_st = _vanilla_frame_fused(
                spec, coarse_params,
                fine_params if fine_params is not None else coarse_params,
                o_st, d_st, near, far,
                samples_per_ray=samples_per_ray,
                importance_samples_per_ray=importance_samples_per_ray,
                white_bkg=white_bkg, compute_dtype_name=compute_dtype_name,
                use_fine=fine_params is not None, use_pallas=pallas_ok,
            )
            rgb = _unstack(rgb_st, total)
            depth = _unstack(depth_st, total)
        else:
            if pallas_ok:
                from neuman_tpu.ops.pallas import raymarch

                compute_dtype = (
                    jnp.bfloat16 if compute_dtype_name == "bfloat16"
                    else jnp.float32
                )
                pchunk = raymarch.make_fused_render(
                    spec, samples_per_ray, importance_samples_per_ray,
                    compute_dtype=compute_dtype,
                )
                fn = jax.jit(
                    lambda o, d: pchunk(coarse_params, fine_params, o, d, near, far)
                )
            else:
                fn = lambda o, d: fused_vanilla_render(
                    spec, coarse_params,
                    fine_params if fine_params is not None else coarse_params,
                    o, d, near, far,
                    samples_per_ray=samples_per_ray,
                    importance_samples_per_ray=importance_samples_per_ray,
                    white_bkg=white_bkg, compute_dtype_name=compute_dtype_name,
                    use_fine=fine_params is not None,
                )
            rgb, depth = _chunked(
                fn, [origins, dirs], total, rays_per_batch, mesh=mesh
            )
        rgb = np.asarray(rgb).reshape(*cap.shape, -1)
        depth = np.asarray(depth).reshape(*cap.shape)
        if return_depth:
            return rgb, depth
        return rgb
    fn = lambda o, d: _vanilla_chunk(
        spec, coarse_params,
        fine_params if fine_params is not None else coarse_params,
        o, d, near, far, time_val,
        samples_per_ray=samples_per_ray,
        importance_samples_per_ray=importance_samples_per_ray,
        white_bkg=white_bkg, use_fine=fine_params is not None,
        use_time=ablate_nerft,
    )
    rgb, depth = _chunked(fn, [origins, dirs], total, rays_per_batch)
    rgb = np.asarray(rgb).reshape(*cap.shape, -1)
    depth = np.asarray(depth).reshape(*cap.shape)
    if return_depth:
        return rgb, depth
    return rgb


# ---------------------------------------------------------------------------
# planarized chunk implementations (the production path; the
# reference-shaped versions below remain as parity oracles)
# ---------------------------------------------------------------------------


def _human_branch_planar(
    spec, params, topology, origins, dirs, posed_verts, Ts, geo_threshold,
    samples_per_ray, render_can, knn_k, interval_comp, compute_dtype,
    use_pallas=False, knn_stride=1,
):
    """Geometry-guided human samples -> (warp) -> canonical MLP, planar.

    knn_stride > 1 amortizes the warp's vertex-KNN phase over groups of
    consecutive ray samples — inference samples are as spatially coherent
    as training ones (98.8% exact-face recall at stride 4, ops/mesh.py);
    guarded against ray-boundary straddle via stride_for.

    Returns (hit [R], z [R, S], sigma [R, S], rgb_c 3x[R, S]).
    """
    from neuman_tpu.ops import fused

    def human_mlp(planes, dir_planes_or_ax, per_ray):
        if use_pallas:
            from neuman_tpu.ops.pallas import raymarch

            if per_ray:
                dirp = raymarch.dir_projection(
                    spec.human, params["coarse_human_net"], dirs, compute_dtype
                )
                return raymarch.nerf_mlp_pallas(
                    spec.human, params["coarse_human_net"], *planes, dirp,
                    compute_dtype,
                )
            return raymarch.nerf_mlp_pallas(
                spec.human, params["coarse_human_net"], *planes, None,
                compute_dtype, dir_planes=tuple(dir_planes_or_ax),
            )
        return fused.mlp_planar(
            spec.human, params["coarse_human_net"], planes, dir_planes_or_ax,
            compute_dtype, dirs_per_ray=per_ray,
        )

    near, far = ray_ops.geometry_guided_near_far(
        origins, dirs, posed_verts, geo_threshold
    )
    hit = near < far
    s_near = jnp.where(hit, near, 0.0)[:, None]
    s_far = jnp.where(hit, far, 1.0)[:, None]
    z = ray_ops.sample_z_vals(s_near, s_far, samples_per_ray)
    r, s = z.shape
    planes = [
        origins[:, a][:, None] + dirs[:, a][:, None] * z for a in range(3)
    ]
    if render_can:
        can_planes = planes
        sg, rgb_c = human_mlp(can_planes, [dirs[:, a] for a in range(3)], True)
    else:
        flat = jnp.stack([p.reshape(-1) for p in planes], axis=-1)
        _, f_id, closest_cols = mesh_ops.point_mesh_closest_planar(
            flat, posed_verts, topology, k=knn_k,
            knn_stride=mesh_ops.stride_for(samples_per_ray, knn_stride),
            use_pallas=None if use_pallas else False,
        )
        aff = mesh_ops._blend_inverse_affine(
            closest_cols, f_id, posed_verts, Ts, topology
        )
        can_cols = mesh_ops.apply_affine_cols(
            aff, (flat[:, 0], flat[:, 1], flat[:, 2])
        )
        can_planes = [c.reshape(r, s) for c in can_cols]
        diffs = [p[:, 1:] - p[:, :-1] for p in can_planes]
        diffs = [jnp.concatenate([p, p[:, -1:]], axis=1) for p in diffs]
        norm = jnp.sqrt(diffs[0] ** 2 + diffs[1] ** 2 + diffs[2] ** 2) + 1e-20
        can_dir_planes = [p / norm for p in diffs]
        sg, rgb_c = human_mlp(can_planes, can_dir_planes, False)
    sg = sg * interval_comp
    return hit, z, sg, rgb_c


def _bkg_branch_planar(
    bkg_spec, coarse_params, fine_params, origins, dirs, bkg_near, bkg_far,
    samples_per_ray, importance_samples_per_ray, white_bkg, compute_dtype,
    use_pallas=False,
):
    """Background coarse -> importance -> fine, planar.

    The single source of the hybrid renderers' background samples AND the
    compact dispatch's bkg-only pass — extracting it guarantees miss rays
    get bit-identical pixels on either path. Returns (f_z, f_sg 1x[R, S'],
    f_rgb_c 3x[R, S'], dir_norm [R])."""
    from neuman_tpu.ops import fused

    d_ax = [dirs[:, a] for a in range(3)]
    dir_norm = jnp.linalg.norm(dirs, axis=-1)

    def bkg_mlp(prm, planes):
        if use_pallas:
            from neuman_tpu.ops.pallas import raymarch

            dirp = raymarch.dir_projection(bkg_spec, prm, dirs, compute_dtype)
            return raymarch.nerf_mlp_pallas(
                bkg_spec, prm, *planes, dirp, compute_dtype
            )
        return fused.mlp_planar(bkg_spec, prm, planes, d_ax, compute_dtype)

    z = fused.sample_z(bkg_near, bkg_far, samples_per_ray)
    planes = [origins[:, a][:, None] + d_ax[a][:, None] * z for a in range(3)]
    sg, rgb_c = bkg_mlp(coarse_params, planes)
    _, _, _, w, _ = fused.integrate_planar(
        sg, rgb_c, z, dir_norm, white_bkg=white_bkg
    )
    f_z = fused.importance_z(z, w, importance_samples_per_ray, det=True)
    planes = [origins[:, a][:, None] + d_ax[a][:, None] * f_z for a in range(3)]
    f_sg, f_rgb_c = bkg_mlp(fine_params, planes)
    return f_z, f_sg, f_rgb_c, dir_norm


@partial(
    jax.jit,
    static_argnames=(
        "spec", "samples_per_ray", "importance_samples_per_ray", "white_bkg",
        "compute_dtype_name", "use_pallas",
    ),
)
def _bkg_chunk_planar(
    spec, params, origins, dirs, bkg_near, bkg_far, samples_per_ray,
    importance_samples_per_ray, white_bkg, compute_dtype_name="bfloat16",
    use_pallas=False,
):
    """Bkg-only pixels for the compact dispatch's miss rays — identical
    math to _hybrid_chunk_planar's bkg_rgb/bkg_depth."""
    from neuman_tpu.ops import fused

    compute_dtype = (
        jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    )
    f_z, f_sg, f_rgb_c, dir_norm = _bkg_branch_planar(
        spec.bkg, params["coarse_bkg_net"], params["fine_bkg_net"], origins,
        dirs, bkg_near, bkg_far, samples_per_ray, importance_samples_per_ray,
        white_bkg, compute_dtype, use_pallas=use_pallas,
    )
    rgb, _, _, _, depth = fused.integrate_planar(
        f_sg, f_rgb_c, f_z, dir_norm, white_bkg=white_bkg
    )
    return rgb, depth


# ---------------------------------------------------------------------------
# human-only renderer (ref: render_utils.py:164-246)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "spec", "samples_per_ray", "white_bkg", "render_can", "knn_k",
    ),
)
def _smpl_chunk(
    spec, params, topology, origins, dirs, posed_verts, Ts, geo_threshold,
    interval_comp, samples_per_ray, white_bkg, render_can, knn_k,
):
    near, far = ray_ops.geometry_guided_near_far(
        origins, dirs, posed_verts, geo_threshold
    )
    hit = near < far
    s_near = jnp.where(hit, near, 0.0)[:, None]
    s_far = jnp.where(hit, far, 1.0)[:, None]
    pts, sdirs, z_vals = ray_ops.ray_to_samples(
        origins, dirs, s_near, s_far, samples_per_ray
    )
    if render_can:
        can_pts, can_dirs = pts, sdirs
    else:
        can_pts, can_dirs, _ = mesh_ops.warp_samples_to_canonical(
            pts, posed_verts, Ts, topology, k=knn_k
        )
    out = hn.apply_coarse_human(spec, params, can_pts, can_dirs)
    out = out.at[..., -1].mul(interval_comp)
    rgb, _, acc, _, depth = volume.raw2outputs(
        out, z_vals, sdirs[:, 0, :], white_bkg=white_bkg
    )
    miss_color = 1.0 if white_bkg else 0.0
    rgb = jnp.where(hit[:, None], rgb, miss_color)
    depth = jnp.where(hit, depth, 0.0)
    acc = jnp.where(hit, acc, 0.0)
    return rgb, depth, acc


@partial(
    jax.jit,
    static_argnames=(
        "spec", "samples_per_ray", "white_bkg", "render_can", "knn_k",
        "compute_dtype_name", "use_pallas", "knn_stride",
    ),
)
def _smpl_chunk_planar(
    spec, params, topology, origins, dirs, posed_verts, Ts, geo_threshold,
    interval_comp, samples_per_ray, white_bkg, render_can, knn_k,
    compute_dtype_name="bfloat16", use_pallas=False, knn_stride=1,
):
    from neuman_tpu.ops import fused

    compute_dtype = (
        jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    )
    hit, z, sg, rgb_c = _human_branch_planar(
        spec, params, topology, origins, dirs, posed_verts, Ts, geo_threshold,
        samples_per_ray, render_can, knn_k, interval_comp, compute_dtype,
        use_pallas=use_pallas, knn_stride=knn_stride,
    )
    dir_norm = jnp.linalg.norm(dirs, axis=-1)
    rgb, _, acc, _, depth = fused.integrate_planar(
        sg, rgb_c, z, dir_norm, white_bkg=white_bkg
    )
    miss_color = 1.0 if white_bkg else 0.0
    rgb = jnp.where(hit[:, None], rgb, miss_color)
    depth = jnp.where(hit, depth, 0.0)
    acc = jnp.where(hit, acc, 0.0)
    return rgb, depth, acc


@partial(
    jax.jit,
    static_argnames=(
        "spec", "samples_per_ray", "white_bkg", "render_can", "knn_k",
        "compute_dtype_name", "use_pallas", "knn_stride",
    ),
)
def _smpl_frame_planar(
    spec, params, topology, origins_st, dirs_st, posed_verts, Ts,
    geo_threshold, interval_comp, samples_per_ray, white_bkg, render_can,
    knn_k, compute_dtype_name, use_pallas, knn_stride,
):
    def body(od):
        o, d = od
        return _smpl_chunk_planar(
            spec, params, topology, o, d, posed_verts, Ts, geo_threshold,
            interval_comp, samples_per_ray=samples_per_ray,
            white_bkg=white_bkg, render_can=render_can, knn_k=knn_k,
            compute_dtype_name=compute_dtype_name, use_pallas=use_pallas,
            knn_stride=knn_stride,
        )

    return jax.lax.map(body, (origins_st, dirs_st))


def render_smpl_nerf(
    spec, params, cap, posed_verts, faces, Ts, rays_per_batch=32768,
    samples_per_ray=64, white_bkg=True, render_can=False,
    geo_threshold=DEFAULT_GEO_THRESH, return_depth=False, return_mask=False,
    interval_comp=1.0, knn_k=4, planar=True, compute_dtype_name="bfloat16",
    mesh=None, use_pallas=False, knn_stride=1, dispatch="compact",
):
    """Human-only frame (ref render_utils.py:164-246). knn_k=4 default:
    see render_hybrid_nerf."""
    topology = _topo_cache(np.asarray(faces[:, :3], dtype=np.int32).tobytes(),
                           faces=np.asarray(faces[:, :3], dtype=np.int32),
                           num_verts=len(posed_verts))
    origins, dirs = _cap_rays(cap)
    total = origins.shape[0]
    posed_verts = jnp.asarray(posed_verts, dtype=jnp.float32)
    if Ts is None:
        Ts = jnp.tile(jnp.eye(4)[None], (posed_verts.shape[0], 1, 1))
    else:
        Ts = jnp.asarray(Ts, dtype=jnp.float32)[: posed_verts.shape[0]]
    geo_t = jnp.float32(geo_threshold)
    icomp = jnp.float32(interval_comp)

    if planar and dispatch in ("scan", "compact"):
        chunk = rays_per_batch
        o_st, d_st = _maybe_shard_stacked(
            _stack_chunks([origins, dirs], total, chunk), mesh, chunk
        )
        frame = lambda ost, dst: _smpl_frame_planar(
            spec, params, topology, ost, dst, posed_verts, Ts, geo_t, icomp,
            samples_per_ray=samples_per_ray, white_bkg=white_bkg,
            render_can=render_can, knn_k=knn_k,
            compute_dtype_name=compute_dtype_name, use_pallas=use_pallas,
            knn_stride=knn_stride,
        )
        if dispatch == "scan":
            rgb_st, depth_st, acc_st = frame(o_st, d_st)
            rgb = _unstack(rgb_st, total)
            depth = _unstack(depth_st, total)
            acc = _unstack(acc_st, total)
        else:
            # miss rays are constant miss_color / 0 depth / 0 acc — only
            # the hit rays need the human branch at all
            hit = _unstack(_hit_frame(o_st, d_st, posed_verts, geo_t), total)
            miss_color = 1.0 if white_bkg else 0.0
            rgb = np.full((total, 3), miss_color, np.float32)
            depth = np.zeros(total, np.float32)
            acc = np.zeros(total, np.float32)
            idx = np.nonzero(hit)[0]
            if idx.size:
                padded = _pow2_hit_chunks(idx, chunk, total)
                ho = jnp.take(origins, jnp.asarray(padded), axis=0)
                hd = jnp.take(dirs, jnp.asarray(padded), axis=0)
                ho_st, hd_st = _maybe_shard_stacked(
                    [ho.reshape(-1, chunk, 3), hd.reshape(-1, chunk, 3)],
                    mesh, chunk,
                )
                h_rgb, h_depth, h_acc = frame(ho_st, hd_st)
                rgb[idx] = _unstack(h_rgb, padded.size)[: idx.size]
                depth[idx] = _unstack(h_depth, padded.size)[: idx.size]
                acc[idx] = _unstack(h_acc, padded.size)[: idx.size]
    else:
        if planar:
            fn = lambda o, d: _smpl_chunk_planar(
                spec, params, topology, o, d, posed_verts, Ts, geo_t, icomp,
                samples_per_ray=samples_per_ray, white_bkg=white_bkg,
                render_can=render_can, knn_k=knn_k,
                compute_dtype_name=compute_dtype_name, use_pallas=use_pallas,
                knn_stride=knn_stride,
            )
        else:
            fn = lambda o, d: _smpl_chunk(
                spec, params, topology, o, d, posed_verts, Ts, geo_t, icomp,
                samples_per_ray=samples_per_ray, white_bkg=white_bkg,
                render_can=render_can, knn_k=knn_k,
            )
        rgb, depth, acc = _chunked(
            fn, [origins, dirs], total, rays_per_batch, mesh=mesh
        )
    rgb = np.asarray(rgb).reshape(*cap.shape, -1)
    depth = np.asarray(depth).reshape(*cap.shape)
    acc = np.asarray(acc).reshape(*cap.shape)
    if return_depth and return_mask:
        return rgb, depth, acc
    if return_depth:
        return rgb, depth
    if return_mask:
        return rgb, acc
    return rgb


# ---------------------------------------------------------------------------
# hybrid human + scene renderer (ref: render_utils.py:249-362)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "spec", "samples_per_ray", "importance_samples_per_ray",
        "white_bkg", "knn_k",
    ),
)
def _hybrid_chunk(
    spec, params, topology, origins, dirs, bkg_near, bkg_far, posed_verts, Ts,
    geo_threshold, samples_per_ray, importance_samples_per_ray, white_bkg, knn_k,
):
    # background: coarse -> importance -> fine
    bkg_pts, bkg_dirs, bkg_z = ray_ops.ray_to_samples(
        origins, dirs, bkg_near, bkg_far, samples_per_ray
    )
    bkg_out = hn.apply_coarse_bkg(spec, params, bkg_pts, bkg_dirs)
    _, _, _, bkg_weights, _ = volume.raw2outputs(
        bkg_out, bkg_z, bkg_dirs[:, 0, :], white_bkg=white_bkg
    )
    bkg_pts, bkg_dirs, bkg_z = ray_ops.ray_to_importance_samples(
        origins, dirs, bkg_z, bkg_weights, importance_samples_per_ray, det=True
    )
    bkg_out = hn.apply_fine_bkg(spec, params, bkg_pts, bkg_dirs)

    # human branch for all rays; misses become far dummy samples with zero
    # density (generalized from ref render_utils.py:417-419)
    near, far = ray_ops.geometry_guided_near_far(
        origins, dirs, posed_verts, geo_threshold
    )
    hit = near < far
    h_near = jnp.where(hit, near, 0.0)[:, None]
    h_far = jnp.where(hit, far, 1.0)[:, None]
    h_pts, h_dirs, h_z = ray_ops.ray_to_samples(
        origins, dirs, h_near, h_far, samples_per_ray
    )
    can_pts, can_dirs, _ = mesh_ops.warp_samples_to_canonical(
        h_pts, posed_verts, Ts, topology, k=knn_k
    )
    h_out = hn.apply_coarse_human(spec, params, can_pts, can_dirs)
    # dummy z beyond the far plane + zero density for misses
    dummy_z = jnp.linspace(1.0, 2.0, samples_per_ray)[None] * bkg_far[..., :1] * 2.0
    h_z = jnp.where(hit[:, None], h_z, dummy_z)
    h_out = jnp.where(hit[:, None, None], h_out, jnp.array([0.0, 0, 0, -1e9]))

    total_z, total_out = volume.sort_and_merge_samples([bkg_z, h_z], [bkg_out, h_out])
    merged_rgb, _, _, _, merged_depth = volume.raw2outputs(
        total_out, total_z, h_dirs[:, 0, :], white_bkg=white_bkg
    )
    bkg_rgb, _, bkg_acc, _, bkg_depth = volume.raw2outputs(
        bkg_out, bkg_z, bkg_dirs[:, 0, :], white_bkg=white_bkg
    )
    h_rgb, _, h_acc, _, _ = volume.raw2outputs(
        h_out, h_z, h_dirs[:, 0, :], white_bkg=white_bkg
    )
    rgb = jnp.where(hit[:, None], merged_rgb, bkg_rgb)
    depth = jnp.where(hit, merged_depth, bkg_depth)
    acc = jnp.where(hit, h_acc, 0.0)
    return rgb, depth, acc


@partial(
    jax.jit,
    static_argnames=(
        "spec", "samples_per_ray", "importance_samples_per_ray", "white_bkg",
        "knn_k", "compute_dtype_name", "use_pallas", "knn_stride",
    ),
)
def _hybrid_chunk_planar(
    spec, params, topology, origins, dirs, bkg_near, bkg_far, posed_verts, Ts,
    geo_threshold, samples_per_ray, importance_samples_per_ray, white_bkg,
    knn_k, compute_dtype_name="bfloat16", use_pallas=False, knn_stride=1,
):
    from neuman_tpu.ops import fused

    compute_dtype = (
        jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    )
    # background: coarse -> importance -> fine (planar)
    f_z, f_sg, f_rgb_c, dir_norm = _bkg_branch_planar(
        spec.bkg, params["coarse_bkg_net"], params["fine_bkg_net"], origins,
        dirs, bkg_near, bkg_far, samples_per_ray, importance_samples_per_ray,
        white_bkg, compute_dtype, use_pallas=use_pallas,
    )

    # human branch; misses become far dummy samples with zero density
    hit, h_z, h_sg, h_rgb_c = _human_branch_planar(
        spec, params, topology, origins, dirs, posed_verts, Ts, geo_threshold,
        samples_per_ray, False, knn_k, 1.0, compute_dtype,
        use_pallas=use_pallas, knn_stride=knn_stride,
    )
    dummy_z = jnp.linspace(1.0, 2.0, samples_per_ray)[None] * bkg_far[..., :1] * 2.0
    h_z = jnp.where(hit[:, None], h_z, dummy_z)
    h_sg = jnp.where(hit[:, None], h_sg, -1e9)

    total_z, total_sg, total_rgb_c = fused.sort_merge_planar(
        [f_z, h_z], [f_sg, h_sg], [f_rgb_c, h_rgb_c]
    )
    merged_rgb, _, _, _, merged_depth = fused.integrate_planar(
        total_sg, total_rgb_c, total_z, dir_norm, white_bkg=white_bkg
    )
    bkg_rgb, _, _, _, bkg_depth = fused.integrate_planar(
        f_sg, f_rgb_c, f_z, dir_norm, white_bkg=white_bkg
    )
    _, _, h_acc, _, _ = fused.integrate_planar(
        h_sg, h_rgb_c, h_z, dir_norm, white_bkg=white_bkg
    )
    rgb = jnp.where(hit[:, None], merged_rgb, bkg_rgb)
    depth = jnp.where(hit, merged_depth, bkg_depth)
    acc = jnp.where(hit, h_acc, 0.0)
    return rgb, depth, acc


# ---------------------------------------------------------------------------
# frame-level dispatch (one jit per frame: lax.map over stacked chunks)
# ---------------------------------------------------------------------------


@jax.jit
def _hit_frame(origins_st, dirs_st, posed_verts, geo_threshold):
    """Whole-frame hit mask (one dispatch): does each ray intersect the
    geo_threshold-dilated body-vertex bounds? Exactly the test the hybrid
    chunk applies internally (ref ray_utils.py:204-219)."""

    def body(od):
        o, d = od
        near, far = ray_ops.geometry_guided_near_far(
            o, d, posed_verts, geo_threshold
        )
        return near < far

    return jax.lax.map(body, (origins_st, dirs_st))


@partial(
    jax.jit,
    static_argnames=(
        "spec", "samples_per_ray", "importance_samples_per_ray", "white_bkg",
        "compute_dtype_name", "use_pallas",
    ),
)
def _bkg_frame_planar(
    spec, params, origins_st, dirs_st, bkg_near, bkg_far, samples_per_ray,
    importance_samples_per_ray, white_bkg, compute_dtype_name, use_pallas,
):
    def body(od):
        o, d = od
        return _bkg_chunk_planar(
            spec, params, o, d, bkg_near, bkg_far,
            samples_per_ray=samples_per_ray,
            importance_samples_per_ray=importance_samples_per_ray,
            white_bkg=white_bkg, compute_dtype_name=compute_dtype_name,
            use_pallas=use_pallas,
        )

    return jax.lax.map(body, (origins_st, dirs_st))


@partial(
    jax.jit,
    static_argnames=(
        "spec", "samples_per_ray", "importance_samples_per_ray", "white_bkg",
        "knn_k", "compute_dtype_name", "use_pallas", "knn_stride",
    ),
)
def _hybrid_frame_planar(
    spec, params, topology, origins_st, dirs_st, bkg_near, bkg_far,
    posed_verts, Ts, geo_threshold, samples_per_ray,
    importance_samples_per_ray, white_bkg, knn_k, compute_dtype_name,
    use_pallas, knn_stride,
):
    def body(od):
        o, d = od
        return _hybrid_chunk_planar(
            spec, params, topology, o, d, bkg_near, bkg_far, posed_verts, Ts,
            geo_threshold, samples_per_ray=samples_per_ray,
            importance_samples_per_ray=importance_samples_per_ray,
            white_bkg=white_bkg, knn_k=knn_k,
            compute_dtype_name=compute_dtype_name, use_pallas=use_pallas,
            knn_stride=knn_stride,
        )

    return jax.lax.map(body, (origins_st, dirs_st))


def render_hybrid_nerf(
    spec, params, cap, posed_verts, faces, Ts, rays_per_batch=32768,
    samples_per_ray=64, importance_samples_per_ray=128, white_bkg=True,
    geo_threshold=DEFAULT_GEO_THRESH, return_depth=False, return_acc=False,
    knn_k=4,
    planar=True, compute_dtype_name="bfloat16", mesh=None, use_pallas=False,
    knn_stride=1, dispatch="compact",
):
    """Hybrid human+scene frame (ref render_utils.py:249-362).

    knn_k default is 4 — the recall study (BASELINE.md) measured 98.8%
    exact-face warp recall at k=4/stride 4, and k=4 keeps the Ericson
    kernel at C=24 -> tn=2048 (k=8 forces C=48 -> tn=1024, ~2x the
    mesh-query time for no measured image-quality gain).
    """
    topology = _topo_cache(np.asarray(faces[:, :3], dtype=np.int32).tobytes(),
                           faces=np.asarray(faces[:, :3], dtype=np.int32),
                           num_verts=len(posed_verts))
    origins, dirs = _cap_rays(cap)
    total = origins.shape[0]
    posed_verts = jnp.asarray(posed_verts, dtype=jnp.float32)
    Ts = jnp.asarray(Ts, dtype=jnp.float32)[: posed_verts.shape[0]]
    bkg_near = jnp.full((rays_per_batch, 1), cap.near["bkg"], jnp.float32)
    bkg_far = jnp.full((rays_per_batch, 1), cap.far["bkg"], jnp.float32)
    geo_t = jnp.float32(geo_threshold)

    if planar and dispatch in ("scan", "compact"):
        chunk = rays_per_batch
        o_st, d_st = _maybe_shard_stacked(
            _stack_chunks([origins, dirs], total, chunk), mesh, chunk
        )
        if dispatch == "scan":
            rgb_st, depth_st, acc_st = _hybrid_frame_planar(
                spec, params, topology, o_st, d_st, bkg_near, bkg_far,
                posed_verts, Ts, geo_t, samples_per_ray=samples_per_ray,
                importance_samples_per_ray=importance_samples_per_ray,
                white_bkg=white_bkg, knn_k=knn_k,
                compute_dtype_name=compute_dtype_name, use_pallas=use_pallas,
                knn_stride=knn_stride,
            )
            rgb = _unstack(rgb_st, total)
            depth = _unstack(depth_st, total)
            acc = _unstack(acc_st, total)
        else:
            hit = _unstack(
                _hit_frame(o_st, d_st, posed_verts, geo_t), total
            )
            rgb_st, depth_st = _bkg_frame_planar(
                spec, params, o_st, d_st, bkg_near, bkg_far,
                samples_per_ray=samples_per_ray,
                importance_samples_per_ray=importance_samples_per_ray,
                white_bkg=white_bkg, compute_dtype_name=compute_dtype_name,
                use_pallas=use_pallas,
            )
            rgb = _unstack(rgb_st, total)
            depth = _unstack(depth_st, total)
            acc = np.zeros(total, np.float32)
            idx = np.nonzero(hit)[0]
            if idx.size:
                padded = _pow2_hit_chunks(idx, chunk, total)
                ho = jnp.take(origins, jnp.asarray(padded), axis=0)
                hd = jnp.take(dirs, jnp.asarray(padded), axis=0)
                ho_st, hd_st = _maybe_shard_stacked(
                    [
                        ho.reshape(-1, chunk, 3),
                        hd.reshape(-1, chunk, 3),
                    ],
                    mesh, chunk,
                )
                h_rgb, h_depth, h_acc = _hybrid_frame_planar(
                    spec, params, topology, ho_st, hd_st, bkg_near, bkg_far,
                    posed_verts, Ts, geo_t, samples_per_ray=samples_per_ray,
                    importance_samples_per_ray=importance_samples_per_ray,
                    white_bkg=white_bkg, knn_k=knn_k,
                    compute_dtype_name=compute_dtype_name,
                    use_pallas=use_pallas, knn_stride=knn_stride,
                )
                rgb[idx] = _unstack(h_rgb, padded.size)[: idx.size]
                depth[idx] = _unstack(h_depth, padded.size)[: idx.size]
                acc[idx] = _unstack(h_acc, padded.size)[: idx.size]
    else:
        if planar:
            fn = lambda o, d: _hybrid_chunk_planar(
                spec, params, topology, o, d, bkg_near, bkg_far, posed_verts,
                Ts, geo_t,
                samples_per_ray=samples_per_ray,
                importance_samples_per_ray=importance_samples_per_ray,
                white_bkg=white_bkg, knn_k=knn_k,
                compute_dtype_name=compute_dtype_name, use_pallas=use_pallas,
                knn_stride=knn_stride,
            )
        else:
            fn = lambda o, d: _hybrid_chunk(
                spec, params, topology, o, d, bkg_near, bkg_far, posed_verts,
                Ts, geo_t,
                samples_per_ray=samples_per_ray,
                importance_samples_per_ray=importance_samples_per_ray,
                white_bkg=white_bkg, knn_k=knn_k,
            )
        rgb, depth, acc = _chunked(
            fn, [origins, dirs], total, rays_per_batch, mesh=mesh
        )
    rgb = np.asarray(rgb).reshape(*cap.shape, -1)
    depth = np.asarray(depth).reshape(*cap.shape)
    if return_acc:
        acc = np.asarray(acc).reshape(*cap.shape)
        return rgb, depth, acc
    if return_depth:
        return rgb, depth
    return rgb


# ---------------------------------------------------------------------------
# multi-actor composite (ref: render_utils.py:365-461)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "bkg_spec", "human_specs", "samples_per_ray",
        "importance_samples_per_ray", "white_bkg", "knn_k",
        "compute_dtype_name", "use_pallas", "knn_stride",
    ),
)
def _multi_chunk_planar(
    bkg_spec, bkg_params, human_specs, actor_trees, origins, dirs, bkg_near,
    bkg_far, geo_threshold, samples_per_ray, importance_samples_per_ray,
    white_bkg, knn_k, compute_dtype_name, use_pallas, knn_stride,
):
    """Multi-actor composite chunk (ref render_utils.py:365-461).

    human_specs: static tuple of HumanNeRF specs; actor_trees: matching
    tuple of (params, verts, topology, Ts) pytrees. Module-level jit so
    frame loops don't recompile per call (the old per-call jit(chunk_fn)
    recompiled every frame)."""
    from neuman_tpu.ops import fused

    compute_dtype = (
        jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    )
    f_z, f_sg, f_rgb_c, dir_norm = _bkg_branch_planar(
        bkg_spec.bkg, bkg_params["coarse_bkg_net"],
        bkg_params["fine_bkg_net"], origins, dirs, bkg_near, bkg_far,
        samples_per_ray, importance_samples_per_ray, white_bkg,
        compute_dtype, use_pallas=use_pallas,
    )

    z_list, sg_list, rgb_list = [f_z], [f_sg], [f_rgb_c]
    for spec_h, (params_h, verts_h, topo_h, ts_h) in zip(
        human_specs, actor_trees
    ):
        hit, h_z, h_sg, h_rgb_c = _human_branch_planar(
            spec_h, params_h, topo_h, origins, dirs, verts_h, ts_h,
            geo_threshold, samples_per_ray, False, knn_k,
            1.0, compute_dtype, use_pallas=use_pallas,
            knn_stride=knn_stride,
        )
        # Dummy fill for miss rays must sit effectively at infinity:
        # anything merely past `far` would truncate the last REAL
        # sample's 1e10 delta in integrate_planar and bleed white
        # background into every miss ray (caught by the gathering
        # composite gate: composite-vs-bkg-only delta 0.18 outside
        # the actors before this fix).
        dummy_z = jnp.linspace(1.0, 2.0, samples_per_ray)[None] * 1e8
        h_z = jnp.where(hit[:, None], h_z, dummy_z)
        h_sg = jnp.where(hit[:, None], h_sg, -1e9)
        z_list.append(h_z)
        sg_list.append(h_sg)
        rgb_list.append(h_rgb_c)

    total_z, total_sg, total_rgb = fused.sort_merge_planar(
        z_list, sg_list, rgb_list
    )
    rgb, _, _, _, depth = fused.integrate_planar(
        total_sg, total_rgb, total_z, dir_norm, white_bkg=white_bkg
    )
    return rgb, depth


@partial(
    jax.jit,
    static_argnames=(
        "bkg_spec", "human_specs", "samples_per_ray",
        "importance_samples_per_ray", "white_bkg", "knn_k",
        "compute_dtype_name", "use_pallas", "knn_stride",
    ),
)
def _multi_frame_planar(
    bkg_spec, bkg_params, human_specs, actor_trees, origins_st, dirs_st,
    bkg_near, bkg_far, geo_threshold, samples_per_ray,
    importance_samples_per_ray, white_bkg, knn_k, compute_dtype_name,
    use_pallas, knn_stride,
):
    def body(od):
        o, d = od
        return _multi_chunk_planar(
            bkg_spec, bkg_params, human_specs, actor_trees, o, d, bkg_near,
            bkg_far, geo_threshold, samples_per_ray=samples_per_ray,
            importance_samples_per_ray=importance_samples_per_ray,
            white_bkg=white_bkg, knn_k=knn_k,
            compute_dtype_name=compute_dtype_name, use_pallas=use_pallas,
            knn_stride=knn_stride,
        )

    return jax.lax.map(body, (origins_st, dirs_st))


def render_hybrid_nerf_multi_persons(
    bkg_spec, bkg_params, cap, human_specs, human_params_list, posed_verts_list,
    faces_list, Ts_list, rays_per_batch=32768, samples_per_ray=64,
    importance_samples_per_ray=128, white_bkg=True,
    geo_threshold=DEFAULT_GEO_THRESH, return_depth=False, knn_k=4,
    compute_dtype_name="bfloat16", mesh=None, use_pallas=False, knn_stride=1,
    dispatch="compact",
):
    """Multi-actor composite frame (ref render_utils.py:365-461). The
    compact dispatch runs the actor branches only on rays inside the UNION
    of the actors' dilated bounds; miss rays take the shared bkg-only pass.
    knn_k=4 default: see render_hybrid_nerf."""
    origins_all, dirs_all = _cap_rays(cap)
    total = origins_all.shape[0]
    bkg_near = jnp.full((rays_per_batch, 1), cap.near["bkg"], jnp.float32)
    bkg_far = jnp.full((rays_per_batch, 1), cap.far["bkg"], jnp.float32)
    geo_t = jnp.float32(geo_threshold)

    specs = tuple(human_specs)
    actor_trees = []
    for params_h, verts_h, faces_h, ts_h in zip(
        human_params_list, posed_verts_list, faces_list, Ts_list
    ):
        topo = _topo_cache(np.asarray(faces_h[:, :3], dtype=np.int32).tobytes(),
                           faces=np.asarray(faces_h[:, :3], dtype=np.int32),
                           num_verts=len(verts_h))
        actor_trees.append(
            (
                params_h,
                jnp.asarray(verts_h, dtype=jnp.float32),
                topo,
                jnp.asarray(ts_h, dtype=jnp.float32)[: len(verts_h)],
            )
        )
    actor_trees = tuple(actor_trees)

    chunk = rays_per_batch
    frame = lambda ost, dst: _multi_frame_planar(
        bkg_spec, bkg_params, specs, actor_trees, ost, dst, bkg_near,
        bkg_far, geo_t, samples_per_ray=samples_per_ray,
        importance_samples_per_ray=importance_samples_per_ray,
        white_bkg=white_bkg, knn_k=knn_k,
        compute_dtype_name=compute_dtype_name, use_pallas=use_pallas,
        knn_stride=knn_stride,
    )
    if dispatch in ("scan", "compact"):
        o_st, d_st = _maybe_shard_stacked(
            _stack_chunks([origins_all, dirs_all], total, chunk), mesh, chunk
        )
        if dispatch == "scan":
            rgb_st, depth_st = frame(o_st, d_st)
            rgb = _unstack(rgb_st, total)
            depth = _unstack(depth_st, total)
        else:
            hit = np.zeros(total, bool)
            for _, verts_h, _, _ in actor_trees:
                hit |= _unstack(_hit_frame(o_st, d_st, verts_h, geo_t), total)
            rgb_st, depth_st = _bkg_frame_planar(
                bkg_spec, bkg_params, o_st, d_st, bkg_near, bkg_far,
                samples_per_ray=samples_per_ray,
                importance_samples_per_ray=importance_samples_per_ray,
                white_bkg=white_bkg, compute_dtype_name=compute_dtype_name,
                use_pallas=use_pallas,
            )
            rgb = _unstack(rgb_st, total)
            depth = _unstack(depth_st, total)
            idx = np.nonzero(hit)[0]
            if idx.size:
                padded = _pow2_hit_chunks(idx, chunk, total)
                ho = jnp.take(origins_all, jnp.asarray(padded), axis=0)
                hd = jnp.take(dirs_all, jnp.asarray(padded), axis=0)
                ho_st, hd_st = _maybe_shard_stacked(
                    [ho.reshape(-1, chunk, 3), hd.reshape(-1, chunk, 3)],
                    mesh, chunk,
                )
                h_rgb, h_depth = frame(ho_st, hd_st)
                rgb[idx] = _unstack(h_rgb, padded.size)[: idx.size]
                depth[idx] = _unstack(h_depth, padded.size)[: idx.size]
    else:
        fn = lambda o, d: _multi_chunk_planar(
            bkg_spec, bkg_params, specs, actor_trees, o, d, bkg_near,
            bkg_far, geo_t, samples_per_ray=samples_per_ray,
            importance_samples_per_ray=importance_samples_per_ray,
            white_bkg=white_bkg, knn_k=knn_k,
            compute_dtype_name=compute_dtype_name, use_pallas=use_pallas,
            knn_stride=knn_stride,
        )
        rgb, depth = _chunked(
            fn, [origins_all, dirs_all], total, rays_per_batch, mesh=mesh
        )
    rgb = np.asarray(rgb).reshape(*cap.shape, -1)
    depth = np.asarray(depth).reshape(*cap.shape)
    if return_depth:
        return rgb, depth
    return rgb


# ---------------------------------------------------------------------------
# topology cache (avoid rebuilding incidence tables per frame)
# ---------------------------------------------------------------------------

_TOPO_CACHE = {}


def _topo_cache(key_bytes, faces, num_verts):
    key = (hash(key_bytes), num_verts)
    if key not in _TOPO_CACHE:
        _TOPO_CACHE[key] = mesh_ops.MeshTopology.build(faces, num_verts)
    return _TOPO_CACHE[key]
