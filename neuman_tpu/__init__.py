"""neuman_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of apple/ml-neuman.

This is a ground-up TPU-first redesign, not a port: the compute path is pure
JAX (static shapes, fused kernels, device-side mesh queries replacing the
reference's CPU libigl round trips), and data-parallel scaling rides
`jax.sharding` over a device mesh instead of `nn.DataParallel`.

Layer map (mirrors the reference's implicit layering, see SURVEY.md §1):
    geometry/   homogeneous-transform math            (ref: geometry/)
    cameras/    pinhole model, poses, captures        (ref: cameras/)
    scenes/     scene containers                      (ref: scenes/)
    data_io/    COLMAP + NeuMan scene readers         (ref: data_io/)
    models/     SMPL, NeRF MLPs, HumanNeRF, LPIPS     (ref: models/)
    ops/        rays, sampling, volume integration,
                mesh queries, Pallas kernels          (ref: utils/ray_utils.py,
                                                       utils/render_utils.py, igl)
    render/     full-image renderers + camera paths   (ref: utils/render_utils.py)
    trainers/   jitted train steps, checkpointing     (ref: trainers/)
    parallel/   device mesh + sharding helpers        (new; ref used DataParallel)
    options/    typed config                          (ref: options/)
"""

__version__ = "0.1.0"
