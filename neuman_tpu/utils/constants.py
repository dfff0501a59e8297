"""Framework-wide constants.

Values match the reference (/root/reference/utils/constant.py:1-15) so that
training schedules, patch losses, and camera paths are numerically identical.
"""

NEAR_INDEX = 0
FAR_INDEX = 1
# = softplus(0) = log(2); offset that makes the hard-surface / sharp-edge
# binary-entropy-style penalty non-negative (ref: utils/constant.py:7).
HARD_SURFACE_OFFSET = 0.31326165795326233
PATCH_SIZE = 32
PATCH_SIZE_SQUARED = PATCH_SIZE**2
TRAIN_SET_LENGTH = 1_000_000
VALIDATION_SET_LENGTH = 10
CANONICAL_ZOOM_FACTOR = 1000 / 1280
CANONICAL_CAMERA_DIST = 3.0
DEFAULT_GEO_THRESH = 0.2
PERTURB_EPSILON = 0.01

# SMPL topology (neutral body model).
SMPL_NUM_VERTS = 6890
SMPL_NUM_JOINTS = 24
SMPL_NUM_FACES = 13776
