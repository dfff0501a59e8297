from neuman_tpu.geometry import transforms
from neuman_tpu.geometry.rotation import Rotation, UnstableRotation, Translation
