from neuman_tpu.cameras.pinhole import PinholeCamera, resize_pinhole_camera
from neuman_tpu.cameras.pose import CameraPose
from neuman_tpu.cameras.capture import Capture, ResizedPinholeCapture
