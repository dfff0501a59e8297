from neuman_tpu.scenes.scene import BaseScene, ImageFileScene, RigCameraScene
