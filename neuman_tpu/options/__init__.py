from neuman_tpu.options.config import NeuManConfig, str2bool
