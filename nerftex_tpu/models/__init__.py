from nerftex_tpu.models.encodings import FourierFeatures, IntegratedPositionalEncoding
from nerftex_tpu.models.mlp import Nerf, ParamNerf, CoarseFine, Model
