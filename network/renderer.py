"""Shim: reference path `network.renderer` -> nerftex_tpu.render renderers."""
from nerftex_tpu.render.renderer import Renderer, MipRenderer, chunked_apply
from nerftex_tpu.ops.volume import sample_pdf
from nerftex_tpu.render.instance_renderer import InstanceRenderer, MipInstanceRenderer
