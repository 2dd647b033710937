"""Pallas texture-fetch kernel (kernels/tex_gather.py, NERFTEX_PALLAS_TEX).

The kernel replaces the XLA quad row-gather for byte-valued (8-bit-PNG-
derived) parameter textures with a one-hot bf16 MXU matmul + iota-mask
corner extraction (PERF.md 2.17/2.18).  Contract pinned here:
  * the 4-corner fetch is BIT-exact against the texture bytes,
  * the full lerped fetch matches the gather path to <=2 ulp (the residual
    is cross-graph fma contraction in the lerp — see PARITY.md),
  * the instancer produces the same model input either way,
  * non-byte textures refuse a table (the gather fallback stays in force).
Runs in interpret mode on the CPU test mesh; the same code compiles via
Mosaic on TPU (validated in-frame by the golden-checked A/B legs,
runlogs/round5a/).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerftex_tpu.kernels.tex_gather import (
    build_byte_tableT,
    sample_channel_quads_pallas,
    _quad_fetch,
)


def _byte_tex(w, h, seed=0):
    rs = np.random.RandomState(seed)
    b = rs.randint(0, 256, (w, h)).astype(np.uint8)
    return b, b.astype(np.float32) / np.float32(255.0)


def test_byte_table_layout_and_reject():
    b, tex = _byte_tex(60, 40)
    tbT = build_byte_tableT(tex)
    assert tbT is not None
    assert tbT.dtype == np.uint8 and tbT.shape == (80, 128)  # [2H, W_pad]
    # Row v < H holds tex[:, v]; row H+v the x+1-shifted copy (clamped).
    assert np.array_equal(tbT[5, :60], b[:, 5])
    assert np.array_equal(tbT[40 + 5, :59], b[1:, 5])
    assert tbT[40 + 5, 59] == b[59, 5]  # x+1 clamp at the last row
    assert np.all(tbT[:, 60:] == 0)  # lane padding never selected
    # Not exactly byte-valued -> no table (gather fallback).
    assert build_byte_tableT(tex + np.float32(1e-4)) is None
    assert build_byte_tableT(tex * np.float32(2.0)) is None  # out of byte range


def test_quad_fetch_corners_bitexact():
    b, tex = _byte_tex(256, 256, seed=1)
    tbT = jnp.asarray(build_byte_tableT(tex)).astype(jnp.bfloat16)
    rs = np.random.RandomState(2)
    n = 1024
    x0 = rs.randint(0, 255, (n,)).astype(np.int32)
    y0 = rs.randint(0, 255, (n,)).astype(np.int32)
    planes = _quad_fetch(
        tbT, jnp.asarray(x0).reshape(-1, 128), jnp.asarray(y0).reshape(-1, 128),
        256, 8, True,
    )
    planes = [np.asarray(p).reshape(-1) for p in planes]
    x1 = np.minimum(x0 + 1, 255)
    y1 = np.minimum(y0 + 1, 255)
    want = [b[x0, y0], b[x0, y1], b[x1, y0], b[x1, y1]]
    for got, w in zip(planes, want):
        assert np.array_equal(got, w.astype(np.float32))


def test_sample_channel_parity_with_gather():
    from nerftex_tpu.instancing.device import _sample_channel_quads

    _, tex = _byte_tex(256, 256, seed=3)
    right = np.concatenate([tex[1:], tex[-1:]], 0)
    down = np.concatenate([tex[:, 1:], tex[:, -1:]], 1)
    right_down = np.concatenate([right[:, 1:], right[:, -1:]], 1)
    quads = jnp.asarray(np.stack([tex, down, right, right_down], -1))
    tbT = jnp.asarray(build_byte_tableT(tex)).astype(jnp.bfloat16)

    rs = np.random.RandomState(4)
    uv = jnp.asarray(rs.rand(7, 37, 2).astype(np.float32))  # odd shape: padding
    ref = np.asarray(_sample_channel_quads(quads, uv, (256, 256)))
    got = np.asarray(sample_channel_quads_pallas(tbT, uv, (256, 256)))
    # <=2 ulp: the corner values are exact, the lerp may contract fma
    # differently across the two graphs.
    assert np.allclose(ref, got, atol=4e-7, rtol=0)
    assert np.mean(ref != got) < 0.9  # mostly identical, not systematically off


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    from nerftex_tpu.tools import gen_assets

    out = tmp_path_factory.mktemp("meshes")
    gen_assets.generate(str(out), seed=0)
    return str(out)


def test_instancer_model_input_parity(assets, monkeypatch):
    """Gate ON vs OFF on the cloth + checkerboard scene: identical hits /
    samples, texture-scaled parameter slots within lerp-fma tolerance."""
    from nerftex_tpu.instancing import device as device_mod
    from nerftex_tpu.instancing.scene import Scene
    from nerftex_tpu.instancing.device import DeviceInstancer

    rs = np.random.RandomState(0)
    n_rays = 8
    rays_o = np.concatenate(
        [rs.uniform(-0.5, 0.5, (n_rays, 2)), np.full((n_rays, 1), 4.0)], -1
    ).astype(np.float32)
    rays_d = np.tile(np.array([0, 0, -1.0], np.float32), (n_rays, 1))
    params = np.tile(np.array([1.0, 1, 1, 0.1, 0, 0, -1.0], np.float32), (n_rays, 1))

    outs = {}
    for flag in (False, True):
        monkeypatch.setattr(device_mod, "_PALLAS_TEX", flag)
        scene = Scene(
            b_0=[-1.4, -1.2, -0.1],
            b_1=[1.2, 1.2, 1.8],
            textures=[os.path.join(assets, "smooth_checkerboard.png"), "", "", "", "light"],
            instance_sampling_method="nearest",
            seed=0,
        )
        scene.distribute_instances_on_mesh(
            os.path.join(assets, "cloth_mesh.ply"), 0.09,
            os.path.join(assets, "cloth_anchor_points.ply"),
        )
        dev = DeviceInstancer(scene, max_hits=32, ray_block=8)
        if flag:
            assert dev.ds.tex_tablesT is not None, "byte tables must build"
        out = dev.get_model_input(rays_o, rays_d, params, 128, 0.02)
        outs[flag] = {k: np.asarray(v) for k, v in out.items()}

    a, b = outs[False], outs[True]
    assert sorted(a) == sorted(b)
    assert a["hit"].any()
    for k in sorted(a):
        if k == "parameters":
            assert np.allclose(a[k], b[k], atol=4e-7, rtol=0), k
        else:
            assert np.array_equal(a[k], b[k], equal_nan=True), k
