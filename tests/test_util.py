import pytest

from nerftex_tpu.utils.util import EasyDict, instantiate, format_name, get_attr_from_path


def test_easydict_attribute_access():
    d = EasyDict({"a": 1, "nested": {"b": 2}})
    assert d.a == 1
    assert d.nested.b == 2
    d.c = 3
    assert d["c"] == 3
    del d.c
    assert "c" not in d
    with pytest.raises(AttributeError):
        _ = d.missing


def test_instantiate_resolves_module_paths():
    sampler = instantiate(EasyDict({"module": "data.sampler.Constant", "d": 2, "c": 0.5}))
    out = sampler()
    assert out.tolist() == [0.5, 0.5]


def test_instantiate_none():
    assert instantiate(None) is None


def test_get_attr_from_path():
    fn = get_attr_from_path("math.sqrt")
    assert fn(4.0) == 2.0


def test_format_name():
    assert format_name("img", 7, 999, ".png") == "img007.png"
    assert format_name("", 10, 10, "") == "10"


def test_stratified_sampler_jitters_within_cell():
    """The reference's Stratified.__call__ raises AttributeError
    (sampler.py:62-65, calls nonexistent super().sample()); ours jitters the
    Grid sample within its cell — a documented conscious fix."""
    import numpy as np
    from nerftex_tpu.data.sampler import Stratified, Grid

    np.random.seed(0)
    s = Stratified(d=2, n=16)
    g = Grid(d=2, n=16)
    for _ in range(16):
        base = g()
        x = s()
        assert np.all(x >= base - 1e-9)
        assert np.all(x <= base + s.cell_size + 1e-9)


def test_mip_renderer_importance_not_implemented():
    """Parity with renderer.py:403-404: importance sampling is explicitly
    unimplemented for the mip path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from nerftex_tpu.render.renderer import MipRenderer
    from nerftex_tpu.models.mlp import Model

    model = Model("model", {"w": jnp.zeros(1)}, lambda p, a, b, c: (jnp.zeros((a.shape[0], 3)), jnp.zeros((a.shape[0], 1))))
    r = MipRenderer(model=model, n_samples=4, n_importance=4, blur_idx=0)
    data = {
        "rays_o": np.zeros((1, 2, 3), np.float32),
        "rays_d": np.tile([0, 0, -1.0], (1, 2, 1)).astype(np.float32),
        "t": np.tile([1.0, 2.0], (1, 2, 1)).astype(np.float32),
        "parameters": np.zeros((1, 2), np.float32),
        "cone_scale": np.full((1, 2, 1), 0.01, np.float32),
    }
    with pytest.raises(NotImplementedError):
        r.apply(r.current_params(), data, jax.random.key(0))
