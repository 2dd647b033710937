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
