"""Config schema tests (reference ``config.cpp:70-125`` semantics)."""

import textwrap

import pytest

from mcpt.config import Config, load_config, parse_config_text, strip_json_comments


CFG = textwrap.dedent(
    """
    {
      # top-level comment, like the reference's checked-in config.json
      "config": [
        {
          "bvhtype": "treeletGPU",
          "width": 512, "height": 512,
          "directory": "../Scene/cbox/",
          "objname": "cbox.obj",
          "maxdepth": 16,
          "attempt": 2048,
          # inline comment
          "camera": {
            "position": [278, 273, -800],
            "lookat": [278, 273, -799],
            "up": [0, 1, 0],
            "fov": 39.3077,
            "resolution": [512, 512]
          },
          "opencl": true
        },
        { "testbvh": true, "objname": "a.obj" },
        { "testall": true, "objname": ["a.obj", "b.obj"] }
      ],
      "configid": 0
    }
    """
)


def test_comment_stripping_preserves_strings():
    s = '{"a": "has # hash", "b": 1} # trailing'
    out = strip_json_comments(s)
    assert '"has # hash"' in out
    assert "trailing" not in out


def test_selects_configid_entry():
    cfg = parse_config_text(CFG)
    assert cfg.bvhtype == "treeletGPU"
    assert cfg.width == 512 and cfg.height == 512
    assert cfg.maxdepth == 16 and cfg.attempt == 2048
    assert cfg.camera.fov == pytest.approx(39.3077)
    assert cfg.camera.position == (278, 273, -800)
    assert cfg.objnames == ("cbox.obj",)
    assert cfg.output_stem == "cbox"


def test_explicit_configid_override_and_modes():
    cfg1 = parse_config_text(CFG, configid=1)
    assert cfg1.testbvh and not cfg1.testall
    cfg2 = parse_config_text(CFG, configid=2)
    assert cfg2.testall
    assert cfg2.objnames == ("a.obj", "b.obj")


def test_zero_value_defaults():
    # tryRead semantics (config.cpp:37-66): missing keys → zero values,
    # bvhtype defaults to hlbvh (config.cpp:86-89)
    cfg = parse_config_text('{"config": [{}], "configid": 0}')
    assert cfg.bvhtype == "hlbvh"
    assert cfg.width == 0 and cfg.maxdepth == 0 and cfg.attempt == 0
    assert cfg.camera is None
    assert not cfg.integrator.nee


def test_configid_out_of_range():
    with pytest.raises(ValueError):
        parse_config_text(CFG, configid=17)


def test_repo_config_loads():
    cfg = load_config("config.json", configid=0)
    assert cfg.objname == "procedural:cornell_box"
    cfg4 = load_config("config.json", configid=4)
    assert cfg4.testbvh
