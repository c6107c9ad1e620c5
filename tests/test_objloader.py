"""obj/mtl loader tests — the reference's classification rules
(``thirdpartywrapper.cpp:65-97``) and the tinyobj-equivalent parse subset."""

import os
import textwrap

import numpy as np

from mcpt import types
from mcpt.io.objloader import classify_materials, load_object, parse_mtl


def _write(tmp_path, name, content):
    p = os.path.join(tmp_path, name)
    with open(p, "w") as f:
        f.write(textwrap.dedent(content))
    return p


def test_load_simple_obj(tmp_path):
    tmp = str(tmp_path)
    _write(
        tmp,
        "m.mtl",
        """
        newmtl red
        Kd 0.9 0.1 0.1
        newmtl lamp
        Ka 5 5 5
        """,
    )
    _write(
        tmp,
        "s.obj",
        """
        mtllib m.mtl
        v 0 0 0
        v 1 0 0
        v 1 1 0
        v 0 1 0
        usemtl red
        f 1 2 3 4
        usemtl lamp
        f 1/1 2/2 3/3
        """,
    )
    obj = load_object(tmp, "s.obj")
    # quad fan-triangulates to 2 tris + 1 lamp tri
    assert obj.verts.shape == (3, 3, 3)
    assert obj.mat_id.tolist() == [0, 0, 1]
    assert obj.mtype.tolist() == [types.DIFFUSE, types.LIGHT]
    np.testing.assert_allclose(obj.kd[0], [0.9, 0.1, 0.1])
    np.testing.assert_allclose(obj.ka[1], [5, 5, 5])


def test_negative_indices(tmp_path):
    tmp = str(tmp_path)
    _write(tmp, "s.obj", "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    obj = load_object(tmp, "s.obj")
    assert obj.verts.shape == (1, 3, 3)
    np.testing.assert_allclose(obj.verts[0, 1], [1, 0, 0])


def test_classification_priority():
    """Order matters (thirdpartywrapper.cpp:65-97): Ni≠1 wins over Ka>0 wins
    over Ns≠1 wins over diffuse."""
    from mcpt.io.objloader import RawMaterial

    mats = [
        RawMaterial("glassy_light", Ka=(1, 1, 1), Ni=1.5),  # → TRANSPARENT
        RawMaterial("lit_gloss", Ka=(0.1, 0, 0), Ns=50.0),  # → LIGHT
        RawMaterial("gloss", Ks=(1, 1, 1), Kd=(0.2, 0.2, 0.2), Ns=98.0),  # GLOSSY
        RawMaterial("plain", Kd=(0.5, 0.5, 0.5)),  # → DIFFUSE
    ]
    mtype, kd, ks, ka, ns, ni = classify_materials(mats)
    assert mtype.tolist() == [
        types.TRANSPARENT,
        types.LIGHT,
        types.GLOSSY,
        types.DIFFUSE,
    ]
    assert ni[0] == 1.5
    assert ns[2] == 98.0


def test_shipped_cbox_mtl_parses():
    """The reference's Scene/cbox/cbox.mtl must classify exactly as the
    reference loader would."""
    path = "/root/reference/Scene/cbox/cbox.mtl"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference scene not mounted")
    mats = parse_mtl(path)
    byname = {m.name: m for m in mats}
    assert set(byname) == {
        "cbox:blue", "cbox:glass", "cbox:light", "cbox:red", "cbox:silver",
        "cbox:white",
    }
    mtype, kd, ks, ka, ns, ni = classify_materials(mats)
    expect = {
        "cbox:blue": types.DIFFUSE,
        "cbox:glass": types.TRANSPARENT,
        "cbox:light": types.LIGHT,
        "cbox:red": types.DIFFUSE,
        "cbox:silver": types.GLOSSY,
        "cbox:white": types.DIFFUSE,
    }
    for i, m in enumerate(mats):
        assert mtype[i] == expect[m.name], m.name
