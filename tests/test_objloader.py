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


def test_write_load_small_roundtrip(tmp_path):
    """write_object → load_object reproduces every array bit-for-bit."""
    from mcpt.io.objloader import write_object
    from mcpt.scenes import veach_mis

    loaded, _ = veach_mis()
    write_object(loaded, str(tmp_path), "veach.obj")
    back = load_object(str(tmp_path), "veach.obj", use_native="never")
    np.testing.assert_array_equal(back.verts, loaded.verts)
    np.testing.assert_array_equal(back.mat_id, loaded.mat_id)
    np.testing.assert_array_equal(back.mtype, loaded.mtype)
    # classification-relevant constants survive (fields the 4-way rules drop —
    # e.g. kd of a LIGHT — are zero-valued on both sides by construction)
    for f in ("kd", "ks", "ka", "ni"):
        np.testing.assert_array_equal(getattr(back, f), getattr(loaded, f))
    glossy = loaded.mtype == types.GLOSSY
    np.testing.assert_array_equal(back.ns[glossy], loaded.ns[glossy])


def test_reference_scale_obj_roundtrip(tmp_path):
    """Reference-scale ingestion (VERDICT r2 item 6): a 100k-tri scene dumped
    to a real .obj/.mtl on disk loads back IDENTICALLY through BOTH loaders —
    the tinyobj-scale workload of ``thirdpartywrapper.cpp:25-99`` (the
    reference's gitignored testall suite, ``config.json:157-192``)."""
    import time

    from mcpt.io.objloader import write_object
    from mcpt.scenes import boxfield

    loaded, _ = boxfield(9000)
    n = loaded.verts.shape[0]
    assert n > 100_000
    t0 = time.time()
    write_object(loaded, str(tmp_path), "boxfield.obj")
    t_write = time.time() - t0

    t0 = time.time()
    py = load_object(str(tmp_path), "boxfield.obj", use_native="never")
    t_py = time.time() - t0
    np.testing.assert_array_equal(py.verts, loaded.verts)
    np.testing.assert_array_equal(py.mat_id, loaded.mat_id)
    np.testing.assert_array_equal(py.mtype, loaded.mtype)

    from mcpt import native

    if native.available():
        t0 = time.time()
        nat = load_object(str(tmp_path), "boxfield.obj", use_native="always")
        t_nat = time.time() - t0
        for f in ("verts", "mat_id", "mtype", "kd", "ks", "ka", "ns", "ni"):
            np.testing.assert_array_equal(
                getattr(nat, f), getattr(py, f), err_msg=f
            )
        print(f"\n108k-tri obj: write {t_write:.2f}s, python load {t_py:.2f}s,"
              f" native load {t_nat:.2f}s")
    else:
        print(f"\n108k-tri obj: write {t_write:.2f}s, python load {t_py:.2f}s"
              " (native unavailable)")


def test_render_from_obj_file_config(tmp_path):
    """End-to-end file-path form (reference config entry 3: directory+objname,
    ``config.json:58-84``): write a scene file, point a config.json at it,
    and drive one frame through ``tools/render.py`` main()."""
    import json
    import sys

    from mcpt.io.objloader import write_object
    from mcpt.scenes import boxfield

    loaded, camcfg = boxfield(60)  # 732 tris — file-path plumbing, CPU-fast
    write_object(loaded, str(tmp_path), "field.obj")
    cfg = {
        "configid": 0,
        "config": [
            {
                "directory": str(tmp_path),
                "objname": "field.obj",
                "width": 32,
                "height": 32,
                "maxdepth": 3,
                "attempt": 1,
                "camera": {
                    "position": list(map(float, camcfg.position)),
                    "lookat": list(map(float, camcfg.lookat)),
                    "up": list(map(float, camcfg.up)),
                    "fov": float(camcfg.fov),
                },
                # XLA wavefront/bvh path: CPU-native (no Pallas interpreter)
                "intersector": "bvh",
                "engine": "wavefront",
            }
        ],
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    sys.path.insert(0, "/root/repo/tools")
    import render as render_cli

    out = tmp_path / "out"
    rc = render_cli.main([
        "--config", str(cfg_path), "--out", str(out),
    ])
    assert rc == 0
    assert (out / "field.hdr").exists()
    from mcpt.io.image import read_hdr

    img = read_hdr(str(out / "field.hdr"))
    assert img.shape == (32, 32, 3)
    assert float(img.mean()) > 0.0
