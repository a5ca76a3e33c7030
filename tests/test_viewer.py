"""Interactive viewer server: HTTP endpoints + scene wire format + options
roundtrip (the browser/WebGL side is exercised manually; CI asserts the
protocol the page consumes)."""

import json
import struct
import urllib.request

import numpy as np
import pytest

from taichislam_tpu.utils.viewer_server import (
    _MAGIC, InteractiveRender, ViewerServer)


@pytest.fixture()
def render():
    r = InteractiveRender(port=0, announce=False)
    yield r
    r.close()


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as f:
        return f.read()


def _parse_scene(blob):
    magic, version = struct.unpack_from("<II", blob, 0)
    assert magic == _MAGIC
    off, sections = 8, {}
    while off + 8 <= len(blob):
        tag, ln = struct.unpack_from("<II", blob, off)
        off += 8
        sections.setdefault(tag, []).append(
            np.frombuffer(blob, np.float32, ln // 4, off))
        off += ln
    return version, sections


def test_viewer_page_and_scene_roundtrip(render):
    url = render.server.url
    page = _get(url).decode()
    # self-contained WebGL page: no external scripts, orbit controls inline
    assert "scene.bin" in page and "webgl" in page
    assert "http" not in page.split("</title>")[1]  # fully offline

    par = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]], np.float32)
    col = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    render.set_particles(par, col)
    render.set_mesh(np.zeros((6, 3), np.float32),
                    np.full((6, 3), 0.5, np.float32), mesh_num=2)
    render.set_drone_pose(1, np.eye(3), np.array([1.0, 2.0, 3.0]))
    render.set_drone_trajectory(1, np.array([[0, 0, 0], [1, 1, 1]],
                                            np.float32))
    render.set_skeleton_graph_edges(np.array([[0, 0, 0], [0, 0, 1]],
                                             np.float32))
    render.rendering()

    v0 = json.loads(_get(url + "version"))["version"]
    assert v0 == 1
    version, sections = _parse_scene(_get(url + "scene.bin"))
    assert version == 1
    np.testing.assert_allclose(sections[1][0].reshape(-1, 3), par)
    np.testing.assert_allclose(sections[2][0].reshape(-1, 3), col)
    assert sections[3][0].size == 18          # mesh vertices
    pose = sections[7][0]
    assert pose[0] == 1.0 and tuple(pose[10:13]) == (1.0, 2.0, 3.0)
    traj = sections[8][0]
    assert traj[0] == 1.0 and traj[1] == 2.0
    assert sections[9][0][0] == pytest.approx(render.particle_radius)

    # rendering again bumps the version (client polls /version cheaply)
    render.rendering()
    assert json.loads(_get(url + "version"))["version"] == 2


def test_viewer_options_roundtrip(render):
    """The browser panel POSTs options; rendering() pulls them back into the
    attributes node code reads (reference options(),
    visualization.py:124-141)."""
    url = render.server.url
    body = json.dumps({"particle_radius": 0.05, "slice_z": 1.5,
                       "disp_mesh": False, "enable_mesher": False,
                       "lock_pos_drone": True}).encode()
    req = urllib.request.Request(url + "options", data=body, method="POST")
    with urllib.request.urlopen(req, timeout=5) as f:
        assert f.status == 200
    render.rendering()
    assert render.particle_radius == pytest.approx(0.05)
    assert render.slice_z == pytest.approx(1.5)
    assert render.disp_mesh is False
    assert render.enable_mesher is False
    assert render.lock_pos_drone is True
    assert render.disp_particles is True  # untouched

    # unknown keys ignored, malformed JSON rejected without crashing
    req = urllib.request.Request(url + "options", data=b"{bad",
                                 method="POST")
    try:
        urllib.request.urlopen(req, timeout=5)
    except urllib.error.HTTPError as e:
        assert e.code == 400
    assert json.loads(_get(url + "options"))["slice_z"] == 1.5


def test_softrender_pixels(render):
    """The software mirror of the WebGL page (utils/viewer_softrender.py —
    same scene parser, camera, shading; see its docstring for why no real
    browser can run here) must render every scene element to visible
    pixels, pinning the served wire format end-to-end."""
    from taichislam_tpu.utils.viewer_softrender import (
        CLEAR, fetch_and_render, parse_scene, render as soft_render)

    th = np.linspace(0, 2 * np.pi, 512, endpoint=False)
    par = np.stack([1.5 * np.cos(th), 1.5 * np.sin(th),
                    0 * th], -1).astype(np.float32)
    col = np.stack([th / th.max(), 1 - th / th.max(),
                    0 * th], -1).astype(np.float32)
    tri = np.array([[-1, -1, 1], [1, -1, 1], [0, 1, 1]], np.float32)
    render.set_particles(par, col)
    render.set_mesh(tri, np.full((3, 3), 0.8, np.float32),
                    np.tile([0, 0, 1.0], (3, 1)).astype(np.float32))
    render.set_drone_pose(0, np.eye(3, dtype=np.float32),
                          np.array([0, -2.0, 0.5], np.float32))
    render.rendering()

    scene, img = fetch_and_render(render.server.url, w=400, h=300)
    assert scene.version == 1 and len(scene.par) == 512
    nonbg = np.abs(img - CLEAR).max(-1) > 0.01
    assert nonbg.mean() > 0.01            # something rendered
    # each element contributes: render with elements toggled off and
    # assert the pixel footprint shrinks
    img_nopts = soft_render(scene, w=400, h=300, disp_particles=False)
    img_nomesh = soft_render(scene, w=400, h=300, disp_mesh=False)
    n_all = int(nonbg.sum())
    n_nopts = int((np.abs(img_nopts - CLEAR).max(-1) > 0.01).sum())
    n_nomesh = int((np.abs(img_nomesh - CLEAR).max(-1) > 0.01).sum())
    assert n_nopts < n_all and n_nomesh < n_all
    # deterministic: same scene renders to the same checksum
    import hashlib
    h1 = hashlib.sha256(
        (np.clip(img, 0, 1) * 255).astype(np.uint8).tobytes()).hexdigest()
    _, img2 = fetch_and_render(render.server.url, w=400, h=300)
    h2 = hashlib.sha256(
        (np.clip(img2, 0, 1) * 255).astype(np.uint8).tobytes()).hexdigest()
    assert h1 == h2
