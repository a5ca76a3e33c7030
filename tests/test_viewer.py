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
