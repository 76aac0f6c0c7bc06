"""Network GUI bridge: end-to-end protocol test over a real local socket
(reference gaussian_renderer/network_gui.py + train.py:52-65)."""

import json
import socket
import struct
import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_with_eye_tracking_tpu.config import OptimizationConfig
from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
from gaussian_splatting_with_eye_tracking_tpu.renderer.network_gui import NetworkGUI
from tests.helpers import make_camera


class FakeScene:
    def __init__(self, state):
        self.max_sh_degree = 0
        self.gaussians = state
        self.model_path = "/tmp/fake_model"

        class Info:
            ply_path = "x"

        self.info = Info()


def send_view_request(port, width=32, height=32, train=False):
    cam = make_camera(width, height)
    view_colmajor = np.asarray(cam.viewmatrix).T.ravel().tolist()
    proj_colmajor = np.asarray(cam.projmatrix).T.ravel().tolist()
    msg = {
        "resolution_x": width, "resolution_y": height,
        "fov_y": 1.0, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
        "train": train, "shs_python": False, "rot_scale_python": False,
        "keep_alive": False, "scaling_modifier": 1.0,
        "view_matrix": view_colmajor,
        "view_projection_matrix": proj_colmajor,
    }
    payload = json.dumps(msg).encode()
    # 60 s: the first poll jit-compiles the eval render (~10-25 s on CPU);
    # a 10 s recv timeout raced that compile and flaked ~15% of runs
    s = socket.create_connection(("127.0.0.1", port), timeout=60)
    s.sendall(struct.pack("I", len(payload)))
    s.sendall(payload)
    img = b""
    want = width * height * 3
    while len(img) < want:
        chunk = s.recv(want - len(img))
        if not chunk:
            break
        img += chunk
    ln = struct.unpack("I", s.recv(4))[0]
    trailer = s.recv(ln)
    s.close()
    return img, trailer


class TestNetworkGUI:
    def test_request_render_roundtrip(self):
        rng = np.random.default_rng(0)
        state, tx = gm.create_from_points(
            rng.normal(scale=0.5, size=(40, 3)).astype(np.float32),
            rng.uniform(size=(40, 3)).astype(np.float32),
            0, OptimizationConfig(), 1.0, capacity=64,
        )
        gui = NetworkGUI("127.0.0.1", 0)
        port = gui.listener.getsockname()[1]
        scene = FakeScene(state)

        result = {}

        def client():
            result["img"], result["trailer"] = send_view_request(port)

        t = threading.Thread(target=client)
        t.start()
        # Poll like the train loop does until the client is served. A fixed
        # poll count races the client thread's connect under load (100 fast
        # polls can complete before the OS even schedules the client), so
        # keep polling while the client is alive, bounded by a deadline.
        deadline = time.time() + 120
        while t.is_alive() and time.time() < deadline:
            gui.poll(state, scene, None, iteration=1, max_iterations=10)
        t.join(timeout=60)
        assert not t.is_alive()
        assert len(result["img"]) == 32 * 32 * 3
        arr = np.frombuffer(result["img"], np.uint8).reshape(32, 32, 3)
        assert arr.max() >= 0  # valid image bytes

    def test_full_session_pause_resume_disconnect(self):
        """Multi-message SIBR session over ONE connection (VERDICT item):
        paused viewer (train=False) is served repeatedly WITHIN a single
        poll, changing resolution mid-session; train=True releases the
        loop; disconnect resets cleanly and training polls keep working."""
        rng = np.random.default_rng(1)
        state, tx = gm.create_from_points(
            rng.normal(scale=0.5, size=(30, 3)).astype(np.float32),
            rng.uniform(size=(30, 3)).astype(np.float32),
            0, OptimizationConfig(), 1.0, capacity=32,
        )
        gui = NetworkGUI("127.0.0.1", 0)
        port = gui.listener.getsockname()[1]
        scene = FakeScene(state)
        sizes = [(32, 32), (64, 32), (32, 64)]
        result = {"imgs": [], "polls_done": 0}

        def one_request(s, width, height, train):
            cam = make_camera(width, height)
            msg = {
                "resolution_x": width, "resolution_y": height,
                "fov_y": 1.0, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
                "train": train, "shs_python": False,
                "rot_scale_python": False, "keep_alive": False,
                "scaling_modifier": 1.0,
                "view_matrix": np.asarray(cam.viewmatrix).T.ravel().tolist(),
                "view_projection_matrix":
                    np.asarray(cam.projmatrix).T.ravel().tolist(),
            }
            payload = json.dumps(msg).encode()
            s.sendall(struct.pack("I", len(payload)))
            s.sendall(payload)
            want = width * height * 3
            img = b""
            while len(img) < want:
                chunk = s.recv(want - len(img))
                assert chunk
                img += chunk
            ln = struct.unpack("I", s.recv(4))[0]
            s.recv(ln)
            return img

        def client():
            s = socket.create_connection(("127.0.0.1", port), timeout=30)
            # paused session: several renders at varying resolution
            for w, h in sizes:
                result["imgs"].append(one_request(s, w, h, train=False))
            # resume training -> poll returns
            result["imgs"].append(one_request(s, 32, 32, train=True))
            s.close()

        t = threading.Thread(target=client)
        t.start()
        # wait for the TCP connect so the poll count below is deterministic
        import time as _time
        for _ in range(200):
            gui.try_connect()
            if gui.conn is not None:
                break
            _time.sleep(0.05)
        assert gui.conn is not None
        polls = 0
        for _ in range(50):
            gui.poll(state, scene, None, iteration=1, max_iterations=10)
            polls += 1
            if not t.is_alive():
                break
        t.join(timeout=30)
        assert not t.is_alive()
        # all 4 renders served; the 3 paused ones within ONE blocking poll
        assert len(result["imgs"]) == 4
        for (w, h), img in zip(sizes, result["imgs"]):
            assert len(img) == w * h * 3
        assert polls <= 2
        # disconnect resets conn; later training polls are non-blocking no-ops
        gui.poll(state, scene, None, iteration=2, max_iterations=10)
        assert gui.conn is None

    def test_scaling_modifier_changes_frame(self):
        """VERDICT item: the viewer's scaling_modifier slider must reach the
        rasterizer (reference train.py:55 passes scaling_modifer into
        render; gaussian_renderer/__init__.py:36-49 builds settings with
        it). A scaling_modifier=0.25 frame must differ from 1.0."""
        rng = np.random.default_rng(2)
        state, tx = gm.create_from_points(
            rng.normal(scale=0.5, size=(40, 3)).astype(np.float32),
            rng.uniform(size=(40, 3)).astype(np.float32),
            0, OptimizationConfig(), 1.0, capacity=64,
        )
        gui = NetworkGUI("127.0.0.1", 0)
        port = gui.listener.getsockname()[1]
        scene = FakeScene(state)
        cam = make_camera(32, 32)
        imgs = {}

        def one_request(s, scaling):
            msg = {
                "resolution_x": 32, "resolution_y": 32,
                "fov_y": 1.0, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
                "train": False, "shs_python": False,
                "rot_scale_python": False, "keep_alive": False,
                "scaling_modifier": scaling,
                "view_matrix": np.asarray(cam.viewmatrix).T.ravel().tolist(),
                "view_projection_matrix":
                    np.asarray(cam.projmatrix).T.ravel().tolist(),
            }
            payload = json.dumps(msg).encode()
            s.sendall(struct.pack("I", len(payload)))
            s.sendall(payload)
            want = 32 * 32 * 3
            img = b""
            while len(img) < want:
                chunk = s.recv(want - len(img))
                assert chunk
                img += chunk
            ln = struct.unpack("I", s.recv(4))[0]
            s.recv(ln)
            return img

        def client():
            s = socket.create_connection(("127.0.0.1", port), timeout=30)
            imgs[1.0] = one_request(s, 1.0)
            imgs[0.25] = one_request(s, 0.25)
            # release the poll loop
            one_request_train = dict()  # noqa: F841 (clarity only)
            s_msg = {
                "resolution_x": 0, "resolution_y": 0, "train": True,
                "keep_alive": False,
            }
            payload = json.dumps(s_msg).encode()
            s.sendall(struct.pack("I", len(payload)))
            s.sendall(payload)
            ln = struct.unpack("I", s.recv(4))[0]
            s.recv(ln)
            s.close()

        t = threading.Thread(target=client)
        t.start()
        for _ in range(200):
            gui.try_connect()
            if gui.conn is not None:
                break
            import time as _time

            _time.sleep(0.05)
        for _ in range(50):
            gui.poll(state, scene, None, iteration=1, max_iterations=10)
            if not t.is_alive():
                break
        t.join(timeout=30)
        assert not t.is_alive()
        a = np.frombuffer(imgs[1.0], np.uint8).astype(np.int32)
        b = np.frombuffer(imgs[0.25], np.uint8).astype(np.int32)
        assert np.abs(a - b).max() > 0, (
            "scaling_modifier had no effect on the rendered frame"
        )
