"""Network GUI bridge: end-to-end protocol test over a real local socket
(reference gaussian_renderer/network_gui.py + train.py:52-65)."""

import json
import socket
import struct
import threading

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
    s = socket.create_connection(("127.0.0.1", port), timeout=10)
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
        # poll like the train loop does until the client is served
        for _ in range(100):
            gui.poll(state, scene, None, iteration=1, max_iterations=10)
            if not t.is_alive():
                break
        t.join(timeout=15)
        assert not t.is_alive()
        assert len(result["img"]) == 32 * 32 * 3
        arr = np.frombuffer(result["img"], np.uint8).reshape(32, 32, 3)
        assert arr.max() >= 0  # valid image bytes
