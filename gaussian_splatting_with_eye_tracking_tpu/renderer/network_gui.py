"""Non-blocking TCP viewer bridge (reference gaussian_renderer/network_gui.py).

Speaks the SIBR remote-viewer protocol: the viewer connects to
``<ip>:<port>``, sends a 4-byte little-endian length + JSON message
describing the requested view (resolution, fovs, view/proj matrices,
training toggles), and receives raw RGB bytes of the rendered frame plus a
JSON trailer with the source path. Polled once per training iteration
(reference train.py:52-65); connection failures reset the socket silently.
"""

from __future__ import annotations

import json
import socket
import struct
import traceback
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gaussian_splatting_with_eye_tracking_tpu.scene.cameras import MiniCam


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None

    def try_connect(self):
        try:
            self.conn, _ = self.listener.accept()
            self.conn.settimeout(None)
        except Exception:
            pass

    def _read_exact(self, n: int) -> bytes:
        # recv may return fewer bytes than asked (TCP stream semantics) —
        # loop the 4-byte header read like the body read, and treat a
        # zero-length recv (peer closed) as a disconnect rather than
        # silently parsing a short buffer
        data = b""
        while len(data) < n:
            part = self.conn.recv(n - len(data))
            if not part:
                raise ConnectionError("viewer disconnected")
            data += part
        return data

    def _read(self) -> dict:
        msg_len = struct.unpack("I", self._read_exact(4))[0]
        return json.loads(self._read_exact(msg_len).decode("utf-8"))

    def receive(self):
        msg = self._read()
        width = msg["resolution_x"]
        height = msg["resolution_y"]
        if width == 0 or height == 0:
            return None, msg
        fovy = msg["fov_y"]
        fovx = msg["fov_x"]
        znear = msg["z_near"]
        zfar = msg["z_far"]
        view = np.reshape(np.array(msg["view_matrix"]), (4, 4)).T
        full_proj = np.reshape(np.array(msg["view_projection_matrix"]), (4, 4)).T
        cam = MiniCam(width, height, fovy, fovx, znear, zfar, view, full_proj)
        return cam, msg

    def send(self, image_bytes: Optional[bytes], source_path: str):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(source_path).to_bytes(4, "little"))
        self.conn.sendall(source_path.encode())

    def poll(self, state, scene, pipe, iteration, max_iterations):
        """One train-loop poll (reference train.py:52-65)."""
        from gaussian_splatting_with_eye_tracking_tpu import train_lib

        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                cam, msg = self.receive()
                do_training = bool(msg.get("train", True))
                scaling = msg.get("scaling_modifier", 1.0)
                img_bytes = None
                if cam is not None:
                    import jax

                    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
                    render = train_lib.make_eval_render(
                        scene.max_sh_degree, cam.width, cam.height, impl=impl
                    )
                    bg = jnp.zeros(3)
                    # reference train.py:55 passes the viewer's slider value
                    # into render as scaling_modifer; traced arg, so slider
                    # changes do not recompile
                    img = render(state, *train_lib.camera_arrays(cam.params()),
                                 bg, float(scaling))
                    img_bytes = bytes(
                        np.asarray(
                            jnp.clip(img, 0, 1).transpose(1, 2, 0) * 255
                        ).astype(np.uint8)
                    )
                self.send(img_bytes, scene.info.ply_path and scene.model_path or "")
                keep_alive = bool(msg.get("keep_alive", False))
                # reference train.py:60: keep serving while paused
                # (train=False), and after the last iteration keep the
                # session open only if the viewer asked to keep_alive
                if do_training and (iteration < max_iterations or not keep_alive):
                    break
            except Exception:
                self.conn = None
        return
