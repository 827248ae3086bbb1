"""Loopback test of the SIBR remote-viewer TCP protocol (byte-level):
length-prefixed JSON camera in → raw RGB bytes + verify string out
(reference `gaussian_renderer/network_gui.py:43-55`)."""

import json
import math
import socket
import threading

import numpy as np

from sparse_view_3dgs_pack_tpu.viewer import network_gui

PORT = 16311
W, H = 32, 24


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        assert chunk, "server closed early"
        buf += chunk
    return buf


def test_network_gui_roundtrip():
    network_gui.init("127.0.0.1", PORT)
    assert network_gui.listener is not None, "could not bind loopback port"

    rendered = {}

    def render_fn(cam, scaling_modifier):
        rendered["cam"] = cam
        rendered["scale"] = scaling_modifier
        img = np.zeros((H, W, 3), np.float32)
        img[..., 0] = 1.0          # red frame: recognisable bytes
        return img

    # the exact message layout the SIBR remote viewer sends
    view = np.eye(4, dtype=np.float32)
    proj = np.eye(4, dtype=np.float32)
    msg = json.dumps({
        "resolution_x": W, "resolution_y": H, "train": True,
        "fov_y": math.radians(45), "fov_x": math.radians(60),
        "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": True, "scaling_modifier": 1.0,
        "view_matrix": view.reshape(-1).tolist(),
        "view_projection_matrix": proj.reshape(-1).tolist(),
    }).encode()

    result = {}

    def client():
        s = socket.create_connection(("127.0.0.1", PORT), timeout=5)
        s.sendall(len(msg).to_bytes(4, "little") + msg)
        img = _recv_exact(s, W * H * 3)
        vlen = int.from_bytes(_recv_exact(s, 4), "little")
        verify = _recv_exact(s, vlen).decode("ascii")
        result["img"] = np.frombuffer(img, np.uint8).reshape(H, W, 3)
        result["verify"] = verify
        s.close()

    t = threading.Thread(target=client)
    t.start()
    # poll like the training loop does, until the message is served
    import time
    for _ in range(500):
        keep = network_gui.serve_once(render_fn, "/tmp/model")
        if "cam" in rendered:
            break
        time.sleep(0.01)
    t.join(timeout=5)
    assert not t.is_alive()

    assert result["verify"] == "/tmp/model"
    assert (result["img"][..., 0] == 255).all()
    assert (result["img"][..., 1:] == 0).all()
    assert keep is True
    cam = rendered["cam"]
    assert cam.width == W and cam.height == H
    network_gui.listener.close()
    network_gui.listener = None
    network_gui.conn = None
