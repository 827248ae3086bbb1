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


def test_bridge_matches_reference_transcript():
    """Replay the recorded REFERENCE network_gui session (byte stream
    captured from the reference's own code running under CPU torch —
    `scripts/record_sibr_transcript.py`) against the TPU bridge: every
    reply byte must match, and the converted camera matrices must equal
    what the reference handed its MiniCam (transposed into our math
    convention)."""
    import os

    fix_path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "sibr_transcript.json")
    with open(fix_path) as f:
        fix = json.load(f)
    msgs = [bytes.fromhex(h) for h in fix["client_messages_hex"]]
    expected_reply = bytes.fromhex(fix["server_reply_hex"])

    port = PORT + 100
    network_gui.init("127.0.0.1", port)
    assert network_gui.listener is not None

    cams = []

    def render_fn(cam, scaling_modifier):
        cams.append((cam, scaling_modifier))
        # same deterministic pattern the recorder rendered (HWC here)
        x = np.arange(cam.width)[None, :, None]
        y = np.arange(cam.height)[:, None, None]
        c = np.arange(3)[None, None, :]
        k = (x * 7 + y * 13 + c * 29) % 255
        return ((k + 0.5) / 255.0).astype(np.float32)

    reply_chunks = []

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        for m in msgs:
            s.sendall(m)
        s.shutdown(socket.SHUT_WR)
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break
            reply_chunks.append(chunk)
        s.close()

    t = threading.Thread(target=client)
    t.start()
    import time
    deadline = time.time() + 30
    while len(cams) < 3 and time.time() < deadline:
        network_gui.serve_once(render_fn, fix["verify"])
        time.sleep(0.005)
    if network_gui.conn is not None:
        network_gui.conn.close()
    t.join(timeout=10)
    assert not t.is_alive()

    got = b"".join(reply_chunks)
    assert got == expected_reply, (
        f"reply stream diverges from the reference transcript: "
        f"{len(got)} vs {len(expected_reply)} bytes, first diff at "
        f"{next((i for i, (a, b) in enumerate(zip(got, expected_reply)) if a != b), -1)}")

    # camera conversion parity: reference stores transposed row-vector
    # matrices; ours are math convention -> equal after .T
    assert len(cams) == len(fix["minicams"])
    for (cam, scale), ref in zip(cams, fix["minicams"]):
        assert cam.width == ref["width"] and cam.height == ref["height"]
        np.testing.assert_allclose(
            cam.world_view_transform,
            np.array(ref["world_view_transform"],
                     np.float32).reshape(4, 4).T, atol=1e-6)
        np.testing.assert_allclose(
            cam.full_proj_transform,
            np.array(ref["full_proj_transform"],
                     np.float32).reshape(4, 4).T, atol=1e-6)
    network_gui.listener.close()
    network_gui.listener = None
    network_gui.conn = None
