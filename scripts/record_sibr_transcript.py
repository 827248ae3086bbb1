#!/usr/bin/env python3
"""Record a golden byte transcript of the REFERENCE SIBR network_gui session
(VERDICT r3 task 8).

Runs the reference's own `gaussian_renderer/network_gui.py` (read-only, under
CPU torch with `.cuda()` patched to a no-op and `scene.cameras.MiniCam`
stubbed to capture its args) against a synthetic SIBR-style client, and
records:

* every client→server message exactly as sent (the SIBR wire format:
  4-byte LE length + JSON),
* every byte the reference server emits in reply (raw H·W·3 u8 image +
  length-prefixed verify string),
* the post-conversion camera matrices the reference hands its MiniCam.

The fixture (`tests/fixtures/sibr_transcript.json`) is then replayed against
the TPU bridge by `tests/test_viewer.py::test_bridge_matches_reference_
transcript` — replacing the round-3 self-loopback test with a recorded
reference protocol check.

The deterministic render pattern is shared with the test: byte value
(x·7 + y·13 + c·29) mod 255, carried as (k+0.5)/255 floats so the
clamp·255→byte truncation on both stacks lands on exactly k.
"""
import importlib.util
import json
import math
import os
import socket
import sys
import threading
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/fs3dgs_benchmark/gaussian-splatting"
PORT = 16411
VERIFY = "/data/scenes/lego"


def load_reference_network_gui():
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU stand-in

    captured = []

    class MiniCamStub:
        def __init__(self, width, height, fovy, fovx, znear, zfar,
                     world_view_transform, full_proj_transform):
            self.image_width = width
            self.image_height = height
            captured.append({
                "width": width, "height": height, "fovy": fovy,
                "fovx": fovx, "znear": znear, "zfar": zfar,
                "world_view_transform":
                    world_view_transform.numpy().reshape(-1).tolist(),
                "full_proj_transform":
                    full_proj_transform.numpy().reshape(-1).tolist(),
            })

    scene_mod = types.ModuleType("scene")
    cam_mod = types.ModuleType("scene.cameras")
    cam_mod.MiniCam = MiniCamStub
    scene_mod.cameras = cam_mod
    sys.modules["scene"] = scene_mod
    sys.modules["scene.cameras"] = cam_mod

    spec = importlib.util.spec_from_file_location(
        "ref_network_gui",
        os.path.join(REF, "gaussian_renderer/network_gui.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, captured


def pattern_image_chw(width, height):
    """torch (3,H,W) float render stand-in (reference train.py:85-90 takes
    render()['render'] in CHW and permutes to HWC before sending)."""
    import torch
    x = np.arange(width)[None, None, :]
    y = np.arange(height)[None, :, None]
    c = np.arange(3)[:, None, None]
    k = (x * 7 + y * 13 + c * 29) % 255
    return torch.from_numpy(((k + 0.5) / 255.0).astype(np.float32))


def client_messages():
    def msg(**kw):
        base = {
            "resolution_x": 0, "resolution_y": 0, "train": False,
            "fov_y": math.radians(45.0), "fov_x": math.radians(60.0),
            "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False,
            "keep_alive": True, "scaling_modifier": 1.0,
            "view_matrix": np.eye(4, dtype=np.float32).reshape(-1).tolist(),
            "view_projection_matrix":
                np.eye(4, dtype=np.float32).reshape(-1).tolist(),
        }
        base.update(kw)
        raw = json.dumps(base).encode("utf-8")
        return len(raw).to_bytes(4, "little") + raw

    # a nontrivial SIBR-style camera: rotation about y + translation, in the
    # viewer's transposed row-vector convention
    th = 0.35
    R = np.array([[math.cos(th), 0, math.sin(th)],
                  [0, 1, 0],
                  [-math.sin(th), 0, math.cos(th)]], np.float32)
    V = np.eye(4, dtype=np.float32)
    V[:3, :3] = R
    V[3, :3] = [0.2, -0.1, 3.0]          # row-vector convention: T in row 3
    P = np.array([[1.2, 0, 0, 0],
                  [0, 1.6, 0, 0],
                  [0, 0, 1.01, 1.0],
                  [0, 0, -0.0101, 0]], np.float32)
    VP = V @ P

    return [
        msg(resolution_x=64, resolution_y=48),                 # plain render
        msg(resolution_x=32, resolution_y=24, train=False,
            scaling_modifier=0.7,
            view_matrix=V.reshape(-1).tolist(),
            view_projection_matrix=VP.reshape(-1).tolist()),   # real camera
        msg(),                                                 # width=0 ping
        msg(resolution_x=16, resolution_y=16, train=True),     # resume train
    ]


def main():
    import torch
    gui, captured = load_reference_network_gui()
    gui.init("127.0.0.1", PORT)

    msgs = client_messages()
    reply_chunks = []

    def client():
        s = socket.create_connection(("127.0.0.1", PORT), timeout=10)
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

    # the reference training loop's viewer block (train.py:82-95)
    import time
    while gui.conn is None:
        gui.try_connect()
        time.sleep(0.01)
    served = 0
    while gui.conn is not None and served < len(msgs):
        net_image_bytes = None
        (custom_cam, do_training, _shs, _rot, keep_alive,
         scaling_modifier) = gui.receive()
        if custom_cam is not None:
            net_image = pattern_image_chw(custom_cam.image_width,
                                          custom_cam.image_height)
            net_image_bytes = memoryview(
                (torch.clamp(net_image, min=0, max=1.0) * 255).byte()
                .permute(1, 2, 0).contiguous().cpu().numpy())
        gui.send(net_image_bytes, VERIFY)
        served += 1
        if do_training:
            break
    gui.conn.close()
    t.join(timeout=10)
    assert not t.is_alive()

    fixture = {
        "recorded_from": "reference gaussian_renderer/network_gui.py "
                         "(CPU torch, MiniCam stubbed) — see "
                         "scripts/record_sibr_transcript.py",
        "verify": VERIFY,
        "client_messages_hex": [m.hex() for m in msgs],
        "server_reply_hex": b"".join(reply_chunks).hex(),
        "minicams": captured,
    }
    out = os.path.join(REPO, "tests/fixtures/sibr_transcript.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(fixture, f, indent=1)
    total = len(fixture["server_reply_hex"]) // 2
    print(f"wrote {out}: {len(msgs)} messages, {total} reply bytes, "
          f"{len(captured)} cameras captured")


if __name__ == "__main__":
    main()
