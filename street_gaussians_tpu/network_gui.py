"""SIBR remote-viewer TCP protocol.

Port of the reference's `network_gui` (ref: lib/models/network_gui.py:
26-85, the standard 3DGS viewer bridge — dormant in the reference's
train loop but a first-class capability): a non-blocking listener that
receives JSON camera messages (`{resolution_x/y, fov_x/y, z_near/far,
view_matrix, view_projection_matrix, ...}`) and replies with raw RGB
bytes + a verification string.

The camera arrives as transposed row-major torch-style matrices with
the SIBR y/z flips (network_gui.py:73-76); `camera_from_message`
converts to this framework's un-transposed math convention
(utils/camera.py docstring) and returns a renderable CameraJax.
"""

from __future__ import annotations

import json
import socket
import traceback
from typing import Optional, Tuple

import numpy as np

from street_gaussians_tpu.utils.camera import CameraJax

host = "127.0.0.1"
port = 6009

conn: Optional[socket.socket] = None
addr = None
listener: Optional[socket.socket] = None


def init(wish_host: str = host, wish_port: int = port) -> None:
    global host, port, listener
    host, port = wish_host, wish_port
    listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    listener.bind((host, port))
    listener.listen()
    listener.settimeout(0)


def try_connect() -> bool:
    global conn, addr
    if listener is None:
        return False
    try:
        conn, addr = listener.accept()
        print(f"\nConnected by {addr}")
        conn.settimeout(None)
        return True
    except Exception:
        return False


def _read_exact(n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("viewer disconnected")
        buf += chunk
    return buf


def read() -> dict:
    n = int.from_bytes(_read_exact(4), "little")
    return json.loads(_read_exact(n).decode("utf-8"))


def send(image_bytes: Optional[bytes], verify: str) -> None:
    if image_bytes is not None:
        conn.sendall(image_bytes)
    conn.sendall(len(verify).to_bytes(4, "little"))
    conn.sendall(bytes(verify, "ascii"))


def camera_from_message(message: dict) -> Optional[CameraJax]:
    """JSON message -> CameraJax (ref: network_gui.py:57-81 receive)."""
    width = message["resolution_x"]
    height = message["resolution_y"]
    if width == 0 or height == 0:
        return None
    fovy = message["fov_y"]
    fovx = message["fov_x"]
    # SIBR sends the TRANSPOSED world->view matrix with y/z columns
    # negated (network_gui.py:73-75); undo both.
    wvt = np.array(message["view_matrix"], np.float32).reshape(4, 4)
    wvt[:, 1] *= -1
    wvt[:, 2] *= -1
    w2c = wvt.T  # un-transpose to the math convention

    fx = width / (2.0 * np.tan(fovx / 2.0))
    fy = height / (2.0 * np.tan(fovy / 2.0))
    K = np.array(
        [[fx, 0, width / 2.0], [0, fy, height / 2.0], [0, 0, 1]], np.float32
    )
    from street_gaussians_tpu.utils.camera import make_camera

    return make_camera(
        K,
        w2c,
        int(height),
        int(width),
        znear=message.get("z_near", 0.01),
        zfar=message.get("z_far", 100.0),
    )


def receive() -> Tuple[Optional[CameraJax], Optional[bool], Optional[bool], Optional[float]]:
    """-> (camera, do_training, keep_alive, scaling_modifier)."""
    message = read()
    try:
        cam = camera_from_message(message)
    except Exception:
        traceback.print_exc()
        raise
    if cam is None:
        return None, None, None, None
    return (
        cam,
        bool(message.get("train", False)),
        bool(message.get("keep_alive", True)),
        float(message.get("scaling_modifier", 1.0)),
    )


def send_image(rgb: "np.ndarray", verify: str = "") -> None:
    """rgb [H, W, 3] float in [0,1] -> raw bytes to the viewer."""
    data = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
    send(memoryview(data).tobytes(), verify)


def disconnect() -> None:
    global conn
    if conn is not None:
        conn.close()
        conn = None
