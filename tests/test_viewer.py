"""SIBR viewer bridge: loopback-socket protocol test (the reference's
lib/models/network_gui.py is wired nowhere and untested; here the
protocol is exercised end-to-end against a fake viewer client)."""

import json
import socket
import threading

import numpy as np
import pytest


def _client_message(H, W):
    import math

    # SIBR sends the transposed world->view matrix with y/z columns
    # negated (ref: lib/models/network_gui.py:73-76)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 4.0
    wvt = w2c.T.copy()
    wvt[:, 1] *= -1
    wvt[:, 2] *= -1
    return {
        "resolution_x": W,
        "resolution_y": H,
        "fov_x": math.radians(60),
        "fov_y": math.radians(40),
        "z_near": 0.01,
        "z_far": 100.0,
        "train": True,
        "keep_alive": False,
        "scaling_modifier": 1.0,
        "view_matrix": wvt.reshape(-1).tolist(),
        "view_projection_matrix": np.eye(4, dtype=np.float32).reshape(-1).tolist(),
    }


def _send_json(sock, obj):
    data = json.dumps(obj).encode("utf-8")
    sock.sendall(len(data).to_bytes(4, "little"))
    sock.sendall(data)


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        assert chunk, "server closed early"
        buf += chunk
    return buf


def test_network_gui_protocol_roundtrip():
    from street_gaussians_tpu import network_gui as gui

    gui.init("127.0.0.1", 0)  # ephemeral port
    port = gui.listener.getsockname()[1]
    H, W = 24, 32

    client = socket.create_connection(("127.0.0.1", port))
    try:
        assert gui.try_connect()
        _send_json(client, _client_message(H, W))

        cam, do_training, keep_alive, scaling = gui.receive()
        assert cam is not None and cam.H == H and cam.W == W
        assert do_training is True and keep_alive is False
        assert abs(scaling - 1.0) < 1e-6
        # camera center must be the inverse-transform translation
        np.testing.assert_allclose(
            np.asarray(cam.cam_center), [0.0, 0.0, -4.0], atol=1e-5
        )

        rgb = np.zeros((H, W, 3), np.float32)
        rgb[..., 0] = 0.5
        gui.send_image(rgb, verify="ok")

        img = np.frombuffer(_recv_exact(client, H * W * 3), np.uint8)
        assert img.reshape(H, W, 3)[..., 0].min() == 127
        n = int.from_bytes(_recv_exact(client, 4), "little")
        assert _recv_exact(client, n) == b"ok"
    finally:
        client.close()
        gui.disconnect()
        gui.listener.close()
        gui.listener = None


def test_viewer_bridge_serves_render():
    """ViewerBridge.poll: receive a camera, render the toy scene with
    current params, stream bytes back, and yield on 'train'."""
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from street_gaussians_tpu import network_gui as gui
    from street_gaussians_tpu import train_lib
    from street_gaussians_tpu.config import default_config
    from street_gaussians_tpu.runner import ViewerBridge

    scene, params, opts = ge._toy_setup(num_actors=1)
    cfg = default_config()
    cfg.viewer.port = 0
    cfg.source_path = "/tmp/x"

    class FakeView:
        frame_input = scene.frames[0]

    bridge = ViewerBridge.__new__(ViewerBridge)
    bridge.gui = gui
    bridge.cfg = cfg
    bridge.scene = scene
    bridge.opts = opts
    bridge._render_cache = {}
    gui.init("127.0.0.1", 0)
    port = gui.listener.getsockname()[1]

    state = train_lib.init_train_state(params, scene.aux)
    H, W = 16, 16
    result = {}

    def client_thread():
        c = socket.create_connection(("127.0.0.1", port))
        _send_json(c, _client_message(H, W))
        img = _recv_exact(c, H * W * 3)
        n = int.from_bytes(_recv_exact(c, 4), "little")
        verify = _recv_exact(c, n)
        result["img"] = img
        result["verify"] = verify
        c.close()

    t = threading.Thread(target=client_thread)
    t.start()
    try:
        # poll until the client connects and is served (train=True,
        # keep_alive=False -> poll returns after one message)
        for _ in range(100):
            bridge.poll(state, FakeView, training_done=False)
            if "img" in result or not t.is_alive():
                break
        t.join(timeout=10)
        assert not t.is_alive()
        assert len(result["img"]) == H * W * 3
        assert result["verify"] == b"/tmp/x"
    finally:
        gui.disconnect()
        if gui.listener is not None:
            gui.listener.close()
            gui.listener = None
