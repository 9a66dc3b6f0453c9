"""Live-training GUI socket server — reference gaussian_renderer/network_gui.py.

Non-blocking TCP server polled from the train loop: receives a JSON camera
message {resolution_x/y, fov_y/x, z_near/far, view_matrix,
view_projection_matrix, train flags, scaling_modifier, keep_alive}, renders
one frame, replies with raw RGB bytes + the source-path string — the SIBR
remote viewer protocol (network_gui.py:26-85).
"""
from __future__ import annotations

import json
import socket
import struct
import traceback
from typing import Optional

import numpy as np

host = "127.0.0.1"
port = 6009
listener: Optional[socket.socket] = None
conn: Optional[socket.socket] = None
addr = None


def init(wish_host: str, wish_port: int):
    global host, port, listener
    host = wish_host
    port = wish_port
    listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    listener.bind((host, port))
    listener.listen()
    listener.settimeout(0)


def try_connect():
    global conn, addr
    if listener is None:
        return
    try:
        conn, addr = listener.accept()
        print(f"\nConnected by {addr}")
        conn.settimeout(None)
    except Exception:
        pass


def read() -> Optional[dict]:
    """One JSON message framed by a u32 length (network_gui.py:38-48)."""
    if conn is None:
        return None
    messageLength = conn.recv(4)
    messageLength = int.from_bytes(messageLength, "little")
    message = conn.recv(messageLength)
    return json.loads(message.decode("utf-8"))


def send(message_bytes: Optional[bytes], verify: str):
    if conn is None:
        return
    if message_bytes is not None:
        conn.sendall(message_bytes)
    conn.sendall(len(verify).to_bytes(4, "little"))
    conn.sendall(bytes(verify, "ascii"))


def receive():
    """Parse one camera message -> (MiniCam | None, flags)
    (network_gui.py:57-85)."""
    from gsplat_tpu.core.cameras import MiniCam

    message = read()
    width = message["resolution_x"]
    height = message["resolution_y"]
    if width != 0 and height != 0:
        try:
            do_training = bool(message["train"])
            fovy = message["fov_y"]
            fovx = message["fov_x"]
            znear = message["z_near"]
            zfar = message["z_far"]
            do_shs_python = bool(message["shs_python"])
            do_rot_scale_python = bool(message["rot_scale_python"])
            keep_alive = bool(message["keep_alive"])
            scaling_modifier = message["scaling_modifier"]
            world_view_transform = np.reshape(
                np.array(message["view_matrix"]), (4, 4))
            world_view_transform[:, 1] = -world_view_transform[:, 1]
            world_view_transform[:, 2] = -world_view_transform[:, 2]
            full_proj_transform = np.reshape(
                np.array(message["view_projection_matrix"]), (4, 4))
            full_proj_transform[:, 1] = -full_proj_transform[:, 1]
            custom_cam = MiniCam(width, height, fovy, fovx, znear, zfar,
                                 world_view_transform, full_proj_transform)
        except Exception:
            print("")
            traceback.print_exc()
            raise
        return (custom_cam, do_training, do_shs_python,
                do_rot_scale_python, keep_alive, scaling_modifier)
    return None, None, None, None, None, None


def poll_and_render(gaussians, pipe_source_path: str, render_fn) -> bool:
    """One train-loop poll (train.py:71-84): returns False when the client
    asked training to stop."""
    global conn
    if conn is None:
        try_connect()
    keep_training = True
    while conn is not None:
        try:
            net_image_bytes = None
            (custom_cam, do_training, _, _, keep_alive,
             scaling_modifier) = receive()
            if custom_cam is not None:
                out = render_fn(custom_cam, gaussians, scaling_modifier)
                img = np.clip(np.asarray(out["render"]), 0, 1)
                net_image_bytes = memoryview(
                    (img * 255).astype(np.uint8).transpose(1, 2, 0)
                    .copy(order="C"))
            send(net_image_bytes, pipe_source_path)
            if do_training and ((not keep_alive)):
                break
        except Exception:
            conn = None
    return keep_training
