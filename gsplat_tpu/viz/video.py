"""Video compositing — reference composite_video.py:35-78 equivalent.

The reference uses OpenCV's mp4 writer; this environment has no cv2, so we
shell out to ffmpeg when present and otherwise leave the numbered PNG frames
(which every downstream tool accepts) with a note.
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import List

import numpy as np


def save_frames(frames: List[np.ndarray], out_dir: str) -> List[str]:
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, f in enumerate(frames):
        arr = np.clip(f, 0, 1)
        if arr.ndim == 3 and arr.shape[0] in (1, 3):
            arr = arr.transpose(1, 2, 0)
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, axis=-1)
        p = os.path.join(out_dir, f"{i:05d}.png")
        Image.fromarray((arr * 255).astype(np.uint8)).save(p)
        paths.append(p)
    return paths


def save_video(frames: List[np.ndarray], out_path: str, fps: int = 30) -> str:
    """Write an mp4 (via ffmpeg) or fall back to a PNG sequence directory."""
    frame_dir = os.path.splitext(out_path)[0] + "_frames"
    save_frames(frames, frame_dir)
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg:
        subprocess.run(
            [ffmpeg, "-y", "-loglevel", "error", "-framerate", str(fps),
             "-i", os.path.join(frame_dir, "%05d.png"),
             "-pix_fmt", "yuv420p", out_path],
            check=True)
        return out_path
    print(f"[video] ffmpeg not found; frames left in {frame_dir}")
    return frame_dir
