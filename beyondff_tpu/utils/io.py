"""On-disk stage contracts and frame IO.

Stage outputs are per-scene dicts (reference: README.md:31-37):
  * 2D stage:   list of {frame_id, segmented_frame_masks (RLE), confidences, labels}
  * 3D stages:  {"ins": (I, N) bool | list[RLE], "conf": (I,), "final_class": list[str]}

Two serializations are supported and auto-detected by extension:
  * ``.pth``  — torch pickle, byte-compatible with the reference (torch is a
                host-only dependency; nothing torch touches the device path);
  * ``.npz``  — torch-free numpy archive for pure-JAX deployments.

Frame IO (images, depth PNGs, poses, intrinsics) matches the reference's
loaders: depth is uint16 PNG / depth_scale, resized to RGB resolution with
OpenCV bilinear (reference: tools/projection_2d_to_3d.py:431-436).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

try:  # torch is optional: only needed for .pth interop
    import torch
except ImportError:  # pragma: no cover
    torch = None


# ----------------------------------------------------------- generic pickles
def _to_numpy(x):
    if torch is not None and isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return x


def _tree_to_numpy(obj):
    if isinstance(obj, dict):
        return {k: _tree_to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = type(obj)
        return t(_tree_to_numpy(v) for v in obj)
    return _to_numpy(obj)


def load_stage_dict(path: str) -> Dict:
    """Load a 3D-stage output ({"ins","conf","final_class"}) from .pth or .npz."""
    if path.endswith(".npz"):
        with np.load(path, allow_pickle=True) as z:
            return {
                "ins": z["ins"],
                "conf": z["conf"],
                "final_class": list(z["final_class"]),
            }
    if torch is None:
        raise RuntimeError("torch unavailable; cannot read .pth — use .npz outputs")
    return _tree_to_numpy(torch.load(path, map_location="cpu", weights_only=False))


def save_stage_dict(path: str, ins, conf, final_class: Sequence[str]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(".npz"):
        np.savez_compressed(
            path,
            ins=np.asarray(ins),
            conf=np.asarray(conf, dtype=np.float32),
            final_class=np.asarray(list(final_class), dtype=object),
        )
        return
    if torch is None:
        raise RuntimeError("torch unavailable; cannot write .pth — use .npz outputs")
    torch.save(
        {
            "ins": torch.from_numpy(np.ascontiguousarray(np.asarray(ins))),
            "conf": torch.from_numpy(np.asarray(conf, dtype=np.float32)),
            "final_class": list(final_class),
        },
        path,
    )


def load_frame_records(path: str) -> List[Dict]:
    """Load a 2D-stage output (list of per-frame records, masks RLE-encoded)."""
    if path.endswith(".npz"):
        with np.load(path, allow_pickle=True) as z:
            return list(z["records"])
    if torch is None:
        raise RuntimeError("torch unavailable; cannot read .pth — use .npz outputs")
    return _tree_to_numpy(torch.load(path, map_location="cpu", weights_only=False))


def save_frame_records(path: str, records: List[Dict]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(".npz"):
        np.savez_compressed(path, records=np.asarray(records, dtype=object))
        return
    if torch is None:
        raise RuntimeError("torch unavailable; cannot write .pth — use .npz outputs")
    out = []
    for rec in records:
        r = dict(rec)
        conf = np.asarray(r.get("confidences", []), dtype=np.float32)
        r["confidences"] = torch.from_numpy(conf)
        out.append(r)
    torch.save(out, path)


# ------------------------------------------------------------------ frame IO
def load_pose(path: str) -> np.ndarray:
    return np.loadtxt(path).astype(np.float64)


def load_intrinsic(path: str) -> np.ndarray:
    return np.loadtxt(path)[:3, :3].astype(np.float64)


def load_depth(path: str, depth_scale: float = 1000.0, size: Optional[tuple] = None) -> np.ndarray:
    """Metric depth map; optionally resized to (width, height) with cv2-convention
    bilinear. Uses the native C++ decoder when built (utils/native.py)."""
    if size is not None:
        from beyondff_tpu.utils import native

        out = native.decode_depth_native(path, depth_scale, (size[1], size[0]))
        if out is not None:
            return out
    import cv2

    depth = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if depth is None:
        raise FileNotFoundError(path)
    depth = depth.astype(np.float32) / depth_scale
    if size is not None and (depth.shape[1], depth.shape[0]) != size:
        depth = cv2.resize(depth, size)  # INTER_LINEAR, like the reference
    return depth


def load_image(path: str, size: Optional[tuple] = None) -> np.ndarray:
    """RGB uint8 (H, W, 3); optionally resized to (width, height)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if size is not None and (img.shape[1], img.shape[0]) != size:
        from PIL import Image

        # the reference resizes RGB with PIL (tools/segmentation_2d.py:250-254)
        img = np.array(Image.fromarray(img).resize(size))
    return img


def list_scene_frames(scene_2d_dir: str, scene_id: str, downsample_ratio: int = 1) -> List[str]:
    """Numerically-sorted frame ids (no extension), strided by downsample_ratio
    (reference: tools/segmentation_2d.py:469-478)."""
    color_dir = os.path.join(scene_2d_dir, scene_id, "color")
    files = [f for f in os.listdir(color_dir) if f.endswith(".jpg")]
    files.sort(key=lambda x: int(x.split(".")[0]))
    return [f[:-4] for f in files[::downsample_ratio]]


def load_point_cloud(scene_npy_dir: str, scene_id: str) -> np.ndarray:
    """(N, 3) xyz from the preprocessed per-scene .npy
    (reference: projection_2d_to_3d.py:385-387)."""
    return np.load(os.path.join(scene_npy_dir, f"{scene_id}.npy"))[:, :3]
