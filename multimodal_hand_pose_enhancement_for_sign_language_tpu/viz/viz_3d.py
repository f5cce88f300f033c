"""3D skeleton visualization to animated GIFs.

Reference: viz/viz_3d.py:25-98 — per-frame matplotlib 3D line plots
(view_init(90, 90), axes hidden) collected into a looping GIF per clip.
Frames are rendered in-memory (no temp PNG tree) but the GIF output
contract (file name `{results_dir}/{clip_idx}.gif`, duration rule) is
kept.
"""

from __future__ import annotations

import io
import os

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import mkdir
from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import skeleton


def plot_3d_lines(frame, structure=None, show=False):
    """Render one frame (150,) of joint coordinates as a 3D line plot."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    structure = structure or skeleton.get_skeletal_model_structure()
    fig = plt.figure(figsize=(10, 6))
    ax = plt.axes(projection="3d")
    ax._axis3don = False
    for bone in structure:
        j, e = bone[0], bone[1]
        ax.plot(
            [frame[j * 3], frame[e * 3]],
            [frame[j * 3 + 1], frame[e * 3 + 1]],
            zs=[frame[j * 3 + 2], frame[e * 3 + 2]],
        )
    ax.view_init(90, 90)
    if show:
        plt.show()
    return fig, ax


def viz_clip(clip, clip_idx, structure=None, frame_rate=2, results_dir="viz_results"):
    """One clip (T, 150) -> `{results_dir}/{clip_idx}.gif`."""
    from PIL import Image
    import matplotlib.pyplot as plt

    mkdir(results_dir)
    frames = []
    for frame_idx in range(clip.shape[0]):
        fig, _ = plot_3d_lines(clip[frame_idx, :], structure)
        buf = io.BytesIO()
        fig.savefig(buf, format="png", dpi=75)
        plt.close(fig)
        buf.seek(0)
        frames.append(Image.open(buf).convert("P"))
    out = os.path.join(results_dir, f"{clip_idx}.gif")
    frames[0].save(
        out,
        format="GIF",
        append_images=frames[1:],
        save_all=True,
        duration=len(frames) / frame_rate,
        loop=0,
    )
    return out


def viz(xyz, structure=None, frame_rate=2, results_dir="viz_results"):
    """All clips -> list of GIF paths (reference viz_3d.py:72-77)."""
    gifs_paths = []
    for clip_idx in range(len(xyz)):
        assert not np.any(np.isnan(xyz[clip_idx]))
        gifs_paths.append(
            viz_clip(
                xyz[clip_idx],
                clip_idx,
                structure,
                frame_rate=frame_rate,
                results_dir=results_dir,
            )
        )
    return gifs_paths
