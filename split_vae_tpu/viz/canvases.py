"""Pure-numpy canvas builders shared by the artifact writers.

Separating canvas math (testable, deterministic) from matplotlib IO keeps the
viz layer unit-testable without touching the filesystem.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def grid_canvas(images: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Tile [N, H, W, C] into a [rows*H, cols*W, C] canvas (row-major)."""
    n, h, w, c = images.shape
    assert n >= rows * cols, (n, rows, cols)
    canvas = np.empty((rows * h, cols * w, c), images.dtype)
    for i in range(rows):
        for j in range(cols):
            canvas[i * h:(i + 1) * h, j * w:(j + 1) * w] = images[i * cols + j]
    return canvas


def stack_rows(*row_batches: np.ndarray) -> np.ndarray:
    """Stack several [N, H, W, C] batches vertically into a (len*H, N*W) canvas.

    Used for recon-vs-input strips (vae/visualizer.py:30-34).
    """
    rows = []
    for batch in row_batches:
        n, h, w, c = batch.shape
        rows.append(batch.transpose(1, 0, 2, 3).reshape(h, n * w, c))
    return np.concatenate(rows, axis=0)


def to_unit(x: np.ndarray) -> np.ndarray:
    """[-1, 1] -> [0, 1] clipped."""
    return np.clip((np.asarray(x) + 1.0) * 0.5, 0.0, 1.0)


def draw_bounding_boxes(images: np.ndarray, boxes: np.ndarray,
                        color: Sequence[float] = (1.0, 1.0, 1.0)) -> np.ndarray:
    """Numpy equivalent of tf.image.draw_bounding_boxes.

    images: [B, H, W, C] floats; boxes: [B, K, 4] normalized
    [ymin, xmin, ymax, xmax]. Degenerate (all-zero) boxes are skipped — the
    reference zeroes masked-out boxes via ``obj_bbox_mask * z_pres``
    (spair/visualizer.py:109), and a zero box drawn at the origin would paint a
    single corner pixel; skipping matches intent.
    """
    out = np.array(images, copy=True)
    b, h, w, c = out.shape
    col = np.asarray(color[:c], out.dtype)
    for bi in range(b):
        for k in range(boxes.shape[1]):
            ymin, xmin, ymax, xmax = boxes[bi, k]
            if ymax - ymin <= 0 or xmax - xmin <= 0:
                continue
            y0 = int(np.clip(round(ymin * (h - 1)), 0, h - 1))
            y1 = int(np.clip(round(ymax * (h - 1)), 0, h - 1))
            x0 = int(np.clip(round(xmin * (w - 1)), 0, w - 1))
            x1 = int(np.clip(round(xmax * (w - 1)), 0, w - 1))
            out[bi, y0, x0:x1 + 1] = col
            out[bi, y1, x0:x1 + 1] = col
            out[bi, y0:y1 + 1, x0] = col
            out[bi, y0:y1 + 1, x1] = col
    return out
