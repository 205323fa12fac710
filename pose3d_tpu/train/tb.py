"""Minimal TensorBoard writer (scalars + images) over tf.summary.

The reference uses torch's SummaryWriter (main.py:100, train.py:129-295);
this framework is torch-free, so the writer wraps tf.summary (TensorFlow is
only imported lazily — it is slow to load and only needed when logging)."""

from __future__ import annotations

from pathlib import Path

import numpy as np


class SummaryWriter:
    def __init__(self, log_dir):
        import tensorflow as tf  # lazy: ~20 s import on small hosts

        self._tf = tf
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        self._writer = tf.summary.create_file_writer(str(log_dir))

    def add_scalar(self, tag: str, value, step: int):
        with self._writer.as_default():
            self._tf.summary.scalar(tag, float(value), step=int(step))

    def add_image(self, tag: str, image_hwc: np.ndarray, step: int):
        """image_hwc: [H, W, C] uint8 or float in [0,1]."""
        img = np.asarray(image_hwc)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        with self._writer.as_default():
            self._tf.summary.image(tag, img[None], step=int(step))

    def add_text(self, tag: str, text: str, step: int = 0):
        with self._writer.as_default():
            self._tf.summary.text(tag, text, step=int(step))

    def flush(self):
        self._writer.flush()

    def close(self):
        self._writer.close()


class NullWriter:
    """No-op writer for tests / benchmark runs."""

    def add_scalar(self, *a, **k):
        pass

    def add_image(self, *a, **k):
        pass

    def add_text(self, *a, **k):
        pass

    def flush(self):
        pass

    def close(self):
        pass
