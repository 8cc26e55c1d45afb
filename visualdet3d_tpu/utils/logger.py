"""Loss logging / metric recording.

Mirrors the reference's LossLogger + AverageMeter -> TensorBoard flow
(reference: visualDet3D/utils/utils.py:10-28, 120-135), with a writer that
degrades gracefully to JSONL when TensorBoard isn't importable.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class AverageMeter:
    """Running average (reference: utils/utils.py:120-135)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class MetricWriter:
    """Scalar/text writer: TensorBoard if available, JSONL fallback."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore
            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, 'metrics.jsonl'), 'a')

    def add_scalar(self, name: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(name, value, step)
        else:
            self._jsonl.write(json.dumps(
                {'t': time.time(), 'name': name, 'value': float(value), 'step': int(step)}) + '\n')
            self._jsonl.flush()

    def add_text(self, name: str, text: str, step: int = 0):
        if self._tb is not None:
            self._tb.add_text(name, text, step)
        else:
            self._jsonl.write(json.dumps(
                {'t': time.time(), 'name': name, 'text': text, 'step': int(step)}) + '\n')
            self._jsonl.flush()

    def flush(self):
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        else:
            self._jsonl.close()


class LossLogger:
    """Accumulate loss dicts, flush averages to the writer.

    reference: visualDet3D/utils/utils.py:10-28 (LossLogger).
    """

    def __init__(self, recorder: Optional[MetricWriter], data_split: str = 'train'):
        self.recorder = recorder
        self.data_split = data_split
        self.reset()

    def reset(self):
        self.loss_stats: Dict[str, AverageMeter] = {}

    def update(self, loss_dict: Dict[str, object]):
        for key, value in loss_dict.items():
            if key not in self.loss_stats:
                self.loss_stats[key] = AverageMeter()
            self.loss_stats[key].update(float(np.asarray(value).mean()))

    def log(self, step: int):
        if self.recorder is None:
            return
        for key, meter in self.loss_stats.items():
            self.recorder.add_scalar(f'{key}/{self.data_split}', meter.avg, step)
