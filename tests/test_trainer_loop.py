"""Trainer orchestration smoke tests (tiny codec, synthetic stream)."""

import os

import jax
import numpy as np
import pytest

from imagecompression_adversarial_tpu.config import Config
from imagecompression_adversarial_tpu.train.trainer import train


def test_train_loop_runs_and_checkpoints(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # ckpts/ under tmp
    cfg = Config(model="debug", quality=1, metric="mse", new=True,
                 batch_size=2, lr_train=1e-4)
    summary = train(cfg, data_root=None, max_steps=3, crop=64)
    assert summary["steps"] == 3
    assert np.isfinite(summary["loss"])
    # final checkpoint was written despite max_steps < eval cadence
    assert os.path.isdir(summary["ckpt_dir"])
    assert any(os.scandir(summary["ckpt_dir"]))


def test_train_resume_continues_steps(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = Config(model="debug", quality=1, metric="mse", new=True,
                 batch_size=2, lr_train=1e-4)
    s1 = train(cfg, data_root=None, max_steps=2, crop=64)
    s2 = train(cfg, data_root=None, max_steps=4, crop=64)
    assert s2["steps"] == 4  # resumed from step 2, not restarted
