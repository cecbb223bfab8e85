"""Shared utilities: metric logging (wandb-compatible, file-backed).

The reference logs via stdlib logging + wandb (reference:
nerf_mae/run_swin_mae3d.py:325-331, 695-709). wandb is not available in
every environment, so MetricLogger always writes a JSONL stream (one
{"step": ..., **metrics} object per line) and forwards to wandb when the
package is importable and --wandb was requested.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, use_wandb: bool = False,
                 project: str = "nerf-mae-tpu", run_name: Optional[str] = None,
                 config: Optional[Dict] = None):
        self._file = None
        self._wandb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            path = os.path.join(
                log_dir, f"metrics_{run_name or int(time.time())}.jsonl"
            )
            self._file = open(path, "a")
            logger.info("metric log: %s", path)
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project, name=run_name, config=config or {})
                self._wandb = wandb
            except ImportError:
                logger.warning("wandb requested but not installed; "
                               "logging to jsonl only")

    def log(self, step: int, metrics: Dict[str, float]):
        if self._file:
            self._file.write(json.dumps({"step": step, **metrics}) + "\n")
            self._file.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def close(self):
        if self._file:
            self._file.close()
        if self._wandb:
            self._wandb.finish()
