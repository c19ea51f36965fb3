"""Training observability (reference: wandb run + EMA loss dicts + psutil
memory logging, scripts/train.py:188-221,397-421,483-507).

A pluggable ``MetricLogger`` that always logs to stdout/JSONL and attaches
wandb when importable (this image ships without it). Host/device memory
sampling replaces the psutil/cuda.mem_get_info lines.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path


class MetricLogger:
    def __init__(self, run_name: str = "unidepth_tpu", out_dir: str | None = None, config: dict | None = None):
        self.run_name = run_name
        self.t0 = time.time()
        self._jsonl = None
        if out_dir:
            Path(out_dir).mkdir(parents=True, exist_ok=True)
            self._jsonl = open(Path(out_dir) / f"{run_name}.jsonl", "a")
        self._wandb = None
        try:  # optional
            import wandb  # type: ignore

            self._wandb = wandb.init(project="UniDepth", name=run_name, config=config)
        except Exception:
            pass
        self.ema: dict[str, float] = {}

    def log(self, metrics: dict, step: int, prefix: str = "train"):
        flat = {f"{prefix}/{k}": float(v) for k, v in metrics.items()}
        for k, v in flat.items():
            if v == v and abs(v) < 1e30:  # clamp NaN/inf out of the EMA
                self.ema[k] = 0.99 * self.ema.get(k, v) + 0.01 * v
        rec = {"step": step, "t": round(time.time() - self.t0, 1), **flat}
        if self._jsonl:
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(flat, step=step)
        return self.ema

    def log_image(self, name: str, image, step: int) -> str | None:
        """Save a (H, W, 3) uint8 artifact as PNG under out_dir/artifacts and
        record its path in the JSONL stream (the reference's wandb.Image
        upload, visualization.py:195-199, replaced by on-disk artifacts).
        Also forwards to wandb when attached."""
        path = None
        if self._jsonl is not None:
            import numpy as np
            from PIL import Image

            art_dir = Path(self._jsonl.name).parent / "artifacts"
            art_dir.mkdir(exist_ok=True)
            path = str(art_dir / f"{name}_{step}.png")
            Image.fromarray(np.asarray(image)).save(path)
            self._jsonl.write(
                json.dumps({"step": step, f"image/{name}": path}) + "\n"
            )
            self._jsonl.flush()
        if self._wandb is not None:
            import wandb  # type: ignore

            self._wandb.log({name: [wandb.Image(image)]}, step=step)
        return path

    def memory_stats(self) -> dict:
        out = {}
        try:
            import jax

            d = jax.local_devices()[0]
            ms = d.memory_stats() or {}
            out["device_bytes_in_use"] = ms.get("bytes_in_use", 0)
        except Exception:
            pass
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        out["host_rss_kb"] = int(line.split()[1])
        except Exception:
            pass
        return out

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
