"""Orbax checkpointing with best-metric retention and resume-by-default.

TPU-native counterpart of Lightning's ModelCheckpoint(save_top_k=1,
monitor='Validate/<loss>', mode='min') (reference train.py:153-162) plus the
crude shell auto-resume in run_script.sh:58-71 — here resume is first-class:
`latest_step()`/`restore()` pick up (params, opt_state, ema, step) exactly.
"""

import os
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, monitor: str = "Validate/complex_l1",
                 mode: str = "min", max_to_keep: int = 1,
                 keep_latest: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep + (1 if keep_latest else 0),
            best_fn=(lambda metrics: metrics.get(monitor, np.inf)),
            best_mode=mode,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> None:
        if step in self._mgr.all_steps():
            # orbax silently no-ops a duplicate-step save. A metric-less
            # step-interval save colliding with the end-of-epoch validation
            # save would otherwise swallow the metrics and lose best-by-
            # monitor retention (Lightning save_top_k=1 parity): replace the
            # banked step with the metric-bearing one. A metric-less re-save
            # of an existing step really is a no-op (same state) — skip it.
            if metrics is None:
                return
            self._mgr.delete(step)
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like))

    def close(self) -> None:
        self._mgr.close()
