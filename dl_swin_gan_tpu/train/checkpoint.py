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
from orbax.checkpoint import checkpoint_managers as ocp_cm


class CheckpointManager:
    def __init__(self, directory: str, monitor: str = "Validate/complex_l1",
                 mode: str = "min", max_to_keep: int = 1,
                 keep_latest: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        # Retention = (best max_to_keep by monitor) OR (the latest step).
        # A plain max_to_keep+best_fn keeps only the best N: once every
        # periodic save collides with a validation save (and so carries
        # metrics), the newest checkpoint is GC'd whenever it isn't among
        # the best — crash-resume then rewinds to the best step, not the
        # last one. BestN sorts ascending and keeps the last n, so
        # reverse=True selects the n smallest for mode='min'.
        # Metric-less (periodic) saves must never rank as "best": the
        # missing-metric sentinel is the worst value for the mode (+inf for
        # min, -inf for max) — np.inf under mode='max' would make every
        # periodic save outrank the genuinely best validated checkpoint.
        worst = np.inf if mode == "min" else -np.inf
        policies = [
            ocp_cm.BestN(
                get_metric_fn=(lambda metrics: metrics.get(monitor, worst)),
                reverse=(mode == "min"),
                n=max_to_keep,
            ),
        ]
        if keep_latest:
            policies.append(ocp_cm.LatestN(n=1))
        options = ocp.CheckpointManagerOptions(
            preservation_policy=ocp_cm.AnyPreservationPolicy(policies),
            best_fn=(lambda metrics: metrics.get(monitor, worst)),
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
