"""Checkpoint / resume.

The reference's implicit resumable state is tiny: (accumulation buffer,
sample counter) — /root/reference/src/main.js:298-311 — and rendering is
a pure fold over samples; a page reload restarts from sample 0. Here that
state (plus optimizer state for training) is serialized with orbax, and
the counter-based RNG makes resume bit-exact (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


# Geometry layout version persisted with every checkpoint. Version 2 =
# triangle rows (category 2) store ABSOLUTE VERTICES in data2/data3
# (scene/data.py); version 1 (round-1 layout) stored edge vectors. A
# version-1 checkpoint containing triangles would restore cleanly but be
# silently reinterpreted as vertices — fail loudly instead.
LAYOUT_VERSION = 2


class Checkpointer:
    """Minimal step-indexed checkpointer over a pytree."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = _ocp().PyTreeCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def save(self, step: int, params: Any, opt_state: Any = None,
             extra: Any = None):
        payload = {"params": params, "opt_state": opt_state, "extra": extra,
                   "step": np.int64(step),
                   "layout_version": np.int64(LAYOUT_VERSION)}
        self._ckptr.save(self._path(step), payload, force=True)

    def latest_step(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                try:
                    steps.append(int(name.split("_")[1]))
                except ValueError:
                    pass
        return max(steps) if steps else None

    def restore(self, step: int, params_like: Any, opt_state_like: Any = None):
        template = {"params": params_like, "opt_state": opt_state_like,
                    "extra": None, "step": np.int64(0),
                    "layout_version": np.int64(0)}
        try:
            restored = self._ckptr.restore(self._path(step), item=template)
        except Exception as e:
            # pre-versioning checkpoints lack the layout_version key and
            # fail the template match: refuse rather than reinterpret
            # round-1 edge-vector triangle geometry as vertices
            raise ValueError(
                f"checkpoint {self._path(step)} has no layout_version "
                f"(pre-v{LAYOUT_VERSION} geometry layout, or corrupt); "
                "re-create it from current scene data") from e
        v = int(restored["layout_version"])
        if v != LAYOUT_VERSION:
            raise ValueError(
                f"checkpoint {self._path(step)} uses geometry layout "
                f"v{v}, this build expects v{LAYOUT_VERSION} "
                "(triangle rows: absolute vertices in data2/data3)")
        return restored

    def restore_latest(self, params_like: Any, opt_state_like: Any = None):
        """Returns (params, opt_state, step) or None if nothing saved."""
        step = self.latest_step()
        if step is None:
            return None
        r = self.restore(step, params_like, opt_state_like)
        return r["params"], r["opt_state"], int(r["step"])


def save_render_state(directory: str, accum_xyz, sample_count: int):
    """Persist the progressive-render state (accumulator + counter).

    The checkpoint step IS the sample counter (the reference's `sample`
    buffer, main.js:304-311)."""
    Checkpointer(directory).save(int(sample_count), {"accum_xyz": accum_xyz})


def load_render_state(directory: str, accum_like):
    """Returns (accum_xyz, sample_count) or None."""
    ck = Checkpointer(directory)
    step = ck.latest_step()
    if step is None:
        return None
    r = ck.restore(step, {"accum_xyz": accum_like})
    return r["params"]["accum_xyz"], step
