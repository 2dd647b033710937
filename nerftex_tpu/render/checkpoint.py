"""Pytree checkpointing with the reference's retention policy.

Mirrors tf.train.CheckpointManager semantics used at network/logger.py:29-39:
save every i_checkpoint steps under <path>/checkpoints, keep max_to_keep most
recent plus one every keep_every_n_hours, restore-latest on startup, and the
train/render asymmetry (render restores model params only, 'expect_partial').

Storage: one pickle per checkpoint of a numpy-ified pytree — single-writer
(process 0) safe for multi-host.
"""

import os
import pickle
import re
import time

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, keep_every_n_hours: float = 12):
        self.directory = directory
        self.max_to_keep = max_to_keep
        self.keep_every_n_seconds = keep_every_n_hours * 3600
        os.makedirs(directory, exist_ok=True)
        self._save_times = {}
        self._preserved = set()  # steps kept PERMANENTLY (hourly policy)
        self._last_preserved = None

    # -- naming --------------------------------------------------------

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt-{step}.pkl")

    def checkpoints(self):
        out = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"ckpt-(\d+)\.pkl", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    @property
    def latest_checkpoint(self):
        steps = self.checkpoints()
        return self._path(steps[-1]) if steps else None

    # -- save / restore ------------------------------------------------

    def save(self, state: dict, step: int) -> str:
        path = self._path(step)
        # Multi-host: single-writer discipline — only process 0 touches disk
        # (SURVEY.md §5 checkpoint/resume).  Everyone still materializes the
        # state (cheap no-op on one host).
        state_np = _to_numpy(state)
        if jax.process_index() != 0:
            return path
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state_np, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)

        self._save_times[step] = time.time()
        self._sweep(step)
        return path

    def _sweep(self, new_step: int) -> None:
        """tf.train.CheckpointManager retention: the newest max_to_keep stay;
        an older checkpoint about to be deleted is instead preserved
        PERMANENTLY if keep_every_n_hours have elapsed since the last
        preserved one (the hourly clock starts at the first save)."""
        now = time.time()
        if self._last_preserved is None:
            self._last_preserved = self._save_times.get(new_step, now)
        active = [s for s in self.checkpoints() if s not in self._preserved]
        while len(active) > self.max_to_keep:
            victim = active.pop(0)
            t = self._save_times.get(victim, now)
            if t - self._last_preserved >= self.keep_every_n_seconds:
                self._preserved.add(victim)
                self._last_preserved = t
                continue
            try:
                os.remove(self._path(victim))
            except OSError:
                pass

    def restore_latest(self):
        path = self.latest_checkpoint
        if path is None:
            return None
        with open(path, "rb") as f:
            return pickle.load(f)
