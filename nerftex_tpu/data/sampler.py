"""Low-level point samplers driving camera/parameter distributions.

Host-side numpy, stateful by design (they enumerate dataset entries), mirror
of reference data/sampler.py:7-78.  The reference's Stratified.__call__ calls
a nonexistent ``super().sample()`` (sampler.py:62-65) — fixed here to jitter
the parent Grid sample; everything else is behavior-identical.
"""

from math import ceil
from typing import Union

import numpy as np

from nerftex_tpu.utils import util
from nerftex_tpu.utils.util import EasyDict


class Sampler:
    """Base: d-dimensional draws, n total (-1 = unbounded), running idx."""

    def __init__(self, d: int = 1, n: int = -1, idx: int = 0) -> None:
        self.d = d
        self.n = n
        self.idx = idx

    def __call__(self) -> np.ndarray:
        self.idx += 1

    def done(self) -> bool:
        return False if self.n < 0 else self.idx >= self.n


class Independent(Sampler):
    """iid uniform [0,1)^d."""

    def __call__(self) -> np.ndarray:
        super().__call__()
        return np.random.rand(self.d)


class Constant(Sampler):
    """Always return the given constant."""

    def __init__(self, d: int = 1, n: int = 0, c: Union[float, list] = 0.0, idx: int = 0) -> None:
        super().__init__(d, n, idx)
        if isinstance(c, float):
            c = [c] * d
        self.c = np.array(c, dtype=float)

    def __call__(self) -> np.ndarray:
        super().__call__()
        return self.c


class Grid(Sampler):
    """Enumerate a linearly spaced d-dim lattice covering [0,1)^d."""

    def __init__(self, d: int = 1, n: int = -1, idx: int = 0, sample_center: bool = False) -> None:
        super().__init__(d, n, idx)
        self.cells_per_d = ceil(self.n ** (1 / self.d))
        self.cell_size = 1 / self.cells_per_d
        self.sample_center = sample_center

    def _grid_point(self) -> np.ndarray:
        x = np.empty(self.d)
        for i in range(self.d):
            x[i] = (self.idx // (self.cells_per_d**i)) % self.cells_per_d
        x /= self.cells_per_d
        if self.sample_center:
            x += self.cell_size / 2
        return x

    def __call__(self) -> np.ndarray:
        x = self._grid_point()
        Sampler.__call__(self)
        return x


class Stratified(Grid):
    """Grid cells + uniform jitter inside each cell."""

    def __call__(self) -> np.ndarray:
        return super().__call__() + np.random.rand(self.d) * self.cell_size


class Concat(Sampler):
    """Concatenate the draws of two child samplers."""

    def __init__(self, sampler_config_0: EasyDict, sampler_config_1: EasyDict, n: int = -1, idx: int = 0) -> None:
        sampler_config_0 = EasyDict(sampler_config_0)
        sampler_config_1 = EasyDict(sampler_config_1)
        sampler_config_0.update({"n": n, "idx": idx})
        self.sampler_0 = util.instantiate(sampler_config_0)
        sampler_config_1.update({"n": n, "idx": idx})
        self.sampler_1 = util.instantiate(sampler_config_1)
        super().__init__(self.sampler_0.d + self.sampler_1.d, n, idx)

    def __call__(self) -> np.ndarray:
        super().__call__()
        return np.concatenate([self.sampler_0(), self.sampler_1()])
