"""Full-factorial design (ref: crates/doe/src/full_factorial.rs:43-81).

Level allocation is a tiny data-dependent host loop (config-level work, not
compute); the grid fill itself is vectorized.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import default_dtype
from .lhs import scale_to_xlimits


def full_factorial_normalized(ns: int, nx: int, dtype=None):
    dtype = dtype or default_dtype()
    # allocate levels per dimension as evenly as possible
    num_list = np.ones(nx, dtype=np.int64)
    weights = np.full(nx, 1.0 / nx)
    while int(np.prod(num_list)) < ns:
        w = num_list / num_list.sum()
        ind = int(np.argmax(weights - w))
        num_list[ind] += 1

    nrows = int(np.prod(num_list))
    doe = np.zeros((nrows, nx))
    level_repeat = nrows
    range_repeat = 1
    for j in range(nx):
        n = int(num_list[j])
        level_repeat //= n
        levels = np.arange(n) / (n - 1) if n > 1 else np.arange(n).astype(float)
        chunk = np.repeat(levels, level_repeat)
        doe[:, j] = np.tile(chunk, range_repeat)
        range_repeat *= n
    return jnp.asarray(doe[:ns], dtype=dtype)


class FullFactorial:
    """Object API mirroring egobox_doe::FullFactorial."""

    def __init__(self, xlimits):
        self.xlimits = jnp.asarray(xlimits, dtype=default_dtype())
        if self.xlimits.ndim != 2 or self.xlimits.shape[1] != 2:
            raise ValueError("xlimits must have shape (nx, 2)")

    def normalized_sample(self, ns: int):
        return full_factorial_normalized(ns, self.xlimits.shape[0],
                                         self.xlimits.dtype)

    def sample(self, ns: int):
        return scale_to_xlimits(self.normalized_sample(ns), self.xlimits)
