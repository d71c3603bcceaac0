"""Device mesh construction."""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

AXIS = "devices"


def make_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default).

    Ray tracing is embarrassingly data-parallel, so a 1-D mesh suffices; the
    axis is sharded over samples or image rows (see ``render_sharded``).
    """
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devs)} present"
            )
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))
