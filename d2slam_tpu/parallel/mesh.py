"""Device mesh construction for the swarm.

The reference's unit of distribution is one robot == one process joined
by LCM UDP multicast (SURVEY.md §2.6). Here one robot == one slice of a
``robot`` mesh axis; consensus exchange rides ICI/DCN collectives
instead of the network stack.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def robot_mesh(n_robots: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_robots is None:
        n_robots = len(devices)
    if len(devices) < n_robots:
        raise ValueError(
            f"need {n_robots} devices for {n_robots} robots, have {len(devices)}"
        )
    return Mesh(np.array(devices[:n_robots]), axis_names=("robot",))
