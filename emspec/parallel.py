"""Multi-chip scaling over a device mesh (SURVEY.md §2.5 / §5.8).

The reference is a single-process desktop app with no distributed story;
the rebuild's honest parallel axis is **channels** (the stress config is
16 channels [NS configs[4]]).  The reassignment scatter is channel-local,
so channel sharding needs no collectives beyond the initial shard — except
the optional global AGC (``Settings.agc_global``), whose cross-channel max
GSPMD turns into the one real ICI all-reduce of the pipeline.

Usage:

>>> mesh = channel_mesh()                        # all visible devices
>>> sp = ShardedPipeline(settings, mesh)         # channels % n_devices == 0
>>> vis, rgba, state = sp.process(x)             # x: (channels, samples)

Everything is plain ``jax.sharding`` + jit (GSPMD): no hand-written
communication, shardings annotated on inputs/outputs, XLA inserts the
collectives and rides ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emspec.config import Settings
from emspec.pipeline import Pipeline, get_pipeline
from emspec.post.chain import PostState


def channel_mesh(devices=None, axis: str = "ch") -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis,))


class ShardedPipeline:
    """Channel-sharded batch processing over a mesh.

    Shards the channel axis of inputs, post-state, and outputs; params are
    replicated.  ``settings.channels`` must be divisible by the mesh size.
    """

    def __init__(self, settings: Settings, mesh: Mesh):
        if settings.channels % mesh.devices.size != 0:
            raise ValueError(
                f"channels ({settings.channels}) must be divisible by the "
                f"mesh size ({mesh.devices.size})")
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.pipe: Pipeline = get_pipeline(settings)
        self.settings = settings
        ax = self.axis
        self._sh_x = NamedSharding(mesh, P(ax, None))
        self._sh_state = PostState(
            smooth=NamedSharding(mesh, P(ax, None)),
            agc_ref=NamedSharding(mesh, P(ax)),
        )
        self._repl = NamedSharding(mesh, P())
        self._step = jax.jit(
            self.pipe._batch_vis,
            static_argnames=("t_count",),
            out_shardings=(
                NamedSharding(mesh, P(None, ax, None)),        # vis (t, ch, rows)
                NamedSharding(mesh, P(None, ax, None, None)),  # rgba
                self._sh_state,
            ),
        )

    def init_state(self) -> PostState:
        state = PostState.init((self.settings.channels, self.pipe.rows))
        return jax.device_put(state, self._sh_state)

    def process(self, x, params=None, state=None):
        """x: (channels, samples) → (vis (t, ch, rows), rgba, PostState),
        all sharded over the mesh's channel axis."""
        x = np.asarray(x, np.float32)
        t_count = self.pipe.num_columns(x.shape[-1])
        if t_count <= 0:
            raise ValueError(f"need at least {self.pipe.n_max} samples")
        xd = jax.device_put(x, self._sh_x)
        p = jax.device_put(params or self.pipe.params(self.settings),
                           self._repl)
        st = state if state is not None else self.init_state()
        return self._step(xd, p, st, t_count=t_count)
