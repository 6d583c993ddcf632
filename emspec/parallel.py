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


class ShardedStream:
    """Channel-sharded STREAMING: the production per-hop rolling step
    (``_stream_step_rolling``) jitted over the mesh with the full carry —
    hop counter (replicated), the device-resident analysis window
    (channel-sharded), pending reassignment ring (P, ch, rows) and
    post-chain state (both channel-sharded) — **donated** each hop,
    exactly like the single-chip Stream's executable.  Per hop only the
    ``hop`` NEW samples cross host→device (the audio-rate floor — the
    same H2D design as Stream; BENCH.md item 45).  The scatter is
    channel-local; with ``agc_global=True`` the per-hop cross-channel
    max is the one ICI all-reduce (SURVEY.md §5.8).

    Feed protocol (mirrors ``emspec.stream.Stream._stage_one``):
    ``reset_window(x[:, :n_max])`` primes the window for hop 0, then
    ``step(x[:, t*hop + n_max - hop : t*hop + n_max])`` per hop; at
    flush, ``reset_window(None)`` zeroes the window and zero blocks
    drain the pending ring.  ``stream_signal_sharded`` packages this so
    streaming ≡ batch is assertable under sharding
    (tests/test_parallel.py).
    """

    def __init__(self, settings: Settings, mesh: Mesh, params=None):
        if settings.channels % mesh.devices.size != 0:
            raise ValueError(
                f"channels ({settings.channels}) must be divisible by the "
                f"mesh size ({mesh.devices.size})")
        self.mesh = mesh
        ax = mesh.axis_names[0]
        self.pipe: Pipeline = get_pipeline(settings)
        self.settings = settings
        ch = settings.channels
        repl = NamedSharding(mesh, P())
        self._sh_window = NamedSharding(mesh, P(ax, None))
        self._sh_block = NamedSharding(mesh, P(ax, None))
        sh_carry = (
            self._sh_window,                              # rolling window
            (
                repl,                                     # hop counter t
                NamedSharding(mesh, P(None, ax, None)),   # acc (P, ch, rows)
                PostState(smooth=NamedSharding(mesh, P(ax, None)),
                          agc_ref=NamedSharding(mesh, P(ax))),
            ),
        )
        self._sh_carry = sh_carry
        self._carry = jax.device_put(
            self.pipe.init_roll_carry((ch,)), sh_carry)
        self.params = jax.device_put(
            params or self.pipe.params(settings), repl)
        self._step = jax.jit(
            self.pipe._stream_step_rolling,
            donate_argnums=0,
            out_shardings=(
                sh_carry,
                (NamedSharding(mesh, P(ax, None)),        # vis (ch, rows)
                 NamedSharding(mesh, P(ax, None, None)),  # rgba
                 repl),                                   # emitted index
            ),
        )
        self._t = 0

    def reset_window(self, window: np.ndarray | None) -> None:
        """(Re)prime the device-resident rolling window.

        ``window``: hop 0's full (channels, n_max) samples — the next
        ``step`` block must then be ``window[:, n_max-hop:]`` (which
        completes it) — or None to zero the window for flush hops."""
        ch, n_max, hop = self.settings.channels, self.pipe.n_max, self.pipe.hop
        if window is None:
            w = np.zeros((ch, n_max), np.float32)
        else:
            w = np.concatenate(
                [np.zeros((ch, hop), np.float32),
                 np.asarray(window, np.float32)[..., :n_max - hop]], axis=-1)
        self._carry = (jax.device_put(w, self._sh_window), self._carry[1])

    def step(self, block: np.ndarray):
        """One hop: (channels, hop) NEW samples → finalized column or
        None (warmup: the first ``reach`` hops emit nothing, like
        Stream)."""
        dev = jax.device_put(np.asarray(block, np.float32),
                             self._sh_block)
        self._carry, (vis, rgba, _) = self._step(self._carry, dev,
                                                 self.params)
        idx = self._t - self.pipe.reach
        self._t += 1
        return None if idx < 0 else (idx, vis, rgba)

    # ----------------------------------------------------- checkpoint/resume
    def state_pytree(self):
        """Sharded streaming state as a HOST pytree (SURVEY.md §5.4 ×
        §5.8): carry leaves are gathered to host numpy — the live
        carry's device buffers are donated into the next step, and a
        snapshot must survive an *elastic* restart onto a different
        mesh size (load_state re-shards on whatever mesh the restored
        stream runs)."""
        carry = jax.tree_util.tree_map(np.asarray, self._carry)
        return {"carry": carry, "t": self._t}

    def load_state(self, state) -> None:
        """Resume from a snapshot, re-sharding onto THIS stream's mesh
        (the snapshot's mesh size need not match — channels must)."""
        self._carry = jax.device_put(state["carry"], self._sh_carry)
        self._t = int(state["t"])


def stream_signal_sharded(x: np.ndarray, settings: Settings, mesh: Mesh):
    """Hop-by-hop sharded streaming of a whole signal → (vis, rgba) host
    arrays, the sharded counterpart of ``emspec.stream.stream_signal``
    (zero-padded flush hops drain the pending ring identically)."""
    st = ShardedStream(settings, mesh)
    pipe = st.pipe
    x = np.asarray(x, np.float32)
    t_count = pipe.num_columns(x.shape[-1])
    if t_count <= 0:
        raise ValueError(f"need at least {pipe.n_max} samples")
    cols = []
    n_max, hop = pipe.n_max, pipe.hop
    zero_block = np.zeros((settings.channels, hop), np.float32)
    st.reset_window(x[..., :n_max])              # prime for hop 0
    for t in range(t_count + pipe.reach):
        if t < t_count:
            block = x[..., t * hop + n_max - hop: t * hop + n_max]
        else:
            if t == t_count:
                st.reset_window(None)            # flush: all-zero windows
            block = zero_block
        out = st.step(block)
        if out is not None:
            cols.append(out)
    cols.sort(key=lambda c: c[0])
    vis = np.stack([np.asarray(v) for _, v, _ in cols])
    rgba = np.stack([np.asarray(r) for _, _, r in cols])
    return vis, rgba
