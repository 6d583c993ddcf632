"""Checkpoint / resume (SURVEY.md §5.4).

The reference's persistence is settings+presets JSON (its "checkpointing");
the rebuild additionally checkpoints *streaming state* — smoothing/AGC
carries, the reassignment pending ring, hop counters, and the host ring
contents — so a live session can be saved and resumed mid-stream
bit-exactly (tested in tests/test_checkpoint.py).

Format: a single ``.npz`` file; the pytree structure is rebuilt from the
stream's own fresh state, so no pickled code is loaded (np.load with
allow_pickle=False — corrupt/hostile files can't execute anything).
Tested in tests/test_ops.py (bit-exact save → resume ≡ uninterrupted run).
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def _flatten(tree) -> list[np.ndarray]:
    leaves = jax.tree_util.tree_leaves(tree)
    return [np.asarray(leaf) for leaf in leaves]


def _carry_payload(carry) -> dict:
    """The npz carry layout (``carry_{i}`` keys), shared by the
    single-chip and sharded savers so the format lives in one place."""
    return {f"carry_{i}": leaf for i, leaf in enumerate(_flatten(carry))}


def _carry_from(z, fresh):
    """Rebuild a carry pytree from :func:`_carry_payload` keys using a
    freshly-initialized carry's structure (no pickled treedefs)."""
    treedef = jax.tree_util.tree_structure(fresh)
    n_leaves = len(jax.tree_util.tree_leaves(fresh))
    missing = [i for i in range(n_leaves) if f"carry_{i}" not in z]
    if missing:
        raise ValueError(
            f"checkpoint has {n_leaves - len(missing)} carry leaves but "
            f"this build expects {n_leaves} — the file was probably saved "
            f"by an older emspec (pre-rolling-window carry layout)")
    return jax.tree_util.tree_unflatten(
        treedef, [z[f"carry_{i}"] for i in range(n_leaves)])


def _roll_carry_from(z, pipe, lead):
    """Rolling carry from a snapshot, migrating pre-rolling-window files
    (round-4 carry layout change): an old snapshot holds only the inner
    leaves, so the window leaf is re-initialized to zeros and the caller
    must re-prime it (the single-chip loader replays the host ring, so
    ``Stream._stage_one`` re-primes transparently; a migrated SHARDED
    snapshot needs ``reset_window`` before the next step).  Returns
    (carry, migrated)."""
    fresh = pipe.init_roll_carry(lead)
    inner_n = len(jax.tree_util.tree_leaves(fresh[1]))
    win_n = len(jax.tree_util.tree_leaves(fresh[0]))     # 1
    total = win_n + inner_n
    if f"carry_{total - 1}" in z:                        # current layout
        return _carry_from(z, fresh), False
    if f"carry_{inner_n - 1}" in z:                      # old layout
        inner = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(fresh[1]),
            [z[f"carry_{i}"] for i in range(inner_n)])
        return (fresh[0], inner), True
    return _carry_from(z, fresh), False   # surface the clear error


def _npz_path(path: str | Path) -> Path:
    """np.savez appends '.npz' to extensionless paths; normalize here so
    save_stream(p)/load_stream(p) round-trip for any p."""
    p = Path(path)
    return p if p.suffix == ".npz" else p.with_suffix(p.suffix + ".npz")


def save_stream(path: str | Path, stream) -> None:
    """Serialize a Stream's full resumable state to ``path`` (.npz)."""
    state = stream.state_pytree()
    ring = stream.ring
    total = int(ring.total_written)
    keep = min(total, ring.capacity)
    ring_data = ring.latest(keep) if keep else np.zeros((stream.channels, 0), np.float32)
    payload = _carry_payload(state["carry"])
    payload["t"] = np.int64(state["t"])
    payload["next_frame"] = np.int64(state["next_frame"])
    payload["ring_data"] = ring_data
    payload["ring_total"] = np.int64(total)
    payload["dropped"] = np.int64(stream.dropped_frames)
    path = _npz_path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **payload)


def load_stream(path: str | Path, stream) -> None:
    """Restore state saved by :func:`save_stream` into a freshly
    constructed Stream with identical Settings."""
    with np.load(_npz_path(path), allow_pickle=False) as z:
        # Stream's carry is the rolling-window pytree (window, inner);
        # pre-rolling snapshots migrate with a zeroed window + re-prime
        carry, migrated = _roll_carry_from(
            z, stream.pipe,
            (stream.channels,) if stream.channels > 1 else ())
        total = int(z["ring_total"])
        ring_data = z["ring_data"]
        # replay the retained window at its absolute position: pushing
        # (total - kept) zeros first restores the absolute sample indexing
        kept = ring_data.shape[-1]
        skip = total - kept
        if skip > 0:
            cap = stream.ring.capacity
            # only the last `capacity` samples matter; fast-forward with one
            # oversized zero push, then overwrite with the real tail
            stream.ring.push(np.zeros((stream.channels, min(skip, cap + 1)),
                                      np.float32))
            remaining = skip - min(skip, cap + 1)
            while remaining > 0:
                chunk = min(remaining, cap)
                stream.ring.push(np.zeros((stream.channels, chunk), np.float32))
                remaining -= chunk
        if kept:
            stream.ring.push(ring_data)
        stream.load_state({"carry": carry, "t": int(z["t"]),
                           "next_frame": int(z["next_frame"])})
        stream.dropped_frames = int(z["dropped"])
        if migrated:
            # old-layout snapshot: the zeroed window can't continue the
            # roll — re-prime from the replayed ring on the next stage
            stream._window_ready = False


def save_sharded_stream(path: str | Path, stream) -> None:
    """Serialize a :class:`~emspec.parallel.ShardedStream`'s resumable
    state (SURVEY §5.4 × §5.8).  The snapshot is mesh-agnostic — the
    sharded carry is gathered to host numpy — so a stream saved on an
    8-device mesh loads onto any mesh whose size divides the channel
    count (elastic restart).  ShardedStream owns no ring: its windows
    come from the caller, so the snapshot is carry + hop counter."""
    state = stream.state_pytree()
    payload = _carry_payload(state["carry"])
    payload["t"] = np.int64(state["t"])
    # a migrated-but-not-yet-reprimed stream must not launder its zeroed
    # window into a "clean" snapshot: the guard travels with the file
    payload["needs_window_prime"] = np.bool_(
        getattr(stream, "needs_window_prime", False))
    path = _npz_path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **payload)


def load_sharded_stream(path: str | Path, stream) -> bool:
    """Restore :func:`save_sharded_stream` state into a freshly built
    ShardedStream with identical Settings (any mesh size; load_state
    re-shards onto the stream's own mesh).

    Returns True when the snapshot was a pre-rolling-window layout and
    was MIGRATED with a zeroed window — the caller must then
    ``reset_window(window_at_resume_point)`` before the next ``step``
    (ShardedStream owns no ring to re-prime from; the stream also
    raises on ``step`` until re-primed, so a silent zero-window resume
    cannot happen)."""
    with np.load(_npz_path(path), allow_pickle=False) as z:
        # ShardedStream's carry is the rolling-window pytree too
        carry, migrated = _roll_carry_from(
            z, stream.pipe, (stream.settings.channels,))
        # a snapshot of a migrated-but-unprimed stream carries the guard
        if "needs_window_prime" in z.files:
            migrated = migrated or bool(z["needs_window_prime"])
        stream.load_state({"carry": carry, "t": int(z["t"])})
    # unconditional assignment: a later healthy load on the same stream
    # object must CLEAR a stale guard, not only ever set it
    stream.needs_window_prime = migrated
    return migrated
