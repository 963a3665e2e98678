"""Device-resident replay ring: self-play samples never leave the chip.

The host ``ReplayBuffer`` (replay.py) mirrors the reference's
``NNTrainDataStorage`` with numpy arrays, which costs two transfers per
iteration: the actor's sample stream comes down to the host, and
``train_epochs`` pushes the buffer back up.  On TPU both directions ride
the (sometimes slow, always finite) host link for data that is produced
AND consumed on the device.  This class keeps the whole loop on-chip:

  * storage = one ``[cap, ...]`` array per field (same FIELDS schema as
    the host buffer), a physical ring addressed by host-side
    ``(start, size)`` pointers,
  * ingest = one jitted call: value backfill -> valid-compaction ->
    wrapped scatter (invalid rows are routed out of bounds and dropped),
  * retention = the reference's MIN/MAX + ``old_game_index`` trim
    (alphazero_nn_data.cpp:67-84) as pure pointer arithmetic on the host
    — no device work at all,
  * epochs = ``learner.make_ring_epoch_fn`` samples the valid window in
    place (trainer.train_epochs dispatches on the buffer type),
  * persistence = the same versioned npz format as the host buffer
    (one download per save — only done at checkpoints), so the two
    implementations are file-interchangeable.

Single-process only: the multi-host path shards episode batches across
hosts and keeps replay host-local (trainer._train_epochs_multihost);
Trainer falls back to the host buffer there.

No reference analog: the reference cannot express this (its replay lives
in CPU RAM next to the TF session, alphazero_nn_data.h:70-143).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from .replay import FIELDS, FORMAT_VERSION


class DeviceReplay:
    """Drop-in for ``ReplayBuffer`` with device-resident storage."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.cap = cfg.samples_storage_max
        self.data: Dict[str, jax.Array] = {
            k: jnp.zeros((self.cap,) + shape, dt)
            for k, (dt, shape) in FIELDS.items()}
        self.start = 0
        self.size = 0
        self.old_game_index = 0
        # the ring enforces the MAX rule at write time; host ReplayBuffer
        # applies it in trim() and then applies AT MOST one rule per call
        # (reference trimOldExamples, alphazero_nn_data.cpp:67-84) — track
        # write-time overflow so trim() skips the old-game rule in the
        # same iteration, mirroring the host's one-rule-per-call behavior
        self._overflowed = False
        # donate the ring storage: the scatter updates it in place
        # instead of holding 2x capacity during ingest
        self._ingest = jax.jit(self._ingest_impl, donate_argnums=(0,))

    def __len__(self) -> int:
        return self.size

    # ---- ingest ----
    def _ingest_impl(self, data, start, size, samples, status, final_round):
        from .actor import backfill_values

        filled = backfill_values(
            samples, status, final_round=final_round,
            round_weighted=self.cfg.round_weighted_value)
        valid = filled.valid.reshape(-1)
        cap = self.cap
        # compact write positions: k-th valid row goes to logical slot
        # size+k; invalid rows are routed past the array and dropped
        pos = size + jnp.cumsum(valid) - 1
        total = jnp.sum(valid)
        # over-capacity ingest: only the newest ``cap`` rows may land
        # (scatter order among duplicate indices is unspecified, so the
        # older rows are masked out instead of relying on overwrite order)
        keep = valid & (pos >= size + total - cap)
        idx = jnp.where(keep, (start + pos) % cap, cap)
        out = {}
        for k in data:
            v = getattr(filled, k)
            v = v.reshape((-1,) + v.shape[2:]).astype(data[k].dtype)
            out[k] = data[k].at[idx].set(v, mode="drop")
        return out, valid.sum()

    def extend_from_actor(self, samples, status, final_round=None) -> int:
        """Append a stacked [T, B, ...] SampleBatch (device arrays)."""
        if final_round is None:
            final_round = jnp.zeros(status.shape, jnp.int32)
        self.data, added = self._ingest(
            self.data, jnp.int32(self.start), jnp.int32(self.size),
            samples, status, jnp.asarray(final_round))
        added = int(added)
        overflow = max(self.size + added - self.cap, 0)
        self.start = (self.start + overflow) % self.cap
        self.size = min(self.size + added, self.cap)
        self.old_game_index = max(self.old_game_index - overflow, 0)
        self._overflowed |= overflow > 0
        return added

    def extend(self, samples: Dict[str, np.ndarray]) -> int:
        """Append flat [N, ...] already-backfilled host arrays (one
        upload; the bulk path is ``extend_from_actor``)."""
        n = int(np.asarray(samples["value"]).shape[0])
        if n == 0:
            return 0
        assert n <= self.cap, (n, self.cap)
        idx = jnp.asarray(
            (self.start + self.size + np.arange(n)) % self.cap)
        self.data = {
            k: self.data[k].at[idx].set(
                jnp.asarray(np.asarray(samples[k]).astype(
                    self.data[k].dtype)))
            for k in self.data}
        overflow = max(self.size + n - self.cap, 0)
        self.start = (self.start + overflow) % self.cap
        self.size = min(self.size + n, self.cap)
        self.old_game_index = max(self.old_game_index - overflow, 0)
        self._overflowed |= overflow > 0
        return n

    # ---- retention (reference trimOldExamples) ----
    def mark_old_games(self) -> None:
        self.old_game_index = max(self.size - 1, 0)

    def trim(self) -> int:
        cfg = self.cfg
        n = self.size
        dropped = 0
        if self._overflowed:
            # MAX rule already fired at write time this iteration
            self._overflowed = False
        elif n > cfg.samples_storage_min and self.old_game_index > 0:
            dropped = min(self.old_game_index, n - cfg.samples_storage_min)
        if dropped > 0:
            self.start = (self.start + dropped) % self.cap
            self.size -= dropped
            self.old_game_index = max(self.old_game_index - dropped, 0)
        return dropped

    # ---- learner access ----
    def epoch_view(self):
        """(data, start, size) for ``make_ring_epoch_fn``."""
        return self.data, jnp.int32(self.start), jnp.int32(self.size)

    def sample_arrays(self, max_samples: Optional[int] = None
                      ) -> Dict[str, np.ndarray]:
        """Logical-order numpy copy (downloads once; for persistence,
        analysis, and the multihost fallback guard)."""
        n = self.size if max_samples is None else min(max_samples,
                                                      self.size)
        idx = (self.start + self.size - n + np.arange(n)) % self.cap
        return {k: np.asarray(v)[idx] for k, v in self.data.items()}

    # ---- persistence: same npz format as the host buffer ----
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(
            path, __version__=FORMAT_VERSION,
            old_game_index=self.old_game_index, **self.sample_arrays())

    def load(self, path: str) -> bool:
        if not os.path.exists(path):
            return False
        with np.load(path) as z:
            assert int(z["__version__"]) == FORMAT_VERSION
            old = int(z["old_game_index"])
            arrays = {k: z[k].astype(FIELDS[k][0]) for k in FIELDS}
        n = arrays["value"].shape[0]
        keep = min(n, self.cap)
        pad = self.cap - keep
        self.data = {
            k: jnp.asarray(np.concatenate(
                [v[n - keep:],
                 np.zeros((pad,) + v.shape[1:], v.dtype)]))
            for k, v in arrays.items()}
        self.start = 0
        self.size = keep
        self.old_game_index = max(old - (n - keep), 0)
        return True
