"""Per-SNR checkpoint/resume for long Monte-Carlo sweeps.

The reference persists only final results (SURVEY.md §5 "Checkpoint/resume");
here each completed SNR point's accumulated counters are saved so a preempted
multi-host job resumes at the last completed SNR.
"""
from __future__ import annotations

import os
import pickle
from typing import Any


class SnrCheckpoint:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _file(self, snr_idx: int) -> str:
        return os.path.join(self.path, f"snr_{snr_idx:03d}.pkl")

    def has(self, snr_idx: int) -> bool:
        return os.path.exists(self._file(snr_idx))

    def save(self, snr_idx: int, obj: Any) -> None:
        tmp = self._file(snr_idx) + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(obj, f)
        os.replace(tmp, self._file(snr_idx))

    def load(self, snr_idx: int) -> Any:
        with open(self._file(snr_idx), "rb") as f:
            return pickle.load(f)

    def load_or_none(self, snr_idx: int) -> Any:
        """Load a checkpoint, or None if it is unreadable/stale.

        Counter NamedTuples (NbfCounts/CdlCounts) pickle positionally, so a
        checkpoint written by an older revision with fewer fields raises
        TypeError on unpickle; a --resume run should re-simulate that SNR
        point rather than crash (ADVICE r03 #2). Only stale-shape /
        truncated-file errors are swallowed — a transient I/O error on a
        good checkpoint (NFS hiccup, permissions) propagates instead of
        silently re-simulating an expensive SNR point (ADVICE r04 #5)."""
        try:
            return self.load(snr_idx)
        except (TypeError, KeyError, AttributeError, EOFError,
                pickle.UnpicklingError, ModuleNotFoundError) as e:
            print(f"[ckpt] snr {snr_idx}: stale/unreadable checkpoint "
                  f"({type(e).__name__}: {e}); re-simulating")
            return None
