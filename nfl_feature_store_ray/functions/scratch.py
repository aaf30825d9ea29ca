"""Deterministic scratch-directory derivation for persisted intermediates."""

from __future__ import annotations

import hashlib
import os


def scratch_dir(prefix: str, key: str) -> str:
    """/tmp/{prefix}/{blake2b(abspath(key))} — one shared derivation so all
    cached intermediates tag their inputs the same way."""
    tag = hashlib.blake2b(os.path.abspath(key).encode(), digest_size=8).hexdigest()
    return f"/tmp/{prefix}/{tag}"
