"""Persisted operator parameters: JSON sidecars with atomic write + checksum.

Mirrors the reference's two-phase fit→transform parameter model where every
operator persists its fitted state so the exact transform replays on new data
(reference: app/core/normalization_handler.py:26-67 — NormalizationParameters
dataclass; :299-404 — atomic tmp-file write + read-back checksum verify).

Params are tiny (per-feature scalars), so they live driver-side and are
injected into transforms as literals / broadcast structs — never a shuffle.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from dataclasses import asdict, dataclass, field
from typing import Any


def _checksum(payload: dict[str, Any]) -> str:
    canon = json.dumps(payload, sort_keys=True, separators=(",", ":"))
    return hashlib.md5(canon.encode("utf-8")).hexdigest()


@dataclass
class StageParams:
    """Fitted parameters for one pipeline stage."""

    stage: str
    method: str
    params: dict[str, Any] = field(default_factory=dict)
    fitted_on: list[str] = field(default_factory=list)  # e.g. ['d1', 'd2']
    n_samples: int = 0

    def to_dict(self) -> dict[str, Any]:
        d = asdict(self)
        d["checksum"] = _checksum(
            {k: d[k] for k in ("stage", "method", "params", "fitted_on", "n_samples")}
        )
        return d


def save_params(path: str, sp: StageParams) -> None:
    """Atomic write: tmp file in the target dir, fsync, rename, read-back verify
    (same durability contract as reference app/core/normalization_handler.py:361-404)."""
    payload = sp.to_dict()
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    if load_params(path).to_dict()["checksum"] != payload["checksum"]:
        raise IOError(f"read-back checksum mismatch for {path}")


def load_params(path: str) -> StageParams:
    with open(path) as f:
        payload = json.load(f)
    sp = StageParams(
        stage=payload["stage"],
        method=payload["method"],
        params=payload["params"],
        fitted_on=payload.get("fitted_on", []),
        n_samples=payload.get("n_samples", 0),
    )
    stored = payload.get("checksum")
    if stored is not None and sp.to_dict()["checksum"] != stored:
        raise IOError(f"checksum mismatch loading {path}")
    return sp
