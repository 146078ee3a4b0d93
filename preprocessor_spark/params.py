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
import math
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
    """Atomic write: tmp file in the target dir, fsync, verify, THEN rename
    (same durability contract as reference
    app/core/normalization_handler.py:361-404). The checksum verify runs on
    the tmp file BEFORE os.replace publishes it: verifying after the
    replace would leave a failed write live and the previous good params
    destroyed — the resume flow would have nothing loadable."""
    payload = sp.to_dict()
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        if load_params(tmp).to_dict()["checksum"] != payload["checksum"]:
            raise IOError(f"read-back checksum mismatch for {path}")
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _dual_checksum(means: dict[str, float], stds: dict[str, float]) -> str:
    """The reference's parameter checksum, byte-for-byte: md5 of the
    sort_keys JSON of {means, stds, features:sorted}
    (app/core/normalization_handler.py:54-63)."""
    params_str = json.dumps(
        {"means": means, "stds": stds, "features": sorted(means)},
        sort_keys=True,
    )
    return hashlib.md5(params_str.encode("utf-8")).hexdigest()


def _atomic_json(path: str, data: dict[str, Any]) -> None:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            try:
                # allow_nan=False: a NaN statistic (avg over NaN data) would
                # otherwise (a) serialize as bare NaN — NOT standard JSON,
                # breaking the reference-tooling interop this layout exists
                # for — and (b) make the read-back dict compare below fail
                # spuriously (NaN != NaN), masking the real problem behind a
                # misleading integrity error
                json.dump(data, f, indent=2, default=str, allow_nan=False)
            except ValueError as exc:
                raise ValueError(
                    f"non-finite statistic in params for {path} — refusing "
                    "to write non-standard JSON (fit stats contain NaN/inf; "
                    "check the input data)"
                ) from exc
            f.flush()
            os.fsync(f.fileno())
        with open(tmp) as f:  # read-back verify before publish
            if json.load(f) != json.loads(json.dumps(data, default=str)):
                raise IOError(f"read-back mismatch writing {path}")
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def save_params_dual(
    dirpath: str,
    sp: StageParams,
    *,
    timestamp: str | None = None,
    means_file: str = "means.json",
    stds_file: str = "stds.json",
) -> None:
    """Persist fitted z-score params in the reference's DUAL-file layout —
    separate ``means.json`` / ``stds.json``, each carrying the shared
    metadata block (timestamp, source datasets, counts, cross-file
    checksum) — byte-level artifact compatibility with
    app/core/normalization_handler.py:299-359. The engine's own sidecar
    (:func:`save_params`) remains the primary format; this writer exists
    so artifacts interoperate with reference tooling."""
    if sp.method != "zscore":
        raise ValueError("dual means/stds layout is defined for zscore params")
    from datetime import datetime, timezone

    cols = sp.params["columns"]
    per = sp.params["per_column"]
    means = {c: per[c]["mean"] for c in cols}
    stds = {c: per[c]["std"] for c in cols}
    meta = {
        "computation_timestamp": timestamp
        or datetime.now(timezone.utc).isoformat(),
        "source_datasets": list(sp.fitted_on),
        "feature_count": len(cols),
        "sample_count": sp.n_samples,
        "checksum": _dual_checksum(means, stds),
    }
    _atomic_json(
        os.path.join(dirpath, means_file), {"metadata": meta, "means": means}
    )
    _atomic_json(
        os.path.join(dirpath, stds_file), {"metadata": meta, "stds": stds}
    )


def load_params_dual(
    dirpath: str,
    *,
    means_file: str = "means.json",
    stds_file: str = "stds.json",
    stage: str = "normalizer",
) -> StageParams:
    """Load reference-layout dual means/stds files into a
    :class:`StageParams` the engine's Normalizer can transform with.
    Applies the reference's validation contract
    (app/core/normalization_handler.py:405-460): the two files must agree
    on checksum and timestamp, and the recomputed checksum must match."""
    with open(os.path.join(dirpath, means_file)) as f:
        means_data = json.load(f)
    with open(os.path.join(dirpath, stds_file)) as f:
        stds_data = json.load(f)
    m_meta, s_meta = means_data["metadata"], stds_data["metadata"]
    if m_meta["checksum"] != s_meta["checksum"]:
        raise IOError("means and stds files have inconsistent checksums")
    if m_meta["computation_timestamp"] != s_meta["computation_timestamp"]:
        raise IOError("means and stds files have different timestamps")
    means, stds = means_data["means"], stds_data["stds"]
    if set(means) != set(stds):
        raise IOError("means and stds cover different feature sets")
    if _dual_checksum(means, stds) != m_meta["checksum"]:
        raise IOError("loaded parameters failed integrity verification")
    # the reference's parameter validation rejects non-positive AND
    # non-finite stds (normalization_handler.py:173) — without this, a
    # hand-authored zero std plus the loaded epsilon of 0.0 would yield
    # division-by-zero/inf, and an inf std would silently zero the
    # zscore output instead of failing at load
    bad = sorted(
        c
        for c, s in stds.items()
        if not (math.isfinite(float(s)) and float(s) > 0.0)
    )
    if bad:
        raise ValueError(
            f"non-positive or non-finite std for feature(s) {bad}: "
            "stds must be finite and > 0"
        )
    cols = sorted(means)
    return StageParams(
        stage=stage,
        method="zscore",
        params={
            "columns": cols,
            "per_column": {
                c: {"mean": means[c], "std": stds[c]} for c in cols
            },
            "feature_range": [0.0, 1.0],
            "epsilon": 0.0,
        },
        fitted_on=list(m_meta.get("source_datasets", [])),
        n_samples=int(m_meta.get("sample_count", 0)),
    )


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
