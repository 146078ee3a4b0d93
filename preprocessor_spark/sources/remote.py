"""S8: remote HTTP config source/sink and result logging.

Reference semantics (app/config_handler.py:45-88, app/main.py:18-67):

- ``remote_load_config(url, user, pass)`` — GET a JSON config, optional
  HTTP basic auth; returns the parsed dict or ``None`` on any transport /
  parse failure (record-don't-raise: a dead config service must not kill
  a batch job that can proceed on defaults + CLI flags).
- ``remote_save_config(config, url, user, pass)`` — POST the composed
  (non-default-only) config as the form field ``json_config``; returns
  ``True``/``False``.
- ``remote_log(config, debug_info, url, user, pass)`` — POST
  ``json_config`` + ``json_result`` form fields; returns ``True``/``False``.
- ``compose_config(config)`` — strip keys equal to the engine defaults so
  only the run's deviations travel (reference app/config_handler.py:19-32).

Stdlib ``urllib`` only — no third-party HTTP client. These calls run on
the DRIVER, once per job (config fetch at startup, one log post at the
end): they never appear inside a Spark task, so cluster scale does not
multiply them. Basic auth over plain ``http://`` sends credentials in
the clear, exactly like the reference; use ``https://`` endpoints in
production.
"""

from __future__ import annotations

import base64
import json
import sys
import urllib.error
import urllib.parse
import urllib.request
from typing import Any

__all__ = [
    "compose_config",
    "remote_load_config",
    "remote_save_config",
    "remote_log",
]

DEFAULT_TIMEOUT = 10.0


def compose_config(config: dict[str, Any]) -> dict[str, Any]:
    """Only the keys that differ from the engine defaults (reference
    app/config_handler.py:19-32 — it also subtracts per-plugin defaults;
    this engine's operator defaults live in DEFAULT_CONFIG itself)."""
    from preprocessor_spark.core import DEFAULT_CONFIG

    return {
        k: v
        for k, v in config.items()
        if k not in DEFAULT_CONFIG or v != DEFAULT_CONFIG[k]
    }


def _basic_auth_header(username: str | None, password: str | None) -> dict:
    if not (username and password):
        return {}
    tok = base64.b64encode(f"{username}:{password}".encode()).decode()
    return {"Authorization": f"Basic {tok}"}


def remote_load_config(
    url: str,
    username: str | None = None,
    password: str | None = None,
    timeout: float = DEFAULT_TIMEOUT,
) -> dict[str, Any] | None:
    """GET a JSON config dict; None on any failure (never raises)."""
    req = urllib.request.Request(
        url, headers=_basic_auth_header(username, password)
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
        cfg = json.loads(body.decode("utf-8"))
        if not isinstance(cfg, dict):
            raise ValueError(f"remote config is {type(cfg).__name__}, not object")
    except (urllib.error.URLError, ValueError, OSError) as e:
        print(f"Failed to load remote configuration: {e}", file=sys.stderr)
        return None
    return cfg


def _post_form(
    url: str,
    fields: dict[str, str],
    username: str | None,
    password: str | None,
    timeout: float,
    what: str,
) -> bool:
    data = urllib.parse.urlencode(fields).encode("utf-8")
    headers = {
        "Content-Type": "application/x-www-form-urlencoded",
        **_basic_auth_header(username, password),
    }
    req = urllib.request.Request(url, data=data, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            status = getattr(resp, "status", 200)
        if status >= 400:  # pragma: no cover — urlopen raises on 4xx/5xx
            raise urllib.error.HTTPError(url, status, "bad status", None, None)
    except (urllib.error.URLError, OSError) as e:
        print(f"Failed to {what}: {e}", file=sys.stderr)
        return False
    return True


def remote_save_config(
    config: dict[str, Any],
    url: str,
    username: str | None = None,
    password: str | None = None,
    timeout: float = DEFAULT_TIMEOUT,
) -> bool:
    """POST the non-default config keys as form field ``json_config``."""
    return _post_form(
        url,
        {"json_config": json.dumps(compose_config(config), default=str)},
        username,
        password,
        timeout,
        "save remote configuration",
    )


def remote_log(
    config: dict[str, Any],
    debug_info: dict[str, Any],
    url: str,
    username: str | None = None,
    password: str | None = None,
    timeout: float = DEFAULT_TIMEOUT,
) -> bool:
    """POST config + run results (``json_config`` / ``json_result``)."""
    return _post_form(
        url,
        {
            "json_config": json.dumps(compose_config(config), default=str),
            "json_result": json.dumps(debug_info, default=str),
        },
        username,
        password,
        timeout,
        "log remote information",
    )
