"""S8 remote HTTP config/log (reference app/config_handler.py:45-88,
app/main.py:18-67) against a stdlib http.server — load/save/log round
trips, basic-auth headers, record-don't-raise failure paths, and the
CLI precedence rule (defaults < remote config < explicit flags)."""

import base64
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from preprocessor_spark.sources.remote import (
    compose_config,
    remote_load_config,
    remote_log,
    remote_save_config,
)


class _ConfigHandler(BaseHTTPRequestHandler):
    """GET serves the configured JSON body; POST records the form fields."""

    server_version = "test"
    posts: list[dict] = []
    get_body: bytes = b"{}"
    require_auth: bool = False

    def log_message(self, *a):  # keep pytest output clean
        pass

    def _authed(self) -> bool:
        if not self.require_auth:
            return True
        tok = base64.b64encode(b"alice:s3cret").decode()
        return self.headers.get("Authorization") == f"Basic {tok}"

    def do_GET(self):
        if not self._authed():
            self.send_response(401)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(self.get_body)

    def do_POST(self):
        if not self._authed():
            self.send_response(401)
            self.end_headers()
            return
        length = int(self.headers.get("Content-Length", 0))
        fields = urllib.parse.parse_qs(self.rfile.read(length).decode())
        type(self).posts.append({k: v[0] for k, v in fields.items()})
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"ok")


@pytest.fixture()
def http_server():
    _ConfigHandler.posts = []
    _ConfigHandler.get_body = b"{}"
    _ConfigHandler.require_auth = False
    srv = HTTPServer(("127.0.0.1", 0), _ConfigHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}/cfg", _ConfigHandler
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_remote_load_config_round_trip(http_server):
    url, handler = http_server
    handler.get_body = json.dumps({"seed": 7, "time_col": "t"}).encode()
    assert remote_load_config(url) == {"seed": 7, "time_col": "t"}


def test_remote_load_config_failures_return_none(http_server, capsys):
    url, handler = http_server
    handler.get_body = b"not json"
    assert remote_load_config(url) is None
    handler.get_body = b"[1, 2]"  # a JSON array is not a config object
    assert remote_load_config(url) is None
    # unreachable port: connection refused, not an exception
    assert remote_load_config("http://127.0.0.1:9/cfg", timeout=0.5) is None
    assert "Failed to load remote configuration" in capsys.readouterr().err


def test_remote_save_posts_non_default_keys_only(http_server):
    url, handler = http_server
    from preprocessor_spark.core import DEFAULT_CONFIG

    cfg = dict(DEFAULT_CONFIG)
    cfg["seed"] = 99  # deviation
    cfg["custom_key"] = "x"  # non-default key
    assert remote_save_config(cfg, url) is True
    posted = json.loads(handler.posts[-1]["json_config"])
    assert posted == {"seed": 99, "custom_key": "x"}
    assert compose_config(dict(DEFAULT_CONFIG)) == {}


def test_remote_log_posts_config_and_result(http_server):
    url, handler = http_server
    assert remote_log({"seed": 1}, {"rows": 42, "status": "done"}, url) is True
    post = handler.posts[-1]
    assert json.loads(post["json_config"]) == {"seed": 1}
    assert json.loads(post["json_result"]) == {"rows": 42, "status": "done"}


def test_basic_auth_header_sent_and_required(http_server, capsys):
    url, handler = http_server
    handler.require_auth = True
    handler.get_body = json.dumps({"seed": 5}).encode()
    assert remote_load_config(url, "alice", "s3cret") == {"seed": 5}
    assert remote_load_config(url, "alice", "wrong") is None  # 401 → None
    assert remote_save_config({"seed": 2}, url, "alice", "s3cret") is True
    assert remote_save_config({"seed": 2}, url, "bob", "nope") is False
    assert "Failed to save remote configuration" in capsys.readouterr().err


def test_cli_remote_config_precedence(http_server, capsys, tmp_path):
    """defaults < remote config < explicit CLI flag (reference merge order);
    a dead endpoint degrades to defaults instead of failing the run."""
    url, handler = http_server
    handler.get_body = json.dumps(
        {"seed": 123, "normalization_method": "minmax"}
    ).encode()
    import pandas as pd

    from preprocessor_spark import cli

    pdf = pd.DataFrame({"ts": ["2024-01-01 00:00:00"], "v": [1.0]})
    csv = tmp_path / "in.csv"
    pdf.to_csv(csv, index=False)
    rc = cli.main(
        [
            str(csv),
            "--dry-run",
            "--remote-load-config",
            url,
            "--normalization-method",
            "zscore",  # explicit flag beats the remote value
        ]
    )
    assert rc == 0
    cfg = json.loads(capsys.readouterr().out)["config"]
    assert cfg["seed"] == 123  # from remote
    assert cfg["normalization_method"] == "zscore"  # CLI wins
    # dead endpoint: run proceeds on defaults
    rc = cli.main(
        [str(csv), "--dry-run", "--remote-load-config", "http://127.0.0.1:9/cfg"]
    )
    assert rc == 0
    cfg = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["config"]
    assert cfg["seed"] == 42


def test_cli_remote_log_after_legacy_run(http_server, tmp_path, spark):
    """EP2 run posts json_config + json_result to --remote-log at the end."""
    url, handler = http_server
    import pandas as pd

    from preprocessor_spark import cli

    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=40, freq="min").strftime(
                "%Y-%m-%d %H:%M:%S"
            ),
            "v": [float(i) for i in range(40)],
        }
    )
    csv = tmp_path / "in.csv"
    pdf.to_csv(csv, index=False)
    out_dir = tmp_path / "out"
    rc = cli.main(
        [
            str(csv),
            "--plugin",
            "trimmer",
            "--trim-rows",
            "0,1",
            "--output-dir",
            str(out_dir),
            "--remote-log",
            url,
        ]
    )
    assert rc == 0
    post = handler.posts[-1]
    assert json.loads(post["json_result"])["status"] == "done"
    assert "json_config" in post
