"""The `python -m deltaforge_spark` operational entry point: validate
(spec parse/compile, no data), run (one batch of a reference spec
against live wire sinks), and serve's argument surface.
"""

import json
import socket

import pytest

from deltaforge_spark.__main__ import main
from test_broker_sockets import RespServerState, _resp_serve

GOOD_SPEC = """
apiVersion: deltaforge/v1
kind: Pipeline
metadata:
  name: cli-run
  tenant: t1
spec:
  source:
    type: mysql
    config:
      id: s
      dsn: "mysql://u:p@h:3306/testdb"
      tables: ["testdb.ev%"]
  processors: []
  sinks:
    - type: redis
      config:
        id: r1
        required: true
        url: "redis://127.0.0.1:PORT"
        stream: "df.${source.table}"
        envelope:
          type: native
  commit_policy:
    mode: all
"""


def test_validate_good_spec(tmp_path, capsys):
    p = tmp_path / "spec.yaml"
    p.write_text(GOOD_SPEC.replace("PORT", "6379"))
    assert main(["validate", str(p)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["valid"] is True


def test_validate_bad_spec_exits_nonzero(tmp_path, capsys):
    p = tmp_path / "bad.yaml"
    p.write_text(GOOD_SPEC.replace("type: mysql", "type: oracle"))
    assert main(["validate", str(p)]) == 1
    out = json.loads(capsys.readouterr().out)
    assert out["valid"] is False and "oracle" in out["error"]


def test_run_delivers_one_batch_over_the_wire(tmp_path, capsys, spark, sf_dir):
    state = RespServerState()
    port, srv = _resp_serve(state)
    try:
        p = tmp_path / "spec.yaml"
        p.write_text(GOOD_SPEC.replace("PORT", str(port)))
        rc = main(["run", str(p), "--data-dir", sf_dir, "--limit", "25"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out == {
            "pipeline": "cli-run", "events": 25, "sinks": {"r1": True}, "ok": True
        }
        entries = [e for s in state.streams.values() for e in s]
        assert len(entries) == 25
        assert set(state.streams) == {"df.events"}
    finally:
        srv.close()


def test_serve_help_surface():
    with pytest.raises(SystemExit) as ei:
        main(["serve", "--help"])
    assert ei.value.code == 0
