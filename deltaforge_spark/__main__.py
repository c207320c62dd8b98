"""Operational entry point — the reference ships a server binary
(`deltaforge --config …`); this is its engine-side analog:

    python -m deltaforge_spark validate spec.yaml
    python -m deltaforge_spark run spec.yaml --data-dir DIR [--limit N]
    python -m deltaforge_spark serve --state-dir DIR [--port P]

``validate`` parses + compiles the spec (both the reference vocabulary
and the native compiler form) without touching data — the REST
``POST /validate`` behavior, exit 0/1. ``run`` executes one batch of a
reference-vocabulary pipeline against a parquet data dir, resolving
live wire transports from the sink configs (plans/wiring.py).
``serve`` starts the HTTP control plane over a PipelineManager and
blocks until SIGINT.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_spec(path: str) -> dict:
    import yaml

    with open(path) as f:
        text = f.read()
    from .plans.refspec import expand_env

    return yaml.safe_load(expand_env(text))


def cmd_validate(args) -> int:
    spec = _load_spec(args.spec)
    try:
        if spec.get("apiVersion") == "deltaforge/v1":
            # the reference vocabulary validates (and REJECTS) as-is —
            # an unknown source type must fail, not fall through
            from .plans.refspec import compile_reference_pipeline, parse_reference_spec

            ref = parse_reference_spec(spec)
            compile_reference_pipeline(ref, js_policy="identity")
            warnings = ref.warnings
        else:
            from .plans.compiler import PipelineSpec, compile_pipeline

            compile_pipeline(PipelineSpec.from_dict(spec))
            warnings = []
    except Exception as e:
        print(json.dumps({"valid": False, "error": f"{type(e).__name__}: {e}"}))
        return 1
    print(json.dumps({"valid": True, "warnings": warnings}))
    return 0


def _binlog_schemas_from_spec(ref):
    """The spec-carried schema registry for archive sources: a mysql
    source with ``binlog_dir`` (or postgres with ``wal_dir``) names its
    table columns + after-image schema inline — the role the reference
    fills from the live DB catalog (mysql_event.rs handle_table_map →
    load_schema); an archive run has no live DB to ask::

        source:
          config:
            binlog_dir: /segments.parquet
            schema:
              columns: {"testdb.events": [id, user_id, ...]}
              image_ddl: "id bigint, user_id bigint, ..."
              ts_ms_field: ts_ms
    """
    cfg = ref.source.extra.get("schema")
    if not cfg:
        return None
    from pyspark.sql import types as T

    cols = {
        tuple(name.split(".", 1)): list(v)
        for name, v in (cfg.get("columns") or {}).items()
    }
    image = T.StructType.fromDDL(cfg["image_ddl"])
    return cols, image, cfg.get("ts_ms_field", "ts_ms")


def cmd_run(args) -> int:
    from .plans.refspec import compile_reference_pipeline, parse_reference_spec
    from .plans.wiring import resolve_transports
    from .session import get_spark
    from .sinks.foreach import fan_out_batch

    spec = _load_spec(args.spec)
    ref = parse_reference_spec(spec)
    spark = get_spark(ref.name)
    program, sinks, policy, _ = compile_reference_pipeline(
        ref,
        transports=resolve_transports(ref),
        binlog_schemas=_binlog_schemas_from_spec(ref),
    )
    df = program(spark, args.data_dir)
    if args.limit:
        df = df.limit(args.limit)
    df = df.cache()
    n = df.count()
    outcomes = fan_out_batch(df, args.batch_id, sinks, policy=policy)
    for s in sinks:  # shutdown flush (reference main.rs: roll on drop)
        if s.close is not None and outcomes.get(s.name, False):
            s.close()
    ok = all(outcomes.get(s.name, False) for s in sinks if s.required)
    print(json.dumps({"pipeline": ref.name, "events": n, "sinks": outcomes, "ok": ok}))
    return 0 if ok else 1


def cmd_serve(args) -> int:
    from .control import PipelineManager
    from .rest import ControlPlaneServer
    from .session import get_spark

    spark = get_spark("control-plane")
    catalog_execute = None
    if args.mysql_catalog:
        import socket

        from .sources.tailloop import mysql_catalog_execute

        host, _, port = args.mysql_catalog.rpartition(":")

        def _dial(h=host or "127.0.0.1", p=int(port)):
            return socket.create_connection((h, p))

        catalog_execute = mysql_catalog_execute(
            _dial, args.db_user or "", args.db_password or ""
        )
    mgr = PipelineManager(spark, args.state_dir, catalog_execute=catalog_execute)
    srv = ControlPlaneServer(mgr, host=args.host, port=args.port).start()
    print(json.dumps({"listening": f"http://{args.host}:{srv.port}"}), flush=True)
    try:
        import signal
        import threading

        stop = threading.Event()
        signal.signal(signal.SIGINT, lambda *a: stop.set())
        signal.signal(signal.SIGTERM, lambda *a: stop.set())
        stop.wait()
    finally:
        srv.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="deltaforge_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="parse + compile a spec, touch no data")
    v.add_argument("spec")
    v.set_defaults(fn=cmd_validate)

    r = sub.add_parser("run", help="one batch of a reference-vocabulary pipeline")
    r.add_argument("spec")
    r.add_argument("--data-dir", required=True)
    r.add_argument("--limit", type=int, default=0)
    r.add_argument("--batch-id", type=int, default=0)
    r.set_defaults(fn=cmd_run)

    s = sub.add_parser("serve", help="HTTP control plane")
    s.add_argument("--state-dir", required=True)
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8080)
    s.add_argument("--mysql-catalog", help="host:port for live schemas/reload")
    s.add_argument("--db-user")
    s.add_argument("--db-password")
    s.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
