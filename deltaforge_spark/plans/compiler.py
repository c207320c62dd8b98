"""Declarative pipeline compiler: YAML spec → DataFrame program.

Re-expresses the reference's primary entry point (reference:
crates/runner/src/main.rs:47-110 config load with env expansion;
crates/deltaforge-config/src/lib.rs:65-140 PipelineSpec{metadata,
spec{source, processors[], sinks[], batch, commit_policy}};
pipeline_manager.rs:417-641 build). Same spec vocabulary, Spark build:

```yaml
metadata: {name: orders-cdc}
spec:
  source: {type: snapshot, table: orders, db: testdb}      # or changefeed
  processors:
    - type: filter
      ops: [c, u]
      fields: [{field: total, op: gte, value: 100}]
    - type: flatten
      max_depth: 8
    - type: route
      topic: "df-${source.table}-${op}"
      key: "${after.o_orderkey}"
    - type: envelope
      kind: cloudevents          # native | debezium | cloudevents
  sinks:
    - {name: lake, type: lake, path: /tmp/lake, format: parquet}
    - {name: console, type: noop, required: false}
  commit_policy: {kind: required}
```

Processors become pure DataFrame→DataFrame functions; the program runs
in batch (oracle mode) or wraps into a StreamingPipeline unchanged.
Env-var expansion: ``${ENV:NAME}`` resolved at load, unknown vars kept
as runtime routing templates (main.rs env semantics).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import (
    FilterSpec,
    OutboxSpec,
    apply_filter,
    envelope_cloudevents,
    envelope_debezium,
    envelope_native,
    flatten_events,
    outbox_transform,
    with_routing,
)
from ..operators.synthetic import sink_filter
from ..sinks import CommitPolicy, SinkSpec, write_lake
from ..sources import change_feed, read_table, snapshot_events

_ENV = re.compile(r"\$\{ENV:([A-Za-z0-9_]+)\}")


def _expand_env(text: str) -> str:
    return _ENV.sub(lambda m: os.environ.get(m.group(1), m.group(0)), text)


@dataclass
class PipelineSpec:
    name: str
    source: dict[str, Any]
    processors: list[dict[str, Any]] = field(default_factory=list)
    sinks: list[dict[str, Any]] = field(default_factory=list)
    commit_policy: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "PipelineSpec":
        spec = d.get("spec", d)
        return cls(
            name=d.get("metadata", {}).get("name", "pipeline"),
            source=spec["source"],
            processors=spec.get("processors", []),
            sinks=spec.get("sinks", []),
            commit_policy=spec.get("commit_policy", {}),
        )


def load_spec(path_or_yaml: str) -> PipelineSpec:
    import yaml

    text = path_or_yaml
    if os.path.exists(path_or_yaml):
        with open(path_or_yaml) as f:
            text = f.read()
    return PipelineSpec.from_dict(yaml.safe_load(_expand_env(text)))


# ------------------------------------------------------------ processors
def _build_processor(p: dict) -> Callable[[DataFrame], DataFrame]:
    kind = p["type"]
    if kind == "filter":
        spec = FilterSpec(
            ops=p.get("ops"),
            include_tables=p.get("include_tables"),
            exclude_tables=p.get("exclude_tables"),
            fields=p.get("fields", []),
            match=p.get("match", "all"),
        )
        return lambda df: apply_filter(df, spec)
    if kind == "flatten":
        kw = {k: p[k] for k in ("max_depth", "list_policy", "index_limit", "collision", "sep") if k in p}
        if p.get("mode", "in_place") == "in_place":
            # reference semantics: flatten INSIDE the row images, the
            # envelope keeps its shape → composes with any downstream
            # processor; mode: project gives the Arrow-flat lake shape
            from ..operators.flatten import flatten_payloads_in_place

            return lambda df: flatten_payloads_in_place(df, **kw)
        return lambda df: flatten_events(df, **kw)
    if kind == "outbox":
        spec = OutboxSpec(
            **{
                k: p[k]
                for k in (
                    "aggregate_type_col",
                    "aggregate_id_col",
                    "event_type_col",
                    "payload_col",
                    "topic_template",
                    "topic_col",
                    "default_topic",
                    "key_template",
                    "raw_payload",
                    "strict",
                )
                if k in p
            }
        )
        return lambda df: outbox_transform(df, spec)
    if kind == "route":
        return lambda df: with_routing(
            df,
            topic_template=p.get("topic"),
            key_template=p.get("key"),
            headers=p.get("headers"),
        )
    if kind == "envelope":
        fn = {"native": envelope_native, "debezium": envelope_debezium, "cloudevents": envelope_cloudevents}[
            p.get("kind", "native")
        ]
        return lambda df: fn(df)
    if kind == "python":
        # the JS-processor analog (reference processors/src/js.rs): a
        # user batch hook `module:function` run via mapInPandas contract
        mod_name, fn_name = p["callable"].rsplit(":", 1)
        import importlib

        hook = getattr(importlib.import_module(mod_name), fn_name)
        return hook
    if kind == "pii_redact":
        # beyond-reference training-data processor: redact PII classes
        # in one payload column, map-only (operators/pii.py)
        from ..operators.pii import redact_pii

        col = p.get("column", "after")

        def _redact(df: DataFrame) -> DataFrame:
            from pyspark.sql import functions as F

            return df.withColumn(col, redact_pii(F.col(col)))

        return _redact
    if kind == "quality_filter":
        # gate events on the per-row Gopher quality rules over a text
        # column (the shuffle-free subset — repetition metrics are a
        # batch corpus job, not a streaming per-event gate)
        from ..operators.quality import gopher_flags

        col = p.get("column", "after")
        gates = p.get(
            "gates",
            ["ok_word_count", "ok_mean_word_len", "ok_symbol_ratio", "ok_alpha_words", "ok_stopwords"],
        )

        def _quality(df: DataFrame) -> DataFrame:
            from pyspark.sql import functions as F

            flags = gopher_flags(F.col(col))
            cond = None
            for g in gates:
                cond = flags[g] if cond is None else (cond & flags[g])
            return df.filter(cond if cond is not None else F.lit(True))

        return _quality
    raise ValueError(f"unknown processor type {kind!r}")


# ------------------------------------------------------------ sinks
def _build_sink(s: dict, pipeline: str = "pipeline") -> SinkSpec:
    kind = s["type"]
    name = s.get("name", kind)
    transport_conf = None
    flt = None
    if any(k in s for k in ("exclude_synthetic", "synthetic_only", "producers")):
        flt = lambda df: sink_filter(  # noqa: E731
            df,
            exclude_synthetic=s.get("exclude_synthetic", False),
            synthetic_only=s.get("synthetic_only", False),
            producers=s.get("producers"),
        )
    if kind == "lake":
        write = lambda df: write_lake(  # noqa: E731
            df, s["path"], fmt=s.get("format", "parquet")
        )
    elif kind == "parquet":
        write = lambda df: df.write.mode("append").parquet(s["path"])  # noqa: E731
    elif kind == "kafka":
        from ..sinks.kafka import write_kafka

        write = lambda df: write_kafka(  # noqa: E731
            df,
            bootstrap=s["bootstrap"],
            default_topic=s.get("topic"),
            client_conf=s.get("client_conf"),
        )
    elif kind == "kafka_eos":
        # exactly-once tier (sinks/kafka_eos.py): transactional per-
        # partition producers; `spool_dir` selects the brokerless file
        # transport (tests/CI), else confluent-kafka against `bootstrap`
        from ..sinks.kafka_eos import (
            confluent_producer_factory,
            file_broker_producer_factory,
            resolve_producer_config,
            write_kafka_eos,
        )

        # the tuning surface (performance.md:58-76): defaults + user
        # client_conf overrides resolve HERE, once, and ride to every
        # per-partition producer
        transport_conf = resolve_producer_config(
            brokers=s.get("bootstrap", ""),
            sink_id=name,
            pipeline=pipeline,
            exactly_once=True,
            client_conf=s.get("client_conf"),
        )
        if "spool_dir" in s:
            factory = file_broker_producer_factory(s["spool_dir"], config=transport_conf)
        elif s.get("transport") == "wire":
            # the stdlib Kafka protocol producer (sinks/kafkawire.py):
            # RecordBatch v2 + transactional Produce over a raw socket —
            # no client library required
            from ..sinks.kafkawire import kafka_wire_producer_factory

            host, _, port = str(s["bootstrap"]).rpartition(":")
            factory = kafka_wire_producer_factory(
                host or "127.0.0.1", int(port),
                num_partitions=int(s.get("num_partitions", 4)),
            )
        else:
            factory = confluent_producer_factory(
                s["bootstrap"],
                sink_id=name,
                pipeline=pipeline,
                client_conf=s.get("client_conf"),
            )
        payload_fn = None
        if s.get("encoding") == "avro":
            # Avro value encoding with SR registration (reference wires
            # the Avro encoder per sink: sinks_cfg.rs encoding block).
            # `registry` is an injected transport object with .post —
            # InMemoryRegistry in tests, an HTTP poster in production.
            from ..sinks.avro import avro_kafka_payload
            from ..sinks.avro_schema import SchemaRegistryClient

            client = SchemaRegistryClient(s["registry"].post)
            strategy = s.get("subject_strategy", "topic_name")
            payload_fn = lambda df, topic: avro_kafka_payload(  # noqa: E731
                df, client, default_topic=topic, strategy=strategy
            )
        write = lambda df: write_kafka_eos(  # noqa: E731
            df,
            factory,
            pipeline=pipeline,
            sink_id=name,
            default_topic=s.get("topic"),
            payload_fn=payload_fn,
        )
    elif kind == "noop":
        write = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731
    else:
        raise ValueError(f"unknown sink type {kind!r}")
    return SinkSpec(
        name=name,
        write=write,
        required=s.get("required", True),
        filter=flt,
        transport_conf=transport_conf,
    )


# ------------------------------------------------------------ program
def compile_pipeline(
    spec: PipelineSpec,
) -> tuple[Callable[[SparkSession, str], DataFrame], list[SinkSpec], CommitPolicy]:
    """Returns (program, sinks, policy): program(spark, sf_dir) builds
    the transformed DataFrame; caller runs it in batch or hands it to
    StreamingPipeline."""
    src = spec.source
    procs = [_build_processor(p) for p in spec.processors]

    def program(spark: SparkSession, sf_dir: str) -> DataFrame:
        if src["type"] == "snapshot":
            df = snapshot_events(
                read_table(spark, sf_dir, src["table"]),
                db=src.get("db", "testdb"),
                table=src["table"],
                pipeline=spec.name,
                event_id=F.col(src["event_id_col"]).cast("string") if "event_id_col" in src else None,
            )
        elif src["type"] == "changefeed":
            df = change_feed(spark, sf_dir, db=src.get("db", "testdb"), pipeline=spec.name)
        elif src["type"] == "parquet":
            # absolute path, or a named testdata/lake table under sf_dir
            df = (
                spark.read.parquet(src["path"])
                if "path" in src
                else read_table(spark, sf_dir, src["table"])
            )
        else:
            raise ValueError(f"unknown source type {src['type']!r}")
        for t in procs:
            df = t(df)
        return df

    sinks = [_build_sink(s, spec.name) for s in spec.sinks]
    cp = CommitPolicy(spec.commit_policy.get("kind", "required"), spec.commit_policy.get("quorum", 0))
    return program, sinks, cp
