"""Contract-level spark-sql-kafka fake (VERDICT r7 #6).

The sandbox cannot reach Maven Central, so the real
``spark-sql-kafka-0-10`` jar has never executed. This fake closes the
seam from the OTHER side: a PySpark Python DataSource registered under
the exact name ``kafka``, implementing the connector's documented
batch-read contract —

- options: ``kafka.bootstrap.servers`` (required), ``subscribe``
  (comma-separated topics; the only subscription mode the engine
  emits), ``startingOffsets`` (``earliest`` | JSON
  ``{topic: {"partition": offset}}``), ``endingOffsets`` (``latest`` |
  JSON map) — the same matrix ``KafkaSourceProvider`` validates;
- output schema: ``key binary, value binary, topic string,
  partition int, offset long, timestamp timestamp, timestampType int``
  (the connector's fixed schema);
- semantics: one input partition per (topic, partition); rows at
  ``offset >= startingOffsets[topic][partition]`` (inclusive start,
  exclusive ``latest`` end), offsets contiguous per partition.

Because registration is BY NAME, the production jar path in
``delta_streamer._pull_kafka`` (``spark.read.format("kafka")`` with the
translated options) executes UNCHANGED against this fake — dropping in
the real jar needs zero engine-code changes, which is exactly the
contract the tests pin. Every option-matrix violation raises loudly so
a translation regression cannot pass silently.

The broker log lives in a JSON file named by the
``kafka.bootstrap.servers`` option as ``mock://<path>`` — file format
``{topic: {"<partition>": [value, ...]}}`` (offset = list index, the
Kafka log contract).
"""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

CONNECTOR_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)

# epoch the fake stamps on every record (deterministic, UTC)
_TS = datetime.datetime(2021, 1, 1, tzinfo=datetime.timezone.utc)


class KafkaContractError(ValueError):
    """Option-matrix violation — the fake refuses anything the real
    KafkaSourceProvider would refuse (and anything outside the subset
    the engine is specified to emit)."""


def _parse_offsets(raw: str, which: str) -> dict | str:
    if raw in ("earliest", "latest"):
        return raw
    try:
        parsed = json.loads(raw)
    except (TypeError, json.JSONDecodeError) as e:
        raise KafkaContractError(
            f"{which} must be 'earliest'/'latest' or a JSON offset map, "
            f"got {raw!r}"
        ) from e
    if not isinstance(parsed, dict):
        raise KafkaContractError(f"{which} JSON must be an object: {raw!r}")
    for topic, parts in parsed.items():
        if not isinstance(parts, dict):
            raise KafkaContractError(
                f"{which}[{topic!r}] must map partition->offset: {parts!r}"
            )
        for p, o in parts.items():
            if not str(p).lstrip("-").isdigit() or not isinstance(o, int):
                raise KafkaContractError(
                    f"{which}[{topic!r}] has non-numeric partition/offset "
                    f"({p!r}: {o!r})"
                )
            if o < 0:
                # the real connector's -1/-2 latest/earliest sentinels:
                # the engine never emits them (it stores concrete
                # next-offsets), so the fake refuses rather than serve
                # Python-negative-index rows that LOOK like data
                # (code-review r8)
                raise KafkaContractError(
                    f"{which}[{topic!r}][{p!r}] = {o}: sentinel/negative "
                    "offsets are not part of the engine's contract"
                )
    return parsed


class _TopicPartition(InputPartition):
    def __init__(self, topic: str, partition: int, begin: int, values: list):
        self.topic = topic
        self.partition = partition
        self.begin = begin
        self.values = values


class FakeKafkaReader(DataSourceReader):
    def __init__(self, options: dict):
        servers = options.get("kafka.bootstrap.servers")
        if not servers:
            raise KafkaContractError(
                "kafka.bootstrap.servers is required (KafkaSourceProvider "
                "rejects a reader without it)"
            )
        if not servers.startswith("mock://"):
            raise KafkaContractError(
                f"fake broker expects mock://<log.json>, got {servers!r}"
            )
        self.log_path = servers[len("mock://"):]
        modes = [
            k for k in ("subscribe", "assign", "subscribepattern") if k in options
        ]
        if modes != ["subscribe"]:
            raise KafkaContractError(
                "exactly one subscription mode is required and the engine "
                f"only emits 'subscribe'; got {modes}"
            )
        self.topics = [t.strip() for t in options["subscribe"].split(",") if t.strip()]
        if not self.topics:
            raise KafkaContractError("subscribe names no topics")
        self.starting = _parse_offsets(
            options.get("startingoffsets", "earliest"), "startingOffsets"
        )
        if self.starting == "latest":
            raise KafkaContractError(
                "startingOffsets=latest is meaningless for a batch read "
                "(KafkaSourceProvider rejects it)"
            )
        ending = _parse_offsets(options.get("endingoffsets", "latest"), "endingOffsets")
        if ending != "latest":
            raise KafkaContractError(
                "the engine always reads to endingOffsets=latest; got "
                f"{ending!r}"
            )
        if isinstance(self.starting, dict):
            # specific-offset mode: EVERY subscribed topic must appear —
            # the real connector throws for TopicPartitions without an
            # offset (KafkaOffsetReader.fetchSpecificOffsets)
            missing = [t for t in self.topics if t not in self.starting]
            if missing:
                raise KafkaContractError(
                    "startingOffsets JSON omits subscribed topic(s) "
                    f"{missing} — the connector requires every "
                    "TopicPartition listed"
                )

    def _load_log(self) -> dict:
        if not os.path.exists(self.log_path):
            raise KafkaContractError(f"broker log not found: {self.log_path}")
        with open(self.log_path) as f:
            return json.load(f)

    def partitions(self):
        log = self._load_log()
        out = []
        for topic in self.topics:
            parts = log.get(topic, {})
            for p_str, values in sorted(parts.items()):
                p = int(p_str)
                if isinstance(self.starting, dict):
                    if p_str not in self.starting.get(topic, {}):
                        # a partition added between rounds: the real
                        # KafkaOffsetReader throws ("startingOffsets
                        # must specify all TopicPartitions") — silently
                        # defaulting to 0 would mask an engine
                        # offset-translation regression (code-review r8)
                        raise KafkaContractError(
                            f"startingOffsets specifies topic {topic!r} "
                            f"but not its partition {p} — the connector "
                            "requires every TopicPartition listed"
                        )
                    begin = int(self.starting[topic][p_str])
                else:  # earliest
                    begin = 0
                out.append(_TopicPartition(topic, p, begin, list(values)))
        # the real connector returns an empty plan for no data; Spark
        # requires >=1 partition object, so emit one empty marker
        return out or [_TopicPartition(self.topics[0], 0, 0, [])]

    def read(self, part: _TopicPartition):
        for offset in range(part.begin, len(part.values)):
            value = part.values[offset]
            yield (
                None,  # key: the engine's JSON sources are keyless
                value.encode("utf-8"),
                part.topic,
                part.partition,
                offset,
                _TS,
                0,  # TimestampType.CREATE_TIME
            )


class FakeKafkaDataSource(DataSource):
    """Registered as ``kafka_mock`` — Spark's ``lookupDataSource``
    special-cases the literal name ``kafka`` (it throws its
    "deploy the Kafka integration" error before consulting the Python
    data source registry), so shadowing the real short name is
    impossible by design. The engine's jar path instead takes the name
    from ``source_options["connector_format"]`` (default ``kafka``);
    everything else — option matrix, schema, semantics — is the real
    connector's contract."""

    @classmethod
    def name(cls) -> str:
        return "kafka_mock"

    def schema(self) -> str:
        return CONNECTOR_SCHEMA

    def reader(self, schema) -> FakeKafkaReader:
        return FakeKafkaReader(self.options)


def register(spark) -> None:
    """Idempotent per-session registration (tests share the session).
    Ships this module to the executors' Python workers too — the
    DataSource class is pickled by reference and unpickled there."""
    try:
        spark.sparkContext.addPyFile(os.path.abspath(__file__))
    except Exception:
        pass  # already added in this session
    try:
        spark.dataSource.register(FakeKafkaDataSource)
    except Exception as e:
        if "ALREADY_EXISTS" not in str(e):
            raise


def write_log(path: str, log: dict) -> None:
    """Persist a broker log: {topic: {"<partition>": [value, ...]}}."""
    with open(path, "w") as f:
        json.dump(log, f)
