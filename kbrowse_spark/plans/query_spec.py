"""QuerySpec: the engine's query IR, with kbrowse CLI parity.

The reference's entire query language is the flat options map built by
`src/kbrowse/cli.clj:21-53`, validated at `cli.clj:55-67`.  This module
is the analyzer: parse -> typed spec -> semantic validation.  The plan
builder (plans/planner.py) turns a valid spec into a DataFrame.

Validation parity (cli.clj:58-66):
* ``default_partition`` requires ``key_regex``
* ``default_partition`` is incompatible with explicit ``partitions``
* ``start_timestamp`` is incompatible with ``relative_offset``
"""

from __future__ import annotations

from dataclasses import dataclass, field


class QuerySpecError(ValueError):
    """Invalid query options (maps to HTTP 400 / CLI usage error — Q8)."""


@dataclass
class QuerySpec:
    # source: either a Kafka cluster or a parquet fixture path
    bootstrap_servers: str | None = None
    source_parquet: str | None = None

    topics: list[str] = field(default_factory=list)
    partitions: list[int] | None = None
    default_partition: bool = False

    key_regex: str | None = None
    value_regex: str | None = None

    key_deserializer: str = "string"  # string | msgpack | avro
    value_deserializer: str = "string"
    # Writer schemas for the avro path (JSON strings). In a deployment
    # with a schema registry these come from the registry client at
    # plan time (kbrowse search.clj:132-133); offline they're supplied.
    avro_key_schema: str | None = None
    avro_value_schema: str | None = None
    # Confluent schema-registry base URL: when set, avro payloads
    # resolve their writer schema per wire-header id at decode time
    # (reference search.clj:132-133); explicit --avro-*-schema wins.
    schema_registry_url: str | None = None

    # Topic partition count for offline (fixture) sources.  The Kafka
    # path gets this from broker metadata; a fixture can only infer
    # max(partition)+1 from data, which under-counts when high
    # partitions happen to be empty — and default-partition pruning
    # (murmur2 mod N) needs the true N.
    num_partitions: int | None = None

    relative_offset: int | None = None
    start_timestamp: str | None = None
    stop_timestamp: str | None = None

    follow: bool = False
    print_offset: int | None = None
    # Scale knobs for hot topics (SURVEY §4 resource governance):
    # min_partitions splits topic-partitions into offset sub-ranges
    # (batch + stream); max_offsets_per_trigger bounds each follow-mode
    # micro-batch (back-pressure).
    min_partitions: int | None = None
    max_offsets_per_trigger: int | None = None
    # None = unset (callers apply their configured default); the
    # reference default is 86400 s.  None (not 86400) so a service can
    # distinguish "client said 86400" from "client said nothing".
    stop_after_seconds: int | None = None

    def validate(self) -> "QuerySpec":
        if self.default_partition and not self.key_regex:
            raise QuerySpecError("--default-partition requires --key-regex")
        if self.default_partition and self.partitions:
            raise QuerySpecError(
                "--default-partition is incompatible with --partitions"
            )
        if self.start_timestamp is not None and self.relative_offset is not None:
            raise QuerySpecError(
                "--start-timestamp is incompatible with --relative-offset"
            )
        if not self.topics and not self.source_parquet:
            raise QuerySpecError("at least one topic (or --source-parquet) required")
        for d in (self.key_deserializer, self.value_deserializer):
            if d not in ("string", "msgpack", "avro"):
                raise QuerySpecError(f"unknown deserializer {d!r}")
        if self.print_offset is not None and self.print_offset <= 0:
            raise QuerySpecError("--print-offset must be positive")
        if self.min_partitions is not None and self.min_partitions <= 0:
            raise QuerySpecError("--min-partitions must be positive")
        if (
            self.max_offsets_per_trigger is not None
            and self.max_offsets_per_trigger <= 0
        ):
            raise QuerySpecError("--max-offsets-per-trigger must be positive")
        return self

    @classmethod
    def from_options(cls, opts: dict) -> "QuerySpec":
        """Build from a flat string-keyed options map (HTTP query args /
        CLI long opts with dashes or underscores)."""
        norm = {k.replace("-", "_"): v for k, v in opts.items()}

        def as_bool(v):
            return str(v).lower() in ("1", "true", "yes", "on", "")

        def as_int(v, name):
            try:
                return int(v)
            except (TypeError, ValueError):
                raise QuerySpecError(f"--{name} must be an integer, got {v!r}")

        spec = cls()
        if "bootstrap_servers" in norm:
            spec.bootstrap_servers = norm["bootstrap_servers"]
        if "source_parquet" in norm:
            spec.source_parquet = norm["source_parquet"]
        if "topics" in norm:
            spec.topics = [t for t in str(norm["topics"]).split(",") if t]
        if "partitions" in norm and norm["partitions"] not in (None, ""):
            spec.partitions = [
                as_int(p, "partitions") for p in str(norm["partitions"]).split(",")
            ]
        if "default_partition" in norm:
            spec.default_partition = as_bool(norm["default_partition"])
        if "key_regex" in norm:
            spec.key_regex = norm["key_regex"]
        if "value_regex" in norm:
            spec.value_regex = norm["value_regex"]
        if "key_deserializer" in norm:
            spec.key_deserializer = norm["key_deserializer"]
        if "value_deserializer" in norm:
            spec.value_deserializer = norm["value_deserializer"]
        if "num_partitions" in norm and norm["num_partitions"] not in (None, ""):
            spec.num_partitions = as_int(norm["num_partitions"], "num-partitions")
        if "avro_key_schema" in norm:
            spec.avro_key_schema = norm["avro_key_schema"]
        if "avro_value_schema" in norm:
            spec.avro_value_schema = norm["avro_value_schema"]
        if "schema_registry_url" in norm:
            spec.schema_registry_url = norm["schema_registry_url"]
        if "relative_offset" in norm and norm["relative_offset"] not in (None, ""):
            spec.relative_offset = as_int(norm["relative_offset"], "relative-offset")
        if "start_timestamp" in norm:
            spec.start_timestamp = norm["start_timestamp"]
        if "stop_timestamp" in norm:
            spec.stop_timestamp = norm["stop_timestamp"]
        if "follow" in norm:
            spec.follow = as_bool(norm["follow"])
        if "print_offset" in norm and norm["print_offset"] not in (None, ""):
            spec.print_offset = as_int(norm["print_offset"], "print-offset")
        if "min_partitions" in norm and norm["min_partitions"] not in (None, ""):
            spec.min_partitions = as_int(norm["min_partitions"], "min-partitions")
        if "max_offsets_per_trigger" in norm and norm[
            "max_offsets_per_trigger"
        ] not in (None, ""):
            spec.max_offsets_per_trigger = as_int(
                norm["max_offsets_per_trigger"], "max-offsets-per-trigger"
            )
        if "stop_after_seconds" in norm:
            spec.stop_after_seconds = as_int(
                norm["stop_after_seconds"], "stop-after-seconds"
            )
        return spec.validate()
