"""Engine configuration (kbrowse `src/kbrowse/config.clj` parity):
YAML file + environment-variable overrides, same keys and defaults as
`config/default.yml` in the reference.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    clusters: dict[str, str] = field(default_factory=dict)
    # bootstrap-servers -> Confluent schema-registry URL (reference
    # config.clj:57-59: registry configured per cluster).
    schema_registry_urls: dict[str, str] = field(default_factory=dict)
    default_bootstrap_servers: str = "localhost:9092"
    kafka_timeout_ms: int = 5000
    kafka_topics_cache_sleep_seconds: int = 300
    cache_max_items: int = 100
    cache_ttl_minutes: int = 60
    cache_item_size_limit: int = 4 * 1024 * 1024
    stop_consumers_after_n_seconds: int = 86400

    @classmethod
    def load(cls, path: str | None = None) -> "EngineConfig":
        cfg = cls()
        data: dict = {}
        path = path or os.environ.get("KBROWSE_CONFIG")
        if path and os.path.exists(path):
            import yaml

            with open(path) as f:
                data = yaml.safe_load(f) or {}
        for k in (
            "kafka_timeout_ms",
            "kafka_topics_cache_sleep_seconds",
            "cache_max_items",
            "cache_ttl_minutes",
            "cache_item_size_limit",
            "stop_consumers_after_n_seconds",
        ):
            yk = k.replace("_", "-")
            if yk in data:
                setattr(cfg, k, int(data[yk]))
            env = os.environ.get(f"KBROWSE_{k.upper()}")
            if env is not None:
                setattr(cfg, k, int(env))
        if "clusters" in data:
            cfg.clusters = dict(data["clusters"])
        if "schema-registry-urls" in data:
            cfg.schema_registry_urls = dict(data["schema-registry-urls"])
        if "default-bootstrap-servers" in data:
            cfg.default_bootstrap_servers = data["default-bootstrap-servers"]
        if os.environ.get("KBROWSE_BOOTSTRAP_SERVERS"):
            cfg.default_bootstrap_servers = os.environ["KBROWSE_BOOTSTRAP_SERVERS"]
        return cfg
