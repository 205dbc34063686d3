"""Confluent schema-registry client (stdlib HTTP, cached).

The reference resolves Avro writer schemas from a registry at search
time: `src/kbrowse/search.clj:132-133` injects `schema.registry.url`
into the consumer config and Confluent's KafkaAvroDeserializer fetches
`GET /schemas/ids/{id}` per wire-header schema id (registry URLs per
cluster at `config.clj:57-59`).  This is that lookup as a tiny client:
one GET per distinct schema id, memoized forever (schema ids are
immutable in the registry data model, so the cache never invalidates).

Used plan-side (service/CLI resolving a known id) and executor-side
(functions/avro.avro_registry_udf resolves each record's header id).
"""

from __future__ import annotations

import json
import urllib.request


class SchemaRegistryError(RuntimeError):
    """Registry unreachable or returned a non-schema response."""


class SchemaRegistryClient:
    def __init__(self, base_url: str, timeout: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._cache: dict[int, str] = {}

    def get_schema(self, schema_id: int) -> str:
        """Writer schema JSON for a wire-header schema id (cached)."""
        hit = self._cache.get(schema_id)
        if hit is not None:
            return hit
        url = f"{self.base_url}/schemas/ids/{schema_id}"
        try:
            with urllib.request.urlopen(url, timeout=self.timeout) as r:
                payload = json.loads(r.read().decode("utf-8"))
            schema = payload["schema"]
        except Exception as e:  # noqa: BLE001 - single raise site
            raise SchemaRegistryError(f"schema id {schema_id} via {url}: {e}") from e
        self._cache[schema_id] = schema
        return schema
