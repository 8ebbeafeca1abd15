"""Schema-registry interface for the Avro boundary.

Connect's AvroConverter resolves the writer schema named by each
payload's Confluent frame against a schema registry (reference config
surface: ``value.converter.schema.registry.url`` in the integration
tests' converter setup). This module is that seam, engine-side:

* :class:`SchemaRegistry` — the protocol the decode path consumes:
  ``get_by_id(schema_id) -> Avro schema dict`` (raise ``KeyError`` for
  unknown ids — the boundary maps that to the per-record error
  contract, same as a malformed payload).
* :class:`FileSchemaRegistry` — the default, network-free impl: an
  in-memory ``{schema_id: schema}`` snapshot, or the JSON file the
  ``value.converter.writer.schemas.file`` property names. Exactly the
  semantics the boundary had before the seam existed, so evolving-
  topic behavior is unchanged.
* :class:`HttpSchemaRegistry` — Confluent Schema Registry REST client
  (``GET /schemas/ids/{id}``) on stdlib ``urllib`` — no extra
  dependency. Responses are cached per instance, and the instance is
  picklable (url + token only), so each executor fetches a given id
  at most once per decode task; nothing is called at plan-build time.

Scale shape: registry lookups happen INSIDE the Arrow-batched decode
workers, once per distinct schema id per worker (cached thereafter) —
a 100 TB topic with a handful of schema versions costs a handful of
HTTP GETs per executor, not per row.
"""

from __future__ import annotations

import json
from typing import Any, Protocol, runtime_checkable


@runtime_checkable
class SchemaRegistry(Protocol):
    """What the Avro decode path needs from a registry."""

    def get_by_id(self, schema_id: int) -> dict:
        """Avro schema (parsed JSON dict) for a registry id; raises
        ``KeyError`` when the id is unknown."""
        ...


class FileSchemaRegistry:
    """Registryless snapshot of the id->schema map (the offline
    default): pass the dict directly, or a path to a JSON file shaped
    ``{"<id>": <avro schema>, ...}`` — the same format the
    ``value.converter.writer.schemas.file`` property loads."""

    def __init__(
        self,
        schemas_by_id: dict[int, Any] | None = None,
        path: str | None = None,
    ) -> None:
        if (schemas_by_id is None) == (path is None):
            raise ValueError(
                "pass exactly one of schemas_by_id or path"
            )
        if path is not None:
            with open(path) as f:
                schemas_by_id = json.load(f)
        self._schemas = {
            int(k): (json.loads(v) if isinstance(v, str) else v)
            for k, v in schemas_by_id.items()
        }

    def get_by_id(self, schema_id: int) -> dict:
        return self._schemas[int(schema_id)]

    def ids(self) -> list[int]:
        return sorted(self._schemas)


class HttpSchemaRegistry:
    """Confluent Schema Registry REST client, stdlib-only.

    ``get_by_id`` issues ``GET {url}/schemas/ids/{id}`` and parses the
    response's ``schema`` field (a JSON-encoded Avro schema string, per
    the public Schema Registry API). Unknown ids (HTTP 404) raise
    ``KeyError`` so the boundary's error contract applies. Instances
    hold only the url/auth token and a response cache, so they pickle
    into decode workers cleanly."""

    def __init__(
        self,
        url: str,
        *,
        timeout: float = 10.0,
        bearer_token: str | None = None,
    ) -> None:
        self.url = url.rstrip("/")
        self.timeout = timeout
        self._token = bearer_token
        self._cache: dict[int, dict] = {}

    def __getstate__(self) -> dict:
        # ship config, not cached responses, to workers
        s = self.__dict__.copy()
        s["_cache"] = {}
        return s

    def get_by_id(self, schema_id: int) -> dict:
        sid = int(schema_id)
        if sid in self._cache:
            return self._cache[sid]
        import urllib.error
        import urllib.request

        req = urllib.request.Request(f"{self.url}/schemas/ids/{sid}")
        if self._token:
            req.add_header("Authorization", f"Bearer {self._token}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                body = json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise KeyError(f"unknown schema id {sid}") from e
            raise
        schema = body["schema"]
        parsed = json.loads(schema) if isinstance(schema, str) else schema
        self._cache[sid] = parsed
        return parsed
