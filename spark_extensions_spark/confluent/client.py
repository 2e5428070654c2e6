"""Schema Registry client with compat-gated schema evolution.

Python rebuild of the reference's registry wrapper
(`/root/reference/src/main/scala/org/apache/spark/sql/confluent/
ConfluentClient.scala:37-133`):

- subject naming ``<topic>-key`` / ``<topic>-value`` (``:46-49``);
- ``set_or_update_schema``: register when the subject is new; no-op when
  the latest schema is identical; otherwise gate on backward (new reads
  old) or mutual (both directions) compatibility and register, raising
  on violations (``:62-81``, ``:121-132``);
- ``set_or_get_schema``: register when new, else return latest (``:88-92``);
- per-subject and per-id caches (the reference delegates to
  ``CachedSchemaRegistryClient``).

Two backends share the interface:

- :class:`HttpSchemaRegistry` speaks the public Confluent REST API
  (``/subjects/{s}/versions``, ``/schemas/ids/{id}``) via ``requests``;
  picklable (lazy session) so executors can resolve writer schemas by id.
- :class:`InMemorySchemaRegistry` is a process-local registry for tests
  and offline pipelines (the reference mocks its client the same way,
  `ConfluentAvroCatalystTest.scala:43-51`).

Compatibility is checked structurally with the engine's own Avro schema
resolution (:mod:`spark_extensions_spark.schema.avro_codec`): reader
``new`` can read writer ``old`` iff a resolver compiles. This mirrors
Avro's canonical read-compat definition used by the registry's
``isBackwardCompatible``.
"""

from __future__ import annotations

import json
import threading
from typing import Any

from spark_extensions_spark.schema.avro_codec import AvroCodecError, _resolver


class IncompatibleSchemaError(ValueError):
    pass


class SubjectType:
    key = "key"
    value = "value"


def check_can_read(data_schema: Any, read_schema: Any) -> list[str]:
    """Violations preventing ``read_schema`` from reading ``data_schema``
    data (empty list = backward compatible)."""
    try:
        _resolver(data_schema, read_schema)
        return []
    except (AvroCodecError, KeyError, TypeError) as e:
        return [str(e)]


def check_mutual_readable(s1: Any, s2: Any) -> list[str]:
    return check_can_read(s1, s2) + check_can_read(s2, s1)


def _canonical(schema: Any) -> str:
    return json.dumps(schema, sort_keys=True, separators=(",", ":"))


class SchemaRegistryClient:
    """Shared subject/compat logic over a storage backend."""

    def get_subject(self, topic: str, subject_type: str) -> str:
        if subject_type not in (SubjectType.key, SubjectType.value):
            raise ValueError(f"subject_type must be key|value, got {subject_type}")
        return f"{topic}-{subject_type}"

    # backend primitives ---------------------------------------------------
    def _register(self, subject: str, schema: Any, schema_type: str) -> int:
        raise NotImplementedError

    def _latest(self, subject: str) -> tuple[int, Any] | None:
        """(schema_id, schema) of the latest version, None if no subject."""
        raise NotImplementedError

    def _by_id(self, schema_id: int) -> Any:
        raise NotImplementedError

    # public API (reference semantics) ------------------------------------
    def get_latest_schema(self, subject: str) -> tuple[int, Any]:
        latest = self._latest(subject)
        if latest is None:
            raise IncompatibleSchemaError(f"Subject {subject} not found")
        return latest

    def get_schema_by_id(self, schema_id: int) -> Any:
        return self._by_id(schema_id)

    def schema_exists(self, subject: str) -> bool:
        return self._latest(subject) is not None

    def set_or_update_schema(
        self,
        subject: str,
        new_schema: Any,
        mutual_read_check: bool = False,
        schema_type: str = "AVRO",
    ) -> tuple[int, Any]:
        latest = self._latest(subject)
        if latest is None:
            return self._register(subject, new_schema, schema_type), new_schema
        latest_id, latest_schema = latest
        if _canonical(latest_schema) == _canonical(new_schema):
            return latest_id, latest_schema
        if schema_type == "AVRO":
            check = check_mutual_readable if mutual_read_check else check_can_read
            violations = check(latest_schema, new_schema)
        else:
            violations = []  # JSON schemas: structural check not applicable
        if violations:
            mode = "forward & backward" if mutual_read_check else "backward"
            raise IncompatibleSchemaError(
                f"New schema for subject {subject} is not {mode} compatible "
                f"with latest schema: {'; '.join(violations)}"
            )
        return self._register(subject, new_schema, schema_type), new_schema

    def set_or_get_schema(
        self, subject: str, new_schema: Any, schema_type: str = "AVRO"
    ) -> tuple[int, Any]:
        latest = self._latest(subject)
        if latest is None:
            return self._register(subject, new_schema, schema_type), new_schema
        return latest


class InMemorySchemaRegistry(SchemaRegistryClient):
    """Process-local registry; ids are globally unique like Confluent's.

    Picklable: executors deserialize a snapshot of the registry state,
    which is sufficient because the driver registers all schemas at plan
    time before any executor decodes by id.
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._by_subject: dict[str, list[int]] = {}
        self._schemas: dict[int, Any] = {}
        self._next_id = 1

    def __getstate__(self):
        return {
            "by_subject": self._by_subject,
            "schemas": self._schemas,
            "next_id": self._next_id,
        }

    def __setstate__(self, state):
        self._lock = threading.Lock()
        self._by_subject = state["by_subject"]
        self._schemas = state["schemas"]
        self._next_id = state["next_id"]

    def _register(self, subject: str, schema: Any, schema_type: str) -> int:
        with self._lock:
            canon = _canonical(schema)
            for sid, s in self._schemas.items():
                if _canonical(s) == canon:
                    versions = self._by_subject.setdefault(subject, [])
                    if sid not in versions:
                        versions.append(sid)
                    return sid
            sid = self._next_id
            self._next_id += 1
            self._schemas[sid] = schema
            self._by_subject.setdefault(subject, []).append(sid)
            return sid

    def _latest(self, subject: str) -> tuple[int, Any] | None:
        versions = self._by_subject.get(subject)
        if not versions:
            return None
        sid = versions[-1]
        return sid, self._schemas[sid]

    def _by_id(self, schema_id: int) -> Any:
        if schema_id not in self._schemas:
            raise IncompatibleSchemaError(f"Schema id {schema_id} not found")
        return self._schemas[schema_id]


class HttpSchemaRegistry(SchemaRegistryClient):
    """Confluent REST registry backend (public wire API).

    Lazy ``requests.Session`` keeps instances picklable for executor-side
    by-id lookups; responses cache per process like the reference's
    ``CachedSchemaRegistryClient`` (`ConfluentClient.scala:39`).
    """

    def __init__(self, url: str, timeout: float = 30.0):
        self.url = url.rstrip("/")
        self.timeout = timeout
        self._session = None
        self._id_cache: dict[int, Any] = {}

    def __getstate__(self):
        return {"url": self.url, "timeout": self.timeout}

    def __setstate__(self, state):
        self.url = state["url"]
        self.timeout = state["timeout"]
        self._session = None
        self._id_cache = {}

    @property
    def session(self):
        if self._session is None:
            import requests

            self._session = requests.Session()
            self._session.headers[
                "Content-Type"
            ] = "application/vnd.schemaregistry.v1+json"
        return self._session

    def _register(self, subject: str, schema: Any, schema_type: str) -> int:
        body: dict[str, Any] = {"schema": _canonical(schema)}
        if schema_type != "AVRO":
            body["schemaType"] = schema_type
        r = self.session.post(
            f"{self.url}/subjects/{subject}/versions",
            json=body,
            timeout=self.timeout,
        )
        r.raise_for_status()
        return r.json()["id"]

    def _latest(self, subject: str) -> tuple[int, Any] | None:
        r = self.session.get(
            f"{self.url}/subjects/{subject}/versions/latest",
            timeout=self.timeout,
        )
        if r.status_code == 404:
            return None
        r.raise_for_status()
        out = r.json()
        return out["id"], json.loads(out["schema"])

    def _by_id(self, schema_id: int) -> Any:
        if schema_id in self._id_cache:
            return self._id_cache[schema_id]
        r = self.session.get(
            f"{self.url}/schemas/ids/{schema_id}", timeout=self.timeout
        )
        r.raise_for_status()
        schema = json.loads(r.json()["schema"])
        self._id_cache[schema_id] = schema
        return schema
