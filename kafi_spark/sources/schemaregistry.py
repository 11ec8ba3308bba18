"""Confluent Schema Registry client (subjects / versions / ids / config).

Mirrors the reference's registry surface (kafi/schemaregistry.py:5-236:
subjects list/delete, version CRUD, lookup by id, compatibility get/set/
test, plus the sls/srm shell aliases) over the public Schema Registry
REST API with stdlib HTTP only — the engine side needs nothing beyond
``get_by_id`` (schema resolution for Confluent-framed Avro,
sources/avro.py). Schemas fetched by id are immutable, so they are
cached for the client's lifetime.
"""

from __future__ import annotations

import fnmatch
import json
import urllib.error
import urllib.request

_CT = "application/vnd.schemaregistry.v1+json"


class SchemaRegistryError(RuntimeError):
    def __init__(self, status: int, body: str):
        super().__init__(f"schema registry HTTP {status}: {body}")
        self.status = status



from kafi_spark.sources.urlutil import quote_segment as _q  # noqa: E402


class SchemaRegistryClient:
    def __init__(self, url: str, auth: tuple[str, str] | None = None, timeout: float = 10.0):
        self.url = url.rstrip("/")
        self.timeout = timeout
        self._headers = {"Content-Type": _CT, "Accept": _CT}
        if auth:
            import base64

            tok = base64.b64encode(f"{auth[0]}:{auth[1]}".encode()).decode()
            self._headers["Authorization"] = f"Basic {tok}"
        self._by_id: dict[int, str] = {}
        self._by_guid: dict[str, str] = {}

    def _req(self, method: str, path: str, body: dict | None = None):
        req = urllib.request.Request(
            self.url + path,
            data=None if body is None else json.dumps(body).encode(),
            headers=self._headers,
            method=method,
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                data = resp.read()
        except urllib.error.HTTPError as e:  # registry errors carry JSON bodies
            raise SchemaRegistryError(e.code, e.read().decode(errors="replace")) from e
        return json.loads(data) if data else None

    # -- subjects (kafi/schemaregistry.py:102-141) --------------------------

    def subjects(self, pattern: str = "*") -> list[str]:
        return sorted(s for s in self._req("GET", "/subjects")
                      if fnmatch.fnmatch(s, pattern))

    sls = subjects  # shell alias

    def delete_subject(self, subject: str, permanent: bool = False) -> list[int]:
        out = self._req("DELETE", f"/subjects/{_q(subject)}")
        if permanent:
            out = self._req("DELETE", f"/subjects/{_q(subject)}?permanent=true")
        return out

    srm = delete_subject

    # -- versions -----------------------------------------------------------

    def versions(self, subject: str) -> list[int]:
        return self._req("GET", f"/subjects/{_q(subject)}/versions")

    def get_version(self, subject: str, version: int | str = "latest") -> dict:
        """-> {subject, id, version, schema, (schemaType)}"""
        return self._req("GET", f"/subjects/{_q(subject)}/versions/{_q(version)}")

    def register(self, subject: str, schema, schema_type: str = "AVRO") -> int:
        body = {"schema": schema if isinstance(schema, str) else json.dumps(schema)}
        if schema_type != "AVRO":
            body["schemaType"] = schema_type
        return self._req("POST", f"/subjects/{_q(subject)}/versions", body)["id"]

    def lookup(self, subject: str, schema, schema_type: str = "AVRO") -> dict:
        """Find the registered version of a schema under a subject."""
        body = {"schema": schema if isinstance(schema, str) else json.dumps(schema)}
        if schema_type != "AVRO":
            body["schemaType"] = schema_type
        return self._req("POST", f"/subjects/{_q(subject)}", body)

    def delete_version(self, subject: str, version: int | str) -> int:
        return self._req("DELETE", f"/subjects/{_q(subject)}/versions/{_q(version)}")

    # -- schemas by id ------------------------------------------------------

    def get_by_id(self, schema_id: int) -> str:
        if schema_id not in self._by_id:
            self._by_id[schema_id] = self._req("GET", f"/schemas/ids/{schema_id}")["schema"]
        return self._by_id[schema_id]

    def get_by_guid(self, guid: str) -> str:
        """Schema text by registry GUID (Confluent's id-in-headers wire
        variant resolves writers this way — kafi/deserializer.py:104-115
        via kafi/schemaregistry.py:215-216). Cached like ids: GUIDs are
        immutable once assigned."""
        if guid not in self._by_guid:
            self._by_guid[guid] = self._req(
                "GET", f"/schemas/guids/{_q(guid)}")["schema"]
        return self._by_guid[guid]

    # -- compatibility (kafi/schemaregistry.py:143-236) ---------------------

    def compatibility_get(self, subject: str | None = None) -> str:
        path = f"/config/{_q(subject)}" if subject else "/config"
        return self._req("GET", path)["compatibilityLevel"]

    def compatibility_set(self, level: str, subject: str | None = None) -> str:
        path = f"/config/{_q(subject)}" if subject else "/config"
        return self._req("PUT", path, {"compatibility": level})["compatibility"]

    def test_compatibility(self, subject: str, schema,
                           version: int | str = "latest") -> bool:
        body = {"schema": schema if isinstance(schema, str) else json.dumps(schema)}
        out = self._req(
            "POST",
            f"/compatibility/subjects/{_q(subject)}/versions/{_q(version)}",
            body
        )
        return bool(out["is_compatible"])
