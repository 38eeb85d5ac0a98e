"""Schema registry: named schema documents ``{schema_name, fields}``.

The reference stores these in Couchbase and fetches by document key
(N1QL ``USE KEYS``, src/services/index.js:31-41). Here the registry is a
plain JSON file (or directory of files) — schemas are *data*, templates
became code paths (SURVEY.md §7), so only the data registry survives.
"""

from __future__ import annotations

import json
import os

from ..operators.compiler import FieldSpec


class SchemaRegistry:
    def __init__(self, path: str | None = None):
        self._path = path
        self._schemas: dict[str, list[FieldSpec]] = {}
        if path and os.path.exists(path):
            self._load(path)

    def _load(self, path: str) -> None:
        files = (
            [os.path.join(path, fn) for fn in sorted(os.listdir(path)) if fn.endswith(".json")]
            if os.path.isdir(path)
            else [path]
        )
        for f in files:
            with open(f) as fh:
                doc = json.load(fh)
            # both single-document and list-of-documents files round-trip
            for item in doc if isinstance(doc, list) else [doc]:
                self._ingest(item)

    def _ingest(self, doc: dict) -> None:
        self._schemas[doc["schema_name"]] = [
            FieldSpec.from_dict(f) for f in doc["fields"]
        ]

    # the reference's GET /api/proc-data?schemaName=X (controllers/index.js:4-7)
    def get(self, schema_name: str) -> list[FieldSpec]:
        try:
            return self._schemas[schema_name]
        except KeyError:
            raise KeyError(f"schema {schema_name!r} not registered") from None

    def put(self, schema_name: str, fields: list[FieldSpec]) -> None:
        self._schemas[schema_name] = fields

    def names(self) -> list[str]:
        return sorted(self._schemas)

    def save(self, path: str | None = None) -> None:
        path = path or self._path
        if not path:
            raise ValueError("no path to save registry to")
        docs = [
            {"schema_name": name, "fields": [f.to_dict() for f in fields]}
            for name, fields in sorted(self._schemas.items())
        ]
        if os.path.isdir(path):
            # directory registry: one file per schema (the loadable shape)
            for doc in docs:
                with open(os.path.join(path, f"{doc['schema_name']}.json"), "w") as fh:
                    json.dump(doc, fh, indent=2)
        else:
            with open(path, "w") as fh:
                json.dump(docs, fh, indent=2)
