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

    def update_all(self, docs: list[dict]) -> None:
        """Bulk upsert/delete, same contract as the reference's
        ``updateAllTemplates`` (src/services/index.js:54-68): each doc
        with truthy ``fields`` is upserted, a falsy ``fields`` removes
        the entry; per-item failures don't abort the batch."""
        for doc in docs:
            try:
                if doc.get("fields"):
                    self._ingest(doc)
                else:
                    self._schemas.pop(doc["schema_name"], None)
            except Exception:  # mirror the reference's log-and-continue
                continue

    def names(self) -> list[str]:
        return sorted(self._schemas)

    def get_all(self) -> list[dict]:
        """All documents, the reference's get-all response shape
        (``{schema_name, fields}`` rows, src/services/index.js:43-52)."""
        return [
            {"schema_name": name, "fields": [f.to_dict() for f in fields]}
            for name, fields in sorted(self._schemas.items())
        ]

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


class TemplateRegistry:
    """Named-template store with the reference's full CRUD surface
    (src/services/index.js:43-79). The engine itself doesn't *run*
    templates — they became code paths (plans/pipeline.py) — but a user
    migrating from the reference still has template documents to carry
    over, so the storage contract is kept 1:1:

    * :meth:`get_all`          — list ``{template_name, template}`` rows
      (``getAllTemplates``, :43-52)
    * :meth:`update_all`       — bulk upsert; a falsy ``template`` deletes,
      per-item failures don't abort the batch (``updateAllTemplates``,
      :54-68)
    * :meth:`get_by_name`      — point lookup that backtick-escapes the
      stored text exactly like the reference (``getTemplateByName``,
      :70-79)
    """

    def __init__(self, path: str | None = None):
        self._path = path
        self._templates: dict[str, str] = {}
        if path and os.path.exists(path):
            with open(path) as fh:
                self._templates = dict(json.load(fh))

    def get_all(self) -> list[dict]:
        return [
            {"template_name": name, "template": tmpl}
            for name, tmpl in sorted(self._templates.items())
        ]

    def update_all(self, templates: list[dict]) -> None:
        for doc in templates:
            try:
                if doc.get("template"):
                    self._templates[doc["template_name"]] = doc["template"]
                else:
                    self._templates.pop(doc["template_name"], None)
            except Exception:  # reference logs and continues per item
                continue

    def get_by_name(self, template_name: str) -> str:
        # the reference escapes backticks in the returned text
        # (src/services/index.js:74: .replace(/`/g, '\\`'))
        try:
            return self._templates[template_name].replace("`", "\\`")
        except KeyError:
            raise KeyError(f"template {template_name!r} not registered") from None

    def names(self) -> list[str]:
        return sorted(self._templates)

    def save(self, path: str | None = None) -> None:
        path = path or self._path
        if not path:
            raise ValueError("no path to save registry to")
        with open(path, "w") as fh:
            json.dump(self._templates, fh, indent=2, sort_keys=True)
