"""Pure-Python DTDL v2/v3/v4 span parser (runs inside pandas UDF batches).

Normalizes a DTDL JSON payload (single Interface, array of Interfaces, or
``@graph`` document — reference: src/formats/dtdl/dtdl_parser.py:125-323)
into flat interface/content rows for the DataFrame pipeline. Complex schemas
(Object/Array/Map/Enum/scaledDecimal) are carried as JSON strings, matching
the reference's degradation to String(JSON)
(reference: src/formats/dtdl/dtdl_converter.py:1044-1076).
"""

from __future__ import annotations

import json


class DtdlParseError(ValueError):
    pass


def _as_list(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _display_name(node: dict) -> str | None:
    dn = node.get("displayName")
    if dn is None:
        return None
    if isinstance(dn, str):
        return dn
    if isinstance(dn, dict):  # localized: en else first value
        return dn.get("en", next(iter(dn.values()), None))
    return None


def dtmi_name(dtmi: str) -> str:
    """Strip version and take the last ':' segment
    (reference: dtdl_models.py:726-739)."""
    no_ver = dtmi.split(";")[0]
    return no_ver.rsplit(":", 1)[-1]


def _schema_info(schema) -> tuple[str, str | None]:
    """→ (schema_kind, schema_json): primitive name, or complex kind +
    its JSON payload. Enum carries its valueSchema for type mapping."""
    if schema is None:
        return "string", None
    if isinstance(schema, str):
        return schema, None
    if isinstance(schema, dict):
        t = schema.get("@type", "Object")
        t = t[0] if isinstance(t, list) else t
        if t == "Enum":
            vs = schema.get("valueSchema", "string")
            return f"enum:{vs if isinstance(vs, str) else 'string'}", json.dumps(schema)
        if t == "ScaledDecimal":
            return "scaledDecimal", json.dumps(schema)
        return f"complex:{t}", json.dumps(schema)
    return "string", None


def _command_info(c: dict) -> str:
    """Command content → JSON payload for ENTITY-mode conversion.

    Mirrors the reference's CommandConverter.convert_to_entity /
    _extract_command_parameters semantics
    (reference: src/formats/dtdl/mode_converters.py:345-483):
    requestSchema/responseSchema marker properties when the payload exists,
    plus one parameter property per Object field ("{prefix}_{field.name}")
    or one for a primitive payload schema ("{prefix}_{payload.name}").
    """
    info: dict = {"id": c.get("@id"), "has_request": False,
                  "has_response": False, "req_params": [], "resp_params": []}
    for prefix, key in (("request", "req_params"), ("response", "resp_params")):
        payload = c.get(prefix)
        if not isinstance(payload, dict):
            continue
        info[f"has_{prefix}"] = True
        schema = payload.get("schema")
        if isinstance(schema, dict) and isinstance(schema.get("fields"), list):
            for field in schema["fields"]:
                if isinstance(field, dict) and field.get("name"):
                    kind, _ = _schema_info(field.get("schema"))
                    info[key].append({"name": f"{prefix}_{field['name']}",
                                      "kind": kind})
        elif isinstance(schema, str) and schema:
            pname = payload.get("name")
            if pname:
                info[key].append({"name": f"{prefix}_{pname}",
                                  "kind": schema})
    return json.dumps(info)


def parse_dtdl(text: str) -> list[dict]:
    """→ one dict per Interface:

    {dtmi, name, display_name, extends: [dtmi...], context,
     contents: [{content_type, name, schema_kind, schema_json, target, pos}]}
    """
    doc = json.loads(text)
    if isinstance(doc, dict) and "@graph" in doc:
        nodes = _as_list(doc["@graph"])
    else:
        nodes = _as_list(doc)

    out = []
    for node in nodes:
        if not isinstance(node, dict):
            continue
        ntype = node.get("@type")
        ntypes = _as_list(ntype)
        if "Interface" not in ntypes:
            continue
        dtmi = node.get("@id")
        if not dtmi:
            raise DtdlParseError("Interface missing @id")
        contents = []
        for pos, c in enumerate(_as_list(node.get("contents"))):
            if not isinstance(c, dict):
                continue
            ctypes = _as_list(c.get("@type"))
            kind = next((t for t in ("Property", "Telemetry", "Relationship",
                                     "Component", "Command") if t in ctypes),
                        None)
            if kind is None:
                continue
            if kind == "Command":
                # commands carry a request/response payload, not a schema
                schema_kind, schema_json = "command", _command_info(c)
            else:
                schema_kind, schema_json = _schema_info(c.get("schema"))
            contents.append({
                "content_type": kind,
                "name": c.get("name", ""),
                "schema_kind": schema_kind,
                "schema_json": schema_json,
                "target": c.get("target"),
                "pos": pos,
            })
        ctx = node.get("@context")
        ctx0 = ctx[0] if isinstance(ctx, list) and ctx else ctx
        out.append({
            "dtmi": dtmi,
            "name": dtmi_name(dtmi),
            "display_name": _display_name(node),
            "extends": [e for e in _as_list(node.get("extends")) if isinstance(e, str)],
            "context": ctx0 if isinstance(ctx0, str) else None,
            "contents": contents,
        })
    return out
