"""Pure-Python CDM span parser (runs inside Arrow UDF batches).

Normalizes the three CDM dialects the reference auto-detects
(reference: src/formats/cdm/cdm_parser.py:208-250 — manifest, legacy
model.json, entity schema) into flat entity/relationship rows.

Attribute semantics follow the reference models
(reference: src/formats/cdm/cdm_models.py:105-175, 237-307):
primary key from traits means.identity.entityId / is.identifiedBy or
purpose == identifiedBy; display name from means.identity.name /
means.identity.person.fullName or purpose == namedBy; entity-typed
attributes flag relationships instead of properties; relationship names
default to verbPhrase trait else '<from>_to_<to>'.
"""

from __future__ import annotations

import json

PK_TRAITS = {"means.identity.entityId", "is.identifiedBy"}
NAME_TRAITS = {"means.identity.name", "means.identity.person.fullName"}


class CdmParseError(ValueError):
    pass


def _trait_names(raw) -> list[str]:
    out = []
    for t in raw or []:
        if isinstance(t, str):
            out.append(t)
        elif isinstance(t, dict):
            ref = t.get("traitReference") or t.get("traitName")
            if isinstance(ref, str):
                out.append(ref)
    return out


def _parse_attr(data, pos: int) -> list[dict]:
    if isinstance(data, str):
        return [{"name": data, "data_type": "string", "raw_type": None,
                 "max_length": None, "traits": [], "purpose": None,
                 "pos": pos}]
    if not isinstance(data, dict):
        return []
    if "attributeGroupReference" in data:
        return []
    if "entity" in data or "entityReference" in data:
        return [{"name": data.get("name", "entityRef"),
                 "data_type": "entity", "raw_type": "entity",
                 "max_length": None, "traits": [],
                 "purpose": data.get("purpose"), "pos": pos}]
    if "attributeReference" in data:
        ref = data["attributeReference"]
        name = data.get("name",
                        ref if isinstance(ref, str)
                        else ref.get("name", "ref") if isinstance(ref, dict)
                        else "ref")
        return [{"name": name, "data_type": "string", "raw_type": None,
                 "max_length": None, "traits": [], "purpose": None,
                 "pos": pos}]
    name = data.get("name")
    if not name:
        return []
    raw = data.get("dataType")
    if isinstance(raw, dict):
        raw = raw.get("dataType")
    raw = raw if isinstance(raw, str) else None
    ml = data.get("maximumLength")
    purpose = data.get("purpose")
    if isinstance(purpose, dict):
        purpose = purpose.get("purposeReference")
    return [{"name": name, "data_type": raw or "string",
             "raw_type": raw,
             "max_length": ml if isinstance(ml, int)
             and not isinstance(ml, bool) else None,
             "traits": _trait_names(data.get("appliedTraits")),
             "purpose": purpose if isinstance(purpose, str) else None,
             "pos": pos}]


def detect_dialect(doc: dict) -> str:
    """reference: cdm_parser._detect_document_type (content-only branch)."""
    if "manifestName" in doc or ("entities" in doc and
                                 "jsonSchemaSemanticVersion" in doc):
        if "definitions" not in doc:
            return "manifest"
    if "definitions" in doc:
        return "entity_schema"
    if "entities" in doc and "name" in doc and \
            "jsonSchemaSemanticVersion" not in doc:
        return "model_json"
    return "entity_schema"


def _rel_rows(rels: list, out_rels: list):
    for r in rels or []:
        if not isinstance(r, dict):
            continue
        frm = r.get("fromEntity", "")
        to = r.get("toEntity", "")
        if not (frm and to):
            # reference drops relationships without both endpoints
            # (cdm_parser.py:619-620 returns None) — e.g. model.json
            # SingleKeyRelationship rows carry nested fromAttribute/
            # toAttribute objects, not fromEntity/toEntity strings
            continue
        name = r.get("name")
        if not name:
            for t in r.get("exhibitsTraits") or []:
                if isinstance(t, dict) and \
                        t.get("traitReference") == "means.relationship.verbPhrase":
                    for a in t.get("arguments") or []:
                        v = a.get("value") if isinstance(a, dict) else a
                        if v:
                            name = str(v)
                            break
        if not name:
            f = frm.split("/")[-1].split(".")[0]
            t_ = to.split("/")[-1].split(".")[0]
            name = f"{f}_to_{t_}"
        out_rels.append({
            "name": name,
            "from_entity": frm.split("/")[-1] if frm else frm,
            "from_attribute": r.get("fromEntityAttribute", ""),
            "to_entity": to.split("/")[-1] if to else to,
            "to_attribute": r.get("toEntityAttribute", ""),
        })


def parse_cdm(text: str) -> tuple[list[dict], list[dict]]:
    """→ (entities, relationships).

    entity: {name, extends, attributes:[{name, data_type, traits, purpose,
             pos}], dialect}
    relationship: {name, from_entity, from_attribute, to_entity,
                   to_attribute}
    """
    doc = json.loads(text)
    if not isinstance(doc, dict):
        raise CdmParseError("CDM document must be a JSON object")
    dialect = detect_dialect(doc)
    entities: list[dict] = []
    rels: list[dict] = []

    if dialect == "entity_schema":
        for d in doc.get("definitions", []):
            if not isinstance(d, dict) or "entityName" not in d:
                continue
            attrs = []
            for i, a in enumerate(d.get("hasAttributes", [])):
                attrs.extend(_parse_attr(a, i))
            ext = d.get("extendsEntity")
            if isinstance(ext, dict):
                ext = ext.get("entityName")
            entities.append({"name": d["entityName"],
                             "extends": ext if isinstance(ext, str) else None,
                             "attributes": attrs, "dialect": dialect})
    elif dialect == "model_json":
        for e in doc.get("entities", []):
            if not isinstance(e, dict) or "name" not in e:
                continue
            attrs = []
            for i, a in enumerate(e.get("attributes", [])):
                attrs.extend(_parse_attr(a, i))
            entities.append({"name": e["name"], "extends": None,
                             "attributes": attrs, "dialect": dialect})
            # model.json relationships come from attributeReference entries
            # on entity attributes (reference cdm_parser.py:327-340).
            for a in e.get("attributes", []):
                if not isinstance(a, dict):
                    continue
                ref = a.get("attributeReference")
                if isinstance(ref, dict):
                    to_ent = ref.get("entityName", "")
                    rels.append({
                        "name": f"{e['name']}_to_{to_ent}",
                        "from_entity": e["name"],
                        "from_attribute": a.get("name", ""),
                        "to_entity": to_ent,
                        "to_attribute": ref.get("attributeName", "")})
        # Documented superset of the reference: flat-style top-level
        # relationship rows (fromEntity/toEntity strings) are also read in
        # model.json. The reference's model.json path ignores the top-level
        # array entirely (cdm_parser.py:305-347), but its nested
        # SingleKeyRelationship rows are dropped here anyway by the
        # both-endpoints guard, so output matches the reference on real
        # model.json corpora.
        _rel_rows(doc.get("relationships"), rels)
    else:  # manifest
        for e in doc.get("entities", []):
            if not isinstance(e, dict):
                continue
            name = e.get("entityName") or e.get("name")
            if not name:
                continue
            attrs = []
            for i, a in enumerate(e.get("attributes", []) or []):
                attrs.extend(_parse_attr(a, i))
            entities.append({"name": name, "extends": None,
                             "attributes": attrs, "dialect": dialect})
        _rel_rows(doc.get("relationships"), rels)

    return entities, rels


def attr_flags(attr: dict) -> tuple[bool, bool]:
    """(is_primary_key, is_display_name) per reference model semantics."""
    traits = set(attr.get("traits") or [])
    is_pk = bool(traits & PK_TRAITS) or attr.get("purpose") == "identifiedBy"
    is_dn = bool(traits & NAME_TRAITS) or attr.get("purpose") == "namedBy"
    return is_pk, is_dn
