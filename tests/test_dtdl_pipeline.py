"""DTDL front-end parity vs the reference converter's assertions
(reference: tests/dtdl/test_dtdl.py:247-346, tests/fixtures/dtdl_fixtures.py).
"""

import hashlib

import corpus
from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import docs_from_payloads
from rdf_dtdl_fabric_ontology_converter_spark.operators.dtdl import (
    convert_interfaces, extract_interfaces)
from rdf_dtdl_fabric_ontology_converter_spark.functions.ids import (
    fabric_id_py, property_id_py)


def ref_dtmi_id(dtmi: str) -> str:
    """The reference's exact ID scheme (dtdl_converter.py:486-512)."""
    clean = dtmi.replace("dtmi:", "").split(";")[0]
    h = hashlib.sha256(clean.encode()).digest()
    return str(1_000_000_000_000 + int.from_bytes(h[:8], "big") % 10**12)


def convert(spark, *names):
    docs = docs_from_payloads(spark, {n: corpus.DTDL[n] for n in names})
    ents, rels, skipped = convert_interfaces(extract_interfaces(docs))
    emap = {r["name"]: r.asDict(recursive=True) for r in ents.collect()}
    return emap, rels.collect(), skipped.collect()


def test_simple_interface(spark):
    emap, rels, _ = convert(spark, "thermostat")
    t = emap["Thermostat"]
    assert t["id"] == ref_dtmi_id("dtmi:com:example:Thermostat;1")
    assert [(p["name"], p["valueType"]) for p in t["properties"]] == \
        [("targetTemperature", "Double")]
    assert [(p["name"], p["valueType"]) for p in t["timeseries_properties"]] == \
        [("currentTemperature", "Double")]
    # property id parity with the reference scheme
    assert t["properties"][0]["id"] == property_id_py(t["id"], "targetTemperature")
    assert t["timeseries_properties"][0]["id"] == \
        property_id_py(t["id"], "ts_currentTemperature")


def test_relationship(spark):
    emap, rels, _ = convert(spark, "room", "thermostat")
    assert set(emap) == {"Room", "Thermostat"}
    assert len(rels) == 1
    rel = rels[0]
    assert rel["name"] == "hasThermostat"
    assert rel["source_entity_type_id"] == ref_dtmi_id("dtmi:com:example:Room;1")
    assert rel["target_entity_type_id"] == \
        ref_dtmi_id("dtmi:com:example:Thermostat;1")


def test_dangling_relationship_target_allowed(spark):
    # reference hashes unknown targets unconditionally (dtdl_converter.py:723-729)
    emap, rels, _ = convert(spark, "room")
    assert len(rels) == 1
    assert rels[0]["target_entity_type_id"] == \
        ref_dtmi_id("dtmi:com:example:Thermostat;1")


def test_enum_maps_to_value_schema(spark):
    emap, _, _ = convert(spark, "enum_device")
    props = emap["Device"]["properties"]
    assert [(p["name"], p["valueType"]) for p in props] == [("status", "String")]


def test_telemetry_all_timeseries(spark):
    emap, _, _ = convert(spark, "sensor")
    s = emap["Sensor"]
    assert [p["name"] for p in s["timeseries_properties"]] == \
        ["temperature", "humidity", "pressure"]
    assert all(p["valueType"] == "Double" for p in s["timeseries_properties"])
    assert s["properties"] == []


def test_component_skipped_by_default(spark):
    emap, rels, _ = convert(spark, "machine_component")
    m = emap["Machine"]
    assert [p["name"] for p in m["properties"]] == ["serialNumber"]
    assert rels == []


def test_inheritance_base_id(spark):
    emap, _, _ = convert(spark, "smart_thermostat", "thermostat")
    st = emap["Smart_Thermostat"]  # displayName 'Smart Thermostat' sanitized
    assert st["base_entity_type_id"] == ref_dtmi_id("dtmi:com:example:Thermostat;1")
    assert {p["name"] for p in st["properties"]} == \
        {"wifiEnabled", "firmwareVersion"}


def test_inheritance_external_parent_is_root(spark):
    emap, _, _ = convert(spark, "smart_thermostat")  # parent not in set
    assert emap["Smart_Thermostat"]["base_entity_type_id"] is None


def test_complex_object_schema_to_string(spark):
    emap, _, _ = convert(spark, "nested_objects")
    props = emap["Building"]["properties"]
    assert [(p["name"], p["valueType"]) for p in props] == [("address", "String")]


def test_display_name_and_id_parts(spark):
    emap, _, _ = convert(spark, "room")
    room = emap["Room"]
    name_prop = room["properties"][0]
    # 'name' is a String prop: becomes displayName (first String in order);
    # no pk-pattern match ('name' has no id/key pattern) → first valid
    assert room["display_name_property_id"] == name_prop["id"]
    assert room["entity_id_parts"] == [name_prop["id"]]


def test_sibling_type_conflict_suffix(spark):
    import json
    a = json.dumps({
        "@context": "dtmi:dtdl:context;4", "@id": "dtmi:com:x:A;1",
        "@type": "Interface",
        "contents": [{"@type": "Property", "name": "value", "schema": "string"}]})
    b = json.dumps({
        "@context": "dtmi:dtdl:context;4", "@id": "dtmi:com:x:B;1",
        "@type": "Interface",
        "contents": [{"@type": "Property", "name": "value", "schema": "double"}]})
    docs = docs_from_payloads(spark, {"a": a, "b": b})
    ents, _, _ = convert_interfaces(extract_interfaces(docs))
    emap = {r["name"]: r.asDict(recursive=True) for r in ents.collect()}
    assert emap["A"]["properties"][0]["name"] == "value"        # first registered
    assert emap["B"]["properties"][0]["name"] == "value_double"  # suffixed


def test_ancestor_type_conflict_suffix(spark):
    import json
    parent = json.dumps({
        "@context": "dtmi:dtdl:context;4", "@id": "dtmi:com:x:P;1",
        "@type": "Interface",
        "contents": [{"@type": "Property", "name": "size", "schema": "string"}]})
    child = json.dumps({
        "@context": "dtmi:dtdl:context;4", "@id": "dtmi:com:x:C;1",
        "@type": "Interface", "extends": "dtmi:com:x:P;1",
        "contents": [{"@type": "Property", "name": "size", "schema": "long"}]})
    docs = docs_from_payloads(spark, {"p": parent, "c": child})
    ents, _, _ = convert_interfaces(extract_interfaces(docs))
    emap = {r["name"]: r.asDict(recursive=True) for r in ents.collect()}
    assert emap["P"]["properties"][0]["name"] == "size"
    assert emap["C"]["properties"][0]["name"] == "size_bigint"


def convert_modes(spark, names, modes):
    docs = docs_from_payloads(spark, {n: corpus.DTDL[n] for n in names})
    ents, rels, _ = convert_interfaces(extract_interfaces(docs), modes)
    emap = {r["name"]: r.asDict(recursive=True) for r in ents.collect()}
    return emap, rels.collect()


def test_component_separate_mode(spark):
    from rdf_dtdl_fabric_ontology_converter_spark.operators.dtdl import DtdlModes
    # target known: relationship only
    emap, rels = convert_modes(spark, ["machine_component", "thermostat"],
                               DtdlModes(component="separate"))
    assert set(emap) == {"Machine", "Thermostat"}
    comp = [r for r in rels if r["name"] == "has_thermostat"]
    assert len(comp) == 1
    assert comp[0]["target_entity_type_id"] == emap["Thermostat"]["id"]
    # target unknown: stub entity with componentId key
    emap2, rels2 = convert_modes(spark, ["machine_component"],
                                 DtdlModes(component="separate"))
    stub = emap2["thermostat_Thermostat"]
    assert [p["name"] for p in stub["properties"]] == ["componentId"]
    assert stub["entity_id_parts"] == [stub["properties"][0]["id"]]
    assert any(r["name"] == "has_thermostat" and
               r["target_entity_type_id"] == stub["id"] for r in rels2)


def test_component_flatten_mode(spark):
    from rdf_dtdl_fabric_ontology_converter_spark.operators.dtdl import DtdlModes
    emap, _ = convert_modes(spark, ["machine_component", "thermostat"],
                            DtdlModes(component="flatten"))
    m = emap["Machine"]
    names = [p["name"] for p in m["properties"]]
    assert names == ["serialNumber", "thermostat_targetTemperature"]
    types = {p["name"]: p["valueType"] for p in m["properties"]}
    assert types["thermostat_targetTemperature"] == "Double"


def test_command_property_mode(spark):
    import json
    from rdf_dtdl_fabric_ontology_converter_spark.operators.dtdl import DtdlModes
    payload = json.dumps({
        "@context": "dtmi:dtdl:context;4", "@id": "dtmi:com:x:Bot;1",
        "@type": "Interface",
        "contents": [
            {"@type": "Property", "name": "label", "schema": "string"},
            {"@type": "Command", "name": "reboot"},
        ]})
    docs = docs_from_payloads(spark, {"b": payload})
    ents, _, _ = convert_interfaces(extract_interfaces(docs),
                                    DtdlModes(command="property"))
    emap = {r["name"]: r.asDict(recursive=True) for r in ents.collect()}
    names = [p["name"] for p in emap["Bot"]["properties"]]
    assert names == ["label", "command_reboot"]


def test_command_entity_mode(spark):
    """Command → standalone CommandType entity + supports_* relationship
    (reference: mode_converters.py:345-483)."""
    import json
    from rdf_dtdl_fabric_ontology_converter_spark.operators.dtdl import DtdlModes
    payload = json.dumps({
        "@context": "dtmi:dtdl:context;4", "@id": "dtmi:com:x:Robot;1",
        "@type": "Interface",
        "contents": [
            {"@type": "Property", "name": "label", "schema": "string"},
            {"@type": "Command", "name": "calibrate",
             "request": {"name": "req", "schema": {
                 "@type": "Object", "fields": [
                     {"name": "axis", "schema": "string"},
                     {"name": "force", "schema": "double"}]}},
             "response": {"name": "ok", "schema": "boolean"}},
            {"@type": "Command", "name": "reboot"},
        ]})
    docs = docs_from_payloads(spark, {"r": payload})
    ents, rels, _ = convert_interfaces(extract_interfaces(docs),
                                       DtdlModes(command="entity"))
    emap = {r["name"]: r.asDict(recursive=True) for r in ents.collect()}
    rels = [r.asDict() for r in rels.collect()]
    assert set(emap) == {"Robot", "Command_calibrate", "Command_reboot"}

    cal = emap["Command_calibrate"]
    robot_id = ref_dtmi_id("dtmi:com:x:Robot;1")
    # deterministic id from cleaned fallback dtmi (no ';version' ambiguity)
    assert cal["id"] == fabric_id_py("com:x:Robot:cmd:calibrate")
    # reference property order: commandName, requestSchema, request params,
    # responseSchema, response params (mode_converters.py:374-415)
    assert [(p["name"], p["valueType"]) for p in cal["properties"]] == [
        ("commandName", "String"), ("requestSchema", "String"),
        ("request_axis", "String"), ("request_force", "Double"),
        ("responseSchema", "String"), ("response_ok", "Boolean")]
    name_prop = cal["properties"][0]
    assert name_prop["id"] == property_id_py(cal["id"], "commandName")
    assert cal["entity_id_parts"] == [name_prop["id"]]
    assert cal["display_name_property_id"] == name_prop["id"]
    assert cal["base_entity_type_id"] is None

    # command without payloads: commandName only
    reboot = emap["Command_reboot"]
    assert [(p["name"], p["valueType"]) for p in reboot["properties"]] == [
        ("commandName", "String")]

    # supports_* relationships, parent-side id scheme
    # (mode_converters.py:428-436)
    sup = {r["name"]: r for r in rels if r["name"].startswith("supports_")}
    assert set(sup) == {"supports_calibrate", "supports_reboot"}
    assert sup["supports_calibrate"]["id"] == \
        property_id_py(robot_id, "cmd_rel_calibrate")
    assert sup["supports_calibrate"]["source_entity_type_id"] == robot_id
    assert sup["supports_calibrate"]["target_entity_type_id"] == cal["id"]
    # parent keeps its regular properties; command NOT added as property
    assert [p["name"] for p in emap["Robot"]["properties"]] == ["label"]


def test_command_entity_explicit_dtmi(spark):
    """Command with its own @id hashes that dtmi (version-stripped)."""
    import json
    from rdf_dtdl_fabric_ontology_converter_spark.operators.dtdl import DtdlModes
    payload = json.dumps({
        "@context": "dtmi:dtdl:context;4", "@id": "dtmi:com:x:Bot;1",
        "@type": "Interface",
        "contents": [{"@type": "Command", "@id": "dtmi:com:x:Bot:boot;1",
                      "name": "boot"}]})
    docs = docs_from_payloads(spark, {"b": payload})
    ents, _, _ = convert_interfaces(extract_interfaces(docs),
                                    DtdlModes(command="entity"))
    emap = {r["name"]: r.asDict(recursive=True) for r in ents.collect()}
    assert emap["Command_boot"]["id"] == ref_dtmi_id("dtmi:com:x:Bot:boot;1")


def test_scaled_decimal_modes(spark):
    import json
    from rdf_dtdl_fabric_ontology_converter_spark.operators.dtdl import DtdlModes
    payload = json.dumps({
        "@context": "dtmi:dtdl:context;4", "@id": "dtmi:com:x:Meter;1",
        "@type": "Interface",
        "contents": [{"@type": "Property", "name": "reading",
                      "schema": "scaledDecimal"}]})
    docs = docs_from_payloads(spark, {"m": payload})

    def run(modes):
        ents, _, _ = convert_interfaces(extract_interfaces(docs), modes)
        e = ents.collect()[0].asDict(recursive=True)
        return [(p["name"], p["valueType"]) for p in e["properties"]]

    assert run(DtdlModes()) == [("reading", "String")]  # json_string default
    assert run(DtdlModes(scaled_decimal="calculated")) == [("reading", "Double")]
    assert run(DtdlModes(scaled_decimal="structured")) == [
        ("reading", "String"), ("reading_scale", "BigInt"),
        ("reading_value", "String")]
